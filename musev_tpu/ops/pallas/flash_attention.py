"""Pallas TPU flash attention (online-softmax, O(S) memory).

Replaces xformers ``memory_efficient_attention`` at every spatial attention
site (SURVEY §2.10 N1). The concat-KV ReferenceOnly and dual-KV IP-Adapter
variants are expressed at the caller by concatenating KV token sets — this
kernel only needs plain (optionally length-masked) attention, so one kernel
serves all three.

Design (v2, tuned on v5e at the 576^2 flagship shapes):

* **unroll kernel**: grid ``(batch*heads, q_blocks)``; the KV extent is
  processed inside one kernel invocation as a Python-unrolled loop over
  sub-blocks with the online-softmax state (m, l, acc) carried in
  registers. No scratch round-trips, and the straight-line body lets Mosaic
  overlap sub-block j+1's QK^T (MXU) with sub-block j's softmax (VPU).
  Measured at (bh=400, s=5184, d=40): 36 ms vs 51 ms for a classic
  kv-grid streaming kernel — 47 vs 34 TFLOP/s, against a ~61 TFLOP/s
  ceiling set by d=40 occupying 40/128 MXU lanes.
* **KV split + merge**: K/V must stay resident in VMEM for the unroll
  kernel, which bounds the KV extent (~6.9k tokens at d=40, less for wide
  heads like the VAE's single d=512 head). Longer KV runs as several
  independent unroll calls that also emit their (m, l) softmax stats; the
  parts are merged exactly in XLA with the standard rescaling identity.
  This is how the 10368-token ReferenceOnly concat-KV cond half runs.
* ``scale * log2(e)`` is folded into the q tile once, so the kernel uses
  ``exp2`` and skips a full (bq, bkv) multiply per tile (~10%).
* logits and softmax in fp32 on the MXU (``preferred_element_type``), PV
  product accumulated in fp32, cast on the final store.
* head_dim stays un-padded (any multiple of 8): Mosaic handles non-128
  lane counts; zero-padding d=40 to 128 would inflate HBM traffic 3.2x.
* q/kv sequence lengths are block-padded with kv tail masking (q padding
  rows are sliced away after).

Tiny-KV sites (cross-attention at 77 text tokens) are grid-overhead bound
here and measured no better than XLA's fused attention — the dispatcher
(ops.attention.sdpa) routes them to the XLA path instead.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

_LANE = 128
_LOG2E = 1.4426950408889634
# long-KV strategy: "carry" (default; in-kernel KV-part grid with scratch
# state) or "split" (unroll calls per part + exact XLA merge) for A/B runs
_LONGKV_IMPL = os.environ.get("MUSEV_FLASH_LONGKV", "carry")
# VMEM budget for resident K/V + q/s/acc tiles; the hardware scoped-vmem
# limit is 16 MB (v5e), leave headroom for Mosaic's own double-buffering
_UNROLL_VMEM_BUDGET = 9 * 1024 * 1024


def _cdiv(a, b):
    return -(-a // b)


def _kv_capacity(d_p: int, sub: int) -> int:
    """Largest KV extent (multiple of ``sub``) the unroll kernel can hold.

    Empirical on v5e (analytic VMEM models under-count Mosaic's per-
    iteration temporaries): sk_p=5184 at 128 lanes compiles with margin,
    8640 blows the 16 MB scoped limit. Capacity scales inversely with the
    K/V lane width (wide heads like the VAE's d=512 shrink it 4x)."""
    lanes = max(d_p, _LANE)
    cap = 5184 * _LANE // lanes
    return max(sub, (cap // sub) * sub)


def _unroll_kernel(q_ref, k_ref, v_ref, *out_refs, scale, sub_kv, sk,
                   with_stats):
    if with_stats:
        o_ref, m_ref, l_ref = out_refs
    else:
        (o_ref,) = out_refs
    sk_p = k_ref.shape[1]
    n_sub = sk_p // sub_kv
    q = (q_ref[0].astype(jnp.float32) * (scale * _LOG2E)).astype(q_ref.dtype)
    m = l = acc = None
    for j in range(n_sub):
        kj = k_ref[0, j * sub_kv : (j + 1) * sub_kv, :]
        vj = v_ref[0, j * sub_kv : (j + 1) * sub_kv, :]
        s = jax.lax.dot_general(
            q, kj, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if (j + 1) * sub_kv > sk:  # static: only the padded tail block
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * sub_kv
            s = jnp.where(col < sk, s, -jnp.inf)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        if m is None:
            m_new = m_cur
            p = jnp.exp2(s - m_new)
            l = jnp.sum(p, axis=-1, keepdims=True)
            acc = jax.lax.dot_general(
                p.astype(vj.dtype), vj, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            m_new = jnp.maximum(m, m_cur)
            p = jnp.exp2(s - m_new)
            alpha = jnp.exp2(m - m_new)
            l = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * alpha + jax.lax.dot_general(
                p.astype(vj.dtype), vj, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        m = m_new
    safe_l = jnp.where(l > 0, l, 1.0)
    o_ref[0] = (acc / safe_l).astype(o_ref.dtype)
    if with_stats:
        m_ref[0] = jnp.broadcast_to(m, m_ref.shape[1:])
        l_ref[0] = jnp.broadcast_to(l, l_ref.shape[1:])


@functools.partial(
    jax.jit,
    static_argnames=("scale", "block_q", "sub_kv", "sk", "with_stats"),
)
def _flash_unroll(q, k, v, scale, block_q, sub_kv, sk, with_stats=False):
    bh, sq_p, d = q.shape
    sk_p = k.shape[1]
    grid = (bh, sq_p // block_q)
    out_shape = [jax.ShapeDtypeStruct((bh, sq_p, d), q.dtype)]
    out_specs = [
        pl.BlockSpec((1, block_q, d), lambda b, iq: (b, iq, 0),
                     memory_space=pltpu.VMEM)
    ]
    if with_stats:
        for _ in range(2):
            out_shape.append(jax.ShapeDtypeStruct((bh, sq_p, 8), jnp.float32))
            out_specs.append(
                pl.BlockSpec((1, block_q, 8), lambda b, iq: (b, iq, 0),
                             memory_space=pltpu.VMEM)
            )
    outs = pl.pallas_call(
        functools.partial(_unroll_kernel, scale=scale, sub_kv=sub_kv, sk=sk,
                          with_stats=with_stats),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, iq: (b, iq, 0),
                         memory_space=pltpu.VMEM),
            # constant block index across iq: fetched once per b
            pl.BlockSpec((1, sk_p, d), lambda b, iq: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_p, d), lambda b, iq: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs if with_stats else out_specs[0],
        out_shape=out_shape if with_stats else out_shape[0],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(q, k, v)
    return outs


def _stream_kernel(q_ref, k_hbm, v_hbm, o_ref, kbuf, vbuf, sems, *,
                   scale, sub_kv, sk, n_sub, bq_inner):
    """Long-KV flash: K/V streamed from HBM with double-buffered DMA.

    Grid is (bh, q_chunks), both parallel — no serial KV grid dimension and
    no scratch-carried softmax state (the two things that held the carry
    kernel at ~39 TF/s vs the unroll kernel's ~48 on identical work). Each
    grid step owns a LARGE resident q chunk; the KV extent is streamed past
    it exactly once as a Python-unrolled loop (manual async copies double-
    buffered against compute), with the inner q sub-blocks' (m, l, acc)
    states all carried in registers. KV-outer / q-inner ordering is what
    keeps the stream affordable: streaming per 576-row q block re-reads KV
    sq/576 times and measured DMA-bound at 30 TF/s.

    K/V arrive reshaped (bh, n_sub, sub_kv, 128): DMA slicing may only index
    leading (untiled) dims, and a memref of logical lane extent 40 cannot be
    sliced at all (physical tile is 128) — so this path pads d to a full
    lane tile. MXU cost is unchanged (lanes were padded in-core anyway) and
    the extra HBM bytes match what the padded physical layout already held."""
    b = pl.program_id(0)
    nq = q_ref.shape[1] // bq_inner

    def dma(slot, j):
        return pltpu.make_async_copy(
            k_hbm.at[b, j], kbuf.at[slot], sems.at[slot, 0],
        ), pltpu.make_async_copy(
            v_hbm.at[b, j], vbuf.at[slot], sems.at[slot, 1],
        )

    for d0 in dma(0, 0):
        d0.start()
    # scale per sub-block: a whole-chunk fp32 intermediate costs ~2 MB of
    # scoped VMEM at qc=2592 and tips the 16 MB limit
    qs = [
        (q_ref[0, i * bq_inner:(i + 1) * bq_inner].astype(jnp.float32)
         * (scale * _LOG2E)).astype(q_ref.dtype)
        for i in range(nq)
    ]
    m = [None] * nq
    l = [None] * nq
    acc = [None] * nq
    for j in range(n_sub):
        slot = j % 2
        if j + 1 < n_sub:
            for dn in dma(1 - slot, j + 1):
                dn.start()
        for dc in dma(slot, j):
            dc.wait()
        kj = kbuf[slot]
        vj = vbuf[slot]
        for i in range(nq):
            s = jax.lax.dot_general(
                qs[i], kj, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if (j + 1) * sub_kv > sk:  # static: only the padded tail block
                col = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                       + j * sub_kv)
                s = jnp.where(col < sk, s, -jnp.inf)
            m_cur = jnp.max(s, axis=-1, keepdims=True)
            if m[i] is None:
                m_new = m_cur
                p = jnp.exp2(s - m_new)
                l[i] = jnp.sum(p, axis=-1, keepdims=True)
                acc[i] = jax.lax.dot_general(
                    p.astype(vj.dtype), vj, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            else:
                m_new = jnp.maximum(m[i], m_cur)
                p = jnp.exp2(s - m_new)
                alpha = jnp.exp2(m[i] - m_new)
                l[i] = alpha * l[i] + jnp.sum(p, axis=-1, keepdims=True)
                acc[i] = acc[i] * alpha + jax.lax.dot_general(
                    p.astype(vj.dtype), vj, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            m[i] = m_new
    for i in range(nq):
        safe_l = jnp.where(l[i] > 0, l[i], 1.0)
        o_ref[0, i * bq_inner:(i + 1) * bq_inner] = (
            acc[i] / safe_l
        ).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "block_q", "sub_kv", "sk", "bq_inner",
                     "interpret"),
)
def _flash_stream(q, k, v, scale, block_q, sub_kv, sk, bq_inner=576,
                  interpret=False):
    bh, sq_p, d = q.shape
    sk_p = k.shape[1]
    if d != _LANE:  # full lane tile required for manual-DMA slicing
        q = jnp.pad(q, ((0, 0), (0, 0), (0, _LANE - d)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, _LANE - d)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, _LANE - d)))
    dp = _LANE
    n_sub = _cdiv(sk_p, sub_kv)
    if n_sub * sub_kv != sk_p:  # tail rows masked via sk in-kernel
        k = _pad_rows(k, n_sub * sub_kv)
        v = _pad_rows(v, n_sub * sub_kv)
    k = k.reshape(bh, n_sub, sub_kv, dp)
    v = v.reshape(bh, n_sub, sub_kv, dp)
    grid = (bh, sq_p // block_q)
    out = pl.pallas_call(
        functools.partial(_stream_kernel, scale=scale, sub_kv=sub_kv, sk=sk,
                          n_sub=n_sub, bq_inner=bq_inner),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, dp), lambda b, iq: (b, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, block_q, dp), lambda b, iq: (b, iq, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, sq_p, dp), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, sub_kv, dp), q.dtype),
            pltpu.VMEM((2, sub_kv, dp), q.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v)
    return out[:, :, :d] if d != dp else out


def _carry_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *,
                  scale, sub_kv, sk, part, n_parts, n_qsub):
    """One KV part per grid step; online-softmax state carried in scratch.

    Grid is (bh, q_blocks, kv_parts) with parts innermost: the q block index
    is constant across the inner loop (fetched once), K/V part fetches
    double-buffer against compute, and (m, l, acc) live in VMEM scratch so
    no stats/merge temps ever hit HBM — the XLA split-merge this replaces
    wrote fp32 lane-padded (3.2x at d=40) partial outputs per part.

    Two pipelining levers close the gap to the resident unroll kernel (the
    round-4 carry kernel ran ~35 vs 47 TF/s because each grid step was one
    serialized QK^T -> softmax -> PV chain, leaving the VPU softmax exposed
    on the critical path):

    * the (m, l, acc) state is read from scratch ONCE per part and carried
      in registers across the KV sub-blocks, so the unrolled body is
      straight-line and Mosaic overlaps sub-block j+1's QK^T (MXU) with
      sub-block j's softmax (VPU) — exactly the unroll kernel's schedule;
    * ``n_qsub`` splits the q block into independent row chunks with
      separate softmax states: even at one KV sub-block per part the
      chunks' chains interleave (chunk B's QK^T hides chunk A's softmax).

    A sub-block wholly past ``sk`` (pad tail) is exact as straight-line
    code: its columns mask to -inf, so m_cur=-inf keeps m (finite — part 0
    always holds real columns), p underflows to 0 and alpha=1.
    """
    ip = pl.program_id(2)

    @pl.when(ip == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    bq = q_ref.shape[1]
    qc = bq // n_qsub
    base = ip * part
    qs, m, l, acc = [], [], [], []
    for i in range(n_qsub):
        r = slice(i * qc, (i + 1) * qc)
        qs.append((q_ref[0, r].astype(jnp.float32)
                   * (scale * _LOG2E)).astype(q_ref.dtype))
        m.append(m_scr[r, 0:1])
        l.append(l_scr[r, 0:1])
        acc.append(acc_scr[r, :])
    for j in range(part // sub_kv):
        kj = k_ref[0, j * sub_kv : (j + 1) * sub_kv, :]
        vj = v_ref[0, j * sub_kv : (j + 1) * sub_kv, :]
        for i in range(n_qsub):
            s = jax.lax.dot_general(
                qs[i], kj, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # static skip: sub-block j needs masking only if it can
            # overshoot sk in the last part (earlier parts always fit)
            if (n_parts - 1) * part + (j + 1) * sub_kv > sk:
                col = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                       + base + j * sub_kv)
                s = jnp.where(col < sk, s, -jnp.inf)
            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m[i], m_cur)
            p = jnp.exp2(s - m_new)
            alpha = jnp.exp2(m[i] - m_new)
            l[i] = alpha * l[i] + jnp.sum(p, axis=-1, keepdims=True)
            acc[i] = acc[i] * alpha + jax.lax.dot_general(
                p.astype(vj.dtype), vj, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m[i] = m_new
    for i in range(n_qsub):
        r = slice(i * qc, (i + 1) * qc)
        m_scr[r, 0:1] = m[i]
        l_scr[r, 0:1] = l[i]
        acc_scr[r, :] = acc[i]

    @pl.when(ip == n_parts - 1)
    def _store():
        for i in range(n_qsub):
            r = slice(i * qc, (i + 1) * qc)
            safe_l = jnp.where(l[i] > 0, l[i], 1.0)
            o_ref[0, r] = (acc[i] / safe_l).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "block_q", "sub_kv", "part", "sk", "n_qsub",
                     "interpret"),
)
def _flash_carry(q, k, v, scale, block_q, sub_kv, part, sk, n_qsub=1,
                 interpret=False):
    bh, sq_p, d = q.shape
    sk_p = k.shape[1]
    if block_q % n_qsub or (block_q // n_qsub) % 8:
        # a non-dividing split would silently drop q rows via bad slices
        raise ValueError(
            f"n_qsub={n_qsub} must divide block_q={block_q} into 8-row-"
            "aligned chunks"
        )
    n_parts = sk_p // part
    grid = (bh, sq_p // block_q, n_parts)
    return pl.pallas_call(
        functools.partial(_carry_kernel, scale=scale, sub_kv=sub_kv, sk=sk,
                          part=part, n_parts=n_parts, n_qsub=n_qsub),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, iq, ip: (b, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, part, d), lambda b, iq, ip: (b, ip, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, part, d), lambda b, iq, ip: (b, ip, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, iq, ip: (b, iq, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, sq_p, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 8), jnp.float32),
            pltpu.VMEM((block_q, 8), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v)


def _carry_plan(sk: int, d_p: int) -> tuple:
    """(n_parts, part, sub) for the carry path: balanced lane-aligned KV
    parts sized to the unroll VMEM capacity, sub-block = largest lane-
    aligned divisor of part <= the measured 2048 sweet spot (wider
    sub-blocks amortize the VPU/MXU switchover).

    Sweep (v5e, 2026-08-19, bh=96 d=40 concat-KV shapes; ms per call):
      sk=10368 (576^2 refnet): (3,3456,1152) 21.97 = best; (3,4096,1024)
        22.98; (3,4096,2048) 23.28; (6,2048,2048) 26.04; (2,5376,672)
        26.41; narrow sub (2,5248,128) collapses to 44.77 (18 TF/s).
      sk=8192 (512^2 refnet): (2,4096,2048) 12.61 = best; (4,2048,2048)
        12.78; (2,4224,128) 29.09.
    part > ~5120 or bq >= 864 at part=4096/sub=2048 blows scoped VMEM
    (Mosaic compile failure) — the dispatcher's bq<=576 never hits it.

    The part cap is 4608, NOT the unroll capacity 5184: the formula at
    cap=5184 picked (2, 5184, 1728) for sk=10368, which both flirts with
    the >~5120 VMEM cliff and measured 27.9 ms vs the sweep-best 3-part
    plan's 21.97 — balanced parts under ~4.6k rows are uniformly faster."""
    cap = min(_kv_capacity(d_p, _LANE), 4608)
    n_parts = _cdiv(sk, cap)
    part = _cdiv(_cdiv(sk, n_parts), _LANE) * _LANE
    if part <= 3456 and d_p <= _LANE:
        # one sub-block per part measured fastest where its fp32 logits
        # tile fits: (3,3456,3456) 20.4 ms vs (3,3456,1152) 21.5
        return n_parts, part, part
    sub = _LANE
    for cand in range(2048, _LANE - 1, -_LANE):
        if part % cand == 0:
            sub = cand
            break
    return n_parts, part, sub


def _carry_qsub(bq: int) -> int:
    """Independent q register-state chunks per carry grid step: two chunks'
    QK^T/softmax chains interleave so the VPU softmax of one hides behind
    the MXU matmul of the other, even with a single KV sub-block per part.

    Swept on v5e (2026-08-20, bh=96 sq=5184 sk=10368 d=40, ms per call,
    scripts/bench_longkv_carry.py): at the production (3,3456,3456) plan
    n_qsub=2 is uniformly best — 21.6-21.8 vs 22.2-23.9 at n_qsub=1 and
    21.9/22.3 at 3/4 (same-session pairs; ~+9%%). Wider q blocks to cut the
    K/V refetch (bq 864-2592 with short parts for the ~4*part*bq scoped-
    vmem logits bound) all LOST: 24.4-31.6 ms — part boundaries serialize
    more than the refetch costs, so the refetch is well-hidden. Chunks must
    stay 8-row aligned."""
    for n in (2, 1):
        if bq % n == 0 and (bq // n) % 8 == 0:
            return n
    return 1


def _bq_target(sq: int, sk: int, d_p: int) -> int:
    """Default q-block target: 576 (tuned at the 576^2 flagship, sq=5184);
    1024 when it tiles sq exactly and KV is small enough that the wider
    q block still fits VMEM alongside it — measured +9% at the 512^2
    refnet shape (sq=sk=4096: 60.4 vs 55.5 TFLOP/s on v5e; bq=864/1024
    at sk_p=5184 blows the scoped-VMEM compile)."""
    if sq % 1024 == 0 and sk <= 4096 and d_p <= 128:
        return 1024
    return 576


def _split_sub_kv(d_p: int) -> int:
    """KV sub-block for the split-merge path: wider sub-blocks amortize the
    per-part pipeline ramp — measured 40.7 vs 34.2 TFLOP/s at the 512^2
    ReferenceOnly concat-KV shape (sk=8192 -> two balanced 4096 parts),
    equal at the 576^2 one (sk=10368). Flat 2048 (not _pick_block over the
    full sk): each part masks its own tail, so whole-sk pad waste doesn't
    apply here."""
    return min(2048, _kv_capacity(d_p, 8))


def _pick_block(s: int, target: int) -> int:
    """Largest block <= target (multiple of 8) minimizing pad waste.

    e.g. sq=5184 with target 1024 -> 864 (6 exact blocks) instead of padding
    to 6144 (+18.5%% wasted rows, visible in traces)."""
    if s <= target:
        return _cdiv(s, 8) * 8
    best, best_waste = target, (_cdiv(s, target) * target - s) / s
    for cand in range(target, target // 2, -8):
        waste = (_cdiv(s, cand) * cand - s) / s
        if waste < best_waste - 1e-9:
            best, best_waste = cand, waste
            if waste == 0:
                break
    return best


def _pad_rows(x, rows):
    return jnp.pad(x, ((0, 0), (0, rows - x.shape[1]), (0, 0))) \
        if rows != x.shape[1] else x


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float = None,
    block_q: int = None,
    block_kv: int = None,  # kept for API compat; sub-block target
) -> jnp.ndarray:
    """Attention over (B, S, H, D) tensors, matching ops.attention.sdpa."""
    if jax.default_backend() != "tpu":
        # NotImplementedError is the contract with ops.attention.sdpa's
        # XLA fallback — a gpu backend must take it too, not crash in Mosaic
        raise NotImplementedError("pallas flash attention requires TPU")
    b, sq, h, d = q.shape
    sk = k.shape[1]
    if scale is None:
        scale = d**-0.5
    # Mosaic handles non-128 head dims (multiple of 8) with identical speed;
    # skipping the explicit zero-pad avoids 3.2x HBM inflation at d=40
    d_p = d if d % 8 == 0 else _cdiv(d, 8) * 8

    def to_bh(x, s):
        x = x.transpose(0, 2, 1, 3).reshape(b * h, s, d)
        if d_p != d:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, d_p - d)))
        return x

    bq = _pick_block(sq, _bq_target(sq, sk, d_p) if block_q is None
                     else block_q)
    sq_p = _cdiv(sq, bq) * bq
    qb = _pad_rows(to_bh(q, sq), sq_p)
    kb = to_bh(k, sk)
    vb = to_bh(v, sk)
    scale = float(scale)

    sub = _pick_block(sk, 864 if block_kv is None else block_kv)
    sub = min(sub, _kv_capacity(d_p, 8))
    sk_p = _cdiv(sk, sub) * sub
    if sk_p <= _kv_capacity(d_p, sub):
        out = _flash_unroll(
            qb, _pad_rows(kb, sk_p), _pad_rows(vb, sk_p), scale,
            int(bq), int(sub), int(sk),
        )[:, :sq]
    elif _LONGKV_IMPL != "split":
        # Long-KV default: one kernel, KV parts as an inner grid dimension,
        # online-softmax state carried in VMEM scratch (_carry_kernel). No
        # HBM stats/merge temps, no XLA merge stage.
        n_parts, part, sub = _carry_plan(sk, d_p)
        sk_p = n_parts * part
        out = _flash_carry(
            qb, _pad_rows(kb, sk_p), _pad_rows(vb, sk_p), scale,
            int(bq), int(sub), int(part), int(sk),
            n_qsub=_carry_qsub(bq),
        )[:, :sq]
    else:
        # KV split + exact merge: independent unroll calls per KV part,
        # each emitting (o, m, l); parts merged with the softmax rescaling
        # identity (all stats share the folded log2e units, so exp2 merges).
        # Smaller q blocks: the stats outputs cost ~50 KB of double-buffered
        # VMEM, which at bq=576 sits exactly at the 16 MB scoped limit.
        bq = _pick_block(sq, 432 if block_q is None else block_q)
        sq_p = _cdiv(sq, bq) * bq
        qb = _pad_rows(to_bh(q, sq), sq_p)
        if block_kv is None:
            sub = _split_sub_kv(d_p)
        part = _kv_capacity(d_p, sub)
        n_parts = _cdiv(sk, part)

        def _merge_parts(qc, kc, vc):
            o = m = l = None
            for i in range(n_parts):
                lo = i * part
                hi = min(sk, lo + part)
                ki = _pad_rows(kc[:, lo:hi], part)
                vi = _pad_rows(vc[:, lo:hi], part)
                oi, mi, li = _flash_unroll(
                    qc, ki, vi, scale, int(bq), int(sub), int(hi - lo),
                    with_stats=True,
                )
                oi = oi.astype(jnp.float32)
                mi = mi[:, :, 0:1]
                li = li[:, :, 0:1]
                if o is None:
                    o, m, l = oi, mi, li
                else:
                    m_new = jnp.maximum(m, mi)
                    w1 = jnp.exp2(m - m_new) * l
                    w2 = jnp.exp2(mi - m_new) * li
                    denom = jnp.where(w1 + w2 > 0, w1 + w2, 1.0)
                    o = (o * w1 + oi * w2) / denom
                    l = w1 + w2
                    m = m_new
            return o.astype(q.dtype)

        # the f32 merge temps are lane-padded d->128 by XLA (3.2x at d=40),
        # so at full bh x sq they dominate HBM (the 576^2 refnet program
        # OOMed at 19 GB / 13% buffer utilization). Chunk bh with lax.map:
        # the kernel compiles once, temps shrink n_chunks x, and the grid
        # inside each chunk still has hundreds of blocks to pipeline.
        bh_rows = qb.shape[0]
        budget_rows = max(
            1, 256 * 1024 * 1024 // (sq_p * max(_LANE, d_p) * 4)
        )
        bc = bh_rows
        if bh_rows > budget_rows:
            for cand in range(min(budget_rows, bh_rows - 1), 0, -1):
                if bh_rows % cand == 0:
                    bc = cand
                    break
        if bc == bh_rows:
            out = _merge_parts(qb, kb, vb)[:, :sq]
        else:
            nc = bh_rows // bc
            out = jax.lax.map(
                lambda args: _merge_parts(*args),
                (qb.reshape(nc, bc, *qb.shape[1:]),
                 kb.reshape(nc, bc, *kb.shape[1:]),
                 vb.reshape(nc, bc, *vb.shape[1:])),
            ).reshape(bh_rows, sq_p, d_p)[:, :sq]

    out = out[:, :, :d].reshape(b, h, sq, d).transpose(0, 2, 1, 3)
    return out
