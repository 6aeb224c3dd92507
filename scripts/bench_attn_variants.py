"""Flash-attention kernel variant shootout at the flagship spatial shapes.

Baseline (prod kernel, tunnel-corrected): L0 self ~57 ms @ bt=50 (~30
TFLOP/s).  d=40 caps the MXU at 40/128 utilization -> ~61 TFLOP/s ceiling;
the gap to close is VPU softmax overhead + scratch traffic + transposes.

Variants:
  base      — production kernel as-is
  nomask    — skip the kv-length iota/where when sk divides block_kv
  slice     — nomask + slice-store m/l scratch instead of 128-lane broadcast
  onekv     — whole KV in one block (k/v fit VMEM at 5184x40), no online
              rescaling: plain softmax per q block
  native    — (B,S,C) layout, per-head lane slicing via BlockSpec; no
              transposes outside the kernel
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/musev_tpu_jax_cache")

_LANE = 128


def _cdiv(a, b):
    return -(-a // b)


def sync(x):
    _ = float(jnp.ravel(x)[0])


_LAT = 0.0


def measure_latency():
    global _LAT
    f = jax.jit(lambda a: a + 1.0)
    x = jnp.zeros((8, 128), jnp.float32)
    sync(f(x))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        sync(f(x))
        best = min(best, time.perf_counter() - t0)
    _LAT = best
    return best


def timeit(fn, *args, iters=3, inner=5):
    out = fn(*args)
    sync(out)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn(*args)
        sync(out)
        best = min(best, time.perf_counter() - t0)
    return max((best - _LAT) / inner, 1e-9)


# --------------------------------------------------------------------------
# variant kernels


def _kernel_v(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *, scale,
              sk, block_kv, mask, slice_store):
    i_kv = pl.program_id(2)
    n_kv = pl.num_programs(2)

    @pl.when(i_kv == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr[:], -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr[:])
        acc_scr[:] = jnp.zeros_like(acc_scr[:])

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * scale
    if mask:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + i_kv * block_kv
        s = jnp.where(col < sk, s, -jnp.inf)

    m_prev = m_scr[:, 0:1]
    l_prev = l_scr[:, 0:1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if slice_store:
        m_scr[:, 0:1] = m_new
        l_scr[:, 0:1] = l_new
    else:
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(i_kv == n_kv - 1)
    def _fin():
        l = l_scr[:, 0:1]
        safe_l = jnp.where(l > 0, l, 1.0)
        o_ref[0] = (acc_scr[:] / safe_l).astype(o_ref.dtype)


def make_flash(mask, slice_store, block_q, block_kv):
    @functools.partial(jax.jit, static_argnames=("scale",))
    def _flash(q, k, v, scale):
        bh, sq, d = q.shape
        sk = k.shape[1]
        bq = min(block_q, sq)
        bkv = min(block_kv, sk)
        assert sq % bq == 0 and sk % bkv == 0
        grid = (bh, sq // bq, sk // bkv)
        return pl.pallas_call(
            functools.partial(_kernel_v, scale=scale, sk=sk, block_kv=bkv,
                              mask=mask, slice_store=slice_store),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, bq, d), lambda b, iq, ik: (b, iq, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bkv, d), lambda b, iq, ik: (b, ik, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bkv, d), lambda b, iq, ik: (b, ik, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, bq, d), lambda b, iq, ik: (b, iq, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
            scratch_shapes=[
                pltpu.VMEM((bq, _LANE), jnp.float32),
                pltpu.VMEM((bq, _LANE), jnp.float32),
                pltpu.VMEM((bq, d), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
        )(q, k, v)

    return _flash


def _kernel_onekv(q_ref, k_ref, v_ref, o_ref, *, scale):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (o / l).astype(o_ref.dtype)


def make_onekv(block_q):
    @functools.partial(jax.jit, static_argnames=("scale",))
    def _flash(q, k, v, scale):
        bh, sq, d = q.shape
        sk = k.shape[1]
        bq = min(block_q, sq)
        assert sq % bq == 0
        grid = (bh, sq // bq)
        return pl.pallas_call(
            functools.partial(_kernel_onekv, scale=scale),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, bq, d), lambda b, iq: (b, iq, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, sk, d), lambda b, iq: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, sk, d), lambda b, iq: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, bq, d), lambda b, iq: (b, iq, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
        )(q, k, v)

    return _flash


_LOG2E = 1.4426950408889634


def _kernel_qs(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *, scale,
               block_kv, use_exp2):
    """Base online-softmax kernel, scale (and log2e) folded into the q tile."""
    i_kv = pl.program_id(2)
    n_kv = pl.num_programs(2)
    exp = jnp.exp2 if use_exp2 else jnp.exp

    @pl.when(i_kv == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr[:], -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr[:])
        acc_scr[:] = jnp.zeros_like(acc_scr[:])

    f = scale * _LOG2E if use_exp2 else scale
    q = (q_ref[0].astype(jnp.float32) * f).astype(q_ref.dtype)
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    m_prev = m_scr[:, 0:1]
    l_prev = l_scr[:, 0:1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = exp(s - m_new)
    alpha = exp(m_prev - m_new)
    l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(i_kv == n_kv - 1)
    def _fin():
        l = l_scr[:, 0:1]
        safe_l = jnp.where(l > 0, l, 1.0)
        o_ref[0] = (acc_scr[:] / safe_l).astype(o_ref.dtype)


def make_qs(block_q, block_kv, use_exp2):
    @functools.partial(jax.jit, static_argnames=("scale",))
    def _flash(q, k, v, scale):
        bh, sq, d = q.shape
        sk = k.shape[1]
        bq = min(block_q, sq)
        bkv = min(block_kv, sk)
        assert sq % bq == 0 and sk % bkv == 0
        grid = (bh, sq // bq, sk // bkv)
        return pl.pallas_call(
            functools.partial(_kernel_qs, scale=scale, block_kv=bkv,
                              use_exp2=use_exp2),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, bq, d), lambda b, iq, ik: (b, iq, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bkv, d), lambda b, iq, ik: (b, ik, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bkv, d), lambda b, iq, ik: (b, ik, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, bq, d), lambda b, iq, ik: (b, iq, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
            scratch_shapes=[
                pltpu.VMEM((bq, _LANE), jnp.float32),
                pltpu.VMEM((bq, _LANE), jnp.float32),
                pltpu.VMEM((bq, d), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
        )(q, k, v)

    return _flash


def _kernel_unroll(q_ref, k_ref, v_ref, o_ref, *, scale, sub_kv):
    """Whole-KV kernel: unrolled kv sub-blocks, register-carried softmax.

    The straight-line unrolled body gives Mosaic independent MXU chains
    (s_{j+1} = q @ k_{j+1}) to overlap with softmax VPU work of block j."""
    sk = k_ref.shape[1]
    n_sub = sk // sub_kv
    q = (q_ref[0].astype(jnp.float32) * (scale * _LOG2E)).astype(q_ref.dtype)
    m = None
    l = None
    acc = None
    for j in range(n_sub):
        kj = k_ref[0, j * sub_kv : (j + 1) * sub_kv, :]
        vj = v_ref[0, j * sub_kv : (j + 1) * sub_kv, :]
        s = jax.lax.dot_general(
            q, kj, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
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
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def make_unroll(block_q, sub_kv):
    @functools.partial(jax.jit, static_argnames=("scale",))
    def _flash(q, k, v, scale):
        bh, sq, d = q.shape
        sk = k.shape[1]
        bq = min(block_q, sq)
        assert sq % bq == 0 and sk % sub_kv == 0
        grid = (bh, sq // bq)
        return pl.pallas_call(
            functools.partial(_kernel_unroll, scale=scale, sub_kv=sub_kv),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, bq, d), lambda b, iq: (b, iq, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, sk, d), lambda b, iq: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, sk, d), lambda b, iq: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, bq, d), lambda b, iq: (b, iq, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
        )(q, k, v)

    return _flash


def _kernel_hybrid(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *,
                   scale, sub_kv):
    """Grid kv-loop with scratch carry + unrolled sub-blocks inside."""
    i_kv = pl.program_id(2)
    n_kv = pl.num_programs(2)
    bkv = k_ref.shape[1]
    n_sub = bkv // sub_kv

    q = (q_ref[0].astype(jnp.float32) * (scale * _LOG2E)).astype(q_ref.dtype)

    @pl.when(i_kv == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr[:], -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr[:])
        acc_scr[:] = jnp.zeros_like(acc_scr[:])

    m = m_scr[:, 0:1]
    l = l_scr[:, 0:1]
    acc = acc_scr[:]
    for j in range(n_sub):
        kj = k_ref[0, j * sub_kv : (j + 1) * sub_kv, :]
        vj = v_ref[0, j * sub_kv : (j + 1) * sub_kv, :]
        s = jax.lax.dot_general(
            q, kj, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m, m_cur)
        p = jnp.exp2(s - m_new)
        alpha = jnp.exp2(m - m_new)
        l = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(vj.dtype), vj, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m = m_new
    m_scr[:] = jnp.broadcast_to(m, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l, l_scr.shape)
    acc_scr[:] = acc

    @pl.when(i_kv == n_kv - 1)
    def _fin():
        lf = l_scr[:, 0:1]
        safe_l = jnp.where(lf > 0, lf, 1.0)
        o_ref[0] = (acc_scr[:] / safe_l).astype(o_ref.dtype)


def make_hybrid(block_q, block_kv, sub_kv):
    @functools.partial(jax.jit, static_argnames=("scale",))
    def _flash(q, k, v, scale):
        bh, sq, d = q.shape
        sk = k.shape[1]
        bq = min(block_q, sq)
        bkv = min(block_kv, sk)
        assert sq % bq == 0 and sk % bkv == 0 and bkv % sub_kv == 0
        grid = (bh, sq // bq, sk // bkv)
        return pl.pallas_call(
            functools.partial(_kernel_hybrid, scale=scale, sub_kv=sub_kv),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, bq, d), lambda b, iq, ik: (b, iq, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bkv, d), lambda b, iq, ik: (b, ik, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bkv, d), lambda b, iq, ik: (b, ik, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, bq, d), lambda b, iq, ik: (b, iq, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
            scratch_shapes=[
                pltpu.VMEM((bq, _LANE), jnp.float32),
                pltpu.VMEM((bq, _LANE), jnp.float32),
                pltpu.VMEM((bq, d), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
        )(q, k, v)

    return _flash


def _kernel_allheads(q_ref, k_ref, v_ref, o_ref, *, scale, sub_kv, heads):
    """(B, S, H*D) layout: heads processed by static lane slicing in-kernel.

    Eliminates the (B,S,H,D)->(BH,S,D) HBM transposes entirely; the lane
    shuffles for the 40-lane head slices are O(bq*c) per block, trivial next
    to the (bq, sub_kv) logits work."""
    sk_p = k_ref.shape[1]
    n_sub = sk_p // sub_kv
    c = q_ref.shape[2]
    d = c // heads
    qa = (q_ref[0].astype(jnp.float32) * (scale * _LOG2E)).astype(q_ref.dtype)
    outs = []
    for hh in range(heads):
        q = qa[:, hh * d : (hh + 1) * d]
        m = l = acc = None
        for j in range(n_sub):
            kj = k_ref[0, j * sub_kv : (j + 1) * sub_kv, hh * d : (hh + 1) * d]
            vj = v_ref[0, j * sub_kv : (j + 1) * sub_kv, hh * d : (hh + 1) * d]
            s = jax.lax.dot_general(
                q, kj, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
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
        outs.append((acc / l).astype(o_ref.dtype))
    o_ref[0] = jnp.concatenate(outs, axis=-1)


def make_allheads(block_q, sub_kv, heads):
    @functools.partial(jax.jit, static_argnames=("scale",))
    def _flash(q, k, v, scale):
        b, sq, c = q.shape
        sk = k.shape[1]
        bq = min(block_q, sq)
        assert sq % bq == 0 and sk % sub_kv == 0
        grid = (b, sq // bq)
        return pl.pallas_call(
            functools.partial(_kernel_allheads, scale=scale, sub_kv=sub_kv,
                              heads=heads),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, bq, c), lambda b_, iq: (b_, iq, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, sk, c), lambda b_, iq: (b_, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, sk, c), lambda b_, iq: (b_, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, bq, c), lambda b_, iq: (b_, iq, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, sq, c), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
        )(q, k, v)

    return _flash


def _kernel_mdma(q_ref, k_hbm, v_hbm, o_ref, kbuf, vbuf, ksem, vsem, *,
                 scale, sub, sk):
    """Unroll-style register-carried softmax with manually double-buffered
    K/V DMA from HBM — bounds VMEM regardless of sk."""
    bh = pl.program_id(0)
    skp = k_hbm.shape[1]
    n_sub = skp // sub

    def kdma(j, slot):
        return pltpu.make_async_copy(
            k_hbm.at[bh, pl.ds(j * sub, sub), :], kbuf.at[slot],
            ksem.at[slot])

    def vdma(j, slot):
        return pltpu.make_async_copy(
            v_hbm.at[bh, pl.ds(j * sub, sub), :], vbuf.at[slot],
            vsem.at[slot])

    kdma(0, 0).start()
    vdma(0, 0).start()
    q = (q_ref[0].astype(jnp.float32) * (scale * _LOG2E)).astype(q_ref.dtype)
    m = l = acc = None
    for j in range(n_sub):
        slot = j % 2
        if j + 1 < n_sub:
            kdma(j + 1, 1 - slot).start()
            vdma(j + 1, 1 - slot).start()
        kdma(j, slot).wait()
        vdma(j, slot).wait()
        kj = kbuf[slot]
        vj = vbuf[slot]
        s = jax.lax.dot_general(
            q, kj, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if (j + 1) * sub > sk:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * sub
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
    o_ref[0] = (acc / jnp.where(l > 0, l, 1.0)).astype(o_ref.dtype)


def make_mdma(block_q, sub_kv):
    @functools.partial(jax.jit, static_argnames=("scale",))
    def _flash(q, k, v, scale):
        bh, sq, d = q.shape
        sk = k.shape[1]
        bq = min(block_q, sq)
        sub = min(sub_kv, sk)
        assert sq % bq == 0 and sk % sub == 0
        grid = (bh, sq // bq)
        return pl.pallas_call(
            functools.partial(_kernel_mdma, scale=scale, sub=sub, sk=sk),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, bq, d), lambda b, iq: (b, iq, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, bq, d), lambda b, iq: (b, iq, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
            scratch_shapes=[
                pltpu.VMEM((2, sub, d), q.dtype),
                pltpu.VMEM((2, sub, d), q.dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
        )(q, k, v)

    return _flash


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bt", type=int, default=50)
    args = ap.parse_args()

    print(f"tunnel readback latency: {measure_latency()*1e3:.2f} ms",
          flush=True)
    key = jax.random.PRNGKey(0)
    h, d = 8, 40

    cases = [
        ("L0 plain", args.bt // 2, 5184, 5184),
        ("L0 concat", args.bt // 2, 5184, 10368),
        ("L0 cross", args.bt, 5184, 77),
    ]
    for name, bt, sq, sk in cases:
        qf = jax.random.normal(key, (bt, sq, h * d), jnp.bfloat16)
        kf = jax.random.normal(key, (bt, sk, h * d), jnp.bfloat16)
        vf = jax.random.normal(key, (bt, sk, h * d), jnp.bfloat16)
        # pre-transposed (BH, S, D) ignoring transpose cost
        q = qf.reshape(bt, sq, h, d).transpose(0, 2, 1, 3).reshape(bt * h, sq, d)
        k = kf.reshape(bt, sk, h, d).transpose(0, 2, 1, 3).reshape(bt * h, sk, d)
        v = vf.reshape(bt, sk, h, d).transpose(0, 2, 1, 3).reshape(bt * h, sk, d)
        flops = 4 * bt * h * sq * sk * d
        scale = d ** -0.5
        print(f"== {name}: bt={bt} sq={sq} sk={sk} ({flops/1e12:.2f} TFLOP)",
              flush=True)

        def run(label, fn, *a):
            try:
                t = timeit(functools.partial(fn, scale=scale), *a)
            except Exception as e:
                msg = str(e).replace("\n", " | ")
                print(f"  {label:28s}: FAIL {msg[:300]}", flush=True)
                return
            print(f"  {label:28s}: {t*1e3:8.2f} ms {flops/t/1e12:6.1f} TFLOP/s",
                  flush=True)

        if sk == 77:
            # tiny-KV cross-attention: grid-overhead bound; compare block
            # sizes + plain XLA
            kp = jnp.pad(k, ((0, 0), (0, 3), (0, 0)))
            vp = jnp.pad(v, ((0, 0), (0, 3), (0, 0)))
            for bq in (576, 1728, 2592, 5184):
                if sq % bq == 0:
                    run(f"mdma bq={bq} sub=80", make_mdma(bq, 80), q, kp, vp)
                    run(f"unroll80 bq={bq}", make_unroll(bq, 80), q, kp, vp)

            def xla_attn(q_, k_, v_, scale):
                s = jnp.einsum("bqd,bkd->bqk", q_, k_).astype(jnp.float32)
                w = jax.nn.softmax(s * scale, axis=-1).astype(q_.dtype)
                return jnp.einsum("bqk,bkd->bqd", w, v_)

            run("xla", jax.jit(xla_attn, static_argnames=("scale",)), q, k, v)
            continue
        run("base bq=864 bkv=1728", make_flash(True, False, 864, 1728),
            q, k, v)
        if sk <= 5184:
            run("unroll bq=576 sub=864", make_unroll(576, 864), q, k, v)
        for bq, sub in [(576, 864), (576, 1728), (288, 864), (864, 1728)]:
            run(f"mdma bq={bq} sub={sub}", make_mdma(bq, sub), q, k, v)
        # correctness probe vs xla at tiny batch
        try:
            small = make_mdma(576, 864)(q[:4], k[:4], v[:4], scale=scale)
            lg = jnp.einsum("bqd,bkd->bqk", q[:4], k[:4]) * scale
            w = jax.nn.softmax(lg.astype(jnp.float32), -1).astype(q.dtype)
            ref = jnp.einsum("bqk,bkd->bqd", w, v[:4])
            err = float(jnp.max(jnp.abs(
                small.astype(jnp.float32) - ref.astype(jnp.float32))))
            print(f"  mdma correctness: max_err={err:.5f}", flush=True)
        except Exception as e:
            print(f"  mdma correctness: FAIL {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
