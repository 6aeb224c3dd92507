"""Packed multi-head self-attention for SHORT sequences (temporal rows).

Motivation (v5e trace, round 1): temporal attention over (N=B*H*W, T=25,
C=320..1280) rows pays ~87ms/step in pure layout copies because XLA
materializes (N,T,H,D)->(N,H,T,D) operand transposes for the batched
per-head dots. This kernel takes the PACKED projection outputs (N, T, C)
directly — q/k/v are read from HBM exactly once, untransposed — and
computes every head in-kernel with the lane-mask trick:

    logits_h = (q ⊙ m_h) @ k^T        (m_h zeroes all lanes outside head h)
    out     += softmax(logits_h) @ (v ⊙ m_h)

Because head lanes are disjoint, the masked full-width contraction equals
the per-head d-contraction exactly, and the per-head outputs accumulate
into disjoint lane ranges (the adds only ever add zeros). No reshapes, no
strided DMA, no (T,H,D) relayouts — the two failure modes of head-split
kernels on Mosaic. T is small (<= 64), so softmax is computed whole, no
online accumulation.

Replaces the xformers temporal-attention call sites of the reference
(attention_processor.py:258; TransformerTemporalModel at
temporal_transformer.py) on the TPU path. Falls back to the XLA sdpa
elsewhere (see musev_tpu/models/unet_blocks.attention).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

MAX_SHORT_SEQ = 64


def _kernel(q_ref, k_ref, v_ref, m_ref, o_ref, *, n_heads: int, scale: float,
            kv_ref=None):
    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    # rows may be T-padded to a sublane multiple (avoids XLA re-tiling
    # copies on every feeding matmul); kv_ref is a (t, t) additive mask
    # with -inf on padded KV columns (host-built operand: in-kernel iota
    # mask constructions SIGABRT the v5e libtpu in this kernel)
    kv_mask = kv_ref[...] if kv_ref is not None else None
    acc = None
    for h in range(n_heads):
        m = m_ref[h][None, None, :].astype(q.dtype)  # (1, 1, C) 0/1 lanes
        logits = jax.lax.dot_general(
            q * m,
            k,
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        if kv_mask is not None:
            logits = logits + kv_mask
        p = jax.nn.softmax(logits * scale, axis=-1)
        oh = jax.lax.dot_general(
            p.astype(v.dtype),
            v * m,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(q.dtype)
        # heads write disjoint lane ranges: the adds only ever add zeros,
        # so accumulating at q.dtype is exact and halves VMEM pressure
        acc = oh if acc is None else acc + oh
    o_ref[...] = acc.astype(o_ref.dtype)


def _pick_block_n(n: int, t: int, c: int, budget_bytes: int = 500_000) -> int:
    """Largest divisor of n with block q-bytes under budget (bf16)."""
    cap = max(1, budget_bytes // max(1, t * c * 2))
    best = 1
    for d in range(1, min(n, cap) + 1):
        if n % d == 0:
            best = d
    return best


@partial(jax.jit, static_argnames=("n_heads", "scale", "interpret", "kv_len"))
def short_attention_packed(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    n_heads: int,
    scale: Optional[float] = None,
    interpret: bool = False,
    kv_len: Optional[int] = None,
) -> jnp.ndarray:
    """Self-attention over packed (N, T, C) rows, T <= MAX_SHORT_SEQ.

    Exact equivalent of heads-split sdpa on (N, T, n_heads, C//n_heads),
    without ever materializing the head-transposed operands.

    ``kv_len``: number of VALID leading positions when T is padded to a
    sublane multiple (keys/queries beyond it are padding; padded-query
    outputs are garbage for the caller to slice away).
    """
    n, t, c = q.shape
    if t > MAX_SHORT_SEQ:
        raise ValueError(f"short_attention_packed is for T<={MAX_SHORT_SEQ}, got {t}")
    if c % n_heads:
        raise ValueError(f"C={c} not divisible by heads={n_heads}")
    d = c // n_heads
    if scale is None:
        scale = float(d) ** -0.5
    if kv_len is None:
        kv_len = t
    mask = np.zeros((n_heads, c), np.float32)
    for h in range(n_heads):
        mask[h, h * d : (h + 1) * d] = 1.0
    mask = jnp.asarray(mask, q.dtype)

    bn = _pick_block_n(n, t, c)
    grid = (n // bn,)
    blk = pl.BlockSpec((bn, t, c), lambda i: (i, 0, 0))
    ins = [q, k, v, mask]
    in_specs = [blk, blk, blk, pl.BlockSpec((n_heads, c), lambda i: (0, 0))]
    if kv_len < t:
        kvm = np.zeros((t, t), np.float32)
        kvm[:, kv_len:] = -np.inf
        ins.append(jnp.asarray(kvm))
        in_specs.append(pl.BlockSpec((t, t), lambda i: (0, 0)))
        kernel = lambda qr, kr, vr, mr, kvr, orf: _kernel(  # noqa: E731
            qr, kr, vr, mr, orf, n_heads=n_heads, scale=scale, kv_ref=kvr
        )
    else:
        kernel = partial(_kernel, n_heads=n_heads, scale=scale)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((n, t, c), q.dtype),
        interpret=interpret,
    )(*ins)
    return out
