"""Ring attention: sequence-parallel exact attention over a mesh axis.

The missing §2.10 piece beyond window-DP and Megatron-TP: shard the *token*
axis of an attention site across devices and rotate K/V shards around the
ring with ``lax.ppermute``, merging partial results with the online-softmax
rescaling identity. Per ring step each device computes a (S/n, S/n) block of
the score matrix, so the full (S, S) attention never materializes on any
chip and activation memory scales 1/n — the standard TPU recipe for
sequence lengths that outgrow a single chip (the 576^2 spatial sites at
5184 tokens fit one v5e comfortably, but 1024^2+ or long-video joint
spatio-temporal attention does not).

Communication: 2(n-1) ppermute hops of the local K/V shards over ICI; the
compute of ring step i overlaps the transfer of step i+1 (XLA schedules the
ppermute DMA asynchronously).

No reference equivalent (the reference is single-GPU xformers,
musev/models/attention_processor.py); the algorithm follows the public ring
/ blockwise-parallel attention formulation.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def _chunk_attn(q, k, v, scale):
    """Unnormalized attention of local q against one K/V chunk.

    q (B,Sq,H,D), k/v (B,Sk,H,D) -> acc (B,H,Sq,D) f32, m/l (B,H,Sq,1) f32.
    """
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    acc = jnp.einsum(
        "bhqk,bkhd->bhqd", p.astype(q.dtype), v
    ).astype(jnp.float32)
    return acc, m, l


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    axis_name: str,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Exact attention with the sequence axis sharded over ``axis_name``.

    Must be called inside ``shard_map`` (or any SPMD region) where q/k/v are
    the *local* shards ``(B, S/n, H, D)``. Returns the local output shard;
    the concatenation over the axis equals full (B,S,H,D) attention.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    n = jax.lax.axis_size(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]

    acc, m, l = _chunk_attn(q, k, v, scale)

    def body(_, carry):
        acc, m, l, k, v = carry
        k = jax.lax.ppermute(k, axis_name, perm)
        v = jax.lax.ppermute(v, axis_name, perm)
        acc2, m2, l2 = _chunk_attn(q, k, v, scale)
        m_new = jnp.maximum(m, m2)
        a1 = jnp.exp(m - m_new)
        a2 = jnp.exp(m2 - m_new)
        return acc * a1 + acc2 * a2, m_new, l * a1 + l2 * a2, k, v

    if n > 1:
        acc, m, l, _, _ = jax.lax.fori_loop(1, n, body, (acc, m, l, k, v))
    out = acc / jnp.where(l > 0, l, 1.0)
    return out.transpose(0, 2, 1, 3).astype(q.dtype)


def sp_sdpa(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    axis: str = "sp",
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Replicated-in / replicated-out ring attention over the ambient mesh.

    Shards the sequence axis of (B, S, H, D) inputs over mesh axis ``axis``
    (set via ``jax.set_mesh`` / ``with mesh:``), runs ``ring_attention``
    under ``shard_map``, and returns the re-assembled output. ``S`` must be
    divisible by the axis size; callers pad or fall back otherwise (see
    ops.attention.sdpa).
    """
    spec = P(None, axis, None, None)
    fn = jax.shard_map(
        partial(ring_attention, axis_name=axis, scale=scale),
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    return fn(q, k, v)
