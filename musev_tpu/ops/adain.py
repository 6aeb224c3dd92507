"""Adaptive instance normalization over video tensors.

Reference semantics: musev/data/data_util.py:499-602 — the generated frames
(``src``) are renormalized to the per-(batch, channel) statistics of the
vision-condition frames (``dst``), computed over (time, height, width) with
biased variance (correction=0) and a ``max(var, eps)`` floor.

Layout here is channels-last ``(B, T, H, W, C)``; statistics reduce over axes
(1, 2, 3). All statistics run in float32 regardless of input dtype, matching
the fp32 GroupNorm islands policy.
"""

from __future__ import annotations

import jax.numpy as jnp

from .index_ops import splice_with_index, take_frames


def adain(src: jnp.ndarray, dst: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Renormalize ``src`` to ``dst``'s statistics. Both ``(B, T, H, W, C)``."""
    dtype = src.dtype
    src32 = src.astype(jnp.float32)
    dst32 = dst.astype(jnp.float32)
    axes = (1, 2, 3)
    mean = jnp.mean(src32, axis=axes, keepdims=True)
    var = jnp.var(src32, axis=axes, keepdims=True)
    std = jnp.sqrt(jnp.maximum(var, eps))
    mean_acc = jnp.mean(dst32, axis=axes, keepdims=True)
    var_acc = jnp.var(dst32, axis=axes, keepdims=True)
    std_acc = jnp.sqrt(jnp.maximum(var_acc, eps))
    out = ((src32 - mean) / std) * std_acc + mean_acc
    return out.astype(dtype)


def adain_to_condition_frames(
    x: jnp.ndarray,
    gen_index,
    cond_index,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """AdaIN the generated frames of ``x`` to the condition frames' statistics
    and re-splice (reference batch_adain_conditioned_tensor,
    data_util.py:550-602). ``x`` is ``(B, T, H, W, C)``; indices are static.
    """
    src = take_frames(x, gen_index, axis=1)
    dst = take_frames(x, cond_index, axis=1)
    src = adain(src, dst, eps=eps)
    return splice_with_index(src, gen_index, dst, cond_index, axis=1)
