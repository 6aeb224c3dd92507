"""Scaled-dot-product attention dispatch.

One entry point, ``sdpa``, with pluggable implementations:
  * ``"xla"`` — einsum + fp32 softmax; XLA fuses this well for the short
    sequences of temporal attention
  * ``"flash"`` — Pallas TPU flash-attention kernel (ops/pallas) for the
    long-sequence spatial paths; falls back to xla off-TPU
  * ``"auto"`` — picks by platform and sequence length

Replaces every xformers ``memory_efficient_attention`` call site in the
reference (attention_processor.py:258, 292, 328, 519, 724; SURVEY §2.10 N1).

Shapes: q ``(B, Sq, H, D)``, k/v ``(B, Sk, H, D)``; returns ``(B, Sq, H, D)``.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

_FLASH_MIN_SEQ = 512


def _xla_sdpa(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    if scale is None:
        scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    logits = logits.astype(jnp.float32)
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", weights, v)


def sdpa(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    bias: Optional[jnp.ndarray] = None,
    impl: str = "auto",
) -> jnp.ndarray:
    """Attention over (B, S, H, D) tensors."""
    if impl == "auto":
        from ..parallel.context import mesh_active, sp_axis

        sp = sp_axis()
        if (
            sp is not None
            and bias is None
            and q.shape[1] == k.shape[1]  # self-attention sites only
            and q.shape[1] >= _FLASH_MIN_SEQ
        ):
            from jax.sharding import get_abstract_mesh

            mesh = get_abstract_mesh()
            n = mesh.shape.get(sp, 1) if mesh.shape else 1
            if n > 1 and q.shape[1] % n == 0:
                from ..parallel.ring_attention import sp_sdpa

                return sp_sdpa(q, k, v, axis=sp, scale=scale)
        on_tpu = jax.default_backend() not in ("cpu", "gpu")
        impl = (
            "flash"
            if on_tpu and bias is None and q.shape[1] >= _FLASH_MIN_SEQ
            # tiny-KV sites (cross-attn over 77 text tokens) are
            # grid-overhead bound in the kernel; XLA measured faster (v5e:
            # 4.2 vs 4.4-6.0 ms at the L0 cross shape) with no transposes
            and k.shape[1] >= 256
            and not mesh_active()  # custom calls aren't SPMD-partitionable
            else "xla"
        )
    if impl == "flash":
        from .pallas.flash_attention import flash_attention

        try:
            return flash_attention(q, k, v, scale=scale)
        except NotImplementedError:
            impl = "xla"
    return _xla_sdpa(q, k, v, scale=scale, bias=bias)
