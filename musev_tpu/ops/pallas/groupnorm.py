"""Fused GroupNorm(+SiLU) Pallas kernel.

The reference leans on cuDNN GroupNorm→SiLU→Conv chains everywhere
(resnet.py:56-78; SURVEY §2.10 N2). The XLA path upcasts to fp32 with
multiple HBM passes; this kernel reads the bf16 sample once, computes group
statistics in fp32, and writes the normalized+activated output.

Group reductions avoid lane-dim reshapes (unsupported by Mosaic for
non-128 factors) by contracting with a channel→group one-hot matrix on the
MXU: ``sum_g = sum_hw(x) @ M``; per-channel stats come back via ``M.T``.

Grid: one step per batch row; the full (H*W, C) sample lives in VMEM (the
wrapper falls back to the XLA path when it doesn't fit).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 6 * 1024 * 1024  # bytes of input per grid step


def _kernel(x_ref, scale_ref, bias_ref, o_ref, *, groups, eps, apply_silu):
    x = x_ref[0].astype(jnp.float32)  # (HW, C)
    hw, c = x.shape
    cg = c // groups
    # channel -> group one-hot (C, G)
    ch = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
    gr = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    onehot = (ch // cg == gr).astype(jnp.float32)
    count = jnp.float32(hw * cg)
    col_sum = jnp.sum(x, axis=0, keepdims=True)  # (1, C)
    col_sq = jnp.sum(x * x, axis=0, keepdims=True)
    sum_g = jax.lax.dot_general(
        col_sum, onehot, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (1, G)
    sq_g = jax.lax.dot_general(
        col_sq, onehot, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    mean_g = sum_g / count
    var_g = sq_g / count - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)
    # back to per-channel via M.T
    mean_c = jax.lax.dot_general(
        mean_g, onehot, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (1, C)
    inv_c = jax.lax.dot_general(
        inv_g, onehot, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    y = (x - mean_c) * inv_c
    y = y * scale_ref[0].astype(jnp.float32) + bias_ref[0].astype(jnp.float32)
    if apply_silu:
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("groups", "eps", "apply_silu"))
def _gn_silu(x, scale, bias, groups, eps, apply_silu):
    n, hw, c = x.shape
    return pl.pallas_call(
        functools.partial(
            _kernel, groups=groups, eps=eps, apply_silu=apply_silu
        ),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, hw, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, hw, c), x.dtype),
    )(x, scale[None], bias[None])


def group_norm_silu(
    p,
    x: jnp.ndarray,
    num_groups: int = 32,
    eps: float = 1e-5,
    apply_silu: bool = True,
):
    """Drop-in fused GroupNorm(+SiLU) over (N, ..., C); returns None when the
    sample doesn't fit the kernel's VMEM budget (caller falls back)."""
    if jax.default_backend() == "cpu":
        return None
    n = x.shape[0]
    c = x.shape[-1]
    hw = 1
    for d in x.shape[1:-1]:
        hw *= d
    if hw * c * x.dtype.itemsize > _VMEM_BUDGET or c % num_groups:
        return None
    y = _gn_silu(
        x.reshape(n, hw, c), p["scale"], p["bias"], num_groups, float(eps),
        apply_silu,
    )
    return y.reshape(x.shape)
