"""Pallas GroupNorm statistics kernel.

XLA's fused GroupNorm reduction traced at ~15 GB/s effective on v5e (the
(..., G, C/G) minor-axis reduce tiles pathologically); even the
one-hot-matmul reformulation leaves ~90ms/step in reduction fusions. This
kernel accumulates per-(sample, channel) sum and sum-of-squares in VMEM
across row tiles — one bandwidth-speed read of the tensor and a tiny write —
and the normalize/affine/SiLU stays in XLA where it fuses with neighbors.

``group_norm_stats`` returns (s1, s2) with shapes (N, C) float32;
``group_norm_pallas`` is the drop-in GroupNorm built on it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a, b):
    return -(-a // b)


def _stats_kernel(x_ref, o_ref, acc_ref, *, rows, block_rows):
    it = pl.program_id(1)
    n_t = pl.num_programs(1)

    @pl.when(it == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref[:])

    x = x_ref[0].astype(jnp.float32)  # (block_rows, C)
    # mask padded rows in the tail tile
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) + it * block_rows
    x = jnp.where(row < rows, x, 0.0)
    acc_ref[0, :] += jnp.sum(x, axis=0)
    acc_ref[1, :] += jnp.sum(x * x, axis=0)

    @pl.when(it == n_t - 1)
    def _store():
        o_ref[0] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("block_rows",))
def group_norm_stats(x2d: jnp.ndarray, block_rows: int = 1024):
    """(N, rows, C) -> (N, 2, C) float32 [sum; sum of squares]."""
    n, rows, c = x2d.shape
    rows_p = _cdiv(rows, block_rows) * block_rows
    if rows_p != rows:
        x2d = jnp.pad(x2d, ((0, 0), (0, rows_p - rows), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_stats_kernel, rows=rows, block_rows=block_rows),
        grid=(n, rows_p // block_rows),
        in_specs=[
            pl.BlockSpec((1, block_rows, c), lambda i, t: (i, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, c), lambda i, t: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 2, c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, c), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(x2d)
    return out[:, 0, :], out[:, 1, :]


def group_norm_pallas(
    p,
    x: jnp.ndarray,
    num_groups: int = 32,
    eps: float = 1e-5,
    block_rows: int = 1024,
):
    """Drop-in GroupNorm over (N, ..., C): Pallas stats + XLA apply.

    Returns None on CPU (caller falls back to the XLA path).
    """
    if jax.default_backend() == "cpu":
        return None
    orig_dtype = x.dtype
    c = x.shape[-1]
    n = x.shape[0]
    cg = c // num_groups
    xf = x.reshape(n, -1, c)
    count = xf.shape[1] * cg
    s1, s2 = group_norm_stats(xf, block_rows=min(block_rows, xf.shape[1]))
    onehot = (
        (jnp.arange(c)[:, None] // cg) == jnp.arange(num_groups)[None, :]
    ).astype(jnp.float32)
    mean_g = (s1 @ onehot) / count
    var_g = jnp.maximum((s2 @ onehot) / count - mean_g * mean_g, 0.0)
    inv_g = lax.rsqrt(var_g + eps)
    mean_c = mean_g @ onehot.T
    inv_c = inv_g @ onehot.T
    scale = inv_c * p["scale"].astype(jnp.float32)[None, :]
    shift = p["bias"].astype(jnp.float32)[None, :] - mean_c * scale
    y = xf.astype(jnp.float32) * scale[:, None, :] + shift[:, None, :]
    return y.reshape(x.shape).astype(orig_dtype)
