"""Functional NN primitives: params are pytrees, forwards are pure functions.

Conventions (TPU-first):
  * activations are channels-last: images ``(N, H, W, C)``, videos
    ``(B, T, H, W, C)``, sequences ``(N, S, C)``
  * conv kernels are HWIO; linear kernels are (in, out)
  * GroupNorm / LayerNorm statistics always run in float32 (the bf16 network
    keeps fp32 norm islands, mirroring the reference's fp16+fp32-GN policy)
  * every ``init_*`` returns a params dict; the matching lower-case function
    applies it
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

Params = dict

# ---------------------------------------------------------------------------
# initializers


def _split(key, n):
    return jax.random.split(key, n)


def init_linear(
    key, in_dim: int, out_dim: int, use_bias: bool = True, dtype=jnp.float32,
    zero_init: bool = False,
) -> Params:
    if zero_init:
        kernel = jnp.zeros((in_dim, out_dim), dtype)
    else:
        kernel = jax.nn.initializers.lecun_normal()(key, (in_dim, out_dim), dtype)
    p = {"kernel": kernel}
    if use_bias:
        p["bias"] = jnp.zeros((out_dim,), dtype)
    return p


def init_conv(
    key,
    in_c: int,
    out_c: int,
    kernel_size: Union[int, Tuple[int, int]] = 3,
    use_bias: bool = True,
    dtype=jnp.float32,
    zero_init: bool = False,
) -> Params:
    if isinstance(kernel_size, int):
        kernel_size = (kernel_size, kernel_size)
    shape = (*kernel_size, in_c, out_c)
    if zero_init:
        kernel = jnp.zeros(shape, dtype)
    else:
        kernel = jax.nn.initializers.lecun_normal()(key, shape, dtype)
    p = {"kernel": kernel}
    if use_bias:
        p["bias"] = jnp.zeros((out_c,), dtype)
    return p


def init_norm(num_channels: int, dtype=jnp.float32) -> Params:
    """Scale/bias pair shared by GroupNorm and LayerNorm."""
    return {
        "scale": jnp.ones((num_channels,), dtype),
        "bias": jnp.zeros((num_channels,), dtype),
    }


# ---------------------------------------------------------------------------
# appliers


def linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    y = x @ p["kernel"].astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def conv2d(
    p: Params,
    x: jnp.ndarray,
    stride: Union[int, Tuple[int, int]] = 1,
    padding: Union[str, int, Sequence[Tuple[int, int]]] = 1,
) -> jnp.ndarray:
    """NHWC conv with HWIO kernel."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    y = lax.conv_general_dilated(
        x,
        p["kernel"].astype(x.dtype),
        window_strides=stride,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def conv_temporal(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Conv along time only, kernel (3,1,1) in the reference (resnet.py:59).

    ``x`` is ``(B, T, H, W, C)``. Implemented as three shifted matmuls
    (y_t = x_{t-1} W0 + x_t W1 + x_{t+1} W2, zero-padded) — ~20% faster than
    the equivalent lax conv on v5e since the tiny T extent tiles poorly as a
    conv spatial dim. Kernel param shape: (3, 1, I, O).
    """
    b, t, h, w, c = x.shape
    kern = p["kernel"].astype(x.dtype)
    w0, w1, w2 = kern[0, 0], kern[1, 0], kern[2, 0]
    xm = jnp.concatenate([jnp.zeros_like(x[:, :1]), x[:, :-1]], axis=1)
    xp = jnp.concatenate([x[:, 1:], jnp.zeros_like(x[:, :1])], axis=1)
    y = xm @ w0 + x @ w1 + xp @ w2
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def group_norm(
    p: Params, x: jnp.ndarray, num_groups: int = 32, eps: float = 1e-5
) -> jnp.ndarray:
    """GroupNorm over the last axis (channels), stats in fp32.

    Group reductions go through a channel->group one-hot matmul instead of a
    reshape to (..., G, C/G): reducing over a 10-wide minor axis is a
    pathological TPU layout, while sum-over-rows with the channel lane dim
    intact plus a (C, G) contraction runs at full bandwidth. Dispatch-
    amortized v5e timing at the L0 flagship shape (50,72,72,320): 0.84 ms =
    ~400 GB/s effective, and GN+SiLU fuses to 0.93 ms — at the elementwise
    roofline, so the once-planned Pallas GN kernel (BASELINE N2) is
    retired: a single-pass stats+apply kernel could save at most 1/3 of the
    traffic on ~7%% of step time while breaking XLA fusion with neighbors.
    """
    orig_dtype = x.dtype
    # Force a materialization boundary: without it XLA CLONES the producing
    # 3x3 convolution into the stats fusion (conv computed twice — the
    # entire ~0.9 s/10-step "conv+GN-stat" bucket in the v5e profile was
    # duplicated convs) and demotes the f32 stat accumulation to bf16.
    x = lax.optimization_barrier(x)
    c = x.shape[-1]
    n = x.shape[0]
    if c % num_groups:
        raise ValueError(
            f"group_norm: channels {c} not divisible by groups {num_groups}"
        )
    cg = c // num_groups
    # NO reshape: a (N, H, W, C) conv output often carries a conv layout;
    # reshaping to (N, HW, C) forced a materialized relayout copy (seen at
    # 1.2 GB/step in the r2 HLO). Reduce over the middle axes in place.
    mid_axes = tuple(range(1, x.ndim - 1))
    count = int(np.prod([x.shape[a] for a in mid_axes])) * cg
    onehot = (
        (jnp.arange(c)[:, None] // cg) == jnp.arange(num_groups)[None, :]
    ).astype(jnp.float32)
    # dtype-accumulated reduces: the bf16->f32 convert fuses into the
    # reduction instead of materializing an fp32 copy of the activation
    s1 = jnp.sum(x, axis=mid_axes, dtype=jnp.float32)  # (N, C)
    s2 = jnp.sum(
        jnp.square(x.astype(jnp.float32)), axis=mid_axes
    )
    sum_g = s1 @ onehot  # (N, G)
    sq_g = s2 @ onehot
    mean_g = sum_g / count
    var_g = jnp.maximum(sq_g / count - mean_g * mean_g, 0.0)
    inv_g = lax.rsqrt(var_g + eps)
    mean_c = mean_g @ onehot.T  # (N, C)
    inv_c = inv_g @ onehot.T
    scale = inv_c * p["scale"].astype(jnp.float32)[None, :]
    shift = p["bias"].astype(jnp.float32)[None, :] - mean_c * scale
    bshape = (n,) + (1,) * len(mid_axes) + (c,)
    y = (
        x.astype(jnp.float32) * scale.reshape(bshape)
        + shift.reshape(bshape)
    )
    return y.astype(orig_dtype)


def layer_norm(
    p: Optional[Params], x: jnp.ndarray, eps: float = 1e-5
) -> jnp.ndarray:
    orig_dtype = x.dtype
    # materialization boundary — same producer-cloning pathology as
    # group_norm (259 stats fusions in the r3 HLO re-ran a conv/dot clone)
    x = lax.optimization_barrier(x)
    c = x.shape[-1]
    # dtype-accumulated reduces keep stats exact in f32 WITHOUT naming a
    # shared fp32 copy of x: the r2 HLO materialized 4.6 GB/step of
    # f32 activations from the old `x32 = x.astype(f32)` multi-consumer
    # pattern (common.py:171 copies)
    mean = jnp.sum(x, axis=-1, keepdims=True, dtype=jnp.float32) / c
    sq = jnp.sum(
        jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True
    ) / c
    var = jnp.maximum(sq - mean * mean, 0.0)
    inv = lax.rsqrt(var + eps)
    y = (x.astype(jnp.float32) - mean) * inv
    if p is not None:
        y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(orig_dtype)


def silu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.silu(x)


# ---------------------------------------------------------------------------
# GEGLU feed-forward (diffusers FeedForward with geglu activation)


def init_geglu_ff(key, dim: int, mult: int = 4, dtype=jnp.float32) -> Params:
    k1, k2 = _split(key, 2)
    inner = dim * mult
    return {
        "proj_in": init_linear(k1, dim, inner * 2, dtype=dtype),
        "proj_out": init_linear(k2, inner, dim, dtype=dtype),
    }


def geglu_ff(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    h = linear(p["proj_in"], x)
    h, gate = jnp.split(h, 2, axis=-1)
    h = h * jax.nn.gelu(gate)
    return linear(p["proj_out"], h)
