"""Sinusoidal time/frame embeddings and 2D sin-cos position embeddings.

Reference: diffusers ``Timesteps``/``TimestepEmbedding`` as instantiated by
musev/models/unet_3d_condition.py:342-367 (flip_sin_to_cos=True,
downscale_freq_shift=0) and musev/models/embeddings.py:24-87 for the spatial
sin-cos grid with optional length normalization.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .common import Params, init_linear, linear, silu


def sinusoidal_embedding(
    timesteps: jnp.ndarray,
    dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jnp.ndarray:
    """(N,) -> (N, dim) in float32."""
    half = dim // 2
    exponent = -np.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    emb = jnp.exp(exponent)[None, :] * timesteps.astype(jnp.float32)[:, None]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    if flip_sin_to_cos:
        return jnp.concatenate([cos, sin], axis=-1)
    return jnp.concatenate([sin, cos], axis=-1)


def init_timestep_embedding(
    key, in_dim: int, embed_dim: int, dtype=jnp.float32
) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "linear_1": init_linear(k1, in_dim, embed_dim, dtype=dtype),
        "linear_2": init_linear(k2, embed_dim, embed_dim, dtype=dtype),
    }


def timestep_embedding(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """linear -> silu -> linear (diffusers TimestepEmbedding, act_fn=silu)."""
    return linear(p["linear_2"], silu(linear(p["linear_1"], x)))


def get_2d_sincos_pos_embed(
    embed_dim: int,
    grid_h: int,
    grid_w: int,
    norm_length: bool = False,
    max_length: int = 2048,
) -> np.ndarray:
    """(H*W, embed_dim) numpy, reference musev/models/embeddings.py:24-52."""
    if norm_length and grid_h <= max_length and grid_w <= max_length:
        h = np.linspace(0, max_length, grid_h)
        w = np.linspace(0, max_length, grid_w)
    else:
        h = np.arange(grid_h, dtype=np.float32)
        w = np.arange(grid_w, dtype=np.float32)
    grid = np.meshgrid(w, h)  # w goes first, like the reference
    grid = np.stack(grid, axis=0).reshape([2, 1, grid_h, grid_w])

    def _1d(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000**omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    emb_h = _1d(embed_dim // 2, grid[0])
    emb_w = _1d(embed_dim // 2, grid[1])
    return np.concatenate([emb_h, emb_w], axis=1).astype(np.float32)
