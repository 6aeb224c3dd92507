"""Temporally-correlated sampler noise (the VideoFusion decomposition).

Reference: musev/utils/noise_util.py:8-83. The single most load-bearing
numeric detail for temporal consistency: stochastic noise is
``sqrt(1-w) * common + sqrt(w) * individual`` where ``common`` is shared
across the time axis and ``individual`` is i.i.d. per frame.

PRNG contract: we thread explicit ``jax.random`` keys. For a given key,
``common`` uses ``fold_in(key, 0)`` and ``individual`` uses ``fold_in(key, 1)``
so results are reproducible and independent of call order.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def random_noise(
    key: jax.Array,
    shape: Sequence[int],
    dtype=jnp.float32,
    noise_offset: Optional[float] = None,
    time_axis: int = 1,
) -> jnp.ndarray:
    """Plain gaussian noise with optional offset-noise (noise_util.py:8-28).

    ``noise_offset`` adds a per-(batch, channel) constant shift — with the
    BTHWC layout that is a draw of shape (B, 1, 1, 1, C) broadcast over
    time/space.
    """
    k0, k1 = jax.random.split(key)
    noise = jax.random.normal(k0, tuple(shape), dtype=jnp.float32)
    if noise_offset is not None:
        off_shape = [1] * len(shape)
        off_shape[0] = shape[0]
        off_shape[-1] = shape[-1]
        noise = noise + noise_offset * jax.random.normal(
            k1, tuple(off_shape), dtype=jnp.float32
        )
    return noise.astype(dtype)


def video_fusion_noise(
    key: jax.Array,
    shape: Sequence[int],
    w_ind_noise: float = 0.5,
    dtype=jnp.float32,
    initial_common_noise: Optional[jnp.ndarray] = None,
    time_axis: int = 1,
) -> jnp.ndarray:
    """``sqrt(1-w) * common + sqrt(w) * individual`` (noise_util.py:31-83).

    ``shape`` is the full video-noise shape (default layout BTHWC with
    ``time_axis=1``); ``common`` has extent 1 on the time axis and broadcasts.
    ``initial_common_noise`` lets callers pin the shared component across
    shots/windows for long-form consistency.
    """
    common_shape = list(shape)
    common_shape[time_axis] = 1
    k_common = jax.random.fold_in(key, 0)
    k_ind = jax.random.fold_in(key, 1)
    if initial_common_noise is not None:
        common = initial_common_noise.astype(jnp.float32)
    else:
        common = jax.random.normal(k_common, tuple(common_shape), dtype=jnp.float32)
    ind = jax.random.normal(k_ind, tuple(shape), dtype=jnp.float32)
    w = jnp.asarray(w_ind_noise, dtype=jnp.float32)
    out = jnp.sqrt(1.0 - w) * common + jnp.sqrt(w) * ind
    return out.astype(dtype)


def make_noise(
    key: jax.Array,
    shape: Sequence[int],
    noise_type: str = "video_fusion",
    w_ind_noise: float = 0.5,
    dtype=jnp.float32,
    initial_common_noise: Optional[jnp.ndarray] = None,
    time_axis: int = 1,
) -> jnp.ndarray:
    """Dispatch on the reference's ``noise_type`` contract
    (scheduling_euler_discrete.py:120-130)."""
    if noise_type == "random":
        return random_noise(key, shape, dtype=dtype, time_axis=time_axis)
    if noise_type == "video_fusion":
        return video_fusion_noise(
            key,
            shape,
            w_ind_noise=w_ind_noise,
            dtype=dtype,
            initial_common_noise=initial_common_noise,
            time_axis=time_axis,
        )
    raise ValueError(f"unknown noise_type {noise_type!r}")
