"""Frame-index algebra for vision-conditioned denoising.

These are the pure-functional JAX equivalents of the reference's tensor index
bookkeeping (reference: musev/data/data_util.py:242-497). All index arrays are
expected to be *static* (numpy / python ints baked in at trace time) so that
XLA sees constant gathers/scatters and can fuse them; nothing here introduces
dynamic shapes.

Layout convention: video tensors are channels-last ``(B, T, H, W, C)`` inside
the framework (TPU-friendly); the time axis defaults to 1.
"""

from __future__ import annotations

from typing import Sequence, Union

import jax.numpy as jnp
import numpy as np

Index = Union[Sequence[int], np.ndarray, jnp.ndarray]


def _as_index(index: Index) -> jnp.ndarray:
    if isinstance(index, jnp.ndarray):
        return index.astype(jnp.int32)
    return jnp.asarray(np.asarray(index, dtype=np.int32))


def take_frames(x: jnp.ndarray, index: Index, axis: int = 1) -> jnp.ndarray:
    """Gather frames along ``axis`` (reference batch_index_select, data_util.py:413)."""
    return jnp.take(x, _as_index(index), axis=axis)


def splice_with_index(
    data1: jnp.ndarray,
    data1_index: Index,
    data2: jnp.ndarray,
    data2_index: Index,
    axis: int = 1,
) -> jnp.ndarray:
    """Scatter-merge two tensors into one along ``axis``.

    Result has ``data1.shape[axis] + data2.shape[axis]`` frames, with
    ``result[..., data1_index[i], ...] = data1[..., i, ...]`` and likewise for
    data2 (reference concat_two_tensor_with_index, data_util.py:242-268).
    """
    d1_idx = _as_index(data1_index)
    d2_idx = _as_index(data2_index)
    total = data1.shape[axis] + data2.shape[axis]
    out_shape = list(data1.shape)
    out_shape[axis] = total
    out = jnp.zeros(out_shape, dtype=data1.dtype)
    idx1 = [slice(None)] * data1.ndim
    idx1[axis] = d1_idx
    idx2 = [slice(None)] * data2.ndim
    idx2[axis] = d2_idx
    out = out.at[tuple(idx1)].set(data1.astype(out.dtype))
    out = out.at[tuple(idx2)].set(data2.astype(out.dtype))
    return out


def frame_mask(
    num_frames: int, zero_index: Index, dtype=jnp.float32
) -> jnp.ndarray:
    """A ``(num_frames,)`` mask that is 0 at ``zero_index`` and 1 elsewhere.

    Functional replacement for the reference's in-place batch_index_fill
    (data_util.py:471-497) as used by the temporal layers'
    ``keep_content_condition`` logic (resnet.py:114-132).
    """
    mask = np.ones((num_frames,), dtype=np.float32)
    mask[np.asarray(zero_index, dtype=np.int64)] = 0.0
    return jnp.asarray(mask, dtype=dtype)


def align_repeat(x: jnp.ndarray, target_length: int, axis: int = 0) -> jnp.ndarray:
    """Broadcast-repeat ``x`` along ``axis`` up to ``target_length``.

    Mirrors the reference's align_repeat_tensor_single_dim
    (data_util.py:605-652): when shorter, repeat_interleave evenly (requires
    divisibility) ; when longer, truncate; equal is identity.
    """
    src = x.shape[axis]
    if target_length == src:
        return x
    if target_length > src:
        if target_length % src == 0:
            return jnp.repeat(x, target_length // src, axis=axis)
        # fall back to repeating the first element, like the reference's
        # n_src_base_length=1 branch
        first = jnp.take(x, jnp.arange(1), axis=axis)
        return jnp.repeat(first, target_length, axis=axis)
    idx = [slice(None)] * x.ndim
    idx[axis] = slice(0, target_length)
    return x[tuple(idx)]


def fuse_part_tensor(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    overlap: int,
    weight: float = 0.5,
    skip_step: int = 0,
    axis: int = 1,
) -> jnp.ndarray:
    """Blend the last ``overlap`` frames of ``src`` into frames
    ``[skip_step, skip_step+overlap)`` of ``dst`` (serial-denoise carry,
    reference fuse_part_tensor, data_util.py:655-681)."""
    if overlap == 0:
        return dst
    idx = [slice(None)] * dst.ndim
    idx[axis] = slice(skip_step, skip_step + overlap)
    src_idx = [slice(None)] * src.ndim
    src_idx[axis] = slice(src.shape[axis] - overlap, src.shape[axis])
    fused = weight * src[tuple(src_idx)].astype(dst.dtype) + (1.0 - weight) * dst[
        tuple(idx)
    ]
    return dst.at[tuple(idx)].set(fused)
