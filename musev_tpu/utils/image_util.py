"""Host-side image utilities: histogram matching, crop/resize.

Reference: musev/utils/tensor_util.py:13-34 (his_match, applied after decode
at pipeline_controlnet.py:2175-2179 / predictor.py:745-750) and mmcm's
batch_dynamic_crop_resize_images (SURVEY §2.9).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np


def hist_match_frame(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Match ``dst``'s per-channel histogram to ``src``'s.

    Both (H, W, 3) floats in [0, 1]; returns matched ``dst``. Mirrors the
    reference's CDF search (tensor_util.py:13-34).
    """
    src8 = (src * 255.0).astype(np.uint8)
    dst8 = (dst * 255.0).astype(np.uint8)
    res = np.zeros_like(dst8)
    kw = dict(bins=256, range=(0, 256), density=True)
    for ch in range(3):
        his_src, _ = np.histogram(src8[:, :, ch], **kw)
        his_dst, _ = np.histogram(dst8[:, :, ch], **kw)
        cdf_src = np.cumsum(his_src)
        cdf_dst = np.cumsum(his_dst)
        index = np.searchsorted(cdf_src, cdf_dst, side="left")
        np.clip(index, 0, 255, out=index)
        res[:, :, ch] = index[dst8[:, :, ch]]
    return res.astype(np.float32) / 255.0


def hist_match_video_to_frame(
    video: np.ndarray, reference_frame: np.ndarray
) -> np.ndarray:
    """Match every frame of (T, H, W, 3) to a reference frame
    (predictor.py:746-749 semantics)."""
    return np.stack([hist_match_frame(reference_frame, f) for f in video])


def dynamic_crop_resize(
    image: np.ndarray, target_h: int, target_w: int
) -> np.ndarray:
    """Center-crop to the target aspect ratio, then resize (the mmcm
    batch_dynamic_crop_resize_images contract)."""
    from PIL import Image

    h, w = image.shape[:2]
    target_ratio = target_w / target_h
    ratio = w / h
    if ratio > target_ratio:  # too wide: crop width
        new_w = int(round(h * target_ratio))
        x0 = (w - new_w) // 2
        image = image[:, x0 : x0 + new_w]
    elif ratio < target_ratio:  # too tall: crop height
        new_h = int(round(w / target_ratio))
        y0 = (h - new_h) // 2
        image = image[y0 : y0 + new_h]
    return np.asarray(
        Image.fromarray(image.astype(np.uint8)).resize((target_w, target_h))
    )


def rescale_noise_cfg(
    noise_cfg, noise_pred_text, guidance_rescale: float = 0.0
):
    """Guidance rescale (arXiv:2305.08891 §3.4; reference util.py:368-383).
    jnp-compatible."""
    import jax.numpy as jnp

    axes = tuple(range(1, noise_pred_text.ndim))
    std_text = jnp.std(noise_pred_text, axis=axes, keepdims=True)
    std_cfg = jnp.std(noise_cfg, axis=axes, keepdims=True)
    rescaled = noise_cfg * (std_text / std_cfg)
    return guidance_rescale * rescaled + (1.0 - guidance_rescale) * noise_cfg
