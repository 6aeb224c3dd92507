"""Host-side ControlNet condition processors.

Reference: the mmcm/controlnet_aux processor zoo (load_controlnet_model;
README.md:403-406 lists 26 names — pose/depth/edge estimators behind
onnxruntime/mm* CUDA stacks). Here processors are plain callables
``(T, H, W, 3) uint8 -> (T, H, W, 3) uint8`` registered by name:

  * ``none`` — pass-through (``video_is_middle=True`` flows)
  * ``canny`` — full native implementation (numpy separable gaussian +
    Sobel + NMS + hysteresis), the classic controlnet edge input
  * ``dwpose*`` etc. — pluggable: users register a callable wrapping their
    pose model (the reference's dwpose runs on onnxruntime, unavailable
    here); unregistered names raise with a clear message.
"""

from __future__ import annotations

from typing import Callable, Dict

import numpy as np

Processor = Callable[[np.ndarray], np.ndarray]

_REGISTRY: Dict[str, Processor] = {}


def register_processor(name: str, fn: Processor) -> None:
    _REGISTRY[name] = fn


def get_processor(name: str) -> Processor:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"controlnet processor {name!r} is not registered; available: "
            f"{sorted(_REGISTRY)}. Register your own with "
            "musev_tpu.io.processors.register_processor (e.g. a dwpose "
            "onnx wrapper)."
        ) from None


def _identity(frames: np.ndarray) -> np.ndarray:
    return frames


def _gaussian_blur_gray(img: np.ndarray, sigma: float = 1.4) -> np.ndarray:
    radius = max(1, int(3 * sigma))
    x = np.arange(-radius, radius + 1, dtype=np.float32)
    k = np.exp(-(x**2) / (2 * sigma**2))
    k /= k.sum()
    out = np.apply_along_axis(lambda r: np.convolve(r, k, mode="same"), 1, img)
    out = np.apply_along_axis(lambda c: np.convolve(c, k, mode="same"), 0, out)
    return out


def canny_frame(
    frame: np.ndarray, low: float = 0.1, high: float = 0.2
) -> np.ndarray:
    """Canny edges of one (H, W, 3) uint8 frame -> (H, W, 3) uint8 edge map."""
    gray = frame.astype(np.float32).mean(axis=-1) / 255.0
    sm = _gaussian_blur_gray(gray)
    gx = np.zeros_like(sm)
    gy = np.zeros_like(sm)
    gx[1:-1, 1:-1] = (
        sm[:-2, 2:] + 2 * sm[1:-1, 2:] + sm[2:, 2:]
        - sm[:-2, :-2] - 2 * sm[1:-1, :-2] - sm[2:, :-2]
    )
    gy[1:-1, 1:-1] = (
        sm[2:, :-2] + 2 * sm[2:, 1:-1] + sm[2:, 2:]
        - sm[:-2, :-2] - 2 * sm[:-2, 1:-1] - sm[:-2, 2:]
    )
    mag = np.hypot(gx, gy)
    ang = np.arctan2(gy, gx)
    # non-max suppression along the quantized gradient direction
    q = ((ang + np.pi) / (np.pi / 4)).round().astype(int) % 4
    offsets = {0: (0, 1), 1: (1, 1), 2: (1, 0), 3: (1, -1)}
    nms = np.zeros_like(mag)
    for d, (dy, dx) in offsets.items():
        a = np.roll(mag, (dy, dx), axis=(0, 1))
        b = np.roll(mag, (-dy, -dx), axis=(0, 1))
        keep = (mag >= a) & (mag >= b) & (q == d)
        nms[keep] = mag[keep]
    strong = nms >= high
    weak = (nms >= low) & ~strong
    # one-pass hysteresis: weak pixels next to strong survive
    grow = strong.copy()
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            grow |= np.roll(strong, (dy, dx), axis=(0, 1))
    edges = strong | (weak & grow)
    out = (edges * 255).astype(np.uint8)
    return np.stack([out] * 3, axis=-1)


def canny_video(frames: np.ndarray, low: float = 0.1, high: float = 0.2):
    return np.stack([canny_frame(f, low, high) for f in frames])


register_processor("none", _identity)
register_processor("canny", canny_video)
