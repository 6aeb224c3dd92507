"""Serving layer: shape/length guards, online inference fns, gradio UI.

Reference: scripts/gradio/app.py (Blocks UI :185-395; ``limit_shape``
:92-123 caps the longest edge and snaps to /8; ``limit_length`` :124-131
caps at 144 frames) and gradio_text2video.py:614-937
(``online_t2v_inference``). The inference functions here are plain callables
so the serving path is testable without gradio; ``build_demo`` wires them
into a Blocks UI when gradio is installed.
"""

from __future__ import annotations

import logging
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

MAX_EDGE = 1280
MAX_FRAMES = 144


def limit_shape(
    image: np.ndarray,
    input_w: int,
    input_h: int,
    img_edge_ratio: float,
    max_image_edge: int = MAX_EDGE,
) -> Tuple[int, int, float]:
    """Cap the longest target edge and snap dims to multiples of 8
    (reference app.py:92-123). Returns (out_w, out_h, out_ratio)."""
    if input_h == -1 and input_w == -1:
        if image is None:
            raise ValueError("image must be given when w=h=-1")
        input_h, input_w = image.shape[:2]
    if img_edge_ratio == 0:
        img_edge_ratio = 1.0
    img_edge_ratio_infer = img_edge_ratio
    if max(input_h, input_w) * img_edge_ratio > max_image_edge:
        img_edge_ratio_infer = max_image_edge / max(input_h, input_w)
    out_w = int(input_w * img_edge_ratio_infer // 8 * 8)
    out_h = int(input_h * img_edge_ratio_infer // 8 * 8)
    return out_w, out_h, img_edge_ratio_infer


def limit_length(length: float, max_frames: int = MAX_FRAMES) -> int:
    """Cap generated frames (reference app.py:124-131)."""
    if length * 12 > max_frames:  # fps 12
        length = max_frames // 12
    return int(length)


class OnlineInference:
    """Holds a pipeline and exposes the two gradio entry points."""

    def __init__(self, pipeline, fps: int = 12):
        self.pipe = pipeline
        self.fps = fps

    def online_t2v_inference(
        self,
        prompt: str,
        image: Optional[np.ndarray],
        seed: int = -1,
        fps: int = 12,
        w: int = -1,
        h: int = -1,
        video_length: int = 12,
        img_edge_ratio: float = 1.0,
    ) -> np.ndarray:
        """(T, H, W, 3) uint8 frames (gradio_text2video.py:614)."""
        w, h, _ = limit_shape(image, w, h, img_edge_ratio)
        video_length = min(int(video_length), MAX_FRAMES)
        seed = int(seed) if seed is not None and int(seed) >= 0 else 0
        cond = image[None, None] if image is not None else None
        if cond is not None and cond.shape[2:4] != (h, w):
            from PIL import Image

            cond = np.asarray(
                Image.fromarray(image.astype(np.uint8)).resize((w, h))
            )[None, None]
        res = self.pipe.text2video(
            prompt,
            height=h,
            width=w,
            video_length=min(video_length, 12),
            n_batch=max(1, video_length // 12),
            condition_images=cond,
            seed=seed,
        )
        return (res.videos[0] * 255).astype(np.uint8)

    def online_v2v_inference(
        self,
        prompt: str,
        image: Optional[np.ndarray],
        video_frames: np.ndarray,
        seed: int = -1,
        fps: int = 12,
        w: int = -1,
        h: int = -1,
        img_edge_ratio: float = 1.0,
    ) -> np.ndarray:
        w, h, _ = limit_shape(
            video_frames[0] if image is None else image, w, h, img_edge_ratio
        )
        seed = int(seed) if seed is not None and int(seed) >= 0 else 0
        cond = image[None, None] if image is not None else None
        res = self.pipe.video2video(
            prompt,
            video_frames[:MAX_FRAMES],
            video_is_middle=True,
            condition_images=cond,
            height=h,
            width=w,
            seed=seed,
        )
        return (res.videos[0] * 255).astype(np.uint8)


def build_demo(pipeline):
    """gr.Blocks UI with T2V and V2V tabs (reference app.py:185-395)."""
    try:
        import gradio as gr
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "gradio is not installed; `pip install gradio` to serve the UI"
        ) from e

    infer = OnlineInference(pipeline)

    with gr.Blocks() as demo:
        gr.Markdown("# MuseV-TPU: infinite-length virtual human video")
        with gr.Tab("Text/Image to Video"):
            prompt = gr.Textbox(label="prompt")
            image = gr.Image(label="condition image (optional)")
            with gr.Row():
                seed = gr.Number(label="seed (-1 random)", value=-1)
                length = gr.Number(label="video length", value=12)
            with gr.Row():
                w = gr.Number(label="width (-1 auto)", value=-1)
                h = gr.Number(label="height (-1 auto)", value=-1)
                ratio = gr.Number(label="img edge ratio", value=1.0)
            out = gr.Video(label="result")
            gr.Button("generate").click(
                lambda p, im, s, l, ww, hh, r: infer.online_t2v_inference(
                    p, im, s, 12, int(ww), int(hh), int(l), r
                ),
                [prompt, image, seed, length, w, h, ratio],
                out,
            )
        with gr.Tab("Video to Video"):
            prompt2 = gr.Textbox(label="prompt")
            image2 = gr.Image(label="condition image (optional)")
            video_in = gr.Video(label="pose/source video")
            out2 = gr.Video(label="result")
            gr.Button("generate").click(
                lambda p, im, v: infer.online_v2v_inference(p, im, v),
                [prompt2, image2, video_in],
                out2,
            )
    return demo
