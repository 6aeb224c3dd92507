"""End-to-end MuseV pipeline: prompt -> infinite-length video.

TPU-native counterpart of MusevControlNetPipeline + DiffusersPipelinePredictor
(musev/pipelines/pipeline_controlnet.py:1295-2202,
pipeline_controlnet_predictor.py:356-750):

  * phase 1 — obtain the vision-condition frame: VAE-encode a given image, or
    generate one text-to-image (the 3D UNet with temporal layers skipped)
  * phase 2 — shot loop: each shot denoises ``video_length`` frames via the
    batched VCPD engine conditioned on the previous shot's tail frames
  * segmented VAE decode keeps HBM constant for unbounded lengths

The denoise loop is jitted once per (shape, plan) and reused across shots —
shot chaining costs zero recompilation.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..models.clip_text import CLIPTextConfig, clip_text_encode
from ..models.unet3d import UNet3DConfig
from ..models.vae import (
    VAEConfig,
    vae_decode_video,
    vae_encode_video,
)
from ..ops.context import make_window_plan
from ..ops.guidance import guidance_schedule
from ..ops.noise import make_noise
from ..schedulers.base import ScheduleConfig
from ..schedulers.euler_discrete import EulerDiscreteScheduler
from ..utils.text_emb import encode_weighted_prompt
from ..utils.tokenizer import Tokenizer, get_tokenizer
from .denoiser import DenoiseSpec, denoise_loop, splice_condition_frames


@dataclasses.dataclass
class MusevModels:
    unet_params: dict
    unet_cfg: UNet3DConfig
    vae_params: dict
    vae_cfg: VAEConfig
    text_params: dict
    text_cfg: CLIPTextConfig
    tokenizer: Tokenizer


@dataclasses.dataclass
class VideoResult:
    """videos in [0, 1], shape (B, T, H, W, 3); latents (B, T, h, w, 4)."""

    videos: np.ndarray
    latents: np.ndarray


class MusevPipeline:
    def __init__(
        self,
        models: MusevModels,
        scheduler_config: ScheduleConfig = ScheduleConfig(),
        dtype=jnp.float32,
        dp_axis: Optional[str] = None,
    ):
        self.m = models
        self.scheduler_config = scheduler_config
        self.dtype = dtype
        self.dp_axis = dp_axis
        self._denoise_jit = jax.jit(
            denoise_loop, static_argnames=("spec", "controlnet_fn")
        )

    # -- encoders ----------------------------------------------------------

    def encode_prompt(self, prompts: Sequence[str]) -> jnp.ndarray:
        fn = partial(clip_text_encode, self.m.text_params, self.m.text_cfg)
        emb = encode_weighted_prompt(self.m.tokenizer, fn, list(prompts))
        return emb.astype(self.dtype)

    def encode_images(self, images: np.ndarray) -> jnp.ndarray:
        """(B, T, H, W, 3) uint8/float in [0,255] -> latents (B, T, h, w, 4)."""
        x = jnp.asarray(images, jnp.float32) / 127.5 - 1.0
        return vae_encode_video(self.m.vae_params, self.m.vae_cfg, x.astype(self.dtype))

    def decode_latents(self, latents: jnp.ndarray, segment: int = 16) -> np.ndarray:
        vid = vae_decode_video(self.m.vae_params, self.m.vae_cfg, latents, segment)
        vid = (jnp.clip(vid.astype(jnp.float32), -1, 1) + 1.0) / 2.0
        return np.asarray(vid)

    # -- generation --------------------------------------------------------

    def _make_spec(
        self,
        num_steps: int,
        time_size: int,
        context_frames: int,
        context_overlap: int,
        context_schedule: str,
        guidance_start: float,
        guidance_end: Optional[float],
        guidance_method: str,
        n_vision_cond: int,
        w_ind_noise: float,
        noise_type: str,
        motion_speed: float,
        ip_adapter_scale: float = 1.0,
    ) -> DenoiseSpec:
        return DenoiseSpec(
            unet_cfg=self.m.unet_cfg,
            scheduler=EulerDiscreteScheduler.create(
                num_steps, config=self.scheduler_config
            ),
            plan=make_window_plan(
                time_size,
                min(context_frames, time_size),
                context_overlap=context_overlap,
                schedule=context_schedule,
            ),
            guidance=guidance_schedule(
                guidance_start, num_steps, stop=guidance_end, method=guidance_method
            ),
            n_vision_cond=n_vision_cond,
            do_cfg=True,
            w_ind_noise=w_ind_noise,
            noise_type=noise_type,
            motion_speed=motion_speed,
            ip_adapter_scale=ip_adapter_scale,
            dp_axis=self.dp_axis,
        )

    def generate_condition_latents(
        self,
        text_c: jnp.ndarray,
        text_uc: jnp.ndarray,
        height: int,
        width: int,
        key: jax.Array,
        num_inference_steps: int = 30,
        guidance_scale: float = 7.5,
        noise_type: str = "video_fusion",
        w_ind_noise: float = 0.5,
    ) -> jnp.ndarray:
        """Text-to-image first frame: T=1 with temporal layers skipped
        (predictor.py:496-535)."""
        scale = self.m.vae_cfg.downscale
        h, w = height // scale, width // scale
        spec = dataclasses.replace(
            self._make_spec(
                num_inference_steps, 1, 1, 0, "uniform_v2", guidance_scale, None,
                "linear", 0, w_ind_noise, noise_type, 8.0,
            ),
            skip_temporal=True,
        )
        b = text_c.shape[0]
        c = self.m.unet_cfg.in_channels
        latents = (
            make_noise(key, (b, 1, h, w, c), noise_type=noise_type,
                       w_ind_noise=w_ind_noise).astype(self.dtype)
            * spec.scheduler.init_noise_sigma
        )
        return self._denoise_jit(
            self.m.unet_params, spec, latents, text_uc, text_c, key
        )

    def text2video(
        self,
        prompt: Union[str, Sequence[str]],
        negative_prompt: Union[str, Sequence[str]] = "",
        *,
        height: int = 256,
        width: int = 256,
        video_length: int = 12,
        n_batch: int = 1,
        n_vision_condition: int = 1,
        condition_images: Optional[np.ndarray] = None,  # (B, 1, H, W, 3) [0,255]
        fix_condition_images: bool = False,
        video_num_inference_steps: int = 10,
        num_inference_steps: int = 30,
        video_guidance_scale: float = 3.5,
        video_guidance_scale_end: Optional[float] = None,
        video_guidance_scale_method: str = "linear",
        guidance_scale: float = 7.5,
        context_schedule: str = "uniform_v2",
        context_frames: int = 12,
        context_overlap: int = 4,
        noise_type: str = "video_fusion",
        w_ind_noise: float = 0.5,
        img_weight: float = 1e-3,
        motion_speed: float = 8.0,
        seed: int = 0,
        decode_segment: int = 16,
    ) -> VideoResult:
        """The infinite-length text/image-to-video driver
        (run_pipe_text2video, predictor.py:356-750)."""
        if isinstance(prompt, str):
            prompt = [prompt]
        if isinstance(negative_prompt, str):
            negative_prompt = [negative_prompt] * len(prompt)
        elif len(negative_prompt) == 1:
            negative_prompt = list(negative_prompt) * len(prompt)
        if len(negative_prompt) != len(prompt):
            raise ValueError(
                f"negative_prompt batch {len(negative_prompt)} != prompt batch "
                f"{len(prompt)} (reference pipeline raises the same)"
            )
        b = len(prompt)
        key = jax.random.PRNGKey(seed)
        text_c = self.encode_prompt(prompt)
        text_uc = self.encode_prompt(negative_prompt)

        scale = self.m.vae_cfg.downscale
        h, w = height // scale, width // scale
        c_lat = self.m.unet_cfg.in_channels

        # phase 1: vision-condition latents
        if n_vision_condition > 0:
            if condition_images is not None:
                condition_latents = self.encode_images(condition_images)
            else:
                key, sub = jax.random.split(key)
                condition_latents = self.generate_condition_latents(
                    text_c, text_uc, height, width, sub,
                    num_inference_steps=num_inference_steps,
                    guidance_scale=guidance_scale,
                    noise_type=noise_type,
                    w_ind_noise=w_ind_noise,
                )
        else:
            condition_latents = None

        spec = self._make_spec(
            video_num_inference_steps, video_length, context_frames,
            context_overlap, context_schedule, video_guidance_scale,
            video_guidance_scale_end, video_guidance_scale_method,
            n_vision_condition, w_ind_noise, noise_type, motion_speed,
        )

        all_latents: List[jnp.ndarray] = []
        for i_batch in range(n_batch):
            key, sub = jax.random.split(key)
            noise = make_noise(
                sub, (b, video_length, h, w, c_lat), noise_type=noise_type,
                w_ind_noise=w_ind_noise,
            ).astype(self.dtype)
            if condition_latents is not None:
                # img-based video noise (pipeline prepare_latents :324-346)
                cond_mean = jnp.mean(condition_latents, axis=1, keepdims=True)
                noise = (
                    img_weight**0.5 * cond_mean
                    + (1.0 - img_weight) ** 0.5 * noise
                ).astype(self.dtype)
            latents = noise * spec.scheduler.init_noise_sigma

            key, sub = jax.random.split(key)
            out = self._denoise_jit(
                self.m.unet_params, spec, latents, text_uc, text_c, sub,
                condition_latents=condition_latents,
            )
            full = splice_condition_frames(out, condition_latents, n_vision_condition)
            if i_batch == 0:
                all_latents.append(full)
            else:
                all_latents.append(full[:, n_vision_condition:])
            if n_vision_condition > 0 and not fix_condition_images:
                condition_latents = full[:, -n_vision_condition:]

        latents_cat = jnp.concatenate(all_latents, axis=1)
        videos = self.decode_latents(latents_cat, segment=decode_segment)
        return VideoResult(videos=videos, latents=np.asarray(latents_cat))
