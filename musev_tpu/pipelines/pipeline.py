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
from typing import List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..models.clip_text import CLIPTextConfig, clip_text_encode
from ..models.clip_vision import (
    CLIPVisionConfig,
    clip_vision_encode,
    preprocess_clip_image,
)
from ..models.controlnet import ControlNetConfig
from ..models.ip_adapter import ResamplerConfig, image_proj, mlp_proj, resampler
from ..models.referencenet import ReferenceNetConfig, referencenet_apply
from ..models.unet3d import UNet3DConfig
from ..models.vae import (
    VAEConfig,
    vae_decode_video,
    vae_encode_video,
)
from ..ops.context import make_stacked_window_plan, make_window_plan
from ..ops.guidance import guidance_schedule
from ..ops.noise import make_noise
from ..schedulers import ScheduleConfig, create_scheduler
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
    # optional conditioning branches (musev_referencenet / pose presets)
    referencenet_params: Optional[dict] = None
    referencenet_cfg: Optional[ReferenceNetConfig] = None
    clip_vision_params: Optional[dict] = None
    clip_vision_cfg: Optional[CLIPVisionConfig] = None
    ip_proj_params: Optional[dict] = None
    # "image_proj" (pooled -> ImageProjModel) or "resampler"
    # (IP-Adapter-Plus: penultimate patch tokens -> perceiver Resampler)
    ip_proj_kind: str = "image_proj"
    ip_resampler_cfg: Optional["ResamplerConfig"] = None
    ip_face_proj_params: Optional[dict] = None
    controlnet_params: Optional[dict] = None
    controlnet_cfg: Optional[ControlNetConfig] = None
    # PoseGuider stem (reference pipeline_controlnet.py:229-231, 1774-1783)
    pose_guider_params: Optional[dict] = None
    pose_guider_cfg: Optional[ControlNetConfig] = None


@dataclasses.dataclass
class VideoResult:
    """videos in [0, 1], shape (B, T, H, W, 3); latents (B, T, h, w, 4).

    Full VideoPipelineOutput surface (pipeline_controlnet.py:68-77):
    ``videos_mid`` — per-step decoded videos when ``need_middle_latents``;
    ``mid_video_latents``/``mid_video_noises`` — serial-denoise carries
    (num_steps+1, B, overlap, h, w, C) recorded when ``record_mid_video``.
    """

    videos: np.ndarray
    latents: np.ndarray
    videos_mid: Optional[np.ndarray] = None
    mid_video_latents: Optional[np.ndarray] = None
    mid_video_noises: Optional[np.ndarray] = None


class MusevPipeline:
    def __init__(
        self,
        models: MusevModels,
        scheduler_config: ScheduleConfig = ScheduleConfig(),
        scheduler_name: str = "euler",
        dtype=jnp.float32,
        dp_axis: Optional[str] = None,
        fp_axis: Optional[str] = None,
        mesh=None,
    ):
        self.m = models
        self.scheduler_config = scheduler_config
        self.scheduler_name = scheduler_name
        self.dtype = dtype
        self.dp_axis = dp_axis
        # frame parallelism (parallel/frame_parallel.py): shard every
        # (window, cfg, frame) row of the denoise over this mesh axis —
        # the flagship multi-chip topology (bench.py --topology fp)
        self.fp_axis = fp_axis
        # concrete device mesh (cli_topology): when set, the VAE decode is
        # frame-sharded over the dp/fp axis instead of segment-looped
        self.mesh = mesh
        self._loras: List[tuple] = []  # (state_dict, scale) fuse log
        self._denoise_jit = jax.jit(
            denoise_loop, static_argnames=("spec",)
        )

    # -- adapters (LoRA / textual inversion / LCM) --------------------------

    def load_lora(self, lora, scale: float = 1.0) -> int:
        """Fuse a kohya/diffusers LoRA into the UNet (+ text encoder) by
        weight delta with stored undo (predictor.py:311-327,
        model_util.py:108-263). ``lora``: path or state dict."""
        from ..models.lora import fuse_lora
        from ..models.sd_weights import load_safetensors, load_torch_checkpoint

        if isinstance(lora, str):
            lora = (
                load_safetensors(lora)
                if lora.endswith(".safetensors")
                else load_torch_checkpoint(lora)
            )
        n, unmatched = fuse_lora(
            self.m.unet_params, self.m.unet_cfg, lora, scale=scale,
            text_params=self.m.text_params, text_cfg=self.m.text_cfg,
        )
        self._loras.append((lora, scale))
        return n

    def unload_lora(self) -> None:
        """Subtract every fused LoRA delta (reference unload_lora,
        model_util.py:468)."""
        from ..models.lora import fuse_lora

        for lora, scale in reversed(self._loras):
            fuse_lora(
                self.m.unet_params, self.m.unet_cfg, lora, scale=-scale,
                text_params=self.m.text_params, text_cfg=self.m.text_cfg,
            )
        self._loras.clear()

    def load_textual_inversion(self, source, trigger: Optional[str] = None):
        """Append a learned embedding to the token table and bind its
        trigger word (predictor.py:248-254)."""
        import os as _os

        from ..models.sd_weights import load_safetensors, load_torch_checkpoint
        from ..utils.textual_inversion import (
            InversionTokenizer,
            add_textual_inversion,
            load_inversion_state_dict,
        )

        if isinstance(source, str):
            if trigger is None:
                trigger = _os.path.splitext(_os.path.basename(source))[0]
            sd = (
                load_safetensors(source)
                if source.endswith(".safetensors")
                else load_torch_checkpoint(source)
            )
            emb = load_inversion_state_dict(sd)
        else:
            emb = np.asarray(source)
        if trigger is None:
            raise ValueError("trigger required when passing a raw embedding")
        if not isinstance(self.m.tokenizer, InversionTokenizer):
            self.m.tokenizer = InversionTokenizer(self.m.tokenizer)
        add_textual_inversion(self.m.text_params, self.m.tokenizer, trigger, emb)

    def enable_lcm(self, lcm_lora=None, scale: float = 1.0) -> None:
        """Switch to the LCM scheduler, optionally fusing an LCM-LoRA first
        (predictor.py:296-306)."""
        if lcm_lora is not None:
            self.load_lora(lcm_lora, scale=scale)
        self.scheduler_name = "lcm"

    # -- encoders ----------------------------------------------------------

    def encode_prompt(self, prompts: Sequence[str]) -> jnp.ndarray:
        fn = partial(clip_text_encode, self.m.text_params, self.m.text_cfg)
        emb = encode_weighted_prompt(self.m.tokenizer, fn, list(prompts))
        return emb.astype(self.dtype)

    def encode_prompt_pair(
        self, prompts: Sequence[str], negative_prompts: Sequence[str]
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Encode cond + uncond in ONE call so long-prompt chunk padding
        lands both at the same sequence length (the reference's
        get_weighted_text_embeddings pads prompt and uncond to a joint
        max_length, text_emb_util.py:218-351). Returns (text_c, text_uc)."""
        fn = partial(clip_text_encode, self.m.text_params, self.m.text_cfg)
        both = list(prompts) + list(negative_prompts)
        emb = encode_weighted_prompt(self.m.tokenizer, fn, both).astype(
            self.dtype
        )
        b = len(prompts)
        return emb[:b], emb[b:]

    def encode_images(self, images: np.ndarray) -> jnp.ndarray:
        """(B, T, H, W, 3) uint8/float in [0,255] -> latents (B, T, h, w, 4)."""
        x = jnp.asarray(images, jnp.float32) / 127.5 - 1.0
        return vae_encode_video(self.m.vae_params, self.m.vae_cfg, x.astype(self.dtype))

    def decode_latents(self, latents: jnp.ndarray, segment: int = 16) -> np.ndarray:
        axis = self.fp_axis or self.dp_axis
        if self.mesh is not None and axis is not None:
            vid = vae_decode_video(
                self.m.vae_params, self.m.vae_cfg, latents, segment,
                mesh=self.mesh, axis=axis,
            )
        else:
            vid = vae_decode_video(
                self.m.vae_params, self.m.vae_cfg, latents, segment
            )
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
        guidance_rescale: float = 0.0,
    ) -> DenoiseSpec:
        return DenoiseSpec(
            unet_cfg=self.m.unet_cfg,
            scheduler=create_scheduler(
                self.scheduler_name, num_steps, config=self.scheduler_config
            ),
            plan=(
                make_stacked_window_plan(
                    num_steps, time_size, min(context_frames, time_size),
                    context_overlap=context_overlap, schedule=context_schedule,
                )
                if context_schedule == "uniform"
                else make_window_plan(
                    time_size,
                    min(context_frames, time_size),
                    context_overlap=context_overlap,
                    schedule=context_schedule,
                )
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
            guidance_rescale=guidance_rescale,
            dp_axis=self.dp_axis,
            fp_axis=self.fp_axis,
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

    def redraw_condition_images(
        self,
        condition_images: np.ndarray,  # (B, 1, H, W, 3) [0, 255]
        text_c: jnp.ndarray,
        text_uc: jnp.ndarray,
        key: jax.Array,
        strength: float = 0.75,
        num_inference_steps: int = 30,
        guidance_scale: float = 7.5,
        noise_type: str = "video_fusion",
        w_ind_noise: float = 0.5,
    ) -> np.ndarray:
        """Phase-1 condition-frame redraw: img2img the given condition image
        with the temporal layers skipped (predictor.py:496-582,
        redraw_condition_image). Returns redrawn images, same shape/range."""
        spec = dataclasses.replace(
            self._make_spec(
                num_inference_steps, 1, 1, 0, "uniform_v2", guidance_scale,
                None, "linear", 0, w_ind_noise, noise_type, 8.0,
            ),
            skip_temporal=True,
            start_step=min(
                int(num_inference_steps * (1.0 - strength)),
                num_inference_steps - 1,
            ),
        )
        lat = self.encode_images(condition_images)  # (B, 1, h, w, 4)
        key, sub = jax.random.split(key)
        noise = make_noise(
            sub, lat.shape, noise_type=noise_type, w_ind_noise=w_ind_noise
        ).astype(self.dtype)
        latents = spec.scheduler.add_noise(lat, noise, spec.start_step)
        out = self._denoise_jit(
            self.m.unet_params, spec, latents, text_uc, text_c, key
        )
        imgs = self.decode_latents(out, segment=1)  # (B, 1, H, W, 3) [0,1]
        return (np.asarray(imgs) * 255.0).astype(np.float32)

    def _prepare_reference_conditioning(
        self,
        refer_image: Optional[np.ndarray],
        ip_adapter_image: Optional[np.ndarray],
        text_c: Optional[jnp.ndarray] = None,
    ) -> dict:
        """ReferenceNet block embs + IP-Adapter clip tokens
        (pipeline get_referencenet_emb :867-964, get_ip_adapter_image_emb
        :686-780). Uncond halves: refer embs are shared (uncond = cond copy,
        :845); IP tokens use proj(zeros) stacked as [uncond; cond].

        The ReferenceNet forward runs at timestep 0 (``ref_timestep =
        torch.zeros_like``, pipeline_controlnet.py:895); its cross-attention
        context is the clip-vision image tokens when available, otherwise the
        cond text embeddings (:896-900)."""
        out: dict = {}
        m = self.m

        def to_multi(images):
            """(B,H,W,3) | (B,N,H,W,3) | list of (B,H,W,3) -> (B,N,H,W,3).

            Multi-reference images enter the ReferenceNet as N 'frames'
            (get_referencenet_emb num_frames=n_refer_image, :890-924) and
            stack their clip tokens along the token axis."""
            if isinstance(images, (list, tuple)):
                images = np.stack([np.asarray(i) for i in images], axis=1)
            images = np.asarray(images)
            if images.ndim == 4:
                images = images[:, None]
            return images

        def ip_tokens(images_bn):
            b, n = images_bn.shape[:2]
            pixels = preprocess_clip_image(
                jnp.asarray(images_bn.reshape(b * n, *images_bn.shape[2:])),
                m.clip_vision_cfg.image_size,
            )
            if m.ip_proj_kind == "resampler":
                # IP-Adapter-Plus: perceiver Resampler over the penultimate
                # layer's patch tokens (ip_adapter_loader.py:95-111 +
                # ImageClipVisionFeatureExtractorV2); uncond = proj of zero
                # tokens, matching the pooled path's proj(zeros) convention
                # (pipeline_controlnet.py:736-774)
                tokens, _ = clip_vision_encode(
                    m.clip_vision_params, m.clip_vision_cfg, pixels,
                    penultimate=True,
                )
                cond = resampler(m.ip_proj_params, m.ip_resampler_cfg, tokens)
                uncond = resampler(
                    m.ip_proj_params, m.ip_resampler_cfg,
                    jnp.zeros_like(tokens),
                )
            else:
                _, pooled = clip_vision_encode(
                    m.clip_vision_params, m.clip_vision_cfg, pixels
                )
                cond = image_proj(m.ip_proj_params, pooled)
                uncond = image_proj(m.ip_proj_params, jnp.zeros_like(pooled))
            k = cond.shape[1]
            cond = cond.reshape(b, n * k, -1)
            uncond = uncond.reshape(b, n * k, -1)
            return cond, uncond

        if (
            refer_image is not None
            and m.referencenet_params is not None
            and m.referencenet_cfg is not None
        ):
            refer_bn = to_multi(refer_image)
            b, n_ref = refer_bn.shape[:2]
            lat = self.encode_images(refer_bn)  # (B, N, h, w, 4)
            lat = lat.reshape(b * n_ref, *lat.shape[2:])
            if text_c is not None:
                clip_ctx = jnp.repeat(text_c.astype(self.dtype), n_ref, axis=0)
            else:
                clip_ctx = jnp.zeros(
                    (b * n_ref, 1, m.referencenet_cfg.cross_attention_dim),
                    self.dtype,
                )
            if (
                m.clip_vision_params is not None
                and m.ip_proj_params is not None
                and ip_adapter_image is not None
            ):
                cond_tok, _ = ip_tokens(to_multi(ip_adapter_image))
                clip_ctx = jnp.repeat(
                    cond_tok.astype(self.dtype), n_ref, axis=0
                )
            down, mid, _ = referencenet_apply(
                m.referencenet_params, m.referencenet_cfg,
                lat.astype(self.dtype), 0.0, clip_ctx,
            )
            # (B*N, 1, h, w, c) -> (B, N, h, w, c): ReferEmbFuse flattens the
            # N axis into reference tokens
            out["refer_embs"] = [
                e.reshape(b, n_ref, *e.shape[2:]) for e in down
            ]
            out["mid_refer_emb"] = mid.reshape(b, n_ref, *mid.shape[2:])
        if (
            ip_adapter_image is not None
            and m.clip_vision_params is not None
            and m.ip_proj_params is not None
            and m.unet_cfg.ip_adapter_cross_attn
        ):
            cond_tokens, uncond_tokens = ip_tokens(to_multi(ip_adapter_image))
            out["vision_clip_emb"] = jnp.concatenate(
                [uncond_tokens, cond_tokens], axis=0
            ).astype(self.dtype)
        return out

    def video2video(
        self,
        prompt: Union[str, Sequence[str]],
        video_frames,  # (T, H, W, 3) uint8 array OR iterator of windows
        negative_prompt: Union[str, Sequence[str]] = "",
        *,
        video_is_middle: bool = False,
        controlnet_processor=None,
        need_video2video: bool = False,
        video_strength: float = 0.8,
        condition_images: Optional[np.ndarray] = None,
        time_size: int = 12,
        n_vision_condition: int = 1,
        height: Optional[int] = None,
        width: Optional[int] = None,
        video_num_inference_steps: int = 10,
        num_inference_steps: int = 30,
        video_guidance_scale: float = 3.5,
        guidance_scale: float = 7.5,
        guidance_rescale: float = 0.0,
        context_schedule: str = "uniform_v2",
        context_frames: int = 12,
        context_overlap: int = 4,
        noise_type: str = "video_fusion",
        w_ind_noise: float = 0.5,
        motion_speed: float = 8.0,
        controlnet_conditioning_scale: float = 1.0,
        refer_image: Optional[np.ndarray] = None,
        ip_adapter_image: Optional[np.ndarray] = None,
        ip_adapter_scale: float = 1.0,
        seed: int = 0,
        decode_segment: int = 16,
        need_hist_match: bool = False,
        record_mid_video: bool = False,
        video_overlap: int = 1,
        need_middle_latents: bool = False,
    ) -> VideoResult:
        """Pose/Video2Video: shot loop over source-video windows
        (run_pipe_video2video, predictor.py:760-1290).

        ``video_is_middle=True`` means the source video already IS the control
        signal (pose maps); otherwise ``controlnet_processor`` (a callable
        frames->maps, e.g. a dwpose stage) is applied per window.

        Batch>1: ``prompt`` may be a list; ``video_frames`` is then either one
        shared source video (broadcast across the batch, matching the
        reference's single ``video`` arg) or a (B, T, H, W, 3) array.

        ``record_mid_video``: serial-denoise — the tail ``video_overlap``
        frames of per-step latents/noises carry into the next window's
        denoise (predictor.py:1262-1265, fuse_part_tensor fusion).
        """
        if isinstance(prompt, str):
            prompt = [prompt]
        if isinstance(negative_prompt, str):
            negative_prompt = [negative_prompt] * len(prompt)
        elif len(negative_prompt) == 1:
            negative_prompt = list(negative_prompt) * len(prompt)
        b = len(prompt)
        if len(negative_prompt) != b:
            raise ValueError(
                f"negative_prompt batch {len(negative_prompt)} != prompt "
                f"batch {b}"
            )
        key = jax.random.PRNGKey(seed)
        text_c, text_uc = self.encode_prompt_pair(prompt, negative_prompt)

        if isinstance(video_frames, np.ndarray) or hasattr(video_frames, "shape"):
            video_frames = np.asarray(video_frames)
            if video_frames.ndim == 5:  # (B, T, H, W, 3): batched sources
                if video_frames.shape[0] != b:
                    raise ValueError(
                        f"batched video_frames B={video_frames.shape[0]} != "
                        f"prompt batch {b}"
                    )
                windows_iter = (
                    video_frames[:, lo : lo + time_size]
                    for lo in range(0, video_frames.shape[1], time_size)
                )
                first_shape = video_frames.shape[2:4]
            else:
                windows_iter = (
                    video_frames[lo : lo + time_size]
                    for lo in range(0, video_frames.shape[0], time_size)
                )
                first_shape = video_frames.shape[1:3]
        else:
            # streaming window iterator (VideoReader.windows /
            # PrefetchingWindows): constant host memory, DecordVideoDataset
            # contract (predictor.py:867-932)
            windows_iter = iter(video_frames)
            try:
                peek = next(windows_iter)
            except StopIteration:
                raise ValueError("video_frames yielded no frames") from None
            first_shape = peek.shape[1:3]

            def _chain(first, rest):
                yield first
                yield from rest

            windows_iter = _chain(peek, windows_iter)
        height = height or first_shape[0]
        width = width or first_shape[1]
        scale = self.m.vae_cfg.downscale
        h, w = height // scale, width // scale
        c_lat = self.m.unet_cfg.in_channels

        def to_control(frames):
            """frames: (B, T, H, W, 3) -> control maps, same shape."""
            if video_is_middle or controlnet_processor is None:
                return frames
            return np.stack([controlnet_processor(f) for f in np.asarray(frames)])

        n_vc = n_vision_condition

        def build_spec(t_window: int):
            s = self._make_spec(
                video_num_inference_steps, t_window,
                min(context_frames, t_window), context_overlap,
                context_schedule, video_guidance_scale, None,
                "linear", n_vc, w_ind_noise, noise_type, motion_speed,
                ip_adapter_scale=ip_adapter_scale,
                guidance_rescale=guidance_rescale,
            )
            if self.m.controlnet_cfg is not None:
                s = dataclasses.replace(
                    s, controlnet_cfg=self.m.controlnet_cfg,
                    controlnet_scale=controlnet_conditioning_scale,
                )
            if self.m.pose_guider_cfg is not None:
                s = dataclasses.replace(s, pose_guider_cfg=self.m.pose_guider_cfg)
            if record_mid_video:
                s = dataclasses.replace(
                    s, record_mid_video=True,
                    video_overlap=min(video_overlap, t_window),
                )
            if need_middle_latents:
                s = dataclasses.replace(s, record_step_latents=True)
            if need_video2video:
                # strength truncates the schedule: only steps [start, N) run
                # (reference get_timesteps, pipeline_controlnet.py:1627-1641)
                start = min(
                    int(video_num_inference_steps * (1.0 - video_strength)),
                    video_num_inference_steps - 1,
                )
                s = dataclasses.replace(s, start_step=start)
            return s

        spec = build_spec(time_size)

        # reference conditioning is loop-invariant: computed once
        # (the reference also runs ReferenceNet once per pipeline call,
        # pipeline_controlnet.py:1883-1899)
        refer_cond = self._prepare_reference_conditioning(
            refer_image, ip_adapter_image, text_c
        )

        condition_latents = None
        last_control = None
        last_mid_latents = last_mid_noises = None
        mid_lat_np = mid_noise_np = None
        all_latents: List[jnp.ndarray] = []
        step_latents_all: List[jnp.ndarray] = []
        def _prep(window):
            window = np.asarray(window)
            if window.ndim == 4:  # (T, H, W, 3) shared across the batch
                window = np.broadcast_to(window[None], (b, *window.shape))
            return window, to_control(window)

        # run the host processor stage in a background thread: window i+1's
        # control maps (dwpose etc.) compute while window i denoises on
        # device (N3 host/device overlap contract, SURVEY §2.10; the
        # reference runs its processor serially between dispatches,
        # predictor.py:947-1029)
        from ..io.video import PrefetchingWindows

        prepared_iter = PrefetchingWindows(windows_iter, map_fn=_prep)
        for i_window, (window, control) in enumerate(prepared_iter):
            t_w = window.shape[1]
            if t_w == 0:
                continue
            # trailing partial window: its own (smaller-T) static spec —
            # dropping it would silently lose up to time_size-1 frames
            spec_w = spec if t_w == time_size else build_spec(t_w)
            if i_window == 0:
                if n_vc > 0:
                    if condition_images is not None:
                        condition_latents = self.encode_images(condition_images)
                        if condition_latents.shape[1] != n_vc:
                            raise ValueError(
                                f"{condition_latents.shape[1]} condition "
                                f"images != n_vision_condition {n_vc}"
                            )
                    elif n_vc == 1:
                        key, sub = jax.random.split(key)
                        condition_latents = self.generate_condition_latents(
                            text_c, text_uc, height, width, sub,
                            num_inference_steps=num_inference_steps,
                            guidance_scale=guidance_scale,
                            noise_type=noise_type, w_ind_noise=w_ind_noise,
                        )
                    else:
                        raise ValueError(
                            "n_vision_condition > 1 requires explicit "
                            "condition_images (the phase-1 T2I generates a "
                            "single frame, predictor.py:496-582)"
                        )
                cond_control = control[:, :n_vc] if n_vc > 0 else None
            else:
                cond_control = last_control if n_vc > 0 else None

            key, sub = jax.random.split(key)
            noise = make_noise(
                sub, (b, t_w, h, w, c_lat), noise_type=noise_type,
                w_ind_noise=w_ind_noise,
            ).astype(self.dtype)
            if need_video2video:
                src_lat = self.encode_images(window)
                latents = spec_w.scheduler.add_noise(
                    src_lat, noise, spec_w.start_step
                )
            else:
                if condition_latents is not None:
                    cond_mean = jnp.mean(condition_latents, axis=1, keepdims=True)
                    noise = (
                        1e-3**0.5 * cond_mean + (1 - 1e-3) ** 0.5 * noise
                    ).astype(self.dtype)
                latents = noise * spec_w.scheduler.init_noise_sigma

            ctrl = None
            ctrl_params = None
            pg_params = self.m.pose_guider_params \
                if spec_w.pose_guider_cfg is not None else None
            need_ctrl = (
                self.m.controlnet_params is not None
                and spec_w.controlnet_cfg is not None
            ) or pg_params is not None
            if need_ctrl:
                parts = ([cond_control] if cond_control is not None else []) + [control]
                ctrl = jnp.asarray(
                    np.concatenate(parts, axis=1), jnp.float32
                ) / 255.0
            if (
                self.m.controlnet_params is not None
                and spec_w.controlnet_cfg is not None
            ):
                ctrl_params = self.m.controlnet_params

            key, sub = jax.random.split(key)
            out = self._denoise_jit(
                self.m.unet_params, spec_w, latents, text_uc, text_c, sub,
                condition_latents=condition_latents,
                controlnet_params=ctrl_params,
                control_images=ctrl,
                pose_guider_params=pg_params,
                last_mid_latents=last_mid_latents,
                last_mid_noises=last_mid_noises,
                **refer_cond,
            )
            if spec_w.record_step_latents:
                out, step_lats = out[:-1], out[-1]
                step_latents_all.append(step_lats)
            if spec_w.record_mid_video and spec_w.video_overlap > 0:
                if isinstance(out, tuple):
                    out, (last_mid_latents, last_mid_noises) = out[0], out[1]
                mid_lat_np = np.asarray(last_mid_latents)
                mid_noise_np = np.asarray(last_mid_noises)
            elif isinstance(out, tuple):
                out = out[0]
            full = splice_condition_frames(out, condition_latents, n_vc)
            all_latents.append(full if i_window == 0 else full[:, n_vc:])
            if n_vc > 0:
                condition_latents = full[:, -n_vc:]
                last_control = control[:, -n_vc:]

        if not all_latents:
            raise ValueError("video_frames yielded no frames")
        latents_cat = jnp.concatenate(all_latents, axis=1)
        videos = self.decode_latents(latents_cat, segment=decode_segment)
        if need_hist_match:
            videos = self._apply_hist_match(videos)
        videos_mid = None
        if step_latents_all:
            videos_mid = np.stack(
                [
                    self.decode_latents(sl, segment=decode_segment)
                    for sl in np.concatenate(step_latents_all, axis=2)
                ]
            )
        return VideoResult(
            videos=videos,
            latents=np.asarray(latents_cat),
            videos_mid=videos_mid,
            mid_video_latents=mid_lat_np,
            mid_video_noises=mid_noise_np,
        )

    def _apply_hist_match(self, videos: np.ndarray) -> np.ndarray:
        """Match every frame after the first to frame 0, per batch item
        (reference hist_match_video_bcthw call, predictor.py:745-750)."""
        from ..utils.image_util import hist_match_video_to_frame

        videos = np.asarray(videos).copy()
        for bi in range(videos.shape[0]):
            videos[bi, 1:] = hist_match_video_to_frame(
                videos[bi, 1:], videos[bi, 0]
            )
        return videos

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
        guidance_rescale: float = 0.0,
        context_schedule: str = "uniform_v2",
        context_frames: int = 12,
        context_overlap: int = 4,
        noise_type: str = "video_fusion",
        w_ind_noise: float = 0.5,
        img_weight: float = 1e-3,
        motion_speed: float = 8.0,
        seed: int = 0,
        decode_segment: int = 16,
        need_hist_match: bool = False,
        prompt_only_use_image_prompt: bool = False,
        refer_image: Optional[np.ndarray] = None,  # (B, H, W, 3) [0,255]
        ip_adapter_image: Optional[np.ndarray] = None,  # (B, H, W, 3) [0,255]
        ip_adapter_scale: float = 1.0,
        face_emb: Optional[np.ndarray] = None,  # (B, id_dim) insightface emb
        ip_adapter_face_scale: float = 1.0,
        control_images: Optional[np.ndarray] = None,  # (B, n_vc+T_total, H, W, 3) [0,255]
        controlnet_conditioning_scale: float = 1.0,
        record_mid_video: bool = False,
        video_overlap: int = 1,
        need_middle_latents: bool = False,
        redraw_condition_image: bool = False,
        redraw_strength: float = 0.75,
    ) -> VideoResult:
        """The infinite-length text/image-to-video driver
        (run_pipe_text2video, predictor.py:356-750).

        ``redraw_condition_image``: img2img the supplied condition image
        before using it (phase-1 redraw, predictor.py:496-582); the redrawn
        frame also propagates into refer/ip-adapter images (:588-636)."""
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
        text_c, text_uc = self.encode_prompt_pair(prompt, negative_prompt)

        scale = self.m.vae_cfg.downscale
        h, w = height // scale, width // scale
        c_lat = self.m.unet_cfg.in_channels

        # phase 1: vision-condition latents
        if n_vision_condition > 0:
            if condition_images is not None:
                if redraw_condition_image:
                    key, sub = jax.random.split(key)
                    condition_images = self.redraw_condition_images(
                        condition_images, text_c, text_uc, sub,
                        strength=redraw_strength,
                        num_inference_steps=num_inference_steps,
                        guidance_scale=guidance_scale,
                        noise_type=noise_type, w_ind_noise=w_ind_noise,
                    )
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
            ip_adapter_scale=ip_adapter_scale,
            guidance_rescale=guidance_rescale,
        )
        if control_images is not None and self.m.controlnet_cfg is not None:
            spec = dataclasses.replace(
                spec,
                controlnet_cfg=self.m.controlnet_cfg,
                controlnet_scale=controlnet_conditioning_scale,
            )
        if control_images is not None and self.m.pose_guider_cfg is not None:
            spec = dataclasses.replace(spec, pose_guider_cfg=self.m.pose_guider_cfg)
        if record_mid_video:
            spec = dataclasses.replace(
                spec, record_mid_video=True, video_overlap=video_overlap
            )
        if need_middle_latents:
            spec = dataclasses.replace(spec, record_step_latents=True)

        # default reference/ip-adapter image: the condition image itself
        # (predictor.py:588-636)
        if refer_image is None and condition_images is not None:
            refer_image = np.asarray(condition_images)[:, 0]
        if ip_adapter_image is None and refer_image is not None:
            ip_adapter_image = refer_image
        refer_cond = self._prepare_reference_conditioning(
            refer_image, ip_adapter_image, text_c
        )
        if prompt_only_use_image_prompt and "vision_clip_emb" in refer_cond:
            # text tokens replaced by image-prompt tokens
            # (pipeline_controlnet.py prompt_only_use_image_prompt flag)
            clip = refer_cond["vision_clip_emb"]
            half = clip.shape[0] // 2
            text_uc = clip[:half].astype(self.dtype)
            text_c = clip[half:].astype(self.dtype)
        if face_emb is not None and self.m.ip_face_proj_params is not None:
            emb = jnp.asarray(face_emb, self.dtype)
            cond_tok = mlp_proj(self.m.ip_face_proj_params, emb)
            uncond_tok = mlp_proj(self.m.ip_face_proj_params, jnp.zeros_like(emb))
            refer_cond["ip_adapter_face_emb"] = jnp.concatenate(
                [uncond_tok, cond_tok], axis=0
            ).astype(self.dtype)
            spec = dataclasses.replace(
                spec, ip_adapter_face_scale=ip_adapter_face_scale
            )

        all_latents: List[jnp.ndarray] = []
        step_latents_all: List[jnp.ndarray] = []
        last_mid_latents = last_mid_noises = None
        mid_lat_np = mid_noise_np = None
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
            ctrl = None
            if control_images is not None and (
                spec.controlnet_cfg is not None
                or spec.pose_guider_cfg is not None
            ):
                lo = i_batch * video_length
                ctrl_gen = control_images[:, n_vision_condition + lo:
                                          n_vision_condition + lo + video_length]
                ctrl = np.concatenate(
                    [control_images[:, :n_vision_condition], ctrl_gen], axis=1
                )
                ctrl = jnp.asarray(ctrl, jnp.float32) / 255.0
            out = self._denoise_jit(
                self.m.unet_params, spec, latents, text_uc, text_c, sub,
                condition_latents=condition_latents,
                controlnet_params=self.m.controlnet_params
                if ctrl is not None and spec.controlnet_cfg is not None
                else None,
                control_images=ctrl,
                pose_guider_params=self.m.pose_guider_params
                if ctrl is not None and spec.pose_guider_cfg is not None
                else None,
                last_mid_latents=last_mid_latents,
                last_mid_noises=last_mid_noises,
                **refer_cond,
            )
            if spec.record_step_latents:
                out, step_lats = out[:-1], out[-1]
                step_latents_all.append(step_lats)
            if spec.record_mid_video and spec.video_overlap > 0:
                if isinstance(out, tuple):
                    out, (last_mid_latents, last_mid_noises) = out[0], out[1]
                mid_lat_np = np.asarray(last_mid_latents)
                mid_noise_np = np.asarray(last_mid_noises)
            elif isinstance(out, tuple):
                out = out[0]
            full = splice_condition_frames(out, condition_latents, n_vision_condition)
            if i_batch == 0:
                all_latents.append(full)
            else:
                all_latents.append(full[:, n_vision_condition:])
            if n_vision_condition > 0 and not fix_condition_images:
                condition_latents = full[:, -n_vision_condition:]

        latents_cat = jnp.concatenate(all_latents, axis=1)
        videos = self.decode_latents(latents_cat, segment=decode_segment)
        if need_hist_match:
            videos = self._apply_hist_match(videos)
        videos_mid = None
        if step_latents_all:
            videos_mid = np.stack(
                [
                    self.decode_latents(sl, segment=decode_segment)
                    for sl in np.concatenate(step_latents_all, axis=2)
                ]
            )
        return VideoResult(
            videos=videos,
            latents=np.asarray(latents_cat),
            videos_mid=videos_mid,
            mid_video_latents=mid_lat_np,
            mid_video_noises=mid_noise_np,
        )
