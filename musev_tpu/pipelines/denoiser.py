"""The VCPD denoise engine: one jitted step, scanned over timesteps.

This is the TPU-native redesign of the reference's triple Python loop
(timesteps x context-windows x UNet, pipeline_controlnet.py:1846-2147):

  * all context windows of a step run as ONE batched UNet call — the window
    axis is folded into the batch and (optionally) sharded over the mesh's
    ``dp`` axis, the direct generalization of ``context_batch_size``
  * the overlap-average (reference noise_pred/counter accumulation,
    :2076-2079) is a single static scatter-add + divide; under pjit XLA
    lowers the cross-device part to ICI collectives
  * the timestep loop is ``lax.scan`` over a compiled step — zero Python
    dispatch in the hot path

Stays fully static: window plan, CFG doubling, condition splicing indices and
guidance schedule are trace-time constants.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.unet3d import UNet3DConfig, unet3d_apply
from ..models.controlnet import ControlNetConfig, controlnet_apply
from ..ops.context import WindowPlan
from ..schedulers.euler_discrete import EulerDiscreteScheduler


@dataclasses.dataclass(frozen=True, eq=False)
class DenoiseSpec:
    """Static configuration of one VCPD denoise run (jit static argument)."""

    unet_cfg: UNet3DConfig
    scheduler: EulerDiscreteScheduler
    plan: WindowPlan
    guidance: np.ndarray  # (num_steps,) per-step CFG scale
    n_vision_cond: int = 0
    do_cfg: bool = True
    w_ind_noise: float = 0.5
    noise_type: str = "video_fusion"
    motion_speed: float = 8.0
    ip_adapter_scale: float = 1.0
    ip_adapter_face_scale: float = 1.0
    # CFG rescale (arXiv:2305.08891 §3.4): the reference DEFINES
    # rescale_noise_cfg (util.py:368-383) but never wires it into the
    # pipeline; here 0.0 keeps the identical default and >0 applies it to
    # the combined noise prediction after the per-step CFG combine
    guidance_rescale: float = 0.0
    skip_temporal: bool = False
    # serial-denoise carry (reference fuse_part_tensor flow,
    # pipeline_controlnet.py:1846-2136; flagged "works bad" upstream but part
    # of the API surface). video_overlap frames of noises/latents recorded per
    # step and fused into the next shot.
    video_overlap: int = 0
    record_mid_video: bool = False
    # per-step decoded-latents debugging surface (reference
    # need_middle_latents, pipeline_controlnet.py:2138-2139)
    record_step_latents: bool = False
    # img2img strength: denoise only steps [start_step, num_steps) —
    # the reference truncates timesteps via get_timesteps(strength)
    # (pipeline_controlnet.py:1627-1641)
    start_step: int = 0
    controlnet_cfg: Optional["ControlNetConfig"] = None
    controlnet_scale: float = 1.0
    # PoseGuider (reference pipeline_controlnet.py:1774-1783): a conv stem
    # over the control images whose output is added to the UNet's conv_in
    # activations. Unlike the reference (which passes the whole-video emb to
    # every window and therefore only works when one window spans the video),
    # the emb here is gathered per window like the controlnet maps.
    pose_guider_cfg: Optional["ControlNetConfig"] = None
    dp_axis: Optional[str] = None  # mesh axis to shard the window batch over
    # mesh axis for tensor parallelism: params are pre-sharded with
    # parallel.sharding.shard_params_tp (Megatron column/row splits) and XLA
    # propagates; setting this also routes attention off the Pallas kernels
    # (custom calls are not auto-partitionable)
    tp_axis: Optional[str] = None
    # mesh axis for sequence parallelism: long self-attention sites run as
    # shard_map ring attention (parallel.ring_attention) with K/V shards
    # rotating over ICI
    sp_axis: Optional[str] = None
    # mesh axis for frame parallelism: the UNet call runs as the shard_map
    # program of parallel.frame_parallel, with every (window, cfg, frame) row
    # sharded — chip count decoupled from the window plan. Mutually exclusive
    # with dp/tp/sp.
    fp_axis: Optional[str] = None
    # single-chip bench mode: run ONE device's frame-parallel shard with
    # StubComm (see frame_parallel.StubComm); outputs are numerically fake
    # at collective points, timing-faithful otherwise
    fp_stub_devices: Optional[int] = None

    def __hash__(self):
        return hash(
            (self.unet_cfg, self.scheduler, self.plan, self.guidance.tobytes(),
             self.n_vision_cond, self.do_cfg, self.w_ind_noise, self.noise_type,
             self.motion_speed, self.ip_adapter_scale,
             self.ip_adapter_face_scale, self.guidance_rescale,
             self.skip_temporal,
             self.video_overlap, self.record_mid_video,
             self.record_step_latents, self.start_step,
             self.controlnet_cfg, self.controlnet_scale, self.pose_guider_cfg,
             self.dp_axis, self.tp_axis, self.sp_axis, self.fp_axis,
             self.fp_stub_devices)
        )

    def __eq__(self, other):
        if not isinstance(other, DenoiseSpec):
            return False
        return hash(self) == hash(other) and np.array_equal(
            self.guidance, other.guidance
        )


def _shard_batch(x: jnp.ndarray, spec: DenoiseSpec) -> jnp.ndarray:
    if spec.dp_axis is None:
        return x
    from jax.sharding import PartitionSpec as P

    ndim = x.ndim
    return jax.lax.with_sharding_constraint(
        x, P(spec.dp_axis, *([None] * (ndim - 1)))
    )


def predict_noise(
    params,
    spec: DenoiseSpec,
    latents: jnp.ndarray,
    step_index,
    text_uc: Optional[jnp.ndarray],
    text_c: jnp.ndarray,
    condition_latents: Optional[jnp.ndarray] = None,
    vision_clip_emb: Optional[jnp.ndarray] = None,
    ip_adapter_face_emb: Optional[jnp.ndarray] = None,
    refer_embs=None,
    mid_refer_emb=None,
    refer_self_attn_embs=None,
    controlnet_params=None,
    control_images=None,
    pose_guider_params=None,
) -> jnp.ndarray:
    """One full VCPD noise prediction over all windows.

    latents: (B, T, h, w, C); control_images: (B, n_vc + T, 8h, 8w, 3) in
    [0, 1] (condition frames' control maps at the head, reference
    pipeline_controlnet.py:1947-2021). Returns CFG-combined noise (B, T, ...).
    """
    from ..parallel.context import sharding_ctx

    with sharding_ctx(dp=spec.dp_axis, tp=spec.tp_axis, sp=spec.sp_axis):
        return _predict_noise_inner(
            params, spec, latents, step_index, text_uc, text_c,
            condition_latents, vision_clip_emb, ip_adapter_face_emb,
            refer_embs, mid_refer_emb, refer_self_attn_embs,
            controlnet_params, control_images, pose_guider_params,
        )


def _predict_noise_inner(
    params,
    spec: DenoiseSpec,
    latents: jnp.ndarray,
    step_index,
    text_uc: Optional[jnp.ndarray],
    text_c: jnp.ndarray,
    condition_latents: Optional[jnp.ndarray] = None,
    vision_clip_emb: Optional[jnp.ndarray] = None,
    ip_adapter_face_emb: Optional[jnp.ndarray] = None,
    refer_embs=None,
    mid_refer_emb=None,
    refer_self_attn_embs=None,
    controlnet_params=None,
    control_images=None,
    pose_guider_params=None,
) -> jnp.ndarray:
    b, t, h, w, c = latents.shape
    plan = spec.plan
    n_win, wlen = plan.n_windows, plan.window_size
    n_vc = spec.n_vision_cond
    if plan.per_step:  # step-dependent schedule ('uniform'): select the
        # current step's plan from the static stack
        windows = jnp.asarray(plan.windows)[step_index]  # (n_win, wlen)
        counts_t = jnp.asarray(plan.counts)[step_index]
    else:
        windows = jnp.asarray(plan.windows)
        counts_t = jnp.asarray(plan.counts)

    scaled = spec.scheduler.scale_model_input(latents, step_index)
    # gather windows -> (B, n_win, wlen, h, w, C) -> fold to batch
    win = jnp.take(scaled, windows.reshape(-1), axis=1)
    win = win.reshape(b, n_win, wlen, h, w, c)
    win = win.reshape(b * n_win, wlen, h, w, c)

    reps = 2 if spec.do_cfg else 1
    model_in = jnp.concatenate([win] * reps, axis=0)
    model_in = _shard_batch(model_in, spec)

    def tile_rows(e):
        """Align a conditioning tensor to the window-folded CFG batch.

        (B, ...) -> replicated to both CFG halves; (2B, ...) -> halves kept
        (pre-doubled inputs like IP-Adapter's uncond=proj(zeros), reference
        pipeline_controlnet.py:736-774).
        """
        if spec.do_cfg and e.shape[0] == 2 * b:
            e = e.reshape(2, b, *e.shape[1:])
            e = jnp.repeat(e, n_win, axis=1)
            return e.reshape(2 * b * n_win, *e.shape[2:])
        e = jnp.repeat(e, n_win, axis=0)
        return jnp.concatenate([e] * reps, axis=0)

    if spec.do_cfg:
        assert text_uc is not None
        text = jnp.concatenate(
            [jnp.repeat(text_uc, n_win, axis=0), jnp.repeat(text_c, n_win, axis=0)],
            axis=0,
        )
    else:
        text = jnp.repeat(text_c, n_win, axis=0)

    cond = None
    gen_index = None
    cond_index = None
    if condition_latents is not None and n_vc > 0:
        cond = tile_rows(condition_latents)
        cond_index = tuple(range(n_vc))
        gen_index = tuple(range(n_vc, n_vc + wlen))

    def tile_opt(e):
        return tile_rows(e) if e is not None else None

    cn_down = cn_mid = None
    pose_guider_emb = None
    use_cn = controlnet_params is not None and spec.controlnet_cfg is not None
    use_pg = pose_guider_params is not None and spec.pose_guider_cfg is not None
    unet_fn = unet3d_apply
    unet_extra = {}
    fp_active = spec.fp_axis is not None or spec.fp_stub_devices is not None
    if fp_active:
        from ..parallel.frame_parallel import unet3d_apply_fp

        unet_fn = unet3d_apply_fp
        unet_extra = dict(
            axis=spec.fp_axis or "fp", stub_devices=spec.fp_stub_devices
        )
    if use_cn or use_pg:
        assert control_images is not None
        # per-window control frames: [viscond maps; window maps]
        if n_vc > 0:
            vc_idx = jnp.broadcast_to(
                jnp.arange(n_vc, dtype=windows.dtype)[None], (n_win, n_vc)
            )
            idx = jnp.concatenate([vc_idx, windows + n_vc], axis=1)
        else:
            idx = windows
        def gather_ctrl(imgs):
            g = jnp.take(imgs, idx.reshape(-1), axis=1)
            g = g.reshape(b * n_win, n_vc + wlen, *imgs.shape[2:])
            g = jnp.concatenate([g] * reps, axis=0)
            return g.reshape(-1, *imgs.shape[2:])

    if use_pg:
        from ..models.controlnet import pose_guider_apply

        pg_imgs = (
            control_images[0]
            if isinstance(control_images, (list, tuple))
            else control_images
        )
        pose_guider_emb = pose_guider_apply(
            pose_guider_params, gather_ctrl(pg_imgs).astype(model_in.dtype)
        )
    if use_cn:
        t_step = jnp.asarray(spec.scheduler.timesteps)[step_index]
        if isinstance(control_images, (list, tuple)):
            ctrl_frames = [gather_ctrl(ci) for ci in control_images]
        else:
            ctrl_frames = gather_ctrl(control_images)
        # MultiControlNet: lists of (params, cfg, scale-weighted images) sum
        # their residuals (reference MultiControlNetModel usage)
        cn_list = (
            controlnet_params
            if isinstance(controlnet_params, (list, tuple))
            else [controlnet_params]
        )
        cfg_list = (
            spec.controlnet_cfg
            if isinstance(spec.controlnet_cfg, tuple)
            else [spec.controlnet_cfg] * len(cn_list)
        )
        img_list = (
            ctrl_frames if isinstance(ctrl_frames, list) else [ctrl_frames] * len(cn_list)
        )
        scale_list = (
            spec.controlnet_scale
            if isinstance(spec.controlnet_scale, tuple)
            else (spec.controlnet_scale,) * len(cn_list)
        )
        if fp_active:
            # under frame parallelism the (frame-local) ControlNet trunk
            # runs row-sharded inside the SPMD program — each chip computes
            # residuals for its own rows only
            unet_extra["controlnet"] = dict(
                params=list(cn_list), cfgs=tuple(cfg_list),
                scales=tuple(float(s) for s in scale_list),
                images=list(img_list), timestep=t_step,
            )
        else:
            # controlnet consumes the spliced (viscond + window) latents
            if cond is not None:
                cn_lat = jnp.concatenate(
                    [cond.astype(model_in.dtype), model_in], axis=1
                )
            else:
                cn_lat = model_in
            nf = cn_lat.shape[1]
            frames = cn_lat.reshape(-1, *cn_lat.shape[2:])
            if spec.do_cfg:
                text_frames = jnp.concatenate([
                    jnp.repeat(jnp.repeat(text_uc, n_win, axis=0), nf, axis=0),
                    jnp.repeat(jnp.repeat(text_c, n_win, axis=0), nf, axis=0),
                ])
            else:
                text_frames = jnp.repeat(
                    jnp.repeat(text_c, n_win, axis=0), nf, axis=0
                )
            for cp, cc, ci, cs in zip(cn_list, cfg_list, img_list, scale_list):
                d_i, m_i = controlnet_apply(
                    cp, cc, frames, t_step, text_frames, ci,
                    conditioning_scale=cs,
                )
                if cn_down is None:
                    cn_down, cn_mid = list(d_i), m_i
                else:
                    cn_down = [a + b_ for a, b_ in zip(cn_down, d_i)]
                    cn_mid = cn_mid + m_i
    out = unet_fn(
        params,
        spec.unet_cfg,
        model_in,
        jnp.asarray(spec.scheduler.timesteps)[step_index],
        text,
        **unet_extra,
        condition_latents=cond,
        gen_index=gen_index,
        cond_index=cond_index,
        do_cfg=spec.do_cfg,
        motion_speed=spec.motion_speed,
        ip_adapter_scale=spec.ip_adapter_scale,
        ip_adapter_face_emb=tile_opt(ip_adapter_face_emb),
        ip_adapter_face_scale=spec.ip_adapter_face_scale,
        skip_temporal=spec.skip_temporal,
        vision_clip_emb=tile_opt(vision_clip_emb),
        down_block_refer_embs=[tile_opt(e) for e in refer_embs]
        if refer_embs is not None
        else None,
        mid_block_refer_emb=tile_opt(mid_refer_emb),
        refer_self_attn_embs=[tile_opt(e) for e in refer_self_attn_embs]
        if refer_self_attn_embs is not None
        else None,
        refer_self_attn_mode="read" if refer_self_attn_embs is not None else None,
        controlnet_down_residuals=cn_down,
        controlnet_mid_residual=cn_mid,
        pose_guider_emb=pose_guider_emb,
    )
    if cond is not None:
        out = jnp.take(out, jnp.asarray(gen_index, jnp.int32), axis=1)

    # scatter-add the overlap average (reference pipeline :2076-2079)
    out = out.reshape(reps, b, n_win * wlen, h, w, c)
    buf = jnp.zeros((reps, b, t, h, w, c), dtype=out.dtype)
    buf = buf.at[:, :, windows.reshape(-1)].add(out)
    noise_pred = buf / counts_t.astype(buf.dtype)[None, None, :, None, None, None]

    if spec.do_cfg:
        g = jnp.asarray(spec.guidance)[step_index].astype(noise_pred.dtype)
        combined = noise_pred[0] + g * (noise_pred[1] - noise_pred[0])
        if spec.guidance_rescale > 0.0:
            from ..utils.image_util import rescale_noise_cfg

            combined = rescale_noise_cfg(
                combined, noise_pred[1], spec.guidance_rescale
            )
        noise_pred = combined
    else:
        noise_pred = noise_pred[0]
    return noise_pred


def denoise_loop(
    params,
    spec: DenoiseSpec,
    latents: jnp.ndarray,
    text_uc: Optional[jnp.ndarray],
    text_c: jnp.ndarray,
    key: jax.Array,
    condition_latents: Optional[jnp.ndarray] = None,
    vision_clip_emb: Optional[jnp.ndarray] = None,
    ip_adapter_face_emb: Optional[jnp.ndarray] = None,
    refer_embs=None,
    mid_refer_emb=None,
    refer_self_attn_embs=None,
    controlnet_params=None,
    control_images=None,
    pose_guider_params=None,
    last_mid_latents=None,
    last_mid_noises=None,
):
    """Scan the denoise step over all timesteps. Returns final latents, or
    (final, (mid_latents, mid_noises)) when ``spec.record_mid_video``.

    Multistep schedulers (``is_multistep``) thread their history through the
    scan carry. ``last_mid_*``: (num_steps+1, B, overlap, h, w, C) carries
    from the previous shot (serial denoise, :1863-2136)."""
    num_steps = spec.scheduler.num_inference_steps
    ov = spec.video_overlap
    from ..ops.index_ops import fuse_part_tensor

    if last_mid_latents is not None and ov > 0:
        latents = fuse_part_tensor(
            last_mid_latents[0], latents, ov, weight=0.1, skip_step=0
        )
    multistep = getattr(spec.scheduler, "is_multistep", False)
    sched_state = (
        spec.scheduler.init_state(latents.shape, latents.dtype)
        if multistep
        else jnp.zeros((), latents.dtype)
    )

    def step_fn(carry, i):
        lat, state, k = carry
        k, sub = jax.random.split(k)
        noise_pred = predict_noise(
            params, spec, lat, i, text_uc, text_c, condition_latents,
            vision_clip_emb=vision_clip_emb,
            ip_adapter_face_emb=ip_adapter_face_emb, refer_embs=refer_embs,
            mid_refer_emb=mid_refer_emb,
            refer_self_attn_embs=refer_self_attn_embs,
            controlnet_params=controlnet_params,
            control_images=control_images,
            pose_guider_params=pose_guider_params,
        )
        if last_mid_noises is not None and ov > 0:
            fused = fuse_part_tensor(
                last_mid_noises[i + 1], noise_pred, ov, weight=0.01, skip_step=1
            )
            noise_pred = jnp.where(i <= num_steps // 2, fused, noise_pred)
        if multistep:
            prev, _, state = spec.scheduler.step(
                noise_pred, i, lat, state, key=sub,
                w_ind_noise=spec.w_ind_noise, noise_type=spec.noise_type,
            )
        else:
            prev, _ = spec.scheduler.step(
                noise_pred, i, lat, key=sub,
                w_ind_noise=spec.w_ind_noise, noise_type=spec.noise_type,
            )
        if last_mid_latents is not None and ov > 0:
            fused = fuse_part_tensor(
                last_mid_latents[i + 1], prev, ov, weight=0.1, skip_step=0
            )
            prev = jnp.where(i <= 1, fused, prev)
        ys = None
        if spec.record_mid_video and ov > 0:
            ys = (prev[:, -ov:], noise_pred[:, -ov:])
        if spec.record_step_latents:
            ys = (ys, prev) if ys is not None else prev
        return (prev, state, k), ys

    (final, _, _), recorded = jax.lax.scan(
        step_fn,
        (latents, sched_state, key),
        jnp.arange(spec.start_step, num_steps, dtype=jnp.int32),
    )
    step_latents = None
    if spec.record_step_latents:
        if spec.record_mid_video and ov > 0:
            recorded, step_latents = recorded
        else:
            step_latents, recorded = recorded, None
    extras = []
    if spec.record_mid_video and ov > 0:
        rec_lat, rec_noise = recorded
        # prepend the initial tail / a zero slot so indices line up with the
        # reference's [None, step0, step1, ...] list layout
        rec_lat = jnp.concatenate([latents[None, :, -ov:], rec_lat], axis=0)
        rec_noise = jnp.concatenate(
            [jnp.zeros_like(rec_noise[:1]), rec_noise], axis=0
        )
        extras.append((rec_lat, rec_noise))
    if spec.record_step_latents:
        extras.append(step_latents)
    if extras:
        return (final, *extras)
    return final


def splice_condition_frames(
    latents: jnp.ndarray, condition_latents: Optional[jnp.ndarray], n_vc: int
) -> jnp.ndarray:
    """Final re-splice of clean condition frames at the head
    (reference :2149-2156 with the default head-first index layout)."""
    if condition_latents is None or n_vc == 0:
        return latents
    return jnp.concatenate([condition_latents.astype(latents.dtype), latents], axis=1)
