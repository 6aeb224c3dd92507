"""Diffusion training step for the 3D UNet (epsilon prediction).

The reference never shipped training code (README.md:36 "training codes
comming very soon"; only the untrained SuperUNet3DConditionModel scaffold,
musev/models/super_model.py). This module provides the TPU-native training
path: DDPM noise-prediction MSE with the video-fusion noise decomposition,
data-parallel over a mesh via shardings (gradients all-reduce over ICI by
XLA), and `jax.checkpoint` on the UNet to trade FLOPs for HBM.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .models.unet3d import UNet3DConfig, unet3d_apply
from .ops.noise import video_fusion_noise
from .schedulers.base import ScheduleConfig


@dataclasses.dataclass(frozen=True)
class TrainSpec:
    unet_cfg: UNet3DConfig
    schedule: ScheduleConfig = ScheduleConfig()
    learning_rate: float = 1e-5
    w_ind_noise: float = 0.5
    n_vision_cond: int = 1
    grad_checkpoint: bool = True
    # frame-parallel training: shard the (batch, frame) rows of the UNet
    # over this mesh axis (parallel/frame_parallel.py — shard_map is
    # differentiable, so gradients flow back through the halo/pivot/psum
    # collectives and XLA all-reduces the replicated-param cotangents).
    # Activation memory scales 1/n: long videos that cannot fit one chip's
    # HBM train by adding chips instead of shrinking T.
    fp_axis: Optional[str] = None
    # optax path (make_optimizer / train_step_opt): "sgd" or "adamw"
    optimizer: str = "adamw"
    weight_decay: float = 1e-2
    max_grad_norm: float = 1.0


def diffusion_loss(
    params,
    spec: TrainSpec,
    latents: jnp.ndarray,  # (B, T, h, w, C) clean video latents
    text_emb: jnp.ndarray,  # (B, S, D)
    key: jax.Array,
) -> jnp.ndarray:
    """Noise-prediction MSE. The first ``n_vision_cond`` frames act as the
    clean vision-condition; the rest are noised and predicted."""
    b, t, h, w, c = latents.shape
    n_vc = spec.n_vision_cond
    cond, gen = latents[:, :n_vc], latents[:, n_vc:]

    ac = jnp.asarray(spec.schedule.alphas_cumprod(), dtype=jnp.float32)
    k_t, k_n = jax.random.split(key)
    timesteps = jax.random.randint(
        k_t, (b,), 0, spec.schedule.num_train_timesteps
    )
    a = ac[timesteps][:, None, None, None, None]
    noise = video_fusion_noise(
        k_n, gen.shape, w_ind_noise=spec.w_ind_noise, dtype=jnp.float32
    )
    noisy = jnp.sqrt(a) * gen.astype(jnp.float32) + jnp.sqrt(1.0 - a) * noise
    noisy = noisy.astype(latents.dtype)

    if spec.fp_axis is not None:
        from .parallel.frame_parallel import unet3d_apply_fp

        unet_fn = partial(unet3d_apply_fp, axis=spec.fp_axis)
    else:
        unet_fn = unet3d_apply

    def apply_fn(p, noisy_, ts_, text_, cond_):
        return unet_fn(
            p,
            spec.unet_cfg,
            noisy_,
            ts_,
            text_,
            condition_latents=cond_,
            cond_index=tuple(range(n_vc)) if n_vc > 0 else None,
            gen_index=tuple(range(n_vc, t)) if n_vc > 0 else None,
        )

    if spec.grad_checkpoint:
        apply_fn = jax.checkpoint(
            apply_fn, policy=jax.checkpoint_policies.nothing_saveable
        )

    from .ops.attention import training_ctx

    with training_ctx():  # Pallas kernels have no VJP: differentiable paths
        pred = apply_fn(
            params,
            noisy,
            timesteps.astype(jnp.float32),
            text_emb,
            cond if n_vc > 0 else None,
        )
    pred_gen = pred[:, n_vc:] if n_vc > 0 else pred
    err = pred_gen.astype(jnp.float32) - noise
    return jnp.mean(err * err)


@dataclasses.dataclass(frozen=True)
class SuperTrainSpec:
    """Training spec for the full conditioned bundle (the reference's
    SuperUNet3DConditionModel scaffold, super_model.py:22-253: ip-proj ->
    referencenet -> controlnet -> unet, all trainable)."""

    unet_cfg: UNet3DConfig
    referencenet_cfg: object = None
    controlnet_cfg: object = None
    schedule: ScheduleConfig = ScheduleConfig()
    learning_rate: float = 1e-5
    w_ind_noise: float = 0.5
    n_vision_cond: int = 1
    controlnet_scale: float = 1.0


def super_diffusion_loss(
    bundle: dict,
    spec: SuperTrainSpec,
    batch: dict,
    key: jax.Array,
) -> jnp.ndarray:
    """Joint loss over unet + optional referencenet/ip-proj/controlnet params.

    bundle keys: unet, referencenet?, ip_proj?, controlnet?
    batch keys: latents (B,T,h,w,C), text_emb (B,S,D), refer_latents?
      (B,h,w,C), clip_pooled? (B,clip_dim), control_images? (B,T,H,W,3)
    """
    from .ops.attention import training_ctx

    with training_ctx():  # Pallas kernels have no VJP: differentiable paths
        return _super_diffusion_loss(bundle, spec, batch, key)


def _super_diffusion_loss(bundle, spec, batch, key):
    from .models.controlnet import controlnet_apply
    from .models.ip_adapter import image_proj
    from .models.referencenet import referencenet_apply

    latents = batch["latents"]
    text_emb = batch["text_emb"]
    b, t, h, w, c = latents.shape
    n_vc = spec.n_vision_cond
    cond, gen = latents[:, :n_vc], latents[:, n_vc:]
    ac = jnp.asarray(spec.schedule.alphas_cumprod(), dtype=jnp.float32)
    k_t, k_n = jax.random.split(key)
    timesteps = jax.random.randint(k_t, (b,), 0, spec.schedule.num_train_timesteps)
    a = ac[timesteps][:, None, None, None, None]
    noise = video_fusion_noise(
        k_n, gen.shape, w_ind_noise=spec.w_ind_noise, dtype=jnp.float32
    )
    noisy = (jnp.sqrt(a) * gen.astype(jnp.float32) + jnp.sqrt(1 - a) * noise).astype(
        latents.dtype
    )

    clip_tokens = None
    if "ip_proj" in bundle and "clip_pooled" in batch:
        clip_tokens = image_proj(bundle["ip_proj"], batch["clip_pooled"])
    refer_embs = mid_emb = None
    if "referencenet" in bundle and "refer_latents" in batch:
        ctx = clip_tokens if clip_tokens is not None else text_emb
        refer_embs, mid_emb, _ = referencenet_apply(
            bundle["referencenet"], spec.referencenet_cfg,
            batch["refer_latents"], timesteps.astype(jnp.float32), ctx,
        )
    cn_down = cn_mid = None
    if "controlnet" in bundle and "control_images" in batch:
        frames = jnp.concatenate([cond.astype(noisy.dtype), noisy], axis=1)
        frames = frames.reshape(-1, h, w, c)
        ctrl = batch["control_images"].reshape(-1, *batch["control_images"].shape[2:])
        txt_f = jnp.repeat(text_emb, t, axis=0)
        ts_f = jnp.repeat(timesteps.astype(jnp.float32), t, axis=0)
        cn_down, cn_mid = controlnet_apply(
            bundle["controlnet"], spec.controlnet_cfg, frames, ts_f, txt_f,
            ctrl, conditioning_scale=spec.controlnet_scale,
        )

    pred = unet3d_apply(
        bundle["unet"],
        spec.unet_cfg,
        noisy,
        timesteps.astype(jnp.float32),
        text_emb,
        condition_latents=cond if n_vc > 0 else None,
        cond_index=tuple(range(n_vc)) if n_vc > 0 else None,
        gen_index=tuple(range(n_vc, t)) if n_vc > 0 else None,
        down_block_refer_embs=refer_embs,
        mid_block_refer_emb=mid_emb,
        vision_clip_emb=clip_tokens,
        controlnet_down_residuals=cn_down,
        controlnet_mid_residual=cn_mid,
    )
    pred_gen = pred[:, n_vc:] if n_vc > 0 else pred
    err = pred_gen.astype(jnp.float32) - noise
    return jnp.mean(err * err)


def super_train_step(bundle, spec: SuperTrainSpec, batch, key):
    """SGD step over the whole bundle (dp-shardable like train_step)."""
    loss, grads = jax.value_and_grad(super_diffusion_loss)(bundle, spec, batch, key)
    lr = spec.learning_rate
    new_bundle = jax.tree_util.tree_map(
        lambda p, g: p - lr * g.astype(p.dtype), bundle, grads
    )
    return new_bundle, loss


def train_step(
    params,
    spec: TrainSpec,
    latents: jnp.ndarray,
    text_emb: jnp.ndarray,
    key: jax.Array,
) -> Tuple[dict, jnp.ndarray]:
    """One SGD step. Batch axis shards over ``dp``; XLA inserts the gradient
    all-reduce. Returns (new_params, loss)."""
    loss, grads = jax.value_and_grad(diffusion_loss)(
        params, spec, latents, text_emb, key
    )
    lr = spec.learning_rate
    new_params = jax.tree_util.tree_map(
        lambda p, g: (p - lr * g.astype(p.dtype)) if g is not None else p,
        params,
        grads,
    )
    return new_params, loss


def make_optimizer(spec: TrainSpec):
    """Optax chain for ``spec.optimizer``. The plain ``train_step`` above is
    the dependency-light SGD path; this gives the production trainer (AdamW +
    global-norm clipping, the de-facto diffusion fine-tune recipe)."""
    import optax

    if spec.optimizer == "sgd":
        return optax.sgd(spec.learning_rate)
    if spec.optimizer == "adamw":
        return optax.chain(
            optax.clip_by_global_norm(spec.max_grad_norm),
            optax.adamw(spec.learning_rate, weight_decay=spec.weight_decay),
        )
    raise ValueError(f"unknown optimizer {spec.optimizer!r}")


def train_step_opt(
    params,
    opt_state,
    spec: TrainSpec,
    latents: jnp.ndarray,
    text_emb: jnp.ndarray,
    key: jax.Array,
):
    """One optimizer step with optax state threading (init the state with
    ``make_optimizer(spec).init(params)``). Shards like ``train_step``:
    batch over ``dp``, frames over ``spec.fp_axis``; the opt state is a
    params-shaped pytree and follows the param sharding."""
    tx = make_optimizer(spec)
    loss, grads = jax.value_and_grad(diffusion_loss)(
        params, spec, latents, text_emb, key
    )
    grads = jax.tree_util.tree_map(
        lambda p, g: jnp.zeros_like(p) if g is None else g.astype(p.dtype),
        params, grads,
    )
    updates, opt_state = tx.update(grads, opt_state, params)
    new_params = jax.tree_util.tree_map(
        lambda p, u: p + u.astype(p.dtype), params, updates
    )
    return new_params, opt_state, loss
