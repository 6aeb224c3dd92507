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

    def apply_fn(p, noisy_, ts_, text_, cond_):
        return unet3d_apply(
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
