"""Euler-ancestral, DDPM, and DDIM samplers with video-fusion noise.

References: musev/schedulers/scheduling_euler_ancestral_discrete.py (the
video_fusion hook at :304-313), scheduling_ddpm.py (:231-240),
scheduling_ddim.py (:282-291 + the zero-SNR option selected at
pipeline_controlnet_predictor.py:270-282). In all three the *stochastic draw*
uses the VideoFusion common+individual decomposition so sampler noise is
temporally correlated.

All share the scheduler protocol: content-hashable frozen dataclasses with
``scale_model_input``, ``step(model_output, i, sample, key, ...)`` and
``add_noise`` operating on precomputed tables.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.noise import make_noise
from .base import ScheduleConfig, spaced_timesteps


def _hashable(cls):
    return cls


@dataclasses.dataclass(frozen=True, eq=False)
class EulerAncestralScheduler:
    config: ScheduleConfig
    num_inference_steps: int
    timesteps: np.ndarray
    sigmas: np.ndarray  # (N+1,), last 0

    @classmethod
    def create(cls, num_inference_steps: int, config: Optional[ScheduleConfig] = None):
        config = config or ScheduleConfig()
        ac = config.alphas_cumprod()
        sig = np.sqrt((1 - ac) / ac)
        ts = spaced_timesteps(
            config.num_train_timesteps, num_inference_steps,
            config.timestep_spacing, config.steps_offset,
        )
        sigmas = np.interp(ts, np.arange(len(sig)), sig)
        sigmas = np.concatenate([sigmas, [0.0]]).astype(np.float32)
        return cls(config, num_inference_steps, ts.astype(np.float32), sigmas)

    def __hash__(self):
        return hash((self.config, self.num_inference_steps, self.sigmas.tobytes()))

    def __eq__(self, other):
        return isinstance(other, type(self)) and hash(self) == hash(other)

    @property
    def init_noise_sigma(self) -> float:
        if self.config.timestep_spacing in ("linspace", "trailing"):
            return float(np.sqrt(self.sigmas.max() ** 2 + 1))
        return float(self.sigmas.max())

    def scale_model_input(self, sample, step_index):
        sigma = jnp.asarray(self.sigmas)[step_index]
        return sample / jnp.sqrt(sigma**2 + 1.0).astype(sample.dtype)

    def step(
        self, model_output, step_index, sample, key=None,
        w_ind_noise: float = 0.5, noise_type: str = "video_fusion",
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        sigmas = jnp.asarray(self.sigmas)
        sigma = sigmas[step_index].astype(jnp.float32)
        sigma_next = sigmas[step_index + 1].astype(jnp.float32)
        x = sample.astype(jnp.float32)
        out = model_output.astype(jnp.float32)
        if self.config.prediction_type == "epsilon":
            pred_x0 = x - sigma * out
        elif self.config.prediction_type == "v_prediction":
            pred_x0 = out * (-sigma / jnp.sqrt(sigma**2 + 1)) + x / (sigma**2 + 1)
        else:
            pred_x0 = out
        var = jnp.maximum(
            sigma_next**2 * (sigma**2 - sigma_next**2) / jnp.maximum(sigma**2, 1e-12),
            0.0,
        )
        sigma_up = jnp.sqrt(var)
        sigma_down = jnp.sqrt(jnp.maximum(sigma_next**2 - sigma_up**2, 0.0))
        derivative = (x - pred_x0) / sigma
        prev = x + derivative * (sigma_down - sigma)
        noise = make_noise(
            key, sample.shape, noise_type=noise_type, w_ind_noise=w_ind_noise
        ).astype(jnp.float32)
        prev = prev + noise * sigma_up
        return prev.astype(sample.dtype), pred_x0.astype(sample.dtype)

    def add_noise(self, original, noise, step_index):
        sigma = jnp.asarray(self.sigmas)[step_index].astype(jnp.float32)
        return (
            original.astype(jnp.float32) + noise.astype(jnp.float32) * sigma
        ).astype(original.dtype)


@dataclasses.dataclass(frozen=True, eq=False)
class DDIMScheduler:
    config: ScheduleConfig
    num_inference_steps: int
    timesteps: np.ndarray  # int indices into alphas_cumprod, descending
    alphas_cumprod: np.ndarray
    eta: float = 0.0
    clip_sample: bool = False

    @classmethod
    def create(
        cls, num_inference_steps: int, config: Optional[ScheduleConfig] = None,
        eta: float = 0.0,
    ):
        config = config or ScheduleConfig()
        ts = spaced_timesteps(
            config.num_train_timesteps, num_inference_steps,
            config.timestep_spacing, config.steps_offset,
        ).round().astype(np.int64)
        return cls(
            config, num_inference_steps, ts,
            config.alphas_cumprod().astype(np.float32), eta,
        )

    def __hash__(self):
        return hash(
            (self.config, self.num_inference_steps, self.timesteps.tobytes(),
             self.eta, self.clip_sample)
        )

    def __eq__(self, other):
        return isinstance(other, type(self)) and hash(self) == hash(other)

    @property
    def init_noise_sigma(self) -> float:
        return 1.0

    def scale_model_input(self, sample, step_index):
        return sample

    def step(
        self, model_output, step_index, sample, key=None,
        w_ind_noise: float = 0.5, noise_type: str = "video_fusion",
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        ac = jnp.asarray(self.alphas_cumprod)
        ts = jnp.asarray(self.timesteps)
        t = ts[step_index]
        step_ratio = self.config.num_train_timesteps // self.num_inference_steps
        prev_t = t - step_ratio
        a_t = ac[t]
        a_prev = jnp.where(prev_t >= 0, ac[jnp.maximum(prev_t, 0)], 1.0)
        x = sample.astype(jnp.float32)
        out = model_output.astype(jnp.float32)
        beta_t = 1.0 - a_t
        if self.config.prediction_type == "epsilon":
            pred_x0 = (x - jnp.sqrt(beta_t) * out) / jnp.sqrt(a_t)
            eps = out
        elif self.config.prediction_type == "v_prediction":
            pred_x0 = jnp.sqrt(a_t) * x - jnp.sqrt(beta_t) * out
            eps = jnp.sqrt(a_t) * out + jnp.sqrt(beta_t) * x
        else:
            pred_x0 = out
            eps = (x - jnp.sqrt(a_t) * pred_x0) / jnp.sqrt(beta_t)
        if self.clip_sample:
            pred_x0 = jnp.clip(pred_x0, -1.0, 1.0)
        var = (1.0 - a_prev) / (1.0 - a_t) * (1.0 - a_t / a_prev)
        std = self.eta * jnp.sqrt(jnp.maximum(var, 0.0))
        dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev - std**2, 0.0)) * eps
        prev = jnp.sqrt(a_prev) * pred_x0 + dir_xt
        if self.eta > 0:
            noise = make_noise(
                key, sample.shape, noise_type=noise_type, w_ind_noise=w_ind_noise
            ).astype(jnp.float32)
            prev = prev + std * noise
        return prev.astype(sample.dtype), pred_x0.astype(sample.dtype)

    def add_noise(self, original, noise, step_index):
        ac = jnp.asarray(self.alphas_cumprod)
        t = jnp.asarray(self.timesteps)[step_index]
        a = ac[t]
        return (
            jnp.sqrt(a) * original.astype(jnp.float32)
            + jnp.sqrt(1 - a) * noise.astype(jnp.float32)
        ).astype(original.dtype)


@dataclasses.dataclass(frozen=True, eq=False)
class DDPMScheduler:
    config: ScheduleConfig
    num_inference_steps: int
    timesteps: np.ndarray
    alphas_cumprod: np.ndarray

    @classmethod
    def create(cls, num_inference_steps: int, config: Optional[ScheduleConfig] = None):
        config = config or ScheduleConfig()
        ts = spaced_timesteps(
            config.num_train_timesteps, num_inference_steps,
            config.timestep_spacing, config.steps_offset,
        ).round().astype(np.int64)
        return cls(config, num_inference_steps, ts,
                   config.alphas_cumprod().astype(np.float32))

    def __hash__(self):
        return hash((self.config, self.num_inference_steps, self.timesteps.tobytes()))

    def __eq__(self, other):
        return isinstance(other, type(self)) and hash(self) == hash(other)

    @property
    def init_noise_sigma(self) -> float:
        return 1.0

    def scale_model_input(self, sample, step_index):
        return sample

    def step(
        self, model_output, step_index, sample, key=None,
        w_ind_noise: float = 0.5, noise_type: str = "video_fusion",
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        ac = jnp.asarray(self.alphas_cumprod)
        ts = jnp.asarray(self.timesteps)
        t = ts[step_index]
        step_ratio = self.config.num_train_timesteps // self.num_inference_steps
        prev_t = t - step_ratio
        a_t = ac[t]
        a_prev = jnp.where(prev_t >= 0, ac[jnp.maximum(prev_t, 0)], 1.0)
        alpha = a_t / a_prev
        beta = 1.0 - alpha
        x = sample.astype(jnp.float32)
        out = model_output.astype(jnp.float32)
        if self.config.prediction_type == "epsilon":
            pred_x0 = (x - jnp.sqrt(1 - a_t) * out) / jnp.sqrt(a_t)
        elif self.config.prediction_type == "v_prediction":
            pred_x0 = jnp.sqrt(a_t) * x - jnp.sqrt(1 - a_t) * out
        else:
            pred_x0 = out
        x0_coef = jnp.sqrt(a_prev) * beta / (1.0 - a_t)
        xt_coef = jnp.sqrt(alpha) * (1.0 - a_prev) / (1.0 - a_t)
        prev = x0_coef * pred_x0 + xt_coef * x
        var = jnp.clip((1.0 - a_prev) / (1.0 - a_t) * beta, 1e-20, None)
        noise = make_noise(
            key, sample.shape, noise_type=noise_type, w_ind_noise=w_ind_noise
        ).astype(jnp.float32)
        prev = jnp.where(prev_t >= 0, prev + jnp.sqrt(var) * noise, prev)
        return prev.astype(sample.dtype), pred_x0.astype(sample.dtype)

    def add_noise(self, original, noise, step_index):
        ac = jnp.asarray(self.alphas_cumprod)
        t = jnp.asarray(self.timesteps)[step_index]
        a = ac[t]
        return (
            jnp.sqrt(a) * original.astype(jnp.float32)
            + jnp.sqrt(1 - a) * noise.astype(jnp.float32)
        ).astype(original.dtype)
