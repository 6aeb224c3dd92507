"""Euler-discrete sampler with video-fusion stochastic noise.

Reference: musev/schedulers/scheduling_euler_discrete.py:47-173 (the default
scheduler, selected at pipeline_controlnet_predictor.py:259-261). The
``step`` is a pure function of a static step index plan: all sigma/timestep
tables are precomputed numpy so the scanned denoise loop closes over
constants.

Stochasticity note: with the default ``s_churn=0`` the Euler step is
deterministic — temporal noise correlation enters through the *initial*
``video_fusion`` latents (prepare_latents) and through ancestral/DDPM-family
schedulers. ``step`` still accepts a key to honor ``s_churn > 0``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.noise import make_noise
from .base import ScheduleConfig, spaced_timesteps


@dataclasses.dataclass(frozen=True, eq=False)
class EulerDiscreteScheduler:
    """Holds the precomputed sigma schedule for a fixed step count.

    Content-hashable so denoise specs can be jit static arguments.
    """

    config: ScheduleConfig
    num_inference_steps: int
    timesteps: np.ndarray  # (N,) float, descending
    sigmas: np.ndarray  # (N+1,) float, last is 0
    s_churn: float = 0.0
    s_tmin: float = 0.0
    s_tmax: float = float("inf")
    s_noise: float = 1.0

    def __hash__(self):
        return hash(
            (self.config, self.num_inference_steps, self.sigmas.tobytes(),
             self.s_churn, self.s_tmin, self.s_tmax, self.s_noise)
        )

    def __eq__(self, other):
        return (
            isinstance(other, EulerDiscreteScheduler)
            and self.config == other.config
            and self.num_inference_steps == other.num_inference_steps
            and np.array_equal(self.timesteps, other.timesteps)
            and np.array_equal(self.sigmas, other.sigmas)
            and (self.s_churn, self.s_tmin, self.s_tmax, self.s_noise)
            == (other.s_churn, other.s_tmin, other.s_tmax, other.s_noise)
        )

    @classmethod
    def create(
        cls,
        num_inference_steps: int,
        config: Optional[ScheduleConfig] = None,
        interpolation_type: str = "linear",
        **kw,
    ) -> "EulerDiscreteScheduler":
        config = config or ScheduleConfig()
        ac = config.alphas_cumprod()
        sigmas_full = np.sqrt((1.0 - ac) / ac)
        timesteps = spaced_timesteps(
            config.num_train_timesteps,
            num_inference_steps,
            config.timestep_spacing,
            config.steps_offset,
        )
        if interpolation_type == "linear":
            sigmas = np.interp(timesteps, np.arange(len(sigmas_full)), sigmas_full)
        elif interpolation_type == "log_linear":
            sigmas = np.exp(
                np.linspace(
                    np.log(sigmas_full[-1]),
                    np.log(sigmas_full[0]),
                    num_inference_steps + 1,
                )
            )[::-1][:num_inference_steps]
        else:
            raise ValueError(interpolation_type)
        sigmas = np.concatenate([sigmas, [0.0]]).astype(np.float32)
        return cls(
            config=config,
            num_inference_steps=num_inference_steps,
            timesteps=timesteps.astype(np.float32),
            sigmas=sigmas,
            **kw,
        )

    @property
    def init_noise_sigma(self) -> float:
        if self.config.timestep_spacing in ("linspace", "trailing"):
            return float(np.sqrt(self.sigmas.max() ** 2 + 1))
        return float(self.sigmas.max())

    # ---- jit-friendly ops (step_index may be a traced int32) ----

    def scale_model_input(self, sample: jnp.ndarray, step_index) -> jnp.ndarray:
        sigma = jnp.asarray(self.sigmas)[step_index]
        return sample / jnp.sqrt(sigma**2 + 1.0).astype(sample.dtype)

    def step(
        self,
        model_output: jnp.ndarray,
        step_index,
        sample: jnp.ndarray,
        key: Optional[jax.Array] = None,
        w_ind_noise: float = 0.5,
        noise_type: str = "random",
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (prev_sample, pred_original_sample).

        Mirrors scheduling_euler_discrete.py:108-173 with static gamma=0 when
        s_churn == 0 (the default), in which case no noise is drawn.
        """
        sigmas = jnp.asarray(self.sigmas)
        sigma = sigmas[step_index].astype(jnp.float32)
        x = sample.astype(jnp.float32)
        out = model_output.astype(jnp.float32)

        if self.s_churn > 0:
            gamma_val = min(
                self.s_churn / (len(self.sigmas) - 1), 2**0.5 - 1
            )
            in_range = jnp.logical_and(sigma >= self.s_tmin, sigma <= self.s_tmax)
            gamma = jnp.where(in_range, gamma_val, 0.0)
            noise = make_noise(
                key, sample.shape, noise_type=noise_type, w_ind_noise=w_ind_noise
            ).astype(jnp.float32)
            eps = noise * self.s_noise
            sigma_hat = sigma * (gamma + 1.0)
            x = x + eps * jnp.sqrt(jnp.maximum(sigma_hat**2 - sigma**2, 0.0))
        else:
            sigma_hat = sigma

        pt = self.config.prediction_type
        if pt in ("original_sample", "sample"):
            pred_original = out
        elif pt == "epsilon":
            pred_original = x - sigma_hat * out
        elif pt == "v_prediction":
            pred_original = out * (-sigma / jnp.sqrt(sigma**2 + 1.0)) + (
                x / (sigma**2 + 1.0)
            )
        else:
            raise ValueError(pt)

        derivative = (x - pred_original) / sigma_hat
        dt = sigmas[step_index + 1].astype(jnp.float32) - sigma_hat
        prev = x + derivative * dt
        return prev.astype(sample.dtype), pred_original.astype(sample.dtype)

    def add_noise(
        self, original: jnp.ndarray, noise: jnp.ndarray, step_index
    ) -> jnp.ndarray:
        sigma = jnp.asarray(self.sigmas)[step_index].astype(jnp.float32)
        return (
            original.astype(jnp.float32) + noise.astype(jnp.float32) * sigma
        ).astype(original.dtype)
