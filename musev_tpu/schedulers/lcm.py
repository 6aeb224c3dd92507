"""Latent Consistency Model sampler with video-fusion noise.

Reference: musev/schedulers/scheduling_lcm.py (video_fusion at :178-187),
enabled with LCM-LoRA at pipeline_controlnet_predictor.py:301-306. Between
consistency steps the sample is re-noised to the next boundary with
temporally-correlated noise.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops.noise import make_noise
from .base import ScheduleConfig


@dataclasses.dataclass(frozen=True, eq=False)
class LCMScheduler:
    config: ScheduleConfig
    num_inference_steps: int
    timesteps: np.ndarray  # int, descending
    alphas_cumprod: np.ndarray
    sigma_data: float = 0.5
    timestep_scaling: float = 10.0
    original_inference_steps: int = 50

    @classmethod
    def create(
        cls,
        num_inference_steps: int,
        config: Optional[ScheduleConfig] = None,
        original_inference_steps: int = 50,
    ):
        config = config or ScheduleConfig()
        if num_inference_steps > original_inference_steps:
            raise ValueError(
                f"LCM num_inference_steps ({num_inference_steps}) must be <= "
                f"original_inference_steps ({original_inference_steps})"
            )
        k = config.num_train_timesteps // original_inference_steps
        lcm_origin_timesteps = np.arange(1, original_inference_steps + 1) * k - 1
        skipping = len(lcm_origin_timesteps) // num_inference_steps
        ts = lcm_origin_timesteps[::-1][::skipping][:num_inference_steps]
        return cls(
            config, num_inference_steps, ts.astype(np.int64),
            config.alphas_cumprod().astype(np.float32),
            original_inference_steps=original_inference_steps,
        )

    def __hash__(self):
        return hash((self.config, self.num_inference_steps, self.timesteps.tobytes()))

    def __eq__(self, other):
        return isinstance(other, type(self)) and hash(self) == hash(other)

    @property
    def init_noise_sigma(self) -> float:
        return 1.0

    def scale_model_input(self, sample, step_index):
        return sample

    def _scalings(self, t):
        scaled = t * self.timestep_scaling
        c_skip = self.sigma_data**2 / (scaled**2 + self.sigma_data**2)
        c_out = scaled / jnp.sqrt(scaled**2 + self.sigma_data**2)
        return c_skip, c_out

    def step(
        self, model_output, step_index, sample, key=None,
        w_ind_noise: float = 0.5, noise_type: str = "video_fusion",
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        ac = jnp.asarray(self.alphas_cumprod)
        ts = jnp.asarray(self.timesteps)
        t = ts[step_index]
        a_t = ac[t]
        x = sample.astype(jnp.float32)
        out = model_output.astype(jnp.float32)
        if self.config.prediction_type == "epsilon":
            pred_x0 = (x - jnp.sqrt(1 - a_t) * out) / jnp.sqrt(a_t)
        elif self.config.prediction_type == "v_prediction":
            pred_x0 = jnp.sqrt(a_t) * x - jnp.sqrt(1 - a_t) * out
        else:
            pred_x0 = out
        c_skip, c_out = self._scalings(t.astype(jnp.float32))
        denoised = c_out * pred_x0 + c_skip * x
        # re-noise to the next boundary unless this was the final step
        is_last = step_index >= self.num_inference_steps - 1
        t_next = ts[jnp.minimum(step_index + 1, self.num_inference_steps - 1)]
        a_next = ac[t_next]
        noise = make_noise(
            key, sample.shape, noise_type=noise_type, w_ind_noise=w_ind_noise
        ).astype(jnp.float32)
        renoised = jnp.sqrt(a_next) * denoised + jnp.sqrt(1 - a_next) * noise
        prev = jnp.where(is_last, denoised, renoised)
        return prev.astype(sample.dtype), denoised.astype(sample.dtype)

    def add_noise(self, original, noise, step_index):
        ac = jnp.asarray(self.alphas_cumprod)
        t = jnp.asarray(self.timesteps)[step_index]
        a = ac[t]
        return (
            jnp.sqrt(a) * original.astype(jnp.float32)
            + jnp.sqrt(1 - a) * noise.astype(jnp.float32)
        ).astype(original.dtype)
