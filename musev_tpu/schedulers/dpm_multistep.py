"""DPM-Solver++ (2M) multistep sampler.

Reference: musev/schedulers/scheduling_dpmsolver_multistep.py (the largest of
the six; video_fusion hook at :662/:729 applies to its SDE variant). This
implements the deterministic 2M ODE solver in data-prediction (++) form; the
one-step history is threaded as explicit state so the sampler works inside
``lax.scan`` (``is_multistep = True``; the denoise loop carries the state).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .base import ScheduleConfig, spaced_timesteps


@dataclasses.dataclass(frozen=True, eq=False)
class DPMSolverMultistepScheduler:
    config: ScheduleConfig
    num_inference_steps: int
    timesteps: np.ndarray
    sigmas: np.ndarray  # karras-style sigma(t) table aligned to timesteps, +0
    is_multistep: bool = True

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

    def init_state(self, shape, dtype=jnp.float32):
        """Previous x0 prediction (zeros; first step falls back to 1st order)."""
        return jnp.zeros(shape, dtype)

    def _sigma_to(self, sigma):
        # alpha_t, sigma_t of the "++" parameterization
        alpha = 1.0 / jnp.sqrt(sigma**2 + 1.0)
        return alpha, sigma * alpha

    def step(
        self, model_output, step_index, sample, state,
        key=None, w_ind_noise: float = 0.5, noise_type: str = "video_fusion",
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Returns (prev_sample, pred_x0, new_state)."""
        sigmas = jnp.asarray(self.sigmas)
        s0 = sigmas[step_index].astype(jnp.float32)
        s1 = sigmas[step_index + 1].astype(jnp.float32)
        s_prev = sigmas[jnp.maximum(step_index - 1, 0)].astype(jnp.float32)
        x = sample.astype(jnp.float32)
        out = model_output.astype(jnp.float32)
        if self.config.prediction_type == "epsilon":
            x0 = x - s0 * out
        elif self.config.prediction_type == "v_prediction":
            x0 = out * (-s0 / jnp.sqrt(s0**2 + 1)) + x / (s0**2 + 1)
        else:
            x0 = out

        a0, st0 = self._sigma_to(s0)
        a1, st1 = self._sigma_to(jnp.maximum(s1, 1e-10))
        ap, stp = self._sigma_to(s_prev)
        lam0 = jnp.log(a0 / jnp.maximum(st0, 1e-10))
        lam1 = jnp.log(a1 / jnp.maximum(st1, 1e-10))
        lamp = jnp.log(ap / jnp.maximum(stp, 1e-10))
        h = lam1 - lam0
        h_prev = lam0 - lamp

        # first-order (DPM-Solver++ 1S) update
        first = (st1 / st0) * x - a1 * jnp.expm1(-h) * x0
        # second-order 2M update using previous x0
        r = h_prev / jnp.maximum(jnp.abs(h), 1e-10) * jnp.sign(h)
        r = jnp.where(jnp.abs(h_prev) > 0, h_prev / h, 1.0)
        d = (1.0 + 1.0 / (2.0 * jnp.maximum(r, 1e-10))) * x0 - (
            1.0 / (2.0 * jnp.maximum(r, 1e-10))
        ) * state.astype(jnp.float32)
        second = (st1 / st0) * x - a1 * jnp.expm1(-h) * d

        use_second = jnp.logical_and(step_index > 0, s1 > 0)
        prev = jnp.where(use_second, second, first)
        # final step (sigma -> 0): prev = x0
        prev = jnp.where(s1 <= 0, x0, prev)
        return (
            prev.astype(sample.dtype),
            x0.astype(sample.dtype),
            x0.astype(sample.dtype),
        )

    def add_noise(self, original, noise, step_index):
        sigma = jnp.asarray(self.sigmas)[step_index].astype(jnp.float32)
        return (
            original.astype(jnp.float32) + noise.astype(jnp.float32) * sigma
        ).astype(original.dtype)
