"""DDIM inversion: recover the noise trajectory of existing latents.

Reference: musev/utils/util.py:264-345 (ddim_inversion helpers used for
video editing flows). Runs the DDIM update in reverse with the model's noise
prediction at each step.
"""

from __future__ import annotations

from typing import Callable, List

import jax.numpy as jnp

from ..schedulers.ancestral import DDIMScheduler


def next_step(
    scheduler: DDIMScheduler,
    model_output: jnp.ndarray,
    step_index: int,
    sample: jnp.ndarray,
) -> jnp.ndarray:
    """x_t -> x_{t+1} (reversed DDIM update)."""
    ac = jnp.asarray(scheduler.alphas_cumprod)
    ts = jnp.asarray(scheduler.timesteps)
    t = ts[step_index]
    step_ratio = scheduler.config.num_train_timesteps // scheduler.num_inference_steps
    next_t = jnp.minimum(
        t + step_ratio, scheduler.config.num_train_timesteps - 1
    )
    a_t = ac[t]
    a_next = ac[next_t]
    x = sample.astype(jnp.float32)
    eps = model_output.astype(jnp.float32)
    x0 = (x - jnp.sqrt(1 - a_t) * eps) / jnp.sqrt(a_t)
    return (jnp.sqrt(a_next) * x0 + jnp.sqrt(1 - a_next) * eps).astype(
        sample.dtype
    )


def ddim_inversion(
    scheduler: DDIMScheduler,
    latents: jnp.ndarray,
    eps_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
) -> List[jnp.ndarray]:
    """Invert clean latents to the noise trajectory.

    ``eps_fn(latent, t)`` is the conditioned noise prediction. Returns the
    trajectory [x_0, x_t1, ..., x_T] (util.py:318-345 semantics).
    """
    traj = [latents]
    x = latents
    ts = scheduler.timesteps
    for i in range(scheduler.num_inference_steps - 1, -1, -1):
        t = jnp.asarray(float(ts[i]))
        eps = eps_fn(x, t)
        x = next_step(scheduler, eps, i, x)
        traj.append(x)
    return traj
