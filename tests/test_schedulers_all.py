"""All six sampler families must integrate the exact-score ODE/SDE back to x0
and expose the common protocol."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from musev_tpu.schedulers import create_scheduler

SHAPE = (1, 4, 4, 4, 1)


def _exact_eps(x, x0, scheduler, i):
    """True epsilon given the scheduler's forward parameterization."""
    name = type(scheduler).__name__
    if hasattr(scheduler, "sigmas"):
        sigma = float(scheduler.sigmas[i])
        return (x - x0) / sigma
    ac = scheduler.alphas_cumprod
    t = int(scheduler.timesteps[i])
    a = float(ac[t])
    return (x - np.sqrt(a) * x0) / np.sqrt(1 - a)


@pytest.mark.parametrize(
    "name,steps,tol",
    [
        ("euler", 40, 1e-2),
        ("euler_ancestral", 40, 0.35),  # stochastic
        ("ddim", 40, 1e-2),
        ("ddpm", 40, 0.35),  # stochastic
        ("dpmpp_2m", 25, 1e-2),
    ],
)
def test_recovers_x0(name, steps, tol):
    s = create_scheduler(name, steps)
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(*SHAPE), jnp.float32) * 0.5
    noise = jnp.asarray(rng.randn(*SHAPE), jnp.float32)
    if hasattr(s, "sigmas"):
        x = x0 + noise * float(s.sigmas[0])
    else:
        a0 = float(s.alphas_cumprod[int(s.timesteps[0])])
        x = np.sqrt(a0) * x0 + np.sqrt(1 - a0) * noise
        x = jnp.asarray(x)
    state = s.init_state(SHAPE) if getattr(s, "is_multistep", False) else None
    key = jax.random.PRNGKey(0)
    for i in range(steps):
        scaled = s.scale_model_input(x, i)
        # the model sees the scaled input; eps is computed on the raw sample
        eps = jnp.asarray(_exact_eps(np.asarray(x), np.asarray(x0), s, i))
        key, sub = jax.random.split(key)
        if state is not None:
            x, _, state = s.step(eps, i, x, state, key=sub)
        else:
            x, _ = s.step(eps, i, x, key=sub)
    err = float(jnp.abs(x - x0).mean())
    assert err < tol, f"{name}: mean err {err}"


def test_lcm_one_step_consistency():
    """With the exact x0 as prediction, LCM's final output approaches x0 as
    t -> small (c_out -> 1)."""
    s = create_scheduler("lcm", 4)
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(*SHAPE), jnp.float32) * 0.5
    key = jax.random.PRNGKey(0)
    a0 = float(s.alphas_cumprod[int(s.timesteps[0])])
    x = jnp.sqrt(a0) * x0 + jnp.sqrt(1 - a0) * jnp.asarray(
        rng.randn(*SHAPE), jnp.float32
    )
    for i in range(4):
        ac = float(s.alphas_cumprod[int(s.timesteps[i])])
        eps = (x - jnp.sqrt(ac) * x0) / jnp.sqrt(1 - ac)
        key, sub = jax.random.split(key)
        x, _ = s.step(eps, i, x, key=sub)
    assert float(jnp.abs(x - x0).mean()) < 0.5


def test_zero_snr_rescale():
    from musev_tpu.schedulers import ScheduleConfig

    cfg = ScheduleConfig(rescale_betas_zero_snr=True, timestep_spacing="trailing")
    s = create_scheduler("ddim", 10, config=cfg)
    # terminal SNR must be ~0: alphas_cumprod[-1] ~ 0
    assert s.alphas_cumprod[-1] < 1e-6


def test_factory_rejects_unknown():
    with pytest.raises(ValueError):
        create_scheduler("nope", 10)


def test_all_have_protocol():
    for name in ["euler", "euler_ancestral", "ddim", "ddpm", "lcm", "dpmpp_2m"]:
        s = create_scheduler(name, 8)
        assert s.init_noise_sigma > 0
        assert len(s.timesteps) == 8
        x = jnp.ones(SHAPE)
        assert s.scale_model_input(x, 0).shape == SHAPE
        assert s.add_noise(x, x, 0).shape == SHAPE
