import jax
import jax.numpy as jnp
import numpy as np
import pytest

from musev_tpu.schedulers.base import ScheduleConfig, make_betas, spaced_timesteps
from musev_tpu.schedulers.euler_discrete import EulerDiscreteScheduler


def test_betas_scaled_linear():
    betas = make_betas(1000, 0.00085, 0.012, "scaled_linear")
    assert betas[0] == pytest.approx(0.00085)
    assert betas[-1] == pytest.approx(0.012)
    assert np.all(np.diff(betas) > 0)


def test_timesteps_linspace():
    ts = spaced_timesteps(1000, 10, "linspace")
    assert ts[0] == 999.0 and ts[-1] == 0.0
    assert len(ts) == 10


def test_euler_sigmas_monotone():
    s = EulerDiscreteScheduler.create(10)
    assert s.sigmas[-1] == 0.0
    assert np.all(np.diff(s.sigmas) <= 0)
    assert s.init_noise_sigma == pytest.approx(
        float(np.sqrt(s.sigmas.max() ** 2 + 1))
    )


def test_euler_step_matches_manual():
    """gamma=0 Euler step: prev = x + (x - (x - sigma*eps))/sigma * (s1 - s0)."""
    s = EulerDiscreteScheduler.create(4)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 2, 4, 4, 1), jnp.float32)
    eps = jnp.asarray(np.random.RandomState(1).randn(1, 2, 4, 4, 1), jnp.float32)
    prev, pred0 = s.step(eps, 0, x)
    sigma0, sigma1 = float(s.sigmas[0]), float(s.sigmas[1])
    expect_pred0 = np.asarray(x) - sigma0 * np.asarray(eps)
    expect_prev = np.asarray(x) + np.asarray(eps) * (sigma1 - sigma0)
    np.testing.assert_allclose(np.asarray(pred0), expect_pred0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(prev), expect_prev, rtol=1e-4, atol=1e-5)


def test_euler_denoises_to_x0_many_steps():
    """Integrating the ODE with the true eps(x) = (x - x0)/sigma recovers x0."""
    s = EulerDiscreteScheduler.create(50)
    x0 = jnp.asarray(np.random.RandomState(2).randn(1, 1, 4, 4, 1), jnp.float32)
    noise = jnp.asarray(np.random.RandomState(3).randn(1, 1, 4, 4, 1), jnp.float32)
    x = x0 + noise * float(s.sigmas[0])
    for i in range(50):
        sigma = float(s.sigmas[i])
        eps = (x - x0) / sigma
        x, _ = s.step(eps, i, x)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=1e-3)


def test_scale_model_input():
    s = EulerDiscreteScheduler.create(4)
    x = jnp.ones((1, 1, 2, 2, 1))
    y = s.scale_model_input(x, 0)
    assert float(y[0, 0, 0, 0, 0]) == pytest.approx(
        1.0 / np.sqrt(float(s.sigmas[0]) ** 2 + 1), rel=1e-5
    )


def test_add_noise():
    s = EulerDiscreteScheduler.create(4)
    x0 = jnp.zeros((1, 1, 2, 2, 1))
    n = jnp.ones((1, 1, 2, 2, 1))
    y = s.add_noise(x0, n, 2)
    assert float(y[0, 0, 0, 0, 0]) == pytest.approx(float(s.sigmas[2]), rel=1e-5)
