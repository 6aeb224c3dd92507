import jax
import jax.numpy as jnp
import numpy as np
import pytest

from musev_tpu.ops import adain, noise


def test_video_fusion_noise_stats():
    key = jax.random.PRNGKey(0)
    shape = (4, 16, 8, 8, 4)
    w = 0.5
    x = noise.video_fusion_noise(key, shape, w_ind_noise=w)
    x = np.asarray(x)
    # unit marginal variance: var = (1-w) + w = 1
    assert np.abs(x.std() - 1.0) < 0.02
    # temporal correlation: corr(frame_i, frame_j) = 1 - w
    flat = x.reshape(4, 16, -1)
    corr = np.mean(
        [
            np.corrcoef(flat[b, 0].ravel(), flat[b, 8].ravel())[0, 1]
            for b in range(4)
        ]
    )
    assert corr == pytest.approx(1.0 - w, abs=0.05)


def test_video_fusion_noise_w1_is_iid():
    key = jax.random.PRNGKey(1)
    x = np.asarray(noise.video_fusion_noise(key, (2, 8, 8, 8, 4), w_ind_noise=1.0))
    flat = x.reshape(2, 8, -1)
    corr = np.corrcoef(flat[0, 0].ravel(), flat[0, 4].ravel())[0, 1]
    assert abs(corr) < 0.1


def test_video_fusion_initial_common_noise():
    key = jax.random.PRNGKey(2)
    shape = (1, 4, 4, 4, 2)
    common = jnp.ones((1, 1, 4, 4, 2))
    x = noise.video_fusion_noise(
        key, shape, w_ind_noise=0.0, initial_common_noise=common
    )
    np.testing.assert_allclose(np.asarray(x), np.ones(shape), atol=1e-5)


def test_make_noise_dispatch():
    key = jax.random.PRNGKey(3)
    a = noise.make_noise(key, (1, 2, 4, 4, 1), noise_type="random")
    b = noise.make_noise(key, (1, 2, 4, 4, 1), noise_type="video_fusion")
    assert a.shape == b.shape
    with pytest.raises(ValueError):
        noise.make_noise(key, (1,), noise_type="bogus")


def test_adain_matches_stats():
    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.randn(2, 4, 8, 8, 3).astype(np.float32) * 3 + 1)
    dst = jnp.asarray(rng.randn(2, 2, 8, 8, 3).astype(np.float32) * 0.5 - 2)
    out = np.asarray(adain.adain(src, dst))
    # per (b, c) stats of out match dst
    for b in range(2):
        for c in range(3):
            assert out[b, ..., c].mean() == pytest.approx(
                np.asarray(dst)[b, ..., c].mean(), abs=1e-2
            )
            assert out[b, ..., c].std() == pytest.approx(
                np.asarray(dst)[b, ..., c].std(), rel=2e-2
            )


def test_adain_to_condition_frames_keeps_condition():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 5, 4, 4, 2).astype(np.float32))
    out = adain.adain_to_condition_frames(x, gen_index=[1, 2, 3, 4], cond_index=[0])
    np.testing.assert_allclose(
        np.asarray(out)[:, 0], np.asarray(x)[:, 0], rtol=1e-5
    )
