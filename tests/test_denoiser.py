import jax
import jax.numpy as jnp
import numpy as np
import pytest

from musev_tpu.models.unet3d import UNet3DConfig, init_unet3d
from musev_tpu.ops.context import make_window_plan
from musev_tpu.ops.guidance import guidance_schedule
from musev_tpu.pipelines.denoiser import (
    DenoiseSpec,
    denoise_loop,
    predict_noise,
    splice_condition_frames,
)
from musev_tpu.schedulers.euler_discrete import EulerDiscreteScheduler

CFG = UNet3DConfig(
    block_out_channels=(16, 16, 32, 32),
    layers_per_block=1,
    cross_attention_dim=16,
    attention_heads=4,
    norm_num_groups=8,
)


@pytest.fixture(scope="module")
def params():
    return init_unet3d(jax.random.PRNGKey(0), CFG)


def make_spec(t, w, overlap, steps=2, n_vc=0, do_cfg=True):
    return DenoiseSpec(
        unet_cfg=CFG,
        scheduler=EulerDiscreteScheduler.create(steps),
        plan=make_window_plan(t, w, context_overlap=overlap),
        guidance=guidance_schedule(3.5, steps),
        n_vision_cond=n_vc,
        do_cfg=do_cfg,
        noise_type="video_fusion",
    )


def test_denoise_loop_shapes(params):
    spec = make_spec(t=8, w=4, overlap=2, steps=2, n_vc=1)
    b, h, w_, c = 1, 4, 4, 4
    lat = jax.random.normal(jax.random.PRNGKey(1), (b, 8, h, w_, c))
    cond = jax.random.normal(jax.random.PRNGKey(2), (b, 1, h, w_, c))
    tu = jax.random.normal(jax.random.PRNGKey(3), (b, 5, 16))
    tc = jax.random.normal(jax.random.PRNGKey(4), (b, 5, 16))
    out = denoise_loop(
        params, spec, lat, tu, tc, jax.random.PRNGKey(5), condition_latents=cond
    )
    assert out.shape == lat.shape
    assert bool(jnp.isfinite(out).all())
    full = splice_condition_frames(out, cond, 1)
    assert full.shape == (b, 9, h, w_, c)


def test_nonoverlapping_windows_equal_independent_runs(params):
    """With overlap=0 the batched-window VCPD step must equal denoising each
    window separately (the overlap-average is the only coupling)."""
    b, h, w_, c = 1, 4, 4, 4
    steps = 2
    lat = jax.random.normal(jax.random.PRNGKey(1), (b, 8, h, w_, c))
    cond = jax.random.normal(jax.random.PRNGKey(2), (b, 1, h, w_, c))
    tu = jax.random.normal(jax.random.PRNGKey(3), (b, 5, 16))
    tc = jax.random.normal(jax.random.PRNGKey(4), (b, 5, 16))
    key = jax.random.PRNGKey(5)

    spec_full = make_spec(t=8, w=4, overlap=0, steps=steps, n_vc=1)
    assert spec_full.plan.n_windows == 2
    out_full = denoise_loop(
        params, spec_full, lat, tu, tc, key, condition_latents=cond
    )

    spec_single = make_spec(t=4, w=4, overlap=0, steps=steps, n_vc=1)
    out_a = denoise_loop(
        params, spec_single, lat[:, :4], tu, tc, key, condition_latents=cond
    )
    out_b = denoise_loop(
        params, spec_single, lat[:, 4:], tu, tc, key, condition_latents=cond
    )
    np.testing.assert_allclose(
        np.asarray(out_full[:, :4]), np.asarray(out_a), atol=1e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out_full[:, 4:]), np.asarray(out_b), atol=1e-4, rtol=1e-3
    )


def test_overlap_average_counts(params):
    """predict_noise divides accumulated window outputs by coverage counts —
    every frame's prediction magnitude should be count-independent."""
    spec = make_spec(t=6, w=4, overlap=2, steps=2, n_vc=0, do_cfg=False)
    b, h, w_, c = 1, 4, 4, 4
    lat = jax.random.normal(jax.random.PRNGKey(1), (b, 6, h, w_, c))
    tc = jax.random.normal(jax.random.PRNGKey(4), (b, 5, 16))
    out = predict_noise(params, spec, lat, 0, None, tc)
    assert out.shape == lat.shape
    assert bool(jnp.isfinite(out).all())
    # overlapped frames are averages, so magnitudes stay comparable
    mags = np.abs(np.asarray(out)).mean(axis=(0, 2, 3, 4))
    assert mags.max() / mags.min() < 10.0


def test_rescale_noise_cfg_math():
    """rescale=1 restores the text prediction's per-sample std exactly;
    rescale=0 is the identity (arXiv:2305.08891 eq. 15-16)."""
    from musev_tpu.utils.image_util import rescale_noise_cfg

    k = jax.random.PRNGKey(0)
    text = jax.random.normal(k, (2, 4, 4, 4, 4))
    cfg_pred = 7.5 * text - 6.5 * jax.random.normal(jax.random.fold_in(k, 1), text.shape)
    out0 = rescale_noise_cfg(cfg_pred, text, 0.0)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(cfg_pred))
    out1 = rescale_noise_cfg(cfg_pred, text, 1.0)
    std_t = np.std(np.asarray(text), axis=(1, 2, 3, 4))
    std_o = np.std(np.asarray(out1), axis=(1, 2, 3, 4))
    np.testing.assert_allclose(std_o, std_t, rtol=1e-5)


def test_guidance_rescale_changes_prediction(params):
    """guidance_rescale > 0 must alter the combined CFG prediction (the
    reference defines rescale_noise_cfg but never wires it — here it is a
    live DenoiseSpec field)."""
    import dataclasses

    spec = make_spec(t=4, w=4, overlap=0, steps=2, n_vc=0, do_cfg=True)
    b, h, w_, c = 1, 4, 4, 4
    lat = jax.random.normal(jax.random.PRNGKey(1), (b, 4, h, w_, c))
    tu = jax.random.normal(jax.random.PRNGKey(3), (b, 5, 16))
    tc = jax.random.normal(jax.random.PRNGKey(4), (b, 5, 16))
    base = predict_noise(params, spec, lat, 0, tu, tc)
    spec_r = dataclasses.replace(spec, guidance_rescale=0.7)
    resc = predict_noise(params, spec_r, lat, 0, tu, tc)
    assert not np.allclose(np.asarray(base), np.asarray(resc))
    assert bool(jnp.isfinite(resc).all())
