import jax
import jax.numpy as jnp
import numpy as np
import pytest

from musev_tpu.models.unet3d import (
    UNet3DConfig,
    init_unet3d,
    musev_config,
    musev_referencenet_config,
    unet3d_apply,
)

TINY = UNet3DConfig(
    block_out_channels=(32, 32, 64, 64),
    layers_per_block=2,
    cross_attention_dim=32,
    attention_heads=4,
    norm_num_groups=8,
)


@pytest.fixture(scope="module")
def tiny_params():
    return init_unet3d(jax.random.PRNGKey(0), TINY)


def _run(params, cfg, b=1, t=4, hw=16, **kw):
    sample = jax.random.normal(jax.random.PRNGKey(1), (b, t, hw // 8, hw // 8, 4))
    text = jax.random.normal(jax.random.PRNGKey(2), (b, 7, cfg.cross_attention_dim))
    return unet3d_apply(params, cfg, sample, jnp.asarray(500.0), text, **kw)


def test_forward_shape_and_finite(tiny_params):
    out = _run(tiny_params, TINY, b=1, t=4, hw=32)
    assert out.shape == (1, 4, 4, 4, 4)
    assert bool(jnp.isfinite(out).all())


def test_vision_condition_splice(tiny_params):
    b, t_gen, n_vc = 1, 3, 1
    sample = jax.random.normal(jax.random.PRNGKey(1), (b, t_gen, 4, 4, 4))
    cond = jax.random.normal(jax.random.PRNGKey(3), (b, n_vc, 4, 4, 4))
    text = jax.random.normal(jax.random.PRNGKey(2), (b, 7, 32))
    out = unet3d_apply(
        tiny_params, TINY, sample, jnp.asarray(100.0), text,
        condition_latents=cond, cond_index=(0,), gen_index=(1, 2, 3),
    )
    assert out.shape == (b, t_gen + n_vc, 4, 4, 4)
    assert bool(jnp.isfinite(out).all())


def test_skip_temporal_equals_2d_unet(tiny_params):
    """skip_temporal=True must reduce the 3D UNet to a per-frame 2D UNet
    (reference set_skip_temporal_layers, unet_3d_condition.py:1639-1661)."""
    cfg = TINY
    b, t = 1, 3
    sample = jax.random.normal(jax.random.PRNGKey(4), (b, t, 4, 4, 4))
    text = jax.random.normal(jax.random.PRNGKey(5), (b, 7, 32))
    out_video = unet3d_apply(
        tiny_params, cfg, sample, jnp.asarray(10.0), text, skip_temporal=True
    )
    # frame-by-frame as single images
    outs = [
        unet3d_apply(
            tiny_params, cfg, sample[:, i : i + 1], jnp.asarray(10.0), text,
            skip_temporal=True,
        )
        for i in range(t)
    ]
    per_frame = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(
        np.asarray(out_video), np.asarray(per_frame), atol=2e-4, rtol=1e-3
    )


def test_temporal_layers_near_identity_at_init(tiny_params):
    """zero-init temporal out-projections + 1e-5 temporal_weight: video
    forward ~= 2D forward at init (resnet.py:83-92, temporal_transformer.py:186)."""
    cfg = TINY
    sample = jax.random.normal(jax.random.PRNGKey(4), (1, 2, 4, 4, 4))
    text = jax.random.normal(jax.random.PRNGKey(5), (1, 7, 32))
    a = unet3d_apply(tiny_params, cfg, sample, jnp.asarray(10.0), text)
    b_ = unet3d_apply(
        tiny_params, cfg, sample, jnp.asarray(10.0), text, skip_temporal=True
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-3)


def test_cfg_batch_halves(tiny_params):
    """With do_cfg, uncond half must ignore condition frames entirely."""
    cfg = TINY
    b, t_gen = 2, 3  # [uncond; cond]
    sample = jax.random.normal(jax.random.PRNGKey(6), (1, t_gen, 4, 4, 4))
    sample2 = jnp.concatenate([sample, sample])
    cond = jax.random.normal(jax.random.PRNGKey(7), (1, 1, 4, 4, 4))
    cond2 = jnp.concatenate([cond, cond])
    text = jax.random.normal(jax.random.PRNGKey(8), (b, 7, 32))
    out = unet3d_apply(
        tiny_params, cfg, sample2, jnp.asarray(100.0), text,
        condition_latents=cond2, cond_index=(0,), gen_index=(1, 2, 3),
        do_cfg=True,
    )
    # change the condition latents only -> uncond half's *generated* frames
    # response differs only through the spliced condition frames' own rows
    cond_b = jnp.concatenate([cond * 0 + 5.0, cond * 0 + 5.0])
    out_b = unet3d_apply(
        tiny_params, cfg, sample2, jnp.asarray(100.0), text,
        condition_latents=cond_b, cond_index=(0,), gen_index=(1, 2, 3),
        do_cfg=True,
    )
    # cond half generated frames DO depend on condition latents (reference attn)
    diff_cond = np.abs(
        np.asarray(out[1:, 1:] - out_b[1:, 1:])
    ).max()
    assert diff_cond > 1e-6


def test_musev_referencenet_preset_runs():
    cfg = musev_referencenet_config(
        block_out_channels=(32, 32, 64, 64),
        layers_per_block=2,
        cross_attention_dim=32,
        attention_heads=4,
        norm_num_groups=8,
    )
    params = init_unet3d(jax.random.PRNGKey(0), cfg)
    out = _run(params, cfg, b=1, t=2, hw=32)
    assert out.shape == (1, 2, 4, 4, 4)
    assert bool(jnp.isfinite(out).all())


def test_presets():
    assert musev_config().need_transformer_in
    assert not musev_referencenet_config().need_transformer_in
    assert musev_referencenet_config().keep_vision_condition
