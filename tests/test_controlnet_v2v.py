import jax
import jax.numpy as jnp
import numpy as np
import pytest

from musev_tpu.models.clip_text import CLIPTextConfig, init_clip_text
from musev_tpu.models.controlnet import (
    ControlNetConfig,
    controlnet_apply,
    init_controlnet,
    init_pose_guider,
    pose_guider_apply,
)
from musev_tpu.models.unet3d import UNet3DConfig, init_unet3d
from musev_tpu.models.vae import VAEConfig, init_vae
from musev_tpu.pipelines.pipeline import MusevModels, MusevPipeline
from musev_tpu.utils.tokenizer import HashTokenizer

CN_CFG = ControlNetConfig(
    block_out_channels=(8, 8, 16, 16), cond_embed_channels=(4, 8, 8, 8),
    layers_per_block=2, cross_attention_dim=16, attention_heads=4,
    norm_num_groups=4,
)


def test_controlnet_shapes_and_zero_init():
    params = init_controlnet(jax.random.PRNGKey(0), CN_CFG)
    sample = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    text = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 16))
    cond = jax.random.normal(jax.random.PRNGKey(3), (2, 64, 64, 3))
    down, mid = controlnet_apply(params, CN_CFG, sample, 100.0, text, cond)
    assert len(down) == 12
    assert down[0].shape == (2, 8, 8, 8)
    assert mid.shape == (2, 1, 1, 16)
    # zero-init residual taps: all outputs exactly zero at init
    for r in down:
        assert float(jnp.abs(r).max()) == 0.0
    assert float(jnp.abs(mid).max()) == 0.0


def test_pose_guider():
    params = init_pose_guider(jax.random.PRNGKey(0), CN_CFG)
    cond = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    out = pose_guider_apply(params, cond)
    assert out.shape == (2, 8, 8, 8)


@pytest.fixture(scope="module")
def cn_pipeline():
    unet_cfg = UNet3DConfig(
        block_out_channels=(8, 8, 16, 16), layers_per_block=2,
        cross_attention_dim=16, attention_heads=4, norm_num_groups=4,
    )
    vae_cfg = VAEConfig(block_out_channels=(8, 8, 16, 16), layers_per_block=1,
                        norm_num_groups=4)
    text_cfg = CLIPTextConfig(vocab_size=500, hidden_size=16, num_layers=1,
                              num_heads=4, intermediate_size=32)
    k = jax.random.PRNGKey(0)
    cn_params = init_controlnet(jax.random.fold_in(k, 3), CN_CFG)
    # perturb the zero-init taps AND the conditioning stem's zero-init
    # conv_out so control actually does something at random init
    for zc in cn_params["zero_convs"]:
        zc["kernel"] = jax.random.normal(jax.random.PRNGKey(9), zc["kernel"].shape) * 0.05
    ce_out = cn_params["cond_embedding"]["conv_out"]
    ce_out["kernel"] = jax.random.normal(jax.random.PRNGKey(8), ce_out["kernel"].shape) * 0.05
    models = MusevModels(
        unet_params=init_unet3d(jax.random.fold_in(k, 0), unet_cfg),
        unet_cfg=unet_cfg,
        vae_params=init_vae(jax.random.fold_in(k, 1), vae_cfg),
        vae_cfg=vae_cfg,
        text_params=init_clip_text(jax.random.fold_in(k, 2), text_cfg),
        text_cfg=text_cfg,
        tokenizer=HashTokenizer(500),
        controlnet_params=cn_params,
        controlnet_cfg=CN_CFG,
    )
    return MusevPipeline(models)


def test_video2video_pose(cn_pipeline):
    video = (np.random.RandomState(0).rand(8, 32, 32, 3) * 255).astype(np.uint8)
    res = cn_pipeline.video2video(
        "a dancer", video, video_is_middle=True,
        time_size=4, context_frames=4, context_overlap=1,
        video_num_inference_steps=2, num_inference_steps=2,
        height=32, width=32,
    )
    # 2 shots of 4 + 1 condition frame
    assert res.videos.shape == (1, 9, 32, 32, 3)
    assert np.isfinite(res.videos).all()


def test_video2video_control_changes_output(cn_pipeline):
    video = (np.random.RandomState(0).rand(4, 32, 32, 3) * 255).astype(np.uint8)
    kw = dict(video_is_middle=True, time_size=4, context_frames=4,
              context_overlap=1, video_num_inference_steps=2,
              num_inference_steps=2, height=32, width=32, seed=1)
    a = cn_pipeline.video2video("x", video, **kw)
    b = cn_pipeline.video2video("x", np.zeros_like(video), **kw)
    assert np.abs(a.latents - b.latents).max() > 1e-6


def test_video2video_partial_tail_window(cn_pipeline):
    """A source not divisible by time_size keeps its tail frames (the old
    behavior silently dropped up to time_size-1 frames)."""
    video = (np.random.RandomState(1).rand(6, 32, 32, 3) * 255).astype(np.uint8)
    res = cn_pipeline.video2video(
        "a dancer", video, video_is_middle=True,
        time_size=4, context_frames=4, context_overlap=1,
        video_num_inference_steps=2, num_inference_steps=2,
        height=32, width=32,
    )
    # 4 + 2 generated + 1 condition frame
    assert res.videos.shape == (1, 7, 32, 32, 3)
    assert np.isfinite(res.videos).all()


def test_video2video_short_source(cn_pipeline):
    """Source shorter than time_size runs as one small window."""
    video = (np.random.RandomState(2).rand(3, 32, 32, 3) * 255).astype(np.uint8)
    res = cn_pipeline.video2video(
        "a dancer", video, video_is_middle=True,
        time_size=4, context_frames=4, context_overlap=1,
        video_num_inference_steps=2, num_inference_steps=2,
        height=32, width=32,
    )
    assert res.videos.shape == (1, 4, 32, 32, 3)


def test_video2video_validations(cn_pipeline):
    video = (np.random.RandomState(3).rand(4, 32, 32, 3) * 255).astype(np.uint8)
    with pytest.raises(ValueError, match="negative_prompt batch"):
        cn_pipeline.video2video(
            ["a", "b"], video, negative_prompt=["x", "y", "z"],
            video_is_middle=True, time_size=4, context_frames=4,
            context_overlap=1, video_num_inference_steps=2,
            num_inference_steps=2, height=32, width=32,
        )
    with pytest.raises(ValueError, match="no frames"):
        cn_pipeline.video2video(
            "a", iter([]), video_is_middle=True, time_size=4,
            context_frames=4, context_overlap=1,
            video_num_inference_steps=2, num_inference_steps=2,
            height=32, width=32,
        )


@pytest.fixture(scope="module")
def pg_pipeline():
    """Pipeline with ONLY a PoseGuider (no controlnet), zero-init conv_out
    perturbable per test via params mutation."""
    unet_cfg = UNet3DConfig(
        block_out_channels=(8, 8, 16, 16), layers_per_block=2,
        cross_attention_dim=16, attention_heads=4, norm_num_groups=4,
    )
    vae_cfg = VAEConfig(block_out_channels=(8, 8, 16, 16), layers_per_block=1,
                        norm_num_groups=4)
    text_cfg = CLIPTextConfig(vocab_size=500, hidden_size=16, num_layers=1,
                              num_heads=4, intermediate_size=32)
    k = jax.random.PRNGKey(0)
    pg_params = init_pose_guider(jax.random.fold_in(k, 3), CN_CFG)
    models = MusevModels(
        unet_params=init_unet3d(jax.random.fold_in(k, 0), unet_cfg),
        unet_cfg=unet_cfg,
        vae_params=init_vae(jax.random.fold_in(k, 1), vae_cfg),
        vae_cfg=vae_cfg,
        text_params=init_clip_text(jax.random.fold_in(k, 2), text_cfg),
        text_cfg=text_cfg,
        tokenizer=HashTokenizer(500),
        pose_guider_params=pg_params,
        pose_guider_cfg=CN_CFG,
    )
    return MusevPipeline(models)


def test_pose_guider_zero_init_is_identity(pg_pipeline):
    """At init the PoseGuider's conv_out is zero, so its post-conv_in add is
    the identity: output equals a pipeline with no pose guider at all
    (reference zero_module, musev/models/controlnet.py:352-359)."""
    video = (np.random.RandomState(0).rand(4, 32, 32, 3) * 255).astype(np.uint8)
    kw = dict(video_is_middle=True, time_size=4, context_frames=4,
              context_overlap=1, video_num_inference_steps=2,
              num_inference_steps=2, height=32, width=32, seed=1)
    with_pg = pg_pipeline.video2video("x", video, **kw)
    saved = pg_pipeline.m.pose_guider_params
    pg_pipeline.m.pose_guider_params = None
    try:
        without = pg_pipeline.video2video("x", video, **kw)
    finally:
        pg_pipeline.m.pose_guider_params = saved
    np.testing.assert_allclose(with_pg.latents, without.latents, atol=1e-6)


def test_pose_guider_changes_output_when_nonzero(pg_pipeline):
    video = (np.random.RandomState(0).rand(4, 32, 32, 3) * 255).astype(np.uint8)
    kw = dict(video_is_middle=True, time_size=4, context_frames=4,
              context_overlap=1, video_num_inference_steps=2,
              num_inference_steps=2, height=32, width=32, seed=1)
    base = pg_pipeline.video2video("x", video, **kw)
    co = pg_pipeline.m.pose_guider_params["conv_out"]
    saved = co["kernel"]
    co["kernel"] = jax.random.normal(jax.random.PRNGKey(7), saved.shape) * 0.05
    try:
        perturbed = pg_pipeline.video2video("x", video, **kw)
    finally:
        co["kernel"] = saved
    assert np.abs(perturbed.latents - base.latents).max() > 1e-6
    # and the control image content matters (not just a constant shift)
    co["kernel"] = jax.random.normal(jax.random.PRNGKey(7), saved.shape) * 0.05
    try:
        other = pg_pipeline.video2video("x", np.zeros_like(video), **kw)
    finally:
        co["kernel"] = saved
    assert np.abs(perturbed.latents - other.latents).max() > 1e-6


def test_convert_pose_guider_weights():
    """Torch InflatedConv3d checkpoint (O, I, 1, kH, kW) loads exactly."""
    from musev_tpu.models.sd_weights import convert_pose_guider

    params = init_pose_guider(jax.random.PRNGKey(0), CN_CFG)
    rng = np.random.RandomState(0)
    sd = {}

    def fake(name, o, i, k=3):
        sd[f"{name}.weight"] = rng.randn(o, i, 1, k, k).astype(np.float32)
        sd[f"{name}.bias"] = rng.randn(o).astype(np.float32)

    ce = CN_CFG.cond_embed_channels
    fake("conv_in", ce[0], 3)
    for j in range(len(ce) - 1):
        fake(f"blocks.{2 * j}", ce[j], ce[j])
        fake(f"blocks.{2 * j + 1}", ce[j + 1], ce[j])
    fake("conv_out", CN_CFG.block_out_channels[0], ce[-1])
    n, leftover = convert_pose_guider(params, CN_CFG, sd)
    assert n == 2 * (2 + 2 * (len(ce) - 1))
    assert leftover == []
    np.testing.assert_array_equal(
        np.asarray(params["conv_in"]["kernel"]),
        sd["conv_in.weight"][:, :, 0].transpose(2, 3, 1, 0),
    )


def test_v2v_processor_runs_prefetched_and_deterministic(cn_pipeline):
    """The controlnet processor now runs inside the prefetch worker; the
    maps it produces must be exactly the windows' frames (order preserved)
    and the pipeline result must be deterministic across runs."""
    import threading

    video = (np.random.RandomState(5).rand(8, 32, 32, 3) * 255).astype(np.uint8)
    calls = []

    def proc(frames):
        calls.append(
            (threading.current_thread() is threading.main_thread(),
             np.asarray(frames).copy())
        )
        return 255 - np.asarray(frames)

    kw = dict(time_size=4, context_frames=4, context_overlap=1,
              video_num_inference_steps=2, num_inference_steps=2,
              height=32, width=32, seed=2, controlnet_processor=proc)
    a = cn_pipeline.video2video("x", video, **kw)
    # processor saw both windows' frames, in order, off the main thread
    assert len(calls) == 2
    assert not any(on_main for on_main, _ in calls)
    np.testing.assert_array_equal(calls[0][1], video[:4])
    np.testing.assert_array_equal(calls[1][1], video[4:])
    b = cn_pipeline.video2video("x", video, **kw)
    np.testing.assert_array_equal(a.latents, b.latents)
    # and the maps actually conditioned the run (differ from identity maps)
    c = cn_pipeline.video2video(
        "x", video, **{**kw, "controlnet_processor": lambda f: np.asarray(f)}
    )
    assert np.abs(a.latents - c.latents).max() > 1e-6
