"""Round-2 parity fixes: strength start-step, refnet t=0, hist match,
serial denoise through drivers, batched v2v, videos_mid.

Reference semantics: pipeline_controlnet.py get_timesteps :1627-1641,
get_referencenet_emb :895-900, predictor.py hist match :745-750 and
serial-denoise carry :1262-1265.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from musev_tpu.models.clip_text import CLIPTextConfig, init_clip_text
from musev_tpu.models.unet3d import UNet3DConfig, init_unet3d
from musev_tpu.models.vae import VAEConfig, init_vae
from musev_tpu.ops.context import make_window_plan
from musev_tpu.ops.guidance import guidance_schedule
from musev_tpu.pipelines.denoiser import DenoiseSpec, denoise_loop, predict_noise
from musev_tpu.pipelines.pipeline import MusevModels, MusevPipeline
from musev_tpu.schedulers.euler_discrete import EulerDiscreteScheduler
from musev_tpu.utils.tokenizer import HashTokenizer


@pytest.fixture(scope="module")
def tiny_unet():
    cfg = UNet3DConfig(
        block_out_channels=(8, 8, 16, 16), layers_per_block=1,
        cross_attention_dim=16, attention_heads=4, norm_num_groups=4,
    )
    return init_unet3d(jax.random.PRNGKey(0), cfg), cfg


@pytest.fixture(scope="module")
def pipeline():
    unet_cfg = UNet3DConfig(
        block_out_channels=(8, 8, 16, 16), layers_per_block=1,
        cross_attention_dim=16, attention_heads=4, norm_num_groups=4,
    )
    vae_cfg = VAEConfig(block_out_channels=(8, 8, 16, 16), layers_per_block=1,
                        norm_num_groups=4)
    text_cfg = CLIPTextConfig(vocab_size=500, hidden_size=16, num_layers=1,
                              num_heads=4, intermediate_size=32)
    k = jax.random.PRNGKey(0)
    models = MusevModels(
        unet_params=init_unet3d(jax.random.fold_in(k, 0), unet_cfg),
        unet_cfg=unet_cfg,
        vae_params=init_vae(jax.random.fold_in(k, 1), vae_cfg),
        vae_cfg=vae_cfg,
        text_params=init_clip_text(jax.random.fold_in(k, 2), text_cfg),
        text_cfg=text_cfg,
        tokenizer=HashTokenizer(500),
    )
    return MusevPipeline(models)


def test_start_step_skips_early_steps(tiny_unet):
    """denoise_loop(start_step=s) must equal a manual scan over steps
    [s, N) with identical key threading — the img2img strength contract."""
    params, cfg = tiny_unet
    n_steps, start = 4, 2
    spec = DenoiseSpec(
        unet_cfg=cfg,
        scheduler=EulerDiscreteScheduler.create(n_steps),
        plan=make_window_plan(4, 4, context_overlap=0),
        guidance=guidance_schedule(3.5, n_steps),
        n_vision_cond=0,
        do_cfg=True,
        start_step=start,
    )
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 4, 4, 4))
    text = jax.random.normal(jax.random.PRNGKey(2), (1, 7, 16))
    key = jax.random.PRNGKey(3)
    out = denoise_loop(params, spec, lat, text, text, key)

    # manual replication of the scan body from step `start`
    k, cur = key, lat
    for i in range(start, n_steps):
        k, sub = jax.random.split(k)
        npred = predict_noise(params, spec, cur, i, text, text, None)
        cur, _ = spec.scheduler.step(
            npred, i, cur, key=sub,
            w_ind_noise=spec.w_ind_noise, noise_type=spec.noise_type,
        )
    # atol admits fp reassociation between the scanned fused-QKV matmul and
    # the eager replication (same math, different XLA tilings)
    np.testing.assert_allclose(np.asarray(out), np.asarray(cur), atol=2e-4)

    # and it must differ from denoising all N steps
    full = denoise_loop(
        params, dataclasses.replace(spec, start_step=0), lat, text, text, key
    )
    assert np.abs(np.asarray(out - full)).max() > 1e-6


def test_v2v_strength_truncates_schedule(pipeline):
    """strength<1 keeps the source video recognizable: lower strength ->
    output closer to the VAE round-trip of the source."""
    video = (np.random.RandomState(0).rand(4, 32, 32, 3) * 255).astype(np.uint8)
    kw = dict(time_size=4, context_frames=4, context_overlap=1,
              video_num_inference_steps=4, num_inference_steps=2,
              height=32, width=32, seed=1, n_vision_condition=0,
              need_video2video=True)
    weak = pipeline.video2video("x", video, video_strength=0.25, **kw)
    strong = pipeline.video2video("x", video, video_strength=1.0, **kw)
    src_lat = np.asarray(pipeline.encode_images(video[None]))
    d_weak = np.abs(weak.latents - src_lat).mean()
    d_strong = np.abs(strong.latents - src_lat).mean()
    assert d_weak < d_strong


def test_hist_match_wired(pipeline):
    cond = (np.random.RandomState(0).rand(1, 1, 32, 32, 3) * 255).astype(np.uint8)
    kw = dict(height=32, width=32, video_length=4, n_batch=1,
              video_num_inference_steps=2, num_inference_steps=2,
              context_frames=4, context_overlap=1,
              condition_images=cond, seed=3)
    plain = pipeline.text2video("a girl", **kw)
    matched = pipeline.text2video("a girl", need_hist_match=True, **kw)
    expect = pipeline._apply_hist_match(plain.videos)
    np.testing.assert_allclose(matched.videos, expect, atol=1e-6)
    # frame 0 untouched
    np.testing.assert_allclose(matched.videos[:, 0], plain.videos[:, 0])
    assert np.abs(matched.videos[:, 1:] - plain.videos[:, 1:]).max() > 0


def test_serial_denoise_carry_v2v(pipeline):
    video = (np.random.RandomState(1).rand(8, 32, 32, 3) * 255).astype(np.uint8)
    kw = dict(time_size=4, context_frames=4, context_overlap=1,
              video_num_inference_steps=2, num_inference_steps=2,
              height=32, width=32, seed=2, video_is_middle=True)
    base = pipeline.video2video("x", video, **kw)
    serial = pipeline.video2video(
        "x", video, record_mid_video=True, video_overlap=1, **kw
    )
    # mid carries recorded: (steps+1, B, overlap, h, w, 4)
    assert serial.mid_video_latents.shape == (3, 1, 1, 4, 4, 4)
    assert serial.mid_video_noises.shape == (3, 1, 1, 4, 4, 4)
    assert base.mid_video_latents is None
    # window 2 receives the carry -> its frames must change
    tail_base = base.latents[:, 5:]
    tail_serial = serial.latents[:, 5:]
    assert np.abs(tail_base - tail_serial).max() > 1e-6


def test_videos_mid_recorded(pipeline):
    cond = (np.random.RandomState(0).rand(1, 1, 32, 32, 3) * 255).astype(np.uint8)
    res = pipeline.text2video(
        "a girl", height=32, width=32, video_length=4, n_batch=1,
        video_num_inference_steps=2, num_inference_steps=2,
        context_frames=4, context_overlap=1, condition_images=cond,
        need_middle_latents=True, seed=3,
    )
    assert res.videos_mid is not None
    assert res.videos_mid.shape == (2, 1, 4, 32, 32, 3)
    assert np.isfinite(res.videos_mid).all()


def test_batched_v2v_shared_video(pipeline):
    video = (np.random.RandomState(3).rand(4, 32, 32, 3) * 255).astype(np.uint8)
    res = pipeline.video2video(
        ["a dancer", "a robot"], video, video_is_middle=True,
        time_size=4, context_frames=4, context_overlap=1,
        video_num_inference_steps=2, num_inference_steps=2,
        height=32, width=32, seed=4,
    )
    assert res.videos.shape == (2, 5, 32, 32, 3)
    # the two prompts must produce different videos
    assert np.abs(res.videos[0] - res.videos[1]).max() > 1e-4


def test_batched_v2v_batched_videos(pipeline):
    videos = (np.random.RandomState(4).rand(2, 4, 32, 32, 3) * 255).astype(np.uint8)
    res = pipeline.video2video(
        ["a dancer", "a robot"], videos, video_is_middle=True,
        time_size=4, context_frames=4, context_overlap=1,
        video_num_inference_steps=2, num_inference_steps=2,
        height=32, width=32, seed=4, n_vision_condition=0,
        need_video2video=True, video_strength=0.5,
    )
    assert res.videos.shape == (2, 4, 32, 32, 3)
    assert np.isfinite(res.videos).all()


def test_refnet_conditioning_runs_at_t0():
    """_prepare_reference_conditioning must evaluate ReferenceNet at
    timestep 0 with the cond text embeddings as fallback context
    (pipeline_controlnet.py:895-900)."""
    from musev_tpu.models.referencenet import (
        ReferenceNetConfig, init_referencenet, referencenet_apply,
    )
    from musev_tpu.models.unet3d import musev_referencenet_config

    ucfg = musev_referencenet_config(
        block_out_channels=(8, 8, 16, 16), layers_per_block=1,
        cross_attention_dim=16, attention_heads=4, norm_num_groups=4,
        ip_adapter_dim=16,
    )
    rcfg = ReferenceNetConfig(
        block_out_channels=(8, 8, 16, 16), layers_per_block=1,
        cross_attention_dim=16, attention_heads=4, norm_num_groups=4,
    )
    vae_cfg = VAEConfig(block_out_channels=(8, 8, 16, 16), layers_per_block=1,
                        norm_num_groups=4)
    text_cfg = CLIPTextConfig(vocab_size=500, hidden_size=16, num_layers=1,
                              num_heads=4, intermediate_size=32)
    k = jax.random.PRNGKey(0)
    models = MusevModels(
        unet_params=init_unet3d(jax.random.fold_in(k, 0), ucfg),
        unet_cfg=ucfg,
        vae_params=init_vae(jax.random.fold_in(k, 1), vae_cfg),
        vae_cfg=vae_cfg,
        text_params=init_clip_text(jax.random.fold_in(k, 2), text_cfg),
        text_cfg=text_cfg,
        tokenizer=HashTokenizer(500),
        referencenet_params=init_referencenet(jax.random.fold_in(k, 3), rcfg),
        referencenet_cfg=rcfg,
    )
    pipe = MusevPipeline(models)
    refer_image = (np.random.RandomState(0).rand(1, 32, 32, 3) * 255).astype(
        np.uint8
    )
    text_c = pipe.encode_prompt(["a girl"])
    out = pipe._prepare_reference_conditioning(refer_image, None, text_c)
    lat = pipe.encode_images(refer_image[:, None])[:, 0]
    down0, mid0, _ = referencenet_apply(
        models.referencenet_params, rcfg, lat, 0.0, text_c
    )
    np.testing.assert_allclose(
        np.asarray(out["mid_refer_emb"]), np.asarray(mid0), atol=1e-6
    )
    down999, _, _ = referencenet_apply(
        models.referencenet_params, rcfg, lat, 999.0, text_c
    )
    assert np.abs(np.asarray(out["refer_embs"][3] - down999[3])).max() > 1e-6


def test_multi_reference_images():
    """N refer/ip images: refnet treats them as N frames; clip tokens stack
    (reference get_referencenet_emb num_frames=n_refer_image,
    get_ip_adapter_image_emb; README multi-reference capability)."""
    from musev_tpu.models.clip_vision import CLIPVisionConfig, init_clip_vision
    from musev_tpu.models.ip_adapter import init_image_proj
    from musev_tpu.models.referencenet import (
        ReferenceNetConfig, init_referencenet,
    )
    from musev_tpu.models.unet3d import musev_referencenet_config

    ucfg = musev_referencenet_config(
        block_out_channels=(8, 8, 16, 16), layers_per_block=1,
        cross_attention_dim=16, attention_heads=4, norm_num_groups=4,
        ip_adapter_dim=16,
    )
    rcfg = ReferenceNetConfig(
        block_out_channels=(8, 8, 16, 16), layers_per_block=1,
        cross_attention_dim=16, attention_heads=4, norm_num_groups=4,
    )
    vcfg = CLIPVisionConfig(image_size=32, patch_size=8, hidden_size=16,
                            num_layers=1, num_heads=4, intermediate_size=32,
                            projection_dim=16)
    vae_cfg = VAEConfig(block_out_channels=(8, 8, 16, 16), layers_per_block=1,
                        norm_num_groups=4)
    text_cfg = CLIPTextConfig(vocab_size=500, hidden_size=16, num_layers=1,
                              num_heads=4, intermediate_size=32)
    k = jax.random.PRNGKey(0)
    models = MusevModels(
        unet_params=init_unet3d(jax.random.fold_in(k, 0), ucfg),
        unet_cfg=ucfg,
        vae_params=init_vae(jax.random.fold_in(k, 1), vae_cfg),
        vae_cfg=vae_cfg,
        text_params=init_clip_text(jax.random.fold_in(k, 2), text_cfg),
        text_cfg=text_cfg,
        tokenizer=HashTokenizer(500),
        referencenet_params=init_referencenet(jax.random.fold_in(k, 3), rcfg),
        referencenet_cfg=rcfg,
        clip_vision_params=init_clip_vision(jax.random.fold_in(k, 4), vcfg),
        clip_vision_cfg=vcfg,
        ip_proj_params=init_image_proj(
            jax.random.fold_in(k, 5), clip_dim=16, cross_dim=16, num_tokens=4
        ),
    )
    pipe = MusevPipeline(models)
    imgs = (np.random.RandomState(0).rand(1, 2, 32, 32, 3) * 255).astype(
        np.uint8
    )  # (B=1, N=2 references)
    text_c = pipe.encode_prompt(["a girl"])
    out = pipe._prepare_reference_conditioning(imgs, imgs, text_c)
    assert out["refer_embs"][0].shape[1] == 2  # N axis preserved
    assert out["mid_refer_emb"].shape[1] == 2
    # 2 images x 4 tokens = 8 IP tokens per CFG half
    assert out["vision_clip_emb"].shape == (2, 8, 16)
    # end to end through the driver with multi-reference lists
    res = pipe.text2video(
        "a girl", height=32, width=32, video_length=4, n_batch=1,
        video_num_inference_steps=2, num_inference_steps=2,
        context_frames=4, context_overlap=1, seed=1,
        condition_images=(np.random.RandomState(1).rand(1, 1, 32, 32, 3)
                          * 255).astype(np.uint8),
        refer_image=imgs, ip_adapter_image=imgs,
    )
    assert res.videos.shape == (1, 5, 32, 32, 3)
    assert np.isfinite(res.videos).all()


def test_redraw_condition_image(pipeline):
    """Phase-1 redraw: condition image is img2img'd first; the redrawn frame
    must differ from the input but keep its structure at low strength."""
    cond = (np.random.RandomState(5).rand(1, 1, 32, 32, 3) * 255).astype(
        np.uint8
    )
    kw = dict(height=32, width=32, video_length=4, n_batch=1,
              video_num_inference_steps=2, num_inference_steps=4,
              context_frames=4, context_overlap=1,
              condition_images=cond, seed=6)
    plain = pipeline.text2video("a girl", **kw)
    redrawn = pipeline.text2video(
        "a girl", redraw_condition_image=True, redraw_strength=0.5, **kw
    )
    # the condition frame (index 0) changed because it was redrawn
    assert np.abs(plain.videos[:, 0] - redrawn.videos[:, 0]).max() > 1e-4
    assert np.isfinite(redrawn.videos).all()

    direct = pipeline.redraw_condition_images(
        cond, pipeline.encode_prompt(["a girl"]),
        pipeline.encode_prompt([""]), jax.random.PRNGKey(0),
        strength=0.25, num_inference_steps=4,
    )
    assert direct.shape == (1, 1, 32, 32, 3)
    # low strength keeps the redrawn image closer to the input than high
    direct_hi = pipeline.redraw_condition_images(
        cond, pipeline.encode_prompt(["a girl"]),
        pipeline.encode_prompt([""]), jax.random.PRNGKey(0),
        strength=1.0, num_inference_steps=4,
    )
    d_lo = np.abs(direct - cond.astype(np.float32)).mean()
    d_hi = np.abs(direct_hi - cond.astype(np.float32)).mean()
    assert d_lo < d_hi
