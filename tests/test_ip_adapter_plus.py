"""IP-Adapter-Plus (perceiver Resampler over patch tokens) end to end.

Reference: ip_adapter_loader.py:71-131 selects Resampler for model_name
"IPAdapterPlus"; configs/model/ip_adapter.py sets clip_extra_context_tokens=16.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from musev_tpu.configs.model_registry import get_model_preset
from musev_tpu.models.ip_adapter import ResamplerConfig, init_resampler, resampler


def _small_plus_preset():
    from musev_tpu.cli.text2video import _shrink_preset

    preset = _shrink_preset(get_model_preset("musev_referencenet"))
    preset.ip_adapter_model_name = "IPAdapterPlus"
    preset.ip_adapter_tokens = 16
    return preset


def _resampler_state_dict(cfg: ResamplerConfig, rng):
    """Synthetic torch-layout Resampler checkpoint ("image_proj" subdict)."""
    d, e, o = cfg.dim, cfg.embedding_dim, cfg.output_dim
    inner = d * cfg.ff_mult
    sd = {
        "latents": rng.randn(1, cfg.num_queries, d).astype(np.float32),
        "proj_in.weight": rng.randn(d, e).astype(np.float32),
        "proj_in.bias": rng.randn(d).astype(np.float32),
        "proj_out.weight": rng.randn(o, d).astype(np.float32),
        "proj_out.bias": rng.randn(o).astype(np.float32),
        "norm_out.weight": rng.randn(o).astype(np.float32),
        "norm_out.bias": rng.randn(o).astype(np.float32),
    }
    for i in range(cfg.depth):
        sd[f"layers.{i}.0.norm1.weight"] = rng.randn(d).astype(np.float32)
        sd[f"layers.{i}.0.norm1.bias"] = rng.randn(d).astype(np.float32)
        sd[f"layers.{i}.0.norm2.weight"] = rng.randn(d).astype(np.float32)
        sd[f"layers.{i}.0.norm2.bias"] = rng.randn(d).astype(np.float32)
        sd[f"layers.{i}.0.to_q.weight"] = rng.randn(d, d).astype(np.float32)
        sd[f"layers.{i}.0.to_kv.weight"] = rng.randn(2 * d, d).astype(np.float32)
        sd[f"layers.{i}.0.to_out.weight"] = rng.randn(d, d).astype(np.float32)
        sd[f"layers.{i}.1.0.weight"] = rng.randn(d).astype(np.float32)
        sd[f"layers.{i}.1.0.bias"] = rng.randn(d).astype(np.float32)
        sd[f"layers.{i}.1.1.weight"] = rng.randn(inner, d).astype(np.float32)
        sd[f"layers.{i}.1.3.weight"] = rng.randn(d, inner).astype(np.float32)
    return sd


def test_convert_resampler_full_load():
    from musev_tpu.models.sd_weights import convert_resampler

    cfg = ResamplerConfig(dim=24, depth=2, heads=4, num_queries=8,
                          embedding_dim=16, output_dim=32)
    params = init_resampler(jax.random.PRNGKey(0), cfg)
    sd = _resampler_state_dict(cfg, np.random.RandomState(0))
    n = convert_resampler(params, {"image_proj": sd})
    # every tensor assigned: latents(1) + proj_in(2) + proj_out(2) +
    # norm_out(2) + per layer: 2 norms(4) + q/kv/out(3) + ff ln(2)+ff(2)
    assert n == 7 + cfg.depth * 11
    np.testing.assert_array_equal(np.asarray(params["latents"]), sd["latents"][0])
    np.testing.assert_array_equal(
        np.asarray(params["layers"][1]["to_kv"]["kernel"]),
        sd["layers.1.0.to_kv.weight"].T,
    )
    # norm1 (torch, media) lands in our norm_media; norm2 in our norm1
    np.testing.assert_array_equal(
        np.asarray(params["layers"][0]["norm_media"]["scale"]),
        sd["layers.0.0.norm1.weight"],
    )
    out = resampler(params, cfg, jnp.asarray(
        np.random.RandomState(1).randn(2, 5, 16).astype(np.float32)))
    assert out.shape == (2, cfg.num_queries, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_plus_loader_builds_resampler(tmp_path):
    import torch

    from musev_tpu.pipelines.loader import build_models

    preset = _small_plus_preset()
    cfg = ResamplerConfig(
        dim=preset.unet_cfg.cross_attention_dim, depth=4, heads=12,
        num_queries=16, embedding_dim=preset.clip_vision_cfg.hidden_size,
        output_dim=preset.unet_cfg.cross_attention_dim,
    )
    sd = _resampler_state_dict(cfg, np.random.RandomState(0))
    ckpt = tmp_path / "ip-adapter-plus_sd15.bin"
    torch.save({"image_proj": {k: torch.from_numpy(v) for k, v in sd.items()}},
               str(ckpt))
    preset.ip_adapter_checkpoint = str(ckpt)
    models = build_models(preset)
    assert models.ip_proj_kind == "resampler"
    assert models.ip_resampler_cfg.num_queries == 16
    np.testing.assert_allclose(
        np.asarray(models.ip_proj_params["latents"]), sd["latents"][0],
        atol=1e-6,
    )


def test_plus_pipeline_tokens_change_output():
    """The Plus path produces (B, num_queries, cross_dim) tokens and the
    ip_adapter image actually changes the denoise output."""
    from musev_tpu.pipelines.loader import build_models
    from musev_tpu.pipelines.pipeline import MusevPipeline

    preset = _small_plus_preset()
    models = build_models(preset)
    pipe = MusevPipeline(models)

    img_a = (np.random.RandomState(0).rand(1, 32, 32, 3) * 255).astype(np.uint8)
    img_b = (np.random.RandomState(1).rand(1, 32, 32, 3) * 255).astype(np.uint8)
    cond = pipe._prepare_reference_conditioning(img_a, img_a)
    assert "vision_clip_emb" in cond
    clip = cond["vision_clip_emb"]  # [uncond; cond] halves stacked
    assert clip.shape == (2, 16, preset.unet_cfg.cross_attention_dim)

    kw = dict(
        video_length=4, height=32, width=32, context_frames=4,
        context_overlap=1, video_num_inference_steps=2, num_inference_steps=2,
        n_vision_condition=1, seed=3,
    )
    cond_img = (np.random.RandomState(2).rand(1, 1, 32, 32, 3) * 255).astype(np.uint8)
    a = pipe.text2video("x", condition_images=cond_img, ip_adapter_image=img_a, **kw)
    b = pipe.text2video("x", condition_images=cond_img, ip_adapter_image=img_b, **kw)
    assert np.abs(a.latents - b.latents).max() > 1e-6
