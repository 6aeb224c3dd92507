import jax
import jax.numpy as jnp
import numpy as np
import pytest

from musev_tpu.models.clip_text import CLIPTextConfig, init_clip_text
from musev_tpu.models.unet3d import UNet3DConfig, init_unet3d
from musev_tpu.models.vae import VAEConfig, init_vae
from musev_tpu.pipelines.pipeline import MusevModels, MusevPipeline
from musev_tpu.utils.text_emb import parse_prompt_attention
from musev_tpu.utils.tokenizer import HashTokenizer


@pytest.fixture(scope="module")
def pipeline():
    unet_cfg = UNet3DConfig(
        block_out_channels=(16, 16, 32, 32), layers_per_block=1,
        cross_attention_dim=24, attention_heads=4, norm_num_groups=8,
    )
    vae_cfg = VAEConfig(block_out_channels=(16, 16, 32, 32), layers_per_block=1,
                        norm_num_groups=8)
    text_cfg = CLIPTextConfig(vocab_size=1000, hidden_size=24, num_layers=2,
                              num_heads=4, intermediate_size=48)
    k = jax.random.PRNGKey(0)
    models = MusevModels(
        unet_params=init_unet3d(jax.random.fold_in(k, 0), unet_cfg),
        unet_cfg=unet_cfg,
        vae_params=init_vae(jax.random.fold_in(k, 1), vae_cfg),
        vae_cfg=vae_cfg,
        text_params=init_clip_text(jax.random.fold_in(k, 2), text_cfg),
        text_cfg=text_cfg,
        tokenizer=HashTokenizer(vocab_size=1000),
    )
    return MusevPipeline(models)


def test_parse_prompt_attention():
    assert parse_prompt_attention("normal text") == [["normal text", 1.0]]
    assert parse_prompt_attention("an (important) word") == [
        ["an ", 1.0], ["important", 1.1], [" word", 1.0]]
    assert parse_prompt_attention("(unbalanced") == [["unbalanced", 1.1]]
    assert parse_prompt_attention("(x:1.5)") == [["x", 1.5]]
    assert parse_prompt_attention("[y]") == [["y", 1 / 1.1]]
    assert parse_prompt_attention(r"\(literal\]") == [["(literal]", 1.0]]


def test_encode_prompt_weighting(pipeline):
    a = pipeline.encode_prompt(["a cat"])
    b = pipeline.encode_prompt(["a (cat:2.0)"])
    assert a.shape == b.shape
    assert a.shape[0] == 1 and a.shape[2] == 24
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-6


def test_text2video_image_conditioned(pipeline):
    cond = (np.random.RandomState(0).rand(1, 1, 32, 32, 3) * 255).astype(np.uint8)
    res = pipeline.text2video(
        "a dancing girl", "bad quality",
        height=32, width=32, video_length=4, n_batch=2,
        video_num_inference_steps=2, num_inference_steps=2,
        context_frames=4, context_overlap=1,
        condition_images=cond, seed=3,
    )
    # shot 0: 1 cond + 4 frames; shot 1: 4 frames
    assert res.videos.shape == (1, 9, 32, 32, 3)
    assert res.latents.shape == (1, 9, 4, 4, 4)
    assert np.isfinite(res.videos).all()
    assert res.videos.min() >= 0.0 and res.videos.max() <= 1.0


def test_text2video_t2i_first_frame(pipeline):
    res = pipeline.text2video(
        "a cat", height=32, width=32, video_length=3, n_batch=1,
        video_num_inference_steps=2, num_inference_steps=2,
        context_frames=3, context_overlap=1, seed=5,
    )
    assert res.videos.shape == (1, 4, 32, 32, 3)
    assert np.isfinite(res.videos).all()


def test_text2video_no_condition(pipeline):
    res = pipeline.text2video(
        "a cat", height=32, width=32, video_length=4, n_batch=1,
        n_vision_condition=0,
        video_num_inference_steps=2, num_inference_steps=2,
        context_frames=4, context_overlap=1, seed=5,
    )
    assert res.videos.shape == (1, 4, 32, 32, 3)


def test_loader_tokenizer_matches_text_vocab():
    """Regression: the fallback tokenizer must hash into the text model's
    vocab — mismatch produced NaN embeddings via out-of-range jnp.take."""
    import numpy as np

    from musev_tpu.cli.text2video import _shrink_preset
    from musev_tpu.configs.model_registry import get_model_preset
    from musev_tpu.pipelines.loader import build_models
    from musev_tpu.pipelines.pipeline import MusevPipeline

    preset = _shrink_preset(get_model_preset("musev"))
    models = build_models(preset)
    assert models.tokenizer.vocab_size == preset.text_cfg.vocab_size
    pipe = MusevPipeline(models)
    emb = pipe.encode_prompt(["a (cat:1.2) jumping"])
    assert np.isfinite(np.asarray(emb)).all()


def test_uniform_schedule_pipeline(pipeline):
    res = pipeline.text2video(
        "a cat", height=32, width=32, video_length=6, n_batch=1,
        video_num_inference_steps=2, num_inference_steps=2,
        context_schedule="uniform", context_frames=4, context_overlap=1,
        seed=7,
    )
    import numpy as np

    assert res.videos.shape[1] == 7
    assert np.isfinite(res.videos).all()
