import jax
import jax.numpy as jnp
import numpy as np

from musev_tpu.configs.model_registry import (
    get_model_preset,
    resolve_negative_prompt,
)
from musev_tpu.configs.tasks import load_tasks
from musev_tpu.models.clip_text import CLIPTextConfig, clip_text_encode, init_clip_text
from musev_tpu.models.lora import fuse_lora
from musev_tpu.models.unet3d import UNet3DConfig, init_unet3d
from musev_tpu.utils.textual_inversion import (
    InversionTokenizer,
    add_textual_inversion,
    load_inversion_state_dict,
)
from musev_tpu.utils.tokenizer import HashTokenizer

CFG = UNet3DConfig(
    block_out_channels=(16, 16, 32, 32), layers_per_block=1,
    cross_attention_dim=16, attention_heads=4, norm_num_groups=8,
)


def test_lora_fuse_unfuse_roundtrip():
    params = init_unet3d(jax.random.PRNGKey(0), CFG)
    before = np.asarray(
        params["down_blocks"][0]["layers"][0]["attn"]["block"]["attn1"]["to_q"]["kernel"]
    ).copy()
    rank, dim = 2, 16
    rng = np.random.RandomState(0)
    lora_sd = {
        "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q"
        ".lora_down.weight": rng.randn(rank, dim).astype(np.float32),
        "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q"
        ".lora_up.weight": rng.randn(dim, rank).astype(np.float32),
        "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q"
        ".alpha": np.asarray(rank, np.float32),
    }
    n, unmatched = fuse_lora(params, CFG, lora_sd, scale=0.7)
    assert n == 1 and unmatched == []
    after = np.asarray(
        params["down_blocks"][0]["layers"][0]["attn"]["block"]["attn1"]["to_q"]["kernel"]
    )
    assert np.abs(after - before).max() > 1e-4
    # unfuse restores
    fuse_lora(params, CFG, lora_sd, scale=-0.7)
    restored = np.asarray(
        params["down_blocks"][0]["layers"][0]["attn"]["block"]["attn1"]["to_q"]["kernel"]
    )
    np.testing.assert_allclose(restored, before, atol=1e-5)


def test_lora_unknown_module_reported():
    params = init_unet3d(jax.random.PRNGKey(0), CFG)
    sd = {
        "lora_unet_nonexistent_module.lora_down.weight": np.zeros((2, 16), np.float32),
        "lora_unet_nonexistent_module.lora_up.weight": np.zeros((16, 2), np.float32),
    }
    n, unmatched = fuse_lora(params, CFG, sd)
    assert n == 0 and len(unmatched) == 1


def test_textual_inversion():
    cfg = CLIPTextConfig(vocab_size=100, hidden_size=16, num_layers=1,
                         num_heads=4, intermediate_size=32)
    params = init_clip_text(jax.random.PRNGKey(0), cfg)
    tok = InversionTokenizer(HashTokenizer(vocab_size=100))
    emb = np.random.RandomState(0).randn(3, 16).astype(np.float32)
    add_textual_inversion(params, tok, "badhandv4", emb)
    assert params["token_embedding"].shape[0] == 103
    ids = tok.encode("a badhandv4 photo")
    assert 100 in ids and 101 in ids and 102 in ids
    # encoding uses the new rows
    padded = (ids + [0] * 8)[:8]
    out = clip_text_encode(params, cfg, jnp.asarray([padded], jnp.int32))
    assert bool(jnp.isfinite(out).all())


def test_load_inversion_layouts():
    emb = np.ones((2, 8), np.float32)
    assert load_inversion_state_dict({"emb_params": emb}).shape == (2, 8)
    assert load_inversion_state_dict(
        {"string_to_param": {"*": emb}}
    ).shape == (2, 8)
    assert load_inversion_state_dict({"x": emb[0]}).shape == (1, 8)


def test_model_presets():
    p = get_model_preset("musev")
    assert p.referencenet_cfg is None
    p = get_model_preset("musev_referencenet")
    assert p.referencenet_cfg is not None and p.controlnet_cfg is None
    p = get_model_preset("musev_referencenet_pose")
    assert p.controlnet_cfg is not None


def test_negative_prompt_registry():
    assert resolve_negative_prompt("V3") == (
        "badhandv4, ng_deepnegative_v1_75t, bad quality"
    )
    assert resolve_negative_prompt("custom text") == "custom text"


def test_task_yaml_interpolation(tmp_path):
    p = tmp_path / "tasks.yaml"
    p.write_text(
        "- name: demo\n"
        "  condition_images: ./img.png\n"
        "  ipadapter_image: ${.condition_images}\n"
        "  refer_image: ${.condition_images}\n"
        "  eye_blinks_factor: 1.8\n"
        "  prompt: (a girl:1.3),(eye blinks:{eye_blinks_factor})\n"
    )
    tasks = load_tasks(str(p))
    assert tasks[0]["ipadapter_image"] == "./img.png"
    assert tasks[0]["refer_image"] == "./img.png"
    assert "(eye blinks:1.8)" in tasks[0]["prompt"]


def test_reference_example_yaml_loads():
    tasks = load_tasks("/root/reference/configs/tasks/example.yaml")
    assert len(tasks) >= 5
    yongen = [t for t in tasks if t.get("name") == "yongen"][0]
    assert yongen["ipadapter_image"] == yongen["condition_images"]
