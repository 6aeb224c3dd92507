"""Original-LDM checkpoint converter + diffusers-format LoRA coverage
(VERDICT r1 item 7; reference convert_from_ckpt.py /
convert_lora_safetensor_to_diffusers.py)."""

import re

import jax
import numpy as np
import pytest

from musev_tpu.models.ldm_convert import (
    convert_ldm_text_keys,
    convert_ldm_unet_keys,
    convert_ldm_vae_keys,
    is_ldm_checkpoint,
    split_ldm_checkpoint,
)


def test_unet_key_branches():
    v = np.zeros(1, np.float32)
    sd = {
        "model.diffusion_model.time_embed.0.weight": v,
        "model.diffusion_model.time_embed.2.bias": v,
        "model.diffusion_model.input_blocks.0.0.weight": v,
        "model.diffusion_model.input_blocks.1.0.in_layers.2.weight": v,
        "model.diffusion_model.input_blocks.4.0.emb_layers.1.weight": v,
        "model.diffusion_model.input_blocks.4.1.transformer_blocks.0.attn1.to_q.weight": v,
        "model.diffusion_model.input_blocks.3.0.op.weight": v,
        "model.diffusion_model.input_blocks.7.0.skip_connection.weight": v,
        "model.diffusion_model.middle_block.0.out_layers.3.weight": v,
        "model.diffusion_model.middle_block.1.proj_in.weight": v,
        "model.diffusion_model.middle_block.2.in_layers.0.weight": v,
        "model.diffusion_model.output_blocks.0.0.in_layers.2.weight": v,
        "model.diffusion_model.output_blocks.2.1.conv.weight": v,
        "model.diffusion_model.output_blocks.5.2.conv.bias": v,
        "model.diffusion_model.output_blocks.4.1.norm.weight": v,
        "model.diffusion_model.out.0.weight": v,
        "model.diffusion_model.out.2.weight": v,
    }
    out = convert_ldm_unet_keys(sd)
    expect = {
        "time_embedding.linear_1.weight",
        "time_embedding.linear_2.bias",
        "conv_in.weight",
        "down_blocks.0.resnets.0.conv1.weight",
        "down_blocks.1.resnets.0.time_emb_proj.weight",
        "down_blocks.1.attentions.0.transformer_blocks.0.attn1.to_q.weight",
        "down_blocks.0.downsamplers.0.conv.weight",
        "down_blocks.2.resnets.0.conv_shortcut.weight",
        "mid_block.resnets.0.conv2.weight",
        "mid_block.attentions.0.proj_in.weight",
        "mid_block.resnets.1.norm1.weight",
        "up_blocks.0.resnets.0.conv1.weight",
        "up_blocks.0.upsamplers.0.conv.weight",
        "up_blocks.1.upsamplers.0.conv.bias",
        "up_blocks.1.attentions.1.norm.weight",
        "conv_norm_out.weight",
        "conv_out.weight",
    }
    assert set(out) == expect


def test_vae_key_branches_and_attn_squeeze():
    v = np.zeros(1, np.float32)
    qw = np.arange(16, dtype=np.float32).reshape(4, 4, 1, 1)
    sd = {
        "first_stage_model.encoder.conv_in.weight": v,
        "first_stage_model.encoder.down.1.block.0.nin_shortcut.weight": v,
        "first_stage_model.encoder.down.0.downsample.conv.weight": v,
        "first_stage_model.encoder.mid.block_1.norm1.weight": v,
        "first_stage_model.encoder.mid.attn_1.q.weight": qw,
        "first_stage_model.encoder.mid.attn_1.norm.weight": v,
        "first_stage_model.decoder.mid.block_2.conv2.weight": v,
        "first_stage_model.decoder.up.3.block.0.conv1.weight": v,
        "first_stage_model.decoder.up.0.block.2.conv1.weight": v,
        "first_stage_model.decoder.up.1.upsample.conv.weight": v,
        "first_stage_model.decoder.norm_out.weight": v,
        "first_stage_model.quant_conv.weight": v,
        "first_stage_model.post_quant_conv.bias": v,
    }
    out = convert_ldm_vae_keys(sd)
    assert "encoder.down_blocks.1.resnets.0.conv_shortcut.weight" in out
    assert "encoder.down_blocks.0.downsamplers.0.conv.weight" in out
    assert "encoder.mid_block.resnets.0.norm1.weight" in out
    assert "encoder.mid_block.attentions.0.group_norm.weight" in out
    assert "decoder.mid_block.resnets.1.conv2.weight" in out
    # LDM decoder.up is bottom-up; diffusers top-down
    assert "decoder.up_blocks.0.resnets.0.conv1.weight" in out
    assert "decoder.up_blocks.3.resnets.2.conv1.weight" in out
    assert "decoder.up_blocks.2.upsamplers.0.conv.weight" in out
    assert "decoder.conv_norm_out.weight" in out
    # 1x1 attn conv squeezed to linear
    q = out["encoder.mid_block.attentions.0.to_q.weight"]
    assert q.shape == (4, 4)
    np.testing.assert_array_equal(q, qw[:, :, 0, 0])


def test_text_keys_and_split():
    v = np.zeros(1, np.float32)
    sd = {
        "cond_stage_model.transformer.text_model.encoder.layers.0.self_attn.q_proj.weight": v,
        "model.diffusion_model.out.0.weight": v,
        "first_stage_model.quant_conv.weight": v,
        "alphas_cumprod": v,  # scheduler buffers in .ckpt files are ignored
    }
    assert is_ldm_checkpoint(sd)
    parts = split_ldm_checkpoint(sd)
    assert list(parts["text"]) == [
        "text_model.encoder.layers.0.self_attn.q_proj.weight"
    ]
    assert list(parts["unet"]) == ["conv_norm_out.weight"]
    assert list(parts["vae"]) == ["quant_conv.weight"]
    assert not is_ldm_checkpoint(parts["vae"])


def _diffusers_unet_to_ldm(sd, layers_per_block=1):
    """Test-side independent inverse mapping (diffusers -> LDM) so bugs in
    either direction surface as round-trip mismatches."""
    per = layers_per_block + 1
    out = {}
    inv_res = {
        "norm1.": "in_layers.0.", "conv1.": "in_layers.2.",
        "time_emb_proj.": "emb_layers.1.", "norm2.": "out_layers.0.",
        "conv2.": "out_layers.3.", "conv_shortcut.": "skip_connection.",
    }

    def res_rename(rest):
        for new, old in inv_res.items():
            rest = rest.replace(new, old)
        return rest

    for k, v in sd.items():
        if k.startswith("time_embedding.linear_1."):
            nk = k.replace("time_embedding.linear_1.", "time_embed.0.")
        elif k.startswith("time_embedding.linear_2."):
            nk = k.replace("time_embedding.linear_2.", "time_embed.2.")
        elif k.startswith("conv_in."):
            nk = k.replace("conv_in.", "input_blocks.0.0.")
        elif m := re.match(r"down_blocks\.(\d+)\.resnets\.(\d+)\.(.*)", k):
            i = 1 + int(m.group(1)) * per + int(m.group(2))
            nk = f"input_blocks.{i}.0." + res_rename(m.group(3))
        elif m := re.match(r"down_blocks\.(\d+)\.attentions\.(\d+)\.(.*)", k):
            i = 1 + int(m.group(1)) * per + int(m.group(2))
            nk = f"input_blocks.{i}.1." + m.group(3)
        elif m := re.match(r"down_blocks\.(\d+)\.downsamplers\.0\.conv\.(.*)", k):
            i = 1 + int(m.group(1)) * per + layers_per_block
            nk = f"input_blocks.{i}.0.op." + m.group(2)
        elif m := re.match(r"mid_block\.resnets\.([01])\.(.*)", k):
            nk = f"middle_block.{2 * int(m.group(1))}." + res_rename(m.group(2))
        elif m := re.match(r"mid_block\.attentions\.0\.(.*)", k):
            nk = "middle_block.1." + m.group(1)
        elif m := re.match(r"up_blocks\.(\d+)\.resnets\.(\d+)\.(.*)", k):
            i = int(m.group(1)) * per + int(m.group(2))
            nk = f"output_blocks.{i}.0." + res_rename(m.group(3))
        elif m := re.match(r"up_blocks\.(\d+)\.attentions\.(\d+)\.(.*)", k):
            i = int(m.group(1)) * per + int(m.group(2))
            nk = f"output_blocks.{i}.1." + m.group(3)
        elif m := re.match(r"up_blocks\.(\d+)\.upsamplers\.0\.conv\.(.*)", k):
            i = int(m.group(1)) * per + (per - 1)
            nk = f"output_blocks.{i}.2.conv." + m.group(2)
        elif k.startswith("conv_norm_out."):
            nk = k.replace("conv_norm_out.", "out.0.")
        elif k.startswith("conv_out."):
            nk = k.replace("conv_out.", "out.2.")
        else:
            continue  # temporal / musev-only keys have no LDM home
        out["model.diffusion_model." + nk] = v
    return out


def test_ldm_roundtrip_through_loader(tmp_path):
    """Full round trip: export the tiny UNet -> invert to LDM layout ->
    merge_sd_base_weights via the LDM path == feeding diffusers keys."""
    import torch

    from musev_tpu.models.sd_weights import export_unet3d, merge_sd_base_weights
    from musev_tpu.models.unet3d import UNet3DConfig, init_unet3d

    cfg = UNet3DConfig(
        block_out_channels=(8, 8, 16, 16), layers_per_block=1,
        cross_attention_dim=16, attention_heads=4, norm_num_groups=4,
    )
    donor = init_unet3d(jax.random.PRNGKey(7), cfg)
    diff_sd = export_unet3d(donor, cfg)
    # keep exactly the keys that have an LDM home (2D spatial subset)
    spatial_sd = {
        k: v for k, v in diff_sd.items()
        if _diffusers_unet_to_ldm({k: v}, layers_per_block=1)
    }
    ldm_sd = _diffusers_unet_to_ldm(spatial_sd, layers_per_block=1)
    assert len(ldm_sd) > 100

    a = init_unet3d(jax.random.PRNGKey(0), cfg)
    b = init_unet3d(jax.random.PRNGKey(0), cfg)
    n_direct, _ = merge_sd_base_weights(a, cfg, spatial_sd)
    converted = convert_ldm_unet_keys(ldm_sd, layers_per_block=1)
    n_ldm, _ = merge_sd_base_weights(b, cfg, converted)
    assert n_ldm == len(ldm_sd) == n_direct
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_diffusers_and_peft_lora_formats():
    from musev_tpu.models.lora import fuse_lora
    from musev_tpu.models.unet3d import UNet3DConfig, init_unet3d

    cfg = UNet3DConfig(
        block_out_channels=(16, 16, 32, 32), layers_per_block=1,
        cross_attention_dim=16, attention_heads=4, norm_num_groups=8,
    )
    rng = np.random.RandomState(0)
    down = rng.randn(2, 16).astype(np.float32)
    up = rng.randn(16, 2).astype(np.float32)
    mod = "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q"
    path = ("down_blocks", 0, "layers", 0, "attn", "block", "attn1", "to_q")

    def kernel(params):
        node = params
        for k in path:
            node = node[k]
        return np.asarray(node["kernel"])

    # kohya reference result
    params_k = init_unet3d(jax.random.PRNGKey(0), cfg)
    base = kernel(params_k).copy()
    n, un = fuse_lora(params_k, cfg, {
        f"lora_unet_{mod.replace('.', '_')}.lora_down.weight": down,
        f"lora_unet_{mod.replace('.', '_')}.lora_up.weight": up,
    }, scale=1.0)
    assert n == 1 and un == []
    ref = kernel(params_k)
    assert np.abs(ref - base).max() > 1e-5

    # peft layout
    params_p = init_unet3d(jax.random.PRNGKey(0), cfg)
    n, un = fuse_lora(params_p, cfg, {
        f"unet.{mod}.lora_A.weight": down,
        f"unet.{mod}.lora_B.weight": up,
    }, scale=1.0)
    assert n == 1 and un == []
    np.testing.assert_allclose(kernel(params_p), ref, atol=1e-6)

    # old attn-procs layout
    params_a = init_unet3d(jax.random.PRNGKey(0), cfg)
    pre = "unet.down_blocks.0.attentions.0.transformer_blocks.0.attn1"
    n, un = fuse_lora(params_a, cfg, {
        f"{pre}.processor.to_q_lora.down.weight": down,
        f"{pre}.processor.to_q_lora.up.weight": up,
    }, scale=1.0)
    assert n == 1 and un == []
    np.testing.assert_allclose(kernel(params_a), ref, atol=1e-6)
