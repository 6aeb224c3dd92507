"""All-slots checkpoint ingestion end-to-end (VERDICT r3 Missing #4).

Writes a COMPLETE synthetic reference-layout checkpoint set to disk —
motion UNet, T2I base, VAE, CLIP text + vision, IP-Adapter (+FaceID),
ReferenceNet, pose ControlNet, textual inversion, LoRA — then

  (a) drives ``build_models`` through every slot at once and asserts each
      loaded tree equals its donor exactly (the converters are lossless
      layout transposes), and
  (b) drives the text2video CLI with every ``--*_checkpoint`` flag at once,
      asserting the happy path emits zero missing-checkpoint warnings and
      writes a video.

This is the path a real reference user hits first (reference loader stack,
scripts/inference/text2video.py:864-993).
"""

import dataclasses
import logging

import jax
import numpy as np
import pytest
import safetensors.numpy as st
import torch

from musev_tpu.cli.text2video import _shrink_preset
from musev_tpu.configs.model_registry import get_model_preset
from musev_tpu.models import sd_weights
from musev_tpu.models.sd_weights import (
    clip_text_key_map,
    clip_vision_key_map,
    controlnet_key_map,
    export_state_dict,
    export_unet3d,
    ip_adapter_site_paths,
    referencenet_key_map,
    vae_key_map,
)
from musev_tpu.pipelines.loader import build_models


def _tiny_full_preset():
    """The exact preset the CLI builds for --model_name
    musev_referencenet_pose --ip_adapter_face_checkpoint ... --tiny
    (face flag enables the branch BEFORE shrinking, as in cli/text2video)."""
    preset = get_model_preset("musev_referencenet_pose")
    preset.unet_cfg = dataclasses.replace(
        preset.unet_cfg, need_ip_adapter_face=True
    )
    return _shrink_preset(preset)


def _tree_allclose(a, b, atol=0.0):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), atol=atol, rtol=0
        )


@pytest.fixture(scope="module")
def ckpt_set(tmp_path_factory):
    """Synthesize every checkpoint from donor models and write them to disk
    in the reference's on-disk layouts."""
    d = tmp_path_factory.mktemp("ckpts")
    preset = _tiny_full_preset()
    donor = build_models(preset, seed=7)
    donor2 = build_models(preset, seed=11)  # T2I base spatial donor
    rng = np.random.RandomState(3)

    paths = {}

    def save(name, sd):
        p = d / name
        st.save_file(
            {k: np.ascontiguousarray(np.asarray(v, np.float32))
             for k, v in sd.items()}, str(p))
        paths[name] = str(p)
        return str(p)

    save("unet.safetensors", export_unet3d(donor.unet_params, preset.unet_cfg))
    # T2I base: spatial-only diffusers-layout dict from a DIFFERENT donor, so
    # the merge is observable (spatial -> donor2, temporal stays donor)
    base_sd = {
        k: v
        for k, v in export_unet3d(donor2.unet_params, preset.unet_cfg).items()
        if "temp_" not in k and "frame_embedding" not in k
        and "transformer_in" not in k
    }
    save("sd_base.safetensors", base_sd)
    save("vae.safetensors",
         export_state_dict(vae_key_map(preset.vae_cfg), donor.vae_params))
    save("text.safetensors",
         export_state_dict(clip_text_key_map(preset.text_cfg),
                           donor.text_params))
    cv_sd = export_state_dict(
        clip_vision_key_map(preset.clip_vision_cfg), donor.clip_vision_params
    )
    cv_sd["vision_model.embeddings.patch_embedding.weight"] = np.asarray(
        donor.clip_vision_params["patch_embedding"]
    ).transpose(3, 2, 0, 1)
    save("clip_vision.safetensors", cv_sd)
    save("referencenet.safetensors",
         export_state_dict(referencenet_key_map(preset.referencenet_cfg),
                           donor.referencenet_params))
    save("controlnet.safetensors",
         export_state_dict(controlnet_key_map(preset.controlnet_cfg),
                           donor.controlnet_params))

    # IP-Adapter .bin: {"image_proj": ImageProjModel, "ip_adapter":
    # numbered to_k_ip/to_v_ip} (tencent-ailab layout)
    sites = ip_adapter_site_paths(preset.unet_cfg)

    def numbered_kv(dim):
        sd = {}
        for i, path in enumerate(sites):
            node = donor.unet_params
            for k in path:
                node = node[k]
            ch = node["to_q"]["kernel"].shape[0]
            sd[f"{2 * i + 1}.to_k_ip.weight"] = torch.from_numpy(
                rng.randn(ch, dim).astype(np.float32)
            )
            sd[f"{2 * i + 1}.to_v_ip.weight"] = torch.from_numpy(
                rng.randn(ch, dim).astype(np.float32)
            )
        return sd

    pk = donor.ip_proj_params["proj"]["kernel"]  # (clip_dim, cross*tokens)
    ip_bin = {
        "image_proj": {
            "proj.weight": torch.from_numpy(
                rng.randn(pk.shape[1], pk.shape[0]).astype(np.float32)),
            "proj.bias": torch.from_numpy(
                rng.randn(pk.shape[1]).astype(np.float32)),
            "norm.weight": torch.from_numpy(rng.randn(np.asarray(
                donor.ip_proj_params["norm"]["scale"]).shape[0]
            ).astype(np.float32)),
            "norm.bias": torch.from_numpy(rng.randn(np.asarray(
                donor.ip_proj_params["norm"]["bias"]).shape[0]
            ).astype(np.float32)),
        },
        "ip_adapter": numbered_kv(preset.unet_cfg.ip_adapter_dim),
    }
    torch.save(ip_bin, d / "ip_adapter.bin")
    paths["ip_adapter.bin"] = str(d / "ip_adapter.bin")

    # FaceID .bin: {"image_proj": MLPProjModel (proj.0/proj.2/norm),
    # "ip_adapter": numbered to_k_ip destined for the _face slots}
    fp = donor.ip_face_proj_params
    f1, f2 = fp["fc1"]["kernel"], fp["fc2"]["kernel"]
    face_bin = {
        "image_proj": {
            "proj.0.weight": torch.from_numpy(
                rng.randn(f1.shape[1], f1.shape[0]).astype(np.float32)),
            "proj.0.bias": torch.from_numpy(
                rng.randn(f1.shape[1]).astype(np.float32)),
            "proj.2.weight": torch.from_numpy(
                rng.randn(f2.shape[1], f2.shape[0]).astype(np.float32)),
            "proj.2.bias": torch.from_numpy(
                rng.randn(f2.shape[1]).astype(np.float32)),
            "norm.weight": torch.from_numpy(
                rng.randn(np.asarray(fp["norm"]["scale"]).shape[0]
                          ).astype(np.float32)),
            "norm.bias": torch.from_numpy(
                rng.randn(np.asarray(fp["norm"]["bias"]).shape[0]
                          ).astype(np.float32)),
        },
        "ip_adapter": numbered_kv(preset.unet_cfg.ip_adapter_face_dim),
    }
    torch.save(face_bin, d / "ip_adapter_face.bin")
    paths["ip_adapter_face.bin"] = str(d / "ip_adapter_face.bin")

    # textual inversion + LoRA (A1111/kohya layouts)
    st.save_file(
        {"emb_params": rng.randn(3, preset.text_cfg.hidden_size
                                 ).astype(np.float32)},
        str(d / "badhandv4.safetensors"))
    paths["badhandv4.safetensors"] = str(d / "badhandv4.safetensors")
    rank, qdim = 2, preset.unet_cfg.block_out_channels[0]
    st.save_file({
        "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q"
        ".lora_down.weight": rng.randn(rank, qdim).astype(np.float32),
        "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q"
        ".lora_up.weight": rng.randn(qdim, rank).astype(np.float32),
    }, str(d / "style.safetensors"))
    paths["style.safetensors"] = str(d / "style.safetensors")

    return {"dir": d, "preset_fn": _tiny_full_preset, "paths": paths,
            "donor": donor, "donor2": donor2, "ip_bin": ip_bin,
            "face_bin": face_bin}


def test_build_models_ingests_every_slot(ckpt_set):
    p = ckpt_set["paths"]
    donor, donor2 = ckpt_set["donor"], ckpt_set["donor2"]
    preset = ckpt_set["preset_fn"]()
    preset.unet_checkpoint = p["unet.safetensors"]
    preset.sd_base_checkpoint = p["sd_base.safetensors"]
    preset.vae_checkpoint = p["vae.safetensors"]
    preset.text_checkpoint = p["text.safetensors"]
    preset.clip_vision_checkpoint = p["clip_vision.safetensors"]
    preset.referencenet_checkpoint = p["referencenet.safetensors"]
    preset.controlnet_checkpoint = p["controlnet.safetensors"]
    preset.ip_adapter_checkpoint = p["ip_adapter.bin"]
    preset.ip_adapter_face_checkpoint = p["ip_adapter_face.bin"]
    preset.textual_inversion_checkpoints = [p["badhandv4.safetensors"]]
    preset.lora_checkpoints = [f"{p['style.safetensors']}:0.5"]

    models = build_models(preset, seed=99)

    # whole-tree equality: vae / clip text core / clip vision / refnet /
    # controlnet come back bit-identical to their donors
    _tree_allclose(models.vae_params, donor.vae_params)
    _tree_allclose(models.clip_vision_params, donor.clip_vision_params)
    _tree_allclose(models.referencenet_params, donor.referencenet_params)
    _tree_allclose(models.controlnet_params, donor.controlnet_params)

    # text: TI appended 3 vectors on top of the donor table
    table = np.asarray(models.text_params["token_embedding"])
    donor_table = np.asarray(donor.text_params["token_embedding"])
    assert table.shape[0] == donor_table.shape[0] + 3
    np.testing.assert_allclose(table[: donor_table.shape[0]], donor_table)
    ti = st.load_file(p["badhandv4.safetensors"])["emb_params"]
    np.testing.assert_allclose(table[donor_table.shape[0]:], ti)

    # unet: T2I base overwrote spatial (donor2), temporal stayed (donor)
    got_spatial = np.asarray(models.unet_params["conv_in"]["kernel"])
    np.testing.assert_allclose(
        got_spatial, np.asarray(donor2.unet_params["conv_in"]["kernel"]))
    got_temporal = np.asarray(
        models.unet_params["down_blocks"][0]["layers"][0]["temp_conv"]
        ["conv1"]["conv"]["kernel"])
    np.testing.assert_allclose(
        got_temporal,
        np.asarray(donor.unet_params["down_blocks"][0]["layers"][0]
                   ["temp_conv"]["conv1"]["conv"]["kernel"]))

    # LoRA fused at 0.5 into attn1.to_q on top of donor2's spatial weight
    lora = st.load_file(p["style.safetensors"])
    down = lora["lora_unet_down_blocks_0_attentions_0_transformer_blocks_0"
                "_attn1_to_q.lora_down.weight"]
    up = lora["lora_unet_down_blocks_0_attentions_0_transformer_blocks_0"
              "_attn1_to_q.lora_up.weight"]
    want_q = np.asarray(
        donor2.unet_params["down_blocks"][0]["layers"][0]["attn"]["block"]
        ["attn1"]["to_q"]["kernel"]) + 0.5 * (up @ down).T
    got_q = np.asarray(
        models.unet_params["down_blocks"][0]["layers"][0]["attn"]["block"]
        ["attn1"]["to_q"]["kernel"])
    np.testing.assert_allclose(got_q, want_q, atol=1e-5)

    # IP-Adapter: image_proj + numbered KV landed in the dual-KV slots
    ip = ckpt_set["ip_bin"]
    np.testing.assert_allclose(
        np.asarray(models.ip_proj_params["proj"]["kernel"]),
        ip["image_proj"]["proj.weight"].numpy().T)
    np.testing.assert_allclose(
        np.asarray(models.unet_params["mid_block"]["attn"]["block"]["attn2"]
                   ["to_k_ip"]["kernel"]),
        ip["ip_adapter"][f"{2 * (len(ip_adapter_site_paths(preset.unet_cfg)) - 1) + 1}"
                         ".to_k_ip.weight"].numpy().T)

    # FaceID: MLP proj + the _face KV slots
    fb = ckpt_set["face_bin"]
    np.testing.assert_allclose(
        np.asarray(models.ip_face_proj_params["fc1"]["kernel"]),
        fb["image_proj"]["proj.0.weight"].numpy().T)
    np.testing.assert_allclose(
        np.asarray(models.ip_face_proj_params["norm"]["scale"]),
        fb["image_proj"]["norm.weight"].numpy())
    np.testing.assert_allclose(
        np.asarray(models.unet_params["mid_block"]["attn"]["block"]["attn2"]
                   ["to_k_ip_face"]["kernel"]),
        fb["ip_adapter"][f"{2 * (len(ip_adapter_site_paths(preset.unet_cfg)) - 1) + 1}"
                         ".to_k_ip.weight"].numpy().T)


def test_every_converter_reports_full_coverage(ckpt_set):
    """No leftover torch keys on any slot: the synthetic checkpoints are
    consumed completely (a real checkpoint with extra keys would surface
    them in the loader's leftover log)."""
    p = ckpt_set["paths"]
    preset = ckpt_set["preset_fn"]()
    donor = build_models(preset, seed=23)

    n, leftover = sd_weights.convert_unet3d(
        donor.unet_params, preset.unet_cfg,
        st.load_file(p["unet.safetensors"]))
    assert leftover == [] and n > 0
    n, leftover = sd_weights.convert_vae(
        donor.vae_params, preset.vae_cfg, st.load_file(p["vae.safetensors"]))
    assert leftover == [] and n > 0
    n, leftover = sd_weights.convert_clip_text(
        donor.text_params, preset.text_cfg,
        st.load_file(p["text.safetensors"]))
    assert leftover == [] and n > 0
    n, leftover = sd_weights.convert_clip_vision(
        donor.clip_vision_params, preset.clip_vision_cfg,
        st.load_file(p["clip_vision.safetensors"]))
    assert leftover == [] and n > 0
    n, leftover = sd_weights.convert_referencenet(
        donor.referencenet_params, preset.referencenet_cfg,
        st.load_file(p["referencenet.safetensors"]))
    assert leftover == [] and n > 0
    n, leftover = sd_weights.convert_controlnet(
        donor.controlnet_params, preset.controlnet_cfg,
        st.load_file(p["controlnet.safetensors"]))
    assert leftover == [] and n > 0


def test_text2video_cli_all_slots(ckpt_set, tmp_path, caplog):
    """The user-facing path: every --*_checkpoint flag at once, tiny run,
    zero missing-checkpoint warnings, a video written."""
    import yaml

    from musev_tpu.cli.text2video import main
    from PIL import Image

    p = ckpt_set["paths"]
    img = (np.random.RandomState(0).rand(64, 64, 3) * 255).astype("uint8")
    cond = tmp_path / "cond.png"
    Image.fromarray(img).save(cond)
    tasks = [{"name": "allslots", "prompt": "a person, badhandv4",
              "condition_images": str(cond), "height": 64, "width": 64}]
    task_yaml = tmp_path / "tasks.yaml"
    yaml.safe_dump(tasks, open(task_yaml, "w"))
    out_dir = tmp_path / "out"

    with caplog.at_level(logging.WARNING):
        main([
            "--test_data_path", str(task_yaml),
            "--output_dir", str(out_dir),
            "--model_name", "musev_referencenet_pose", "--tiny",
            "--unet_checkpoint", p["unet.safetensors"],
            "--sd_base_checkpoint", p["sd_base.safetensors"],
            "--vae_checkpoint", p["vae.safetensors"],
            "--text_checkpoint", p["text.safetensors"],
            "--clip_vision_checkpoint", p["clip_vision.safetensors"],
            "--referencenet_checkpoint", p["referencenet.safetensors"],
            "--controlnet_checkpoint", p["controlnet.safetensors"],
            "--ip_adapter_checkpoint", p["ip_adapter.bin"],
            "--ip_adapter_face_checkpoint", p["ip_adapter_face.bin"],
            "--textual_inversion", p["badhandv4.safetensors"],
            "--lora_path", f"{p['style.safetensors']}:0.5",
            "--time_size", "4", "--context_frames", "4",
            "--context_overlap", "0", "--height", "64", "--width", "64",
            "--num_inference_steps", "2", "--video_num_inference_steps", "2",
            "--seed", "5", "--fps", "4",
        ])

    assert "does not exist" not in caplog.text
    assert "missing" not in caplog.text
    vids = list(out_dir.glob("*.mp4"))
    assert len(vids) == 1 and vids[0].stat().st_size > 0
