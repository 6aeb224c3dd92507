"""Checkpoint key-naming pinned to the reference (VERDICT r4 item 5a).

Conversion is deliberately tolerant (missing torch keys keep the init
value), so a renamed-key drift between our exporter/converter and real
MuseV/diffusers checkpoints loads SILENTLY with random weights — the bug
class that hit FaceID image_proj in round 3. Two defenses here:

1. a frozen golden key list (tests/data/flagship_torch_keys.txt) for the
   musev_referencenet_pose + FaceID preset, hand-derived from the
   reference's module-attribute naming (unet_3d_condition.py:212-610 +
   2D->3D renames :1283-1637, attention_processor.py:118-133 ip/face
   projections, resnet.py:56-92 temp-conv Sequential indices,
   temporal_transformer.py:117-171 norm/proj_in/frame_emb_proj/
   temporal_weight, ReferEmbFuseAttention = Attention naming :558) and
   spot-verified against that source — any exporter/key-map rename now
   breaks loudly;
2. loader strict mode: a user-supplied checkpoint that leaves required
   sites unconsumed raises instead of logging.
"""

import dataclasses
import os
from functools import partial

import jax
import numpy as np
import pytest
import safetensors.numpy as st

from musev_tpu.models import sd_weights as sw
from musev_tpu.models.controlnet import (
    ControlNetConfig,
    init_controlnet,
    init_pose_guider,
)
from musev_tpu.models.referencenet import ReferenceNetConfig, init_referencenet
from musev_tpu.models.unet3d import musev_referencenet_config, init_unet3d

DATA = os.path.join(os.path.dirname(__file__), "data",
                    "flagship_torch_keys.txt")


def _golden_sections():
    sections = {}
    cur = None
    with open(DATA) as f:
        for line in f:
            line = line.strip()
            if line.startswith("#"):
                cur = line.split()[1]
                sections[cur] = []
            elif line:
                sections[cur].append(line)
    return sections


def _current_sections():
    k = jax.random.PRNGKey(0)
    ucfg = musev_referencenet_config(need_ip_adapter_face=True)
    rcfg = ReferenceNetConfig()
    ccfg = ControlNetConfig()
    pcfg = ControlNetConfig(
        block_out_channels=ucfg.block_out_channels,
        cross_attention_dim=ucfg.cross_attention_dim,
        attention_heads=ucfg.attention_heads,
        norm_num_groups=ucfg.norm_num_groups,
    )
    out = {}
    for name, km, init, cfg in [
        ("unet3d", sw.unet3d_key_map, init_unet3d, ucfg),
        ("referencenet", sw.referencenet_key_map, init_referencenet, rcfg),
        ("controlnet", sw.controlnet_key_map, init_controlnet, ccfg),
        ("pose_guider", sw.pose_guider_key_map, init_pose_guider, pcfg),
    ]:
        tree = jax.eval_shape(partial(init, k, cfg))
        out[name] = sw.export_key_names(list(km(cfg)), tree)
    return out


def test_flagship_torch_keys_match_golden():
    """export_state_dict's key set for the full flagship preset must equal
    the frozen reference-derived list exactly — both directions: a key we
    stopped emitting AND a key we renamed both fail."""
    golden = _golden_sections()
    current = _current_sections()
    assert set(golden) == set(current)
    for name in golden:
        g, c = golden[name], current[name]
        only_golden = sorted(set(g) - set(c))[:5]
        only_current = sorted(set(c) - set(g))[:5]
        assert g == c, (
            f"{name}: key drift. missing={only_golden} new={only_current}"
        )


def test_flagship_unet_key_census():
    """Structural invariants a rename can't fake: every CrossAttn site has
    its dual-KV ip + face projections, every temporal module carries
    temporal_weight, refer fuse attns exist at every down block + first +
    mid (reference unet_3d_condition.py:413-448)."""
    keys = _current_sections()["unet3d"]
    ip = [k for k in keys if k.endswith(".to_k_ip.weight")
          and "face" not in k]
    face = [k for k in keys if "ip_adapter_face_to_k_ip.weight" in k]
    # SD1.5 topology: 16 attn2 sites (6 down + 9 up + 1 mid)
    assert len(ip) == 16 and len(face) == 16
    tw = [k for k in keys if k.endswith("temporal_weight")]
    # temp_convs on every resnet: 8 down + 2 mid + 12 up = 22;
    # temp_attentions only on CrossAttn blocks (DownBlock3D/UpBlock3D carry
    # none, unet_3d_blocks.py:775/1254): 6 down + 1 mid + 9 up = 16
    assert len(tw) == 38, len(tw)
    refer = sorted({k.rsplit(".to_", 1)[0] for k in keys
                    if "refer_emb_attns" in k})
    assert "first_refer_emb_attns" in refer
    assert "mid_block_refer_emb_attns" in refer
    assert sum(1 for r in refer if r.startswith("down_blocks")) == 11


def test_export_key_names_matches_export_state_dict():
    """The shape-tree key enumeration must agree with what the real
    exporter emits on a materialized tree."""
    from musev_tpu.models.unet3d import UNet3DConfig

    cfg = UNet3DConfig(
        block_out_channels=(8, 8, 16, 16), layers_per_block=1,
        cross_attention_dim=16, attention_heads=4, norm_num_groups=4,
        ip_adapter_cross_attn=True, need_refer_emb=True,
    )
    params = init_unet3d(jax.random.PRNGKey(1), cfg)
    km = list(sw.unet3d_key_map(cfg))
    assert sw.export_key_names(km, params) == list(
        sw.export_state_dict(km, params)
    )


@pytest.fixture()
def tiny_strict_setup(tmp_path):
    from musev_tpu.cli.text2video import _shrink_preset
    from musev_tpu.configs.model_registry import get_model_preset

    preset = _shrink_preset(get_model_preset("musev"))
    from musev_tpu.pipelines.loader import build_models

    donor = build_models(preset, seed=3)
    sd = sw.export_unet3d(donor.unet_params, preset.unet_cfg)
    return preset, sd, tmp_path


def _save(sd, path):
    st.save_file(
        {k: np.ascontiguousarray(np.asarray(v, np.float32))
         for k, v in sd.items()}, str(path))
    return str(path)


def test_build_models_strict_raises_on_unconsumed_sites(tiny_strict_setup):
    from musev_tpu.pipelines.loader import build_models

    preset, sd, tmp = tiny_strict_setup
    bad = dict(sd)
    # simulate a naming drift on one load-bearing site
    bad["renamed.conv_in.weight"] = bad.pop("conv_in.weight")
    preset = dataclasses.replace(
        preset, unet_checkpoint=_save(bad, tmp / "unet_bad.safetensors")
    )
    with pytest.raises(ValueError, match="conv_in.weight"):
        build_models(preset, seed=3, strict=True)
    # non-strict: same checkpoint only logs (historical behavior)
    build_models(preset, seed=3, strict=False)


def test_build_models_strict_ok_on_complete_checkpoint(tiny_strict_setup):
    from musev_tpu.pipelines.loader import build_models

    preset, sd, tmp = tiny_strict_setup
    preset = dataclasses.replace(
        preset, unet_checkpoint=_save(sd, tmp / "unet.safetensors")
    )
    build_models(preset, seed=3, strict=True)


def test_build_models_strict_allows_sd_base_supplied_spatial(
    tiny_strict_setup
):
    """A motion-module-style unet checkpoint (temporal/MuseV-only keys)
    plus an sd_base checkpoint supplying the spatial weights is the
    documented T2I-overwrite path (loader sd_base merge) — strict mode
    must NOT flag the spatial keys, but must still flag missing temporal
    ones."""
    from musev_tpu.pipelines.loader import build_models

    preset, sd, tmp = tiny_strict_setup

    def musev_only(k):
        return ("temp_" in k or k.startswith("frame_embedding")
                or "transformer_in" in k or "refer_emb" in k)

    motion_sd = {k: v for k, v in sd.items() if musev_only(k)}
    base_sd = {k: v for k, v in sd.items() if not musev_only(k)}
    p2 = dataclasses.replace(
        preset,
        unet_checkpoint=_save(motion_sd, tmp / "motion.safetensors"),
        sd_base_checkpoint=_save(base_sd, tmp / "base.safetensors"),
    )
    build_models(p2, seed=3, strict=True)  # must not raise
    # without the base, the same motion checkpoint must raise on spatial
    p3 = dataclasses.replace(
        preset, unet_checkpoint=p2.unet_checkpoint
    )
    with pytest.raises(ValueError, match="unconsumed"):
        build_models(p3, seed=3, strict=True)
    # with the base but a temporal key dropped, strict must still raise
    broken = dict(motion_sd)
    broken.pop(next(k for k in broken if "temp_" in k))
    p4 = dataclasses.replace(
        p2, unet_checkpoint=_save(broken, tmp / "motion_broken.safetensors")
    )
    with pytest.raises(ValueError, match="unconsumed"):
        build_models(p4, seed=3, strict=True)


def test_build_models_strict_raises_on_missing_file(tiny_strict_setup):
    from musev_tpu.pipelines.loader import build_models

    preset, _, tmp = tiny_strict_setup
    preset = dataclasses.replace(
        preset, unet_checkpoint=str(tmp / "nope.safetensors")
    )
    with pytest.raises(FileNotFoundError):
        build_models(preset, seed=3, strict=True)
