"""Checkpoint ingestion: torch/safetensors (diffusers layout) -> param pytrees.

Covers the reference's weight surgery (SURVEY §3.3):
  * the MuseV motion UNet (their UNet3DConditionModel state dict)
  * stock SD1.5 2D UNets loaded into the 3D config (from_pretrained_2d,
    unet_3d_condition.py:1283-1637) — temporal params keep their init
  * T2I base-model overwrite of spatial weights (update_unet_with_sd,
    unet_loader.py:41-80)
  * AutoencoderKL VAE and CLIP text encoder

The mapping is a declarative bidirectional table: ``unet3d_key_map`` yields
(torch_key, tree_path, kind) triples; ``convert_*`` walks it forward, and the
same table can export back for parity testing. Conversion is name-based and
tolerant: missing torch keys leave the init value in place (strict=False
mirror), and the unconsumed-key list is returned for inspection.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from .clip_text import CLIPTextConfig
from .controlnet import ControlNetConfig
from .referencenet import ReferenceNetConfig
from .unet3d import UNet3DConfig
from .vae import VAEConfig

Path = Tuple
KeyEntry = Tuple[str, Path, str]  # torch key prefix (no .weight/.bias), path, kind

# kinds: "linear" (weight.T / bias), "conv2d" (OIHW->HWIO), "conv3d_t"
# ((O,I,3,1,1)->(3,1,I,O)), "norm" (weight->scale, bias->bias),
# "raw" (tensor as-is), "embedding" (as-is)


def _attn_entries(tk: str, path: Path, with_ip: bool = False) -> Iterator[KeyEntry]:
    yield f"{tk}.to_q", (*path, "to_q"), "linear"
    yield f"{tk}.to_k", (*path, "to_k"), "linear"
    yield f"{tk}.to_v", (*path, "to_v"), "linear"
    yield f"{tk}.to_out.0", (*path, "to_out"), "linear"
    if with_ip:
        yield f"{tk}.to_k_ip", (*path, "to_k_ip"), "linear"
        yield f"{tk}.to_v_ip", (*path, "to_v_ip"), "linear"
        yield f"{tk}.ip_adapter_face_to_k_ip", (*path, "to_k_ip_face"), "linear"
        yield f"{tk}.ip_adapter_face_to_v_ip", (*path, "to_v_ip_face"), "linear"


def _tf_block_entries(tk: str, path: Path, ip: bool) -> Iterator[KeyEntry]:
    yield f"{tk}.norm1", (*path, "norm1"), "norm"
    yield from _attn_entries(f"{tk}.attn1", (*path, "attn1"))
    yield f"{tk}.norm2", (*path, "norm2"), "norm"
    yield from _attn_entries(f"{tk}.attn2", (*path, "attn2"), with_ip=ip)
    yield f"{tk}.norm3", (*path, "norm3"), "norm"
    yield f"{tk}.ff.net.0.proj", (*path, "ff", "proj_in"), "linear"
    yield f"{tk}.ff.net.2", (*path, "ff", "proj_out"), "linear"


def _spatial_attn_entries(tk: str, path: Path, ip: bool) -> Iterator[KeyEntry]:
    yield f"{tk}.norm", (*path, "norm"), "norm"
    yield f"{tk}.proj_in", (*path, "proj_in"), "conv2d"
    yield from _tf_block_entries(f"{tk}.transformer_blocks.0", (*path, "block"), ip)
    yield f"{tk}.proj_out", (*path, "proj_out"), "conv2d"


def _temporal_attn_entries(tk: str, path: Path) -> Iterator[KeyEntry]:
    yield f"{tk}.norm", (*path, "norm"), "norm"
    yield f"{tk}.proj_in", (*path, "proj_in"), "linear"
    yield f"{tk}.frame_emb_proj", (*path, "femb_proj"), "linear"
    yield from _tf_block_entries(f"{tk}.transformer_blocks.0", (*path, "block"), False)
    yield f"{tk}.proj_out", (*path, "proj_out"), "linear"
    yield f"{tk}.temporal_weight", (*path, "temporal_weight"), "raw"


def _temporal_conv_entries(tk: str, path: Path) -> Iterator[KeyEntry]:
    # Sequential indices: conv1 = (GN, SiLU, Conv) -> .0/.2;
    # conv2..4 = (GN, SiLU, Dropout, Conv) -> .0/.3 (resnet.py:56-78)
    for i in range(1, 5):
        conv_idx = 2 if i == 1 else 3
        yield f"{tk}.conv{i}.0", (*path, f"conv{i}", "norm"), "norm"
        yield f"{tk}.conv{i}.{conv_idx}", (*path, f"conv{i}", "conv"), "conv3d_t"
    yield f"{tk}.temporal_weight", (*path, "temporal_weight"), "raw"


def _resnet_entries(tk: str, path: Path, temb: bool = True) -> Iterator[KeyEntry]:
    yield f"{tk}.norm1", (*path, "norm1"), "norm"
    yield f"{tk}.conv1", (*path, "conv1"), "conv2d"
    if temb:
        yield f"{tk}.time_emb_proj", (*path, "time_emb_proj"), "linear"
    yield f"{tk}.norm2", (*path, "norm2"), "norm"
    yield f"{tk}.conv2", (*path, "conv2"), "conv2d"
    yield f"{tk}.conv_shortcut", (*path, "conv_shortcut"), "conv2d"


def unet3d_key_map(cfg: UNet3DConfig) -> Iterator[KeyEntry]:
    yield "conv_in", ("conv_in",), "conv2d"
    yield "time_embedding.linear_1", ("time_embedding", "linear_1"), "linear"
    yield "time_embedding.linear_2", ("time_embedding", "linear_2"), "linear"
    if cfg.temporal_transformer:
        yield "frame_embedding.linear_1", ("frame_embedding", "linear_1"), "linear"
        yield "frame_embedding.linear_2", ("frame_embedding", "linear_2"), "linear"
    if cfg.need_transformer_in and cfg.temporal_transformer:
        yield from _temporal_attn_entries("transformer_in", ("transformer_in",))
    ip = cfg.ip_adapter_cross_attn
    for i, btype in enumerate(cfg.down_block_types):
        base = f"down_blocks.{i}"
        for j in range(cfg.layers_per_block):
            path = ("down_blocks", i, "layers", j)
            yield from _resnet_entries(f"{base}.resnets.{j}", (*path, "resnet"))
            if cfg.temporal_conv:
                yield from _temporal_conv_entries(
                    f"{base}.temp_convs.{j}", (*path, "temp_conv")
                )
            if "CrossAttn" in btype:
                yield from _spatial_attn_entries(
                    f"{base}.attentions.{j}", (*path, "attn"), ip
                )
            if cfg.temporal_transformer:
                yield from _temporal_attn_entries(
                    f"{base}.temp_attentions.{j}", (*path, "temp_attn")
                )
        if i < len(cfg.down_block_types) - 1:
            yield (
                f"{base}.downsamplers.0.conv",
                ("down_blocks", i, "downsample", "conv"),
                "conv2d",
            )
        if cfg.need_refer_emb:
            n_fuse = cfg.layers_per_block + (
                1 if i < len(cfg.down_block_types) - 1 else 0
            )
            for j in range(n_fuse):
                yield from _attn_entries(
                    f"{base}.refer_emb_attns.{j}",
                    ("down_blocks", i, "refer_emb_attns", j),
                )
    if cfg.need_refer_emb:
        yield from _attn_entries(
            "first_refer_emb_attns", ("first_refer_emb_attns",)
        )
        yield from _attn_entries(
            "mid_block_refer_emb_attns", ("mid_block_refer_emb_attns",)
        )
    # mid
    yield from _resnet_entries("mid_block.resnets.0", ("mid_block", "resnet_0"))
    yield from _resnet_entries("mid_block.resnets.1", ("mid_block", "resnet_1"))
    if cfg.temporal_conv:
        yield from _temporal_conv_entries(
            "mid_block.temp_convs.0", ("mid_block", "temp_conv_0")
        )
        yield from _temporal_conv_entries(
            "mid_block.temp_convs.1", ("mid_block", "temp_conv_1")
        )
    yield from _spatial_attn_entries(
        "mid_block.attentions.0", ("mid_block", "attn"), ip
    )
    if cfg.temporal_transformer:
        yield from _temporal_attn_entries(
            "mid_block.temp_attentions.0", ("mid_block", "temp_attn")
        )
    for i, btype in enumerate(cfg.up_block_types):
        base = f"up_blocks.{i}"
        for j in range(cfg.layers_per_block + 1):
            path = ("up_blocks", i, "layers", j)
            yield from _resnet_entries(f"{base}.resnets.{j}", (*path, "resnet"))
            if cfg.temporal_conv:
                yield from _temporal_conv_entries(
                    f"{base}.temp_convs.{j}", (*path, "temp_conv")
                )
            if "CrossAttn" in btype:
                yield from _spatial_attn_entries(
                    f"{base}.attentions.{j}", (*path, "attn"), ip
                )
            if cfg.temporal_transformer:
                yield from _temporal_attn_entries(
                    f"{base}.temp_attentions.{j}", (*path, "temp_attn")
                )
        if i < len(cfg.up_block_types) - 1:
            yield (
                f"{base}.upsamplers.0.conv",
                ("up_blocks", i, "upsample", "conv"),
                "conv2d",
            )
    yield "conv_norm_out", ("conv_norm_out",), "norm"
    yield "conv_out", ("conv_out",), "conv2d"


def vae_key_map(cfg: VAEConfig) -> Iterator[KeyEntry]:
    def attn(tk, path):
        # new diffusers names; legacy (query/key/value/proj_attn) handled in
        # _convert via aliases
        yield f"{tk}.group_norm", (*path, "norm"), "norm"
        yield f"{tk}.to_q", (*path, "to_q"), "linear"
        yield f"{tk}.to_k", (*path, "to_k"), "linear"
        yield f"{tk}.to_v", (*path, "to_v"), "linear"
        yield f"{tk}.to_out.0", (*path, "to_out"), "linear"

    yield "encoder.conv_in", ("encoder", "conv_in"), "conv2d"
    for i in range(len(cfg.block_out_channels)):
        for j in range(cfg.layers_per_block):
            yield from _resnet_entries(
                f"encoder.down_blocks.{i}.resnets.{j}",
                ("encoder", "down", i, "layers", j),
                temb=False,
            )
        if i < len(cfg.block_out_channels) - 1:
            yield (
                f"encoder.down_blocks.{i}.downsamplers.0.conv",
                ("encoder", "down", i, "downsample"),
                "conv2d",
            )
    yield from _resnet_entries(
        "encoder.mid_block.resnets.0", ("encoder", "mid", "resnet_0"), temb=False
    )
    yield from attn("encoder.mid_block.attentions.0", ("encoder", "mid", "attn"))
    yield from _resnet_entries(
        "encoder.mid_block.resnets.1", ("encoder", "mid", "resnet_1"), temb=False
    )
    yield "encoder.conv_norm_out", ("encoder", "norm_out"), "norm"
    yield "encoder.conv_out", ("encoder", "conv_out"), "conv2d"
    yield "quant_conv", ("quant_conv",), "conv2d"
    yield "post_quant_conv", ("post_quant_conv",), "conv2d"
    yield "decoder.conv_in", ("decoder", "conv_in"), "conv2d"
    yield from _resnet_entries(
        "decoder.mid_block.resnets.0", ("decoder", "mid", "resnet_0"), temb=False
    )
    yield from attn("decoder.mid_block.attentions.0", ("decoder", "mid", "attn"))
    yield from _resnet_entries(
        "decoder.mid_block.resnets.1", ("decoder", "mid", "resnet_1"), temb=False
    )
    for i in range(len(cfg.block_out_channels)):
        for j in range(cfg.layers_per_block + 1):
            yield from _resnet_entries(
                f"decoder.up_blocks.{i}.resnets.{j}",
                ("decoder", "up", i, "layers", j),
                temb=False,
            )
        if i < len(cfg.block_out_channels) - 1:
            yield (
                f"decoder.up_blocks.{i}.upsamplers.0.conv",
                ("decoder", "up", i, "upsample"),
                "conv2d",
            )
    yield "decoder.conv_norm_out", ("decoder", "norm_out"), "norm"
    yield "decoder.conv_out", ("decoder", "conv_out"), "conv2d"


def referencenet_key_map(cfg: ReferenceNetConfig) -> Iterator[KeyEntry]:
    """ReferenceNet2D = SD UNet trunk (referencenet.py head pruned at
    :624-636), so the torch keys are the 2D UNet's down+mid subset."""
    yield "conv_in", ("conv_in",), "conv2d"
    yield "time_embedding.linear_1", ("time_embedding", "linear_1"), "linear"
    yield "time_embedding.linear_2", ("time_embedding", "linear_2"), "linear"
    n = len(cfg.block_out_channels)
    for i in range(n):
        base = f"down_blocks.{i}"
        has_attn = i < n - 1
        for j in range(cfg.layers_per_block):
            path = ("down_blocks", i, "layers", j)
            yield from _resnet_entries(f"{base}.resnets.{j}", (*path, "resnet"))
            if has_attn:
                yield from _spatial_attn_entries(
                    f"{base}.attentions.{j}", (*path, "attn"), False
                )
        if i < n - 1:
            yield (
                f"{base}.downsamplers.0.conv",
                ("down_blocks", i, "downsample", "conv"),
                "conv2d",
            )
    yield from _resnet_entries("mid_block.resnets.0", ("mid_block", "resnet_0"))
    yield from _spatial_attn_entries(
        "mid_block.attentions.0", ("mid_block", "attn"), False
    )
    yield from _resnet_entries("mid_block.resnets.1", ("mid_block", "resnet_1"))


def controlnet_key_map(cfg: ControlNetConfig) -> Iterator[KeyEntry]:
    """diffusers ControlNetModel keys -> our tree."""
    yield "conv_in", ("conv_in",), "conv2d"
    yield "time_embedding.linear_1", ("time_embedding", "linear_1"), "linear"
    yield "time_embedding.linear_2", ("time_embedding", "linear_2"), "linear"
    yield (
        "controlnet_cond_embedding.conv_in",
        ("cond_embedding", "conv_in"),
        "conv2d",
    )
    n_pairs = len(cfg.cond_embed_channels) - 1
    for i in range(n_pairs):
        yield (
            f"controlnet_cond_embedding.blocks.{2 * i}",
            ("cond_embedding", "blocks", i, "conv1"),
            "conv2d",
        )
        yield (
            f"controlnet_cond_embedding.blocks.{2 * i + 1}",
            ("cond_embedding", "blocks", i, "conv2"),
            "conv2d",
        )
    yield (
        "controlnet_cond_embedding.conv_out",
        ("cond_embedding", "conv_out"),
        "conv2d",
    )
    n = len(cfg.block_out_channels)
    zc = 0
    yield f"controlnet_down_blocks.{zc}", ("zero_convs", zc), "conv2d"
    for i in range(n):
        base = f"down_blocks.{i}"
        has_attn = i < n - 1
        for j in range(cfg.layers_per_block):
            path = ("down_blocks", i, "layers", j)
            yield from _resnet_entries(f"{base}.resnets.{j}", (*path, "resnet"))
            if has_attn:
                yield from _spatial_attn_entries(
                    f"{base}.attentions.{j}", (*path, "attn"), False
                )
            zc += 1
            yield f"controlnet_down_blocks.{zc}", ("zero_convs", zc), "conv2d"
        if i < n - 1:
            yield (
                f"{base}.downsamplers.0.conv",
                ("down_blocks", i, "downsample", "conv"),
                "conv2d",
            )
            zc += 1
            yield f"controlnet_down_blocks.{zc}", ("zero_convs", zc), "conv2d"
    yield from _resnet_entries("mid_block.resnets.0", ("mid_block", "resnet_0"))
    yield from _spatial_attn_entries(
        "mid_block.attentions.0", ("mid_block", "attn"), False
    )
    yield from _resnet_entries("mid_block.resnets.1", ("mid_block", "resnet_1"))
    yield "controlnet_mid_block", ("mid_zero_conv",), "conv2d"


def clip_text_key_map(cfg: CLIPTextConfig) -> Iterator[KeyEntry]:
    yield (
        "text_model.embeddings.token_embedding",
        ("token_embedding",),
        "embedding",
    )
    yield (
        "text_model.embeddings.position_embedding",
        ("position_embedding",),
        "embedding",
    )
    for i in range(cfg.num_layers):
        pre = f"text_model.encoder.layers.{i}"
        path = ("layers", i)
        yield f"{pre}.layer_norm1", (*path, "layer_norm1"), "norm"
        for n in ("q_proj", "k_proj", "v_proj", "out_proj"):
            yield f"{pre}.self_attn.{n}", (*path, n), "linear"
        yield f"{pre}.layer_norm2", (*path, "layer_norm2"), "norm"
        yield f"{pre}.mlp.fc1", (*path, "fc1"), "linear"
        yield f"{pre}.mlp.fc2", (*path, "fc2"), "linear"
    yield "text_model.final_layer_norm", ("final_layer_norm",), "norm"


def clip_vision_key_map(cfg) -> Iterator[KeyEntry]:
    """transformers CLIPVisionModel(WithProjection) -> models/clip_vision.py
    params (the IP-Adapter image encoder the reference loads via mmcm's
    clip_vision_extractor, SURVEY §2.9). Note 'pre_layrnorm' is the HF
    checkpoint spelling."""
    # (patch_embedding handled in convert_clip_vision: bare HWIO array leaf)
    yield (
        "vision_model.embeddings.class_embedding",
        ("class_embedding",),
        "raw",
    )
    yield (
        "vision_model.embeddings.position_embedding",
        ("position_embedding",),
        "embedding",
    )
    yield "vision_model.pre_layrnorm", ("pre_layrnorm",), "norm"
    for i in range(cfg.num_layers):
        pre = f"vision_model.encoder.layers.{i}"
        path = ("layers", i)
        yield f"{pre}.layer_norm1", (*path, "layer_norm1"), "norm"
        for n in ("q_proj", "k_proj", "v_proj", "out_proj"):
            yield f"{pre}.self_attn.{n}", (*path, n), "linear"
        yield f"{pre}.layer_norm2", (*path, "layer_norm2"), "norm"
        yield f"{pre}.mlp.fc1", (*path, "fc1"), "linear"
        yield f"{pre}.mlp.fc2", (*path, "fc2"), "linear"
    yield "vision_model.post_layernorm", ("post_layernorm",), "norm"
    yield "visual_projection", ("visual_projection",), "linear"


# ---------------------------------------------------------------------------
# application

_VAE_LEGACY_ALIASES = {
    ".query": ".to_q",
    ".key": ".to_k",
    ".value": ".to_v",
    ".proj_attn": ".to_out.0",
}


def _get(tree, path):
    for k in path:
        if isinstance(tree, (list, tuple)):
            tree = tree[k]
        else:
            if k not in tree:
                return None
            tree = tree[k]
    return tree


def _check_shape(name, old, value):
    if old is not None and np.shape(old) != np.shape(value):
        raise ValueError(
            f"checkpoint tensor for {name} has shape {np.shape(value)}, "
            f"model expects {np.shape(old)} — wrong checkpoint for this "
            "architecture preset?"
        )


def _set_leaf(tree, path, leaf_key, value):
    node = _get(tree, path)
    if node is None:
        return False
    old = node.get(leaf_key) if isinstance(node, dict) else None
    _check_shape(f"{'.'.join(map(str, path))}.{leaf_key}", old, value)
    node[leaf_key] = value
    return True


def _transform(kind: str, suffix: str, arr: np.ndarray) -> Tuple[str, np.ndarray]:
    """Return (leaf name, converted array)."""
    if kind == "linear":
        if suffix == "weight":
            return "kernel", np.ascontiguousarray(arr.T)
        return "bias", arr
    if kind == "conv2d":
        if suffix == "weight":
            return "kernel", np.ascontiguousarray(arr.transpose(2, 3, 1, 0))
        return "bias", arr
    if kind == "conv3d_t":
        if suffix == "weight":
            # (O, I, kT, 1, 1) -> (kT, 1, I, O)
            return "kernel", np.ascontiguousarray(arr[:, :, :, :, 0].transpose(2, 3, 1, 0))
        return "bias", arr
    if kind == "conv3d_spatial":
        if suffix == "weight":
            # InflatedConv3d (O, I, 1, kH, kW) -> (kH, kW, I, O); plain 2D
            # conv weights (O, I, kH, kW) accepted too
            if arr.ndim == 5:
                arr = arr[:, :, 0]
            return "kernel", np.ascontiguousarray(arr.transpose(2, 3, 1, 0))
        return "bias", arr
    if kind == "norm":
        return ("scale" if suffix == "weight" else "bias"), arr
    raise ValueError(kind)


def apply_state_dict(
    params,
    key_map: List[KeyEntry],
    state_dict: Dict[str, np.ndarray],
    aliases: Optional[Dict[str, str]] = None,
) -> Tuple[int, List[str]]:
    """Write torch tensors into the params tree in place.

    Returns (num_assigned, leftover_torch_keys).
    """
    sd = dict(state_dict)
    if aliases:
        for k in list(sd):
            nk = k
            for old, new in aliases.items():
                nk = nk.replace(old, new)
            if nk != k:
                sd[nk] = sd.pop(k)
    consumed = set()
    n = 0
    for tk, path, kind in key_map:
        if kind in ("raw", "embedding"):
            key = tk if kind == "raw" else f"{tk}.weight"
            if key in sd:
                node = _get(params, path[:-1])
                if node is not None and path[-1] in node:
                    arr = np.asarray(sd[key])
                    _check_shape(".".join(map(str, path)), node[path[-1]], arr)
                    node[path[-1]] = arr
                    consumed.add(key)
                    n += 1
            continue
        for suffix in ("weight", "bias"):
            key = f"{tk}.{suffix}"
            if key not in sd:
                continue
            leaf, arr = _transform(kind, suffix, np.asarray(sd[key]))
            if _set_leaf(params, path, leaf, arr):
                consumed.add(key)
                n += 1
    leftover = [k for k in sd if k not in consumed]
    return n, leftover


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    from safetensors import safe_open

    out = {}
    with safe_open(path, framework="numpy") as f:
        for k in f.keys():
            out[k] = f.get_tensor(k)
    return out


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]

    def conv(v):
        # IP-Adapter .bin files nest subdicts ({"image_proj": ..,
        # "ip_adapter": ..}); preserve the nesting as numpy trees
        if isinstance(v, dict):
            return {k: conv(x) for k, x in v.items()}
        return v.float().numpy()

    return {k: conv(v) for k, v in sd.items()}


def convert_unet3d(params, cfg: UNet3DConfig, state_dict) -> Tuple[int, List[str]]:
    return apply_state_dict(params, list(unet3d_key_map(cfg)), state_dict)


def convert_vae(params, cfg: VAEConfig, state_dict) -> Tuple[int, List[str]]:
    return apply_state_dict(
        params, list(vae_key_map(cfg)), state_dict, aliases=_VAE_LEGACY_ALIASES
    )


def convert_clip_text(params, cfg: CLIPTextConfig, state_dict) -> Tuple[int, List[str]]:
    return apply_state_dict(params, list(clip_text_key_map(cfg)), state_dict)


def convert_clip_vision(params, cfg, state_dict) -> Tuple[int, List[str]]:
    """Load a transformers CLIPVisionModel(WithProjection) checkpoint (the
    IP-Adapter image encoder) into the functional clip_vision params."""
    n, leftover = apply_state_dict(
        params, list(clip_vision_key_map(cfg)), state_dict
    )
    pk = "vision_model.embeddings.patch_embedding.weight"
    if pk in state_dict:
        # conv (D, 3, ps, ps) OIHW -> our bare HWIO array leaf
        arr = np.ascontiguousarray(
            np.asarray(state_dict[pk]).transpose(2, 3, 1, 0)
        )
        _check_shape("patch_embedding", params.get("patch_embedding"), arr)
        params["patch_embedding"] = arr
        n += 1
        leftover = [k for k in leftover if k != pk]
    return n, leftover


def convert_referencenet(
    params, cfg: ReferenceNetConfig, state_dict
) -> Tuple[int, List[str]]:
    return apply_state_dict(params, list(referencenet_key_map(cfg)), state_dict)


def convert_controlnet(
    params, cfg: ControlNetConfig, state_dict
) -> Tuple[int, List[str]]:
    return apply_state_dict(params, list(controlnet_key_map(cfg)), state_dict)


def pose_guider_key_map(cfg: ControlNetConfig) -> Iterator[KeyEntry]:
    """Moore-AnimateAnyone PoseGuider (reference musev/models/controlnet.py:
    326-371): conv_in + (conv, strided conv) pairs + zero conv_out, all
    InflatedConv3d (kT=1), SiLU between. Same tree as our controlnet
    cond_embedding stem."""
    yield "conv_in", ("conv_in",), "conv3d_spatial"
    n_pairs = len(cfg.cond_embed_channels) - 1
    for i in range(n_pairs):
        yield f"blocks.{2 * i}", ("blocks", i, "conv1"), "conv3d_spatial"
        yield f"blocks.{2 * i + 1}", ("blocks", i, "conv2"), "conv3d_spatial"
    yield "conv_out", ("conv_out",), "conv3d_spatial"


def convert_pose_guider(
    params, cfg: ControlNetConfig, state_dict
) -> Tuple[int, List[str]]:
    return apply_state_dict(params, list(pose_guider_key_map(cfg)), state_dict)


def export_state_dict(key_map, params) -> Dict[str, np.ndarray]:
    """Inverse of apply_state_dict: read the params tree through a key map
    and emit torch-layout tensors (parity tests, interop, and synthesizing
    full reference-layout checkpoints for the ingestion tests).

    Every emitted tensor is C-contiguous: safetensors serializes the raw
    backing buffer, so a transposed VIEW would silently save garbage."""
    out: Dict[str, np.ndarray] = {}
    C = np.ascontiguousarray
    for tk, path, kind in key_map:
        if kind in ("raw", "embedding"):
            node = _get(params, path[:-1])
            if node is None or path[-1] not in node:
                continue
            key = tk if kind == "raw" else f"{tk}.weight"
            out[key] = C(np.asarray(node[path[-1]]))
            continue
        node = _get(params, path)
        if node is None or "kernel" not in node and "scale" not in node:
            continue
        if kind == "linear":
            out[f"{tk}.weight"] = C(np.asarray(node["kernel"]).T)
        elif kind == "conv2d":
            out[f"{tk}.weight"] = C(
                np.asarray(node["kernel"]).transpose(3, 2, 0, 1)
            )
        elif kind == "conv3d_t":
            # (kT, 1, I, O) -> (O, I, kT, 1, 1)
            out[f"{tk}.weight"] = C(
                np.asarray(node["kernel"]).transpose(3, 2, 0, 1)[
                    :, :, :, :, None
                ]
            )
        elif kind == "conv3d_spatial":
            # (kH, kW, I, O) -> InflatedConv3d (O, I, 1, kH, kW)
            out[f"{tk}.weight"] = C(
                np.asarray(node["kernel"]).transpose(3, 2, 0, 1)[:, :, None]
            )
        elif kind == "norm":
            out[f"{tk}.weight"] = C(np.asarray(node["scale"]))
            out[f"{tk}.bias"] = C(np.asarray(node["bias"]))
            continue
        else:
            raise ValueError(kind)
        if "bias" in node:
            out[f"{tk}.bias"] = C(np.asarray(node["bias"]))
    return out


def export_unet3d(params, cfg: UNet3DConfig) -> Dict[str, np.ndarray]:
    """Inverse of convert_unet3d (for parity tests and interop)."""
    return export_state_dict(unet3d_key_map(cfg), params)


def export_key_names(key_map, params) -> List[str]:
    """The torch keys ``export_state_dict`` would emit for this tree.

    Consults only tree structure (key presence), no array data — so it
    works on ``jax.eval_shape`` trees, letting the key-naming tests pin the
    full flagship-preset key set without materializing gigabytes of params.
    Consistency with export_state_dict is asserted in test_sd_weights."""
    out: List[str] = []
    for tk, path, kind in key_map:
        if kind in ("raw", "embedding"):
            node = _get(params, path[:-1])
            if node is None or path[-1] not in node:
                continue
            out.append(tk if kind == "raw" else f"{tk}.weight")
            continue
        node = _get(params, path)
        if node is None or ("kernel" not in node and "scale" not in node):
            continue
        if kind == "norm":
            out += [f"{tk}.weight", f"{tk}.bias"]
            continue
        out.append(f"{tk}.weight")
        if "bias" in node:
            out.append(f"{tk}.bias")
    return out


def missing_torch_keys(
    key_map, params, state_dict: Dict[str, np.ndarray],
    aliases: Optional[Dict[str, str]] = None,
) -> List[str]:
    """Expected torch keys ABSENT from a checkpoint.

    Conversion is deliberately tolerant (missing keys keep the init value,
    strict=False mirror) — which means a renamed-key drift loads silently
    with random weights. This is the loud counterpart: the loader's strict
    mode raises when a user-supplied checkpoint leaves any of these
    unconsumed."""
    names = set(state_dict)
    if aliases:
        names = {
            _apply_aliases(k, aliases) for k in names
        }
    return [k for k in export_key_names(key_map, params) if k not in names]


def _apply_aliases(key: str, aliases: Dict[str, str]) -> str:
    for old, new in aliases.items():
        key = key.replace(old, new)
    return key


def ip_adapter_site_paths(cfg: UNet3DConfig) -> List[Tuple]:
    """attn2 sites in the IP-Adapter checkpoint order: down blocks, up
    blocks (skipping the attnless first up block), mid last
    (ip_adapter_loader.py:232-305)."""
    paths = []
    for i, btype in enumerate(cfg.down_block_types):
        if "CrossAttn" not in btype:
            continue
        for j in range(cfg.layers_per_block):
            paths.append(("down_blocks", i, "layers", j, "attn", "block", "attn2"))
    for i, btype in enumerate(cfg.up_block_types):
        if "CrossAttn" not in btype:
            continue
        for j in range(cfg.layers_per_block + 1):
            paths.append(("up_blocks", i, "layers", j, "attn", "block", "attn2"))
    paths.append(("mid_block", "attn", "block", "attn2"))
    return paths


def convert_ip_adapter_unet(
    unet_params, cfg: UNet3DConfig, ip_adapter_state_dict: Dict[str, np.ndarray],
    face: bool = False,
) -> int:
    """Copy the numbered to_k_ip/to_v_ip weights of an ip_adapter.bin
    ("ip_adapter" subdict: keys '1.to_k_ip.weight', ...) into the attn2 dual-KV
    projections. ``face=True`` writes the FaceID slots instead."""
    sd = ip_adapter_state_dict
    if "ip_adapter" in sd:
        sd = sd["ip_adapter"]
    paths = ip_adapter_site_paths(cfg)
    k_name, v_name = ("to_k_ip_face", "to_v_ip_face") if face else ("to_k_ip", "to_v_ip")
    n = 0
    for site_idx, path in enumerate(paths):
        num = 2 * site_idx + 1  # attn2 sites are the odd processor indices
        node = _get(unet_params, path)
        if node is None:
            continue
        for proj, tgt in ((f"{num}.to_k_ip.weight", k_name),
                          (f"{num}.to_v_ip.weight", v_name)):
            if proj in sd and tgt in node:
                node[tgt]["kernel"] = np.ascontiguousarray(
                    np.asarray(sd[proj]).T
                )
                n += 1
    return n


def convert_image_proj(proj_params, state_dict: Dict[str, np.ndarray]) -> int:
    """Load an ImageProjModel ("image_proj" subdict: proj.weight/bias,
    norm.weight/bias) into our image_proj params."""
    sd = state_dict.get("image_proj", state_dict)
    n = 0
    if "proj.weight" in sd:
        proj_params["proj"]["kernel"] = np.ascontiguousarray(np.asarray(sd["proj.weight"]).T)
        n += 1
    if "proj.bias" in sd:
        proj_params["proj"]["bias"] = np.asarray(sd["proj.bias"])
        n += 1
    if "norm.weight" in sd:
        proj_params["norm"]["scale"] = np.asarray(sd["norm.weight"])
        n += 1
    if "norm.bias" in sd:
        proj_params["norm"]["bias"] = np.asarray(sd["norm.bias"])
        n += 1
    return n


def convert_mlp_proj(proj_params, state_dict: Dict[str, np.ndarray]) -> int:
    """Load an IPAdapterFaceID MLPProjModel ("image_proj" subdict of an
    ip-adapter-faceid_sd15.bin: proj.0 = Linear(id, id*2), proj.2 =
    Linear(id*2, cross*tokens), norm = LayerNorm) into our mlp_proj params
    (fc1/fc2/norm). The reference loads this via IPAdapterFaceID image_proj
    (ip_adapter_face_loader.py:98-144)."""
    sd = state_dict.get("image_proj", state_dict)
    n = 0
    for torch_key, ours in (("proj.0", "fc1"), ("proj.2", "fc2")):
        wk, bk = f"{torch_key}.weight", f"{torch_key}.bias"
        if wk in sd:
            kern = np.ascontiguousarray(np.asarray(sd[wk]).T)
            _check_shape(f"mlp_proj.{ours}.kernel",
                         proj_params[ours].get("kernel"), kern)
            proj_params[ours]["kernel"] = kern
            n += 1
        if bk in sd:
            proj_params[ours]["bias"] = np.asarray(sd[bk])
            n += 1
    if "norm.weight" in sd:
        _check_shape("mlp_proj.norm.scale", proj_params["norm"].get("scale"),
                     sd["norm.weight"])
        proj_params["norm"]["scale"] = np.asarray(sd["norm.weight"])
        proj_params["norm"]["bias"] = np.asarray(sd["norm.bias"])
        n += 2
    return n


def convert_resampler(res_params, state_dict: Dict[str, np.ndarray]) -> int:
    """Load a tencent-ailab Resampler state dict ("image_proj" subdict of an
    ip-adapter-plus_sd15.bin: latents, proj_in/out, norm_out, and per depth
    layers.{i}.0 = PerceiverAttention(norm1=media norm, norm2=latent norm,
    to_q, to_kv, to_out) + layers.{i}.1 = FeedForward(LN, Linear, GELU,
    Linear)) into our resampler params (reference ip_adapter_loader.py:95-111
    selecting Resampler for IPAdapterPlus)."""
    sd = state_dict.get("image_proj", state_dict)
    n = 0

    def set_linear(node, torch_key):
        nonlocal n
        if f"{torch_key}.weight" in sd:
            node["kernel"] = np.ascontiguousarray(
                np.asarray(sd[f"{torch_key}.weight"]).T
            )
            n += 1
        if f"{torch_key}.bias" in sd and "bias" in node:
            node["bias"] = np.asarray(sd[f"{torch_key}.bias"])
            n += 1

    def set_norm(node, torch_key):
        nonlocal n
        if f"{torch_key}.weight" in sd:
            node["scale"] = np.asarray(sd[f"{torch_key}.weight"])
            node["bias"] = np.asarray(sd[f"{torch_key}.bias"])
            n += 2

    if "latents" in sd:
        res_params["latents"] = np.asarray(sd["latents"])[0]  # (1, Q, D)->(Q, D)
        n += 1
    set_linear(res_params["proj_in"], "proj_in")
    set_linear(res_params["proj_out"], "proj_out")
    set_norm(res_params["norm_out"], "norm_out")
    for i, layer in enumerate(res_params["layers"]):
        set_norm(layer["norm_media"], f"layers.{i}.0.norm1")  # media norm
        set_norm(layer["norm1"], f"layers.{i}.0.norm2")  # latent norm
        set_linear(layer["to_q"], f"layers.{i}.0.to_q")
        set_linear(layer["to_kv"], f"layers.{i}.0.to_kv")
        set_linear(layer["to_out"], f"layers.{i}.0.to_out")
        set_norm(layer["ff_norm"], f"layers.{i}.1.0")
        set_linear(layer["ff1"], f"layers.{i}.1.1")
        set_linear(layer["ff2"], f"layers.{i}.1.3")
    return n


def merge_sd_base_weights(
    unet_params, cfg: UNet3DConfig, sd_unet_state_dict
) -> Tuple[int, List[str]]:
    """Overwrite the spatial (2D) weights with a T2I base model's UNet weights,
    keeping temporal weights (reference update_unet_with_sd,
    unet_loader.py:41-80). The 2D state dict simply lacks temporal keys, so a
    plain tolerant apply does exactly this."""
    return convert_unet3d(unet_params, cfg, sd_unet_state_dict)
