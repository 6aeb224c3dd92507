"""LoRA fuse/unfuse by in-place weight delta.

Reference: musev/utils/model_util.py:108-263 (update_pipeline_lora_model) —
LoRA weights are folded into the base weights (W += scale * up @ down) with a
stored undo, rather than kept as runtime branches; unload subtracts the same
delta (model_util.py:468).

Supports kohya-format safetensors (``lora_unet_*`` / ``lora_te_*`` keys with
``lora_down``/``lora_up``/``alpha``). Keys are matched to param paths through
the same declarative key maps as the checkpoint converter, via normalized
name comparison, so any key the converter understands can take a LoRA.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

import numpy as np

from .clip_text import CLIPTextConfig
from .sd_weights import clip_text_key_map, unet3d_key_map
from .unet3d import UNet3DConfig


def _normalize(name: str) -> str:
    return re.sub(r"[^a-z0-9]", "", name.lower())


def _collect_modules(key_map) -> Dict[str, Tuple[Tuple, str]]:
    """normalized torch module name -> (tree path, kind)."""
    out = {}
    for tk, path, kind in key_map:
        if kind in ("linear", "conv2d"):
            out[_normalize(tk)] = (path, kind)
    return out


def parse_kohya_lora(
    state_dict: Dict[str, np.ndarray]
) -> Dict[str, Dict[str, np.ndarray]]:
    """Group flat LoRA keys into {module: {down, up, alpha}} per network.

    Accepts every common layout (the reference ships a kohya->diffusers
    converter, convert_lora_safetensor_to_diffusers.py; here all three park
    in one parser):
      * kohya:      lora_unet_<mod>.lora_down.weight / .lora_up / .alpha
      * peft:       unet.<mod>.lora_A[.default].weight / lora_B
      * attn-procs: unet.<mod>.processor.to_q_lora.down.weight / .up
    """
    mods: Dict[str, Dict[str, np.ndarray]] = {}
    for k, v in state_dict.items():
        if ".lora_down" in k:
            mod, _ = k.split(".lora_down", 1)
            mods.setdefault(mod, {})["down"] = np.asarray(v)
        elif ".lora_up" in k:
            mod, _ = k.split(".lora_up", 1)
            mods.setdefault(mod, {})["up"] = np.asarray(v)
        elif ".lora_A" in k:  # peft
            mod, _ = k.split(".lora_A", 1)
            mods.setdefault(mod, {})["down"] = np.asarray(v)
        elif ".lora_B" in k:
            mod, _ = k.split(".lora_B", 1)
            mods.setdefault(mod, {})["up"] = np.asarray(v)
        elif ".lora.down" in k:  # diffusers "<mod>.lora.down.weight"
            mod = k.split(".lora.down", 1)[0]
            mods.setdefault(mod, {})["down"] = np.asarray(v)
        elif ".lora.up" in k:
            mod = k.split(".lora.up", 1)[0]
            mods.setdefault(mod, {})["up"] = np.asarray(v)
        elif "_lora.down" in k:
            mod = _strip_attn_proc(k.split(".down.weight", 1)[0])
            mods.setdefault(mod, {})["down"] = np.asarray(v)
        elif "_lora.up" in k:
            mod = _strip_attn_proc(k.split(".up.weight", 1)[0])
            mods.setdefault(mod, {})["up"] = np.asarray(v)
        elif k.endswith(".alpha"):
            mod = k[: -len(".alpha")]
            mods.setdefault(mod, {})["alpha"] = np.asarray(v)
    return mods


def _strip_attn_proc(mod: str) -> str:
    """'...attn1.processor.to_q_lora' -> '...attn1.to_q'."""
    mod = mod.replace(".processor.", ".")
    return re.sub(r"_lora$", "", mod).replace("to_out_lora", "to_out")


def _delta(entry: Dict[str, np.ndarray]) -> Optional[np.ndarray]:
    if "down" not in entry or "up" not in entry:
        return None
    down, up = entry["down"], entry["up"]
    if down.ndim == 4:  # conv lora (r, in, kh, kw) / (out, r, 1, 1)
        down = down.reshape(down.shape[0], -1)
        up = up.reshape(up.shape[0], -1)
    rank = down.shape[0]
    alpha = float(entry.get("alpha", rank))
    return (alpha / rank) * (up @ down)  # (out, in)


def _get(tree, path):
    for k in path:
        tree = tree[k]
    return tree


def fuse_lora(
    params,
    cfg: UNet3DConfig,
    lora_state_dict: Dict[str, np.ndarray],
    scale: float = 1.0,
    text_params=None,
    text_cfg: Optional[CLIPTextConfig] = None,
) -> Tuple[int, List[str]]:
    """Fold LoRA deltas into UNet (and optionally text-encoder) params.

    Call again with ``scale=-scale`` to unfuse (model_util.py:468).
    Returns (num_fused, unmatched_module_names).
    """
    unet_modules = _collect_modules(unet3d_key_map(cfg))
    text_modules = (
        _collect_modules(clip_text_key_map(text_cfg)) if text_cfg else {}
    )
    mods = parse_kohya_lora(lora_state_dict)
    fused, unmatched = 0, []
    for mod, entry in mods.items():
        d = _delta(entry)
        if d is None:
            unmatched.append(mod)
            continue
        if mod.startswith("lora_unet_"):
            lookup, tree = unet_modules, params
            name = mod[len("lora_unet_") :]
        elif mod.startswith("unet."):
            lookup, tree = unet_modules, params
            name = mod[len("unet.") :]
        elif mod.startswith("lora_te") and text_params is not None:
            # lora_te_ / lora_te1_ (sdxl splits te1/te2; te1 = CLIP-L)
            lookup, tree = text_modules, text_params
            name = mod.split("_", 2)[2]
        elif mod.startswith("text_encoder.") and text_params is not None:
            lookup, tree = text_modules, text_params
            name = mod[len("text_encoder.") :]
        else:
            unmatched.append(mod)
            continue
        hit = lookup.get(_normalize(name))
        if hit is None:
            unmatched.append(mod)
            continue
        path, kind = hit
        node = _get(tree, path)
        kernel = np.asarray(node["kernel"])
        if kind == "linear":
            node["kernel"] = kernel + scale * d.T.astype(kernel.dtype)
        else:  # conv2d HWIO; lora delta is (out, in) for 1x1
            kh, kw, ci, co = kernel.shape
            d4 = d.reshape(co, ci, 1, 1) if (kh, kw) == (1, 1) else d.reshape(
                co, ci, kh, kw
            )
            node["kernel"] = kernel + scale * d4.transpose(2, 3, 1, 0).astype(
                kernel.dtype
            )
        fused += 1
    return fused, unmatched
