"""Named model presets and negative-prompt registry.

Reference: the python-dict registries under configs/model/ loaded with
load_pyhon_obj (text2video.py:671-776) and the architecture presets keyed by
name in unet_loader.py:232-268. A ``ModelPreset`` bundles the architecture
configs plus the checkpoint-path slots a user fills in for their weights.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

from ..models.clip_text import CLIPTextConfig
from ..models.clip_vision import CLIPVisionConfig
from ..models.controlnet import ControlNetConfig
from ..models.referencenet import ReferenceNetConfig
from ..models.unet3d import (
    UNet3DConfig,
    musev_config,
    musev_referencenet_config,
)
from ..models.vae import VAEConfig


@dataclasses.dataclass
class ModelPreset:
    name: str
    unet_cfg: UNet3DConfig
    vae_cfg: VAEConfig = VAEConfig()
    text_cfg: CLIPTextConfig = CLIPTextConfig()
    referencenet_cfg: Optional[ReferenceNetConfig] = None
    clip_vision_cfg: Optional[CLIPVisionConfig] = None
    controlnet_cfg: Optional[ControlNetConfig] = None
    ip_adapter_clip_dim: int = 1024
    ip_adapter_tokens: int = 4
    ip_adapter_face_id_dim: int = 512
    # reference configs/model/ip_adapter.py model_name: "IPAdapter" (pooled
    # emb -> ImageProjModel) or "IPAdapterPlus"/"IPAdapterPlus-face"
    # (penultimate patch tokens -> perceiver Resampler with 16 queries,
    # ip_adapter_loader.py:95-111)
    ip_adapter_model_name: str = "IPAdapter"
    # checkpoint path slots (filled by the user / task config)
    unet_checkpoint: Optional[str] = None
    sd_base_checkpoint: Optional[str] = None
    vae_checkpoint: Optional[str] = None
    text_checkpoint: Optional[str] = None
    referencenet_checkpoint: Optional[str] = None
    # IP-Adapter image encoder (transformers CLIPVisionModelWithProjection
    # weights, e.g. the ViT-H ip_image_encoder the reference downloads)
    clip_vision_checkpoint: Optional[str] = None
    ip_adapter_checkpoint: Optional[str] = None
    ip_adapter_face_checkpoint: Optional[str] = None
    controlnet_checkpoint: Optional[str] = None
    # Moore-AnimateAnyone-style PoseGuider stem (video2video.py:531-534,
    # pipeline_controlnet.py:229-231); built when a checkpoint is given
    pose_guider_checkpoint: Optional[str] = None
    pose_guider_cfg: Optional[ControlNetConfig] = None
    tokenizer_path: Optional[str] = None
    # user-surface adapters (predictor.py:248-254 textual inversion,
    # :296-306 LCM-LoRA, :311-327 LoRA): entries are "path", "path:scale"
    # (lora) / "path:trigger" (textual inversion)
    lora_checkpoints: Optional[List[str]] = None
    textual_inversion_checkpoints: Optional[List[str]] = None
    lcm_lora_checkpoint: Optional[str] = None
    lcm_lora_scale: float = 1.0


def get_model_preset(name: str, **overrides) -> ModelPreset:
    """The three shipped presets (unet_loader.py:232-268)."""
    if name == "musev":
        preset = ModelPreset(name=name, unet_cfg=musev_config())
    elif name in ("musev_referencenet", "musev_referencenet_pose"):
        preset = ModelPreset(
            name=name,
            unet_cfg=musev_referencenet_config(),
            referencenet_cfg=ReferenceNetConfig(),
            clip_vision_cfg=CLIPVisionConfig(),
            controlnet_cfg=ControlNetConfig() if name.endswith("pose") else None,
        )
    else:
        raise ValueError(
            f"unknown model preset {name!r}; choose musev, musev_referencenet,"
            " musev_referencenet_pose"
        )
    for k, v in overrides.items():
        setattr(preset, k, v)
    return preset


# Named negative prompts (reference configs/model/negative_prompt.py —
# these presets are user-facing config data and must match by name).
NEGATIVE_PROMPTS: Dict[str, str] = {
    "Empty": "",
    "V1": (
        "nsfw, lowres, bad anatomy, bad hands, text, error, missing fingers, "
        "extra digit, fewer digits, cropped, worst quality, low quality, "
        "normal quality, jpeg artifacts, signature, watermark, username, "
        "blurry, tail, watermarks"
    ),
    "V2": (
        "badhandv4, ng_deepnegative_v1_75t, (((multiple heads))), "
        "(((bad body))), (((two people))), ((extra arms)), ((deformed body)), "
        "(((sexy))), paintings,(((two heads))), ((big head)),sketches, "
        "(worst quality:2), (low quality:2), (normal quality:2), lowres, "
        "((monochrome)), ((grayscale)), skin spots, acnes, skin blemishes, "
        "age spot, glans, (((nsfw))), nipples, extra fingers, (extra legs), "
        "(long neck), mutated hands, (fused fingers), (too many fingers)"
    ),
    "V3": "badhandv4, ng_deepnegative_v1_75t, bad quality",
    "V4": (
        "badhandv4,ng_deepnegative_v1_75t,EasyNegativeV2,"
        "bad_prompt_version2-neg,bad quality"
    ),
    "V5": (
        "(((multiple heads))), (((bad body))), (((two people))), "
        "((extra arms)), ((deformed body)), (((sexy))), paintings,"
        "(((two heads))), ((big head)),sketches, (worst quality:2), "
        "(low quality:2), (normal quality:2), lowres, ((monochrome)), "
        "((grayscale)), skin spots, acnes, skin blemishes, age spot, glans, "
        "(((nsfw))), nipples, extra fingers, (extra legs), (long neck), "
        "mutated hands, (fused fingers), (too many fingers)"
    ),
}


def resolve_negative_prompt(name_or_text: str) -> str:
    return NEGATIVE_PROMPTS.get(name_or_text, name_or_text)
