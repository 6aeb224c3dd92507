"""Model zoo construction: preset -> initialized/loaded MusevModels.

TPU counterpart of the reference's loader stack (unet_loader.py,
referencenet_loader.py, ip_adapter_loader.py + DiffusersPipelinePredictor
init, SURVEY §3.3): builds every branch's params, then applies user
checkpoints through the declarative converter when paths are provided —
including the T2I base-model spatial overwrite.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax
import jax.numpy as jnp

from ..configs.model_registry import ModelPreset
from ..models import sd_weights
from ..models.clip_text import init_clip_text
from ..models.clip_vision import init_clip_vision
from ..models.controlnet import init_controlnet
from ..models.init_util import fast_init
from ..models.ip_adapter import init_image_proj, init_mlp_proj
from ..models.referencenet import init_referencenet
from ..models.unet3d import init_unet3d
from ..models.vae import init_vae
from ..utils.tokenizer import HashTokenizer, HFCLIPTokenizer
from .pipeline import MusevModels

logger = logging.getLogger(__name__)


def _tokenizer_for(preset: ModelPreset):
    if preset.tokenizer_path:
        try:
            return HFCLIPTokenizer(preset.tokenizer_path)
        except Exception:
            logger.warning("tokenizer load failed; using hash fallback")
    # fallback tokenizer must hash into the text model's actual vocab
    return HashTokenizer(vocab_size=preset.text_cfg.vocab_size)


def _load_state_dict(path: str):
    if path.endswith(".safetensors"):
        return sd_weights.load_safetensors(path)
    return sd_weights.load_torch_checkpoint(path)


def build_models(
    preset: ModelPreset,
    seed: int = 0,
    dtype=jnp.float32,
    use_fast_init: bool = True,
) -> MusevModels:
    key = jax.random.PRNGKey(seed)

    def init(fn, cfg, idx):
        if use_fast_init:
            return fast_init(fn, cfg, dtype=dtype, seed=seed + idx)
        return fn(jax.random.fold_in(key, idx), cfg, dtype=dtype)

    unet_params = init(init_unet3d, preset.unet_cfg, 0)
    vae_params = init(init_vae, preset.vae_cfg, 1)
    text_params = init(init_clip_text, preset.text_cfg, 2)

    if preset.unet_checkpoint and os.path.exists(preset.unet_checkpoint):
        n, leftover = sd_weights.convert_unet3d(
            unet_params, preset.unet_cfg, _load_state_dict(preset.unet_checkpoint)
        )
        logger.info("unet: %d tensors loaded, %d leftover", n, len(leftover))
    if preset.sd_base_checkpoint and os.path.exists(preset.sd_base_checkpoint):
        # T2I base overwrite of spatial weights (unet_loader.py:41-80)
        n, _ = sd_weights.merge_sd_base_weights(
            unet_params, preset.unet_cfg,
            _load_state_dict(preset.sd_base_checkpoint),
        )
        logger.info("sd base merge: %d tensors", n)
    if preset.vae_checkpoint and os.path.exists(preset.vae_checkpoint):
        sd_weights.convert_vae(
            vae_params, preset.vae_cfg, _load_state_dict(preset.vae_checkpoint)
        )
    if preset.text_checkpoint and os.path.exists(preset.text_checkpoint):
        sd_weights.convert_clip_text(
            text_params, preset.text_cfg, _load_state_dict(preset.text_checkpoint)
        )

    kwargs = {}
    if preset.referencenet_cfg is not None:
        rp = init(init_referencenet, preset.referencenet_cfg, 3)
        if preset.referencenet_checkpoint and os.path.exists(
            preset.referencenet_checkpoint
        ):
            n, _ = sd_weights.convert_referencenet(
                rp, preset.referencenet_cfg,
                _load_state_dict(preset.referencenet_checkpoint),
            )
            logger.info("referencenet: %d tensors loaded", n)
        kwargs["referencenet_params"] = rp
        kwargs["referencenet_cfg"] = preset.referencenet_cfg
    if preset.clip_vision_cfg is not None:
        kwargs["clip_vision_params"] = init(init_clip_vision, preset.clip_vision_cfg, 4)
        kwargs["clip_vision_cfg"] = preset.clip_vision_cfg
        ip_proj = init_image_proj(
            jax.random.fold_in(key, 5),
            clip_dim=preset.ip_adapter_clip_dim,
            cross_dim=preset.unet_cfg.cross_attention_dim,
            num_tokens=preset.ip_adapter_tokens,
            dtype=dtype,
        )
        if preset.ip_adapter_checkpoint and os.path.exists(
            preset.ip_adapter_checkpoint
        ):
            ip_sd = _load_state_dict(preset.ip_adapter_checkpoint)
            n1 = sd_weights.convert_image_proj(ip_proj, ip_sd)
            n2 = sd_weights.convert_ip_adapter_unet(
                unet_params, preset.unet_cfg, ip_sd
            )
            logger.info("ip_adapter: %d proj + %d unet tensors", n1, n2)
        kwargs["ip_proj_params"] = ip_proj
    if preset.unet_cfg.need_ip_adapter_face:
        face_proj = init_mlp_proj(
            jax.random.fold_in(key, 7),
            id_dim=preset.ip_adapter_face_id_dim,
            cross_dim=preset.unet_cfg.cross_attention_dim,
            num_tokens=preset.ip_adapter_tokens,
            dtype=dtype,
        )
        if preset.ip_adapter_face_checkpoint and os.path.exists(
            preset.ip_adapter_face_checkpoint
        ):
            face_sd = _load_state_dict(preset.ip_adapter_face_checkpoint)
            sd_weights.convert_ip_adapter_unet(
                unet_params, preset.unet_cfg, face_sd, face=True
            )
            logger.info("ip_adapter_face tensors loaded")
        kwargs["ip_face_proj_params"] = face_proj
    if preset.controlnet_cfg is not None:
        cnp = init(init_controlnet, preset.controlnet_cfg, 6)
        if preset.controlnet_checkpoint and os.path.exists(
            preset.controlnet_checkpoint
        ):
            n, _ = sd_weights.convert_controlnet(
                cnp, preset.controlnet_cfg,
                _load_state_dict(preset.controlnet_checkpoint),
            )
            logger.info("controlnet: %d tensors loaded", n)
        kwargs["controlnet_params"] = cnp
        kwargs["controlnet_cfg"] = preset.controlnet_cfg

    return MusevModels(
        unet_params=unet_params,
        unet_cfg=preset.unet_cfg,
        vae_params=vae_params,
        vae_cfg=preset.vae_cfg,
        text_params=text_params,
        text_cfg=preset.text_cfg,
        tokenizer=_tokenizer_for(preset),
        **kwargs,
    )
