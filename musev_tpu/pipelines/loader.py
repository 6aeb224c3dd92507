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
        # an explicitly-given path that fails to load must raise — silently
        # hash-tokenizing a typo'd --tokenizer_path yields garbage generations
        try:
            return HFCLIPTokenizer(preset.tokenizer_path)
        except Exception as e:
            raise ValueError(
                f"tokenizer_path {preset.tokenizer_path!r} failed to load: {e}. "
                "Leave tokenizer_path unset to use the hash fallback tokenizer."
            ) from e
    # fallback tokenizer must hash into the text model's actual vocab
    return HashTokenizer(vocab_size=preset.text_cfg.vocab_size)


def _load_state_dict(path: str):
    if path.endswith(".safetensors"):
        return sd_weights.load_safetensors(path)
    return sd_weights.load_torch_checkpoint(path)


def _load_sd_base(path: str):
    """Load a T2I base checkpoint: diffusers layout, or an original-LDM
    ``.ckpt`` (auto-detected and split, convert_from_ckpt.py equivalent).
    Returns (unet_sd, vae_sd_or_None, text_sd_or_None)."""
    from ..models.ldm_convert import is_ldm_checkpoint, split_ldm_checkpoint

    sd = _load_state_dict(path)
    if is_ldm_checkpoint(sd):
        parts = split_ldm_checkpoint(sd)
        return parts["unet"], parts["vae"] or None, parts["text"] or None
    return sd, None, None


def _strict_check(slot, key_map, params, sd, aliases=None, allow=()):
    """Raise when a user-supplied checkpoint leaves required sites at init.

    Tolerant conversion (the strict=False mirror) means a renamed torch key
    silently loads random weights — the bug class that hit FaceID
    image_proj. With strict=True the loader refuses instead."""
    missing = sd_weights.missing_torch_keys(key_map, params, sd, aliases)
    if allow:
        missing = [k for k in missing if not k.endswith(tuple(allow))]
    if missing:
        shown = ", ".join(missing[:8])
        raise ValueError(
            f"{slot} checkpoint leaves {len(missing)} required sites "
            f"unconsumed (naming drift or wrong file?): {shown}"
            + (" ..." if len(missing) > 8 else "")
        )


def build_models(
    preset: ModelPreset,
    seed: int = 0,
    dtype=jnp.float32,
    use_fast_init: bool = True,
    strict: bool = False,
) -> MusevModels:
    """``strict=True`` makes every user-supplied checkpoint raise (not log)
    when it leaves required param sites unconsumed — see _strict_check."""
    key = jax.random.PRNGKey(seed)

    def init(fn, cfg, idx):
        if use_fast_init:
            return fast_init(fn, cfg, dtype=dtype, seed=seed + idx)
        return fn(jax.random.fold_in(key, idx), cfg, dtype=dtype)

    unet_params = init(init_unet3d, preset.unet_cfg, 0)
    vae_params = init(init_vae, preset.vae_cfg, 1)
    text_params = init(init_clip_text, preset.text_cfg, 2)

    unet_sd_keys = None
    if preset.unet_checkpoint and os.path.exists(preset.unet_checkpoint):
        unet_sd = _load_state_dict(preset.unet_checkpoint)
        n, leftover = sd_weights.convert_unet3d(
            unet_params, preset.unet_cfg, unet_sd
        )
        logger.info("unet: %d tensors loaded, %d leftover", n, len(leftover))
        unet_sd_keys = set(unet_sd)
        del unet_sd
    if preset.sd_base_checkpoint and os.path.exists(preset.sd_base_checkpoint):
        # T2I base overwrite of spatial weights (unet_loader.py:41-80);
        # original-LDM .ckpt bases are auto-split (convert_from_ckpt.py)
        base_sd, ldm_vae_sd, ldm_text_sd = _load_sd_base(
            preset.sd_base_checkpoint
        )
        n, _ = sd_weights.merge_sd_base_weights(
            unet_params, preset.unet_cfg, base_sd
        )
        logger.info("sd base merge: %d tensors", n)
        # the LDM-embedded nets are the fallback whenever the explicit
        # checkpoint will not actually load (unset OR missing file) — a set-
        # but-missing path must not leave the VAE/text at random init
        vae_explicit = preset.vae_checkpoint and os.path.exists(
            preset.vae_checkpoint
        )
        text_explicit = preset.text_checkpoint and os.path.exists(
            preset.text_checkpoint
        )
        if ldm_vae_sd and not vae_explicit:
            n, _ = sd_weights.convert_vae(vae_params, preset.vae_cfg, ldm_vae_sd)
            logger.info("ldm vae: %d tensors", n)
        if ldm_text_sd and not text_explicit:
            sd_weights.convert_clip_text(
                text_params, preset.text_cfg, ldm_text_sd
            )
            logger.info("ldm text encoder loaded")
    if strict and unet_sd_keys is not None:
        # the strict unet check runs AFTER the optional T2I base merge:
        # spatial sites may legitimately arrive via sd_base_checkpoint
        # (motion-module-style unet checkpoints carry only the temporal/
        # MuseV-specific weights), and the dual-KV IP projections via the
        # separate ip_adapter(.bin) checkpoints
        allow = ()
        if preset.ip_adapter_checkpoint or preset.ip_adapter_face_checkpoint:
            allow = ("to_k_ip.weight", "to_v_ip.weight")
        expected = sd_weights.export_key_names(
            list(sd_weights.unet3d_key_map(preset.unet_cfg)), unet_params
        )
        missing = [k for k in expected
                   if k not in unet_sd_keys and not k.endswith(allow)]
        if preset.sd_base_checkpoint and os.path.exists(
            preset.sd_base_checkpoint
        ):
            def _musev_only(k):
                # sites no SD1.5 base can supply: temporal layers, frame
                # embedding, transformer_in, refer-emb fuse attentions
                return ("temp_" in k or k.startswith("frame_embedding")
                        or "transformer_in" in k or "refer_emb" in k)

            missing = [k for k in missing if _musev_only(k)]
        if missing:
            shown = ", ".join(missing[:8])
            raise ValueError(
                f"unet checkpoint leaves {len(missing)} required sites "
                f"unconsumed (naming drift or wrong file?): {shown}"
                + (" ..." if len(missing) > 8 else "")
            )
    for slot in (
        "unet", "sd_base", "vae", "text", "clip_vision", "referencenet",
        "ip_adapter", "ip_adapter_face", "controlnet",
    ):
        p = getattr(preset, f"{slot}_checkpoint", None)
        if p and not os.path.exists(p):
            if strict:
                raise FileNotFoundError(
                    f"{slot}_checkpoint {p!r} does not exist — the network "
                    "would silently stay at random init"
                )
            logger.warning(
                "%s_checkpoint %r does not exist — network stays at its "
                "current (possibly random) init", slot, p,
            )
    if preset.vae_checkpoint and os.path.exists(preset.vae_checkpoint):
        vae_sd = _load_state_dict(preset.vae_checkpoint)
        sd_weights.convert_vae(vae_params, preset.vae_cfg, vae_sd)
        if strict:
            _strict_check(
                "vae", list(sd_weights.vae_key_map(preset.vae_cfg)),
                vae_params, vae_sd, aliases=sd_weights._VAE_LEGACY_ALIASES,
            )
    if preset.text_checkpoint and os.path.exists(preset.text_checkpoint):
        text_sd = _load_state_dict(preset.text_checkpoint)
        sd_weights.convert_clip_text(text_params, preset.text_cfg, text_sd)
        if strict:
            _strict_check(
                "text", list(sd_weights.clip_text_key_map(preset.text_cfg)),
                text_params, text_sd,
            )

    kwargs = {}
    if preset.referencenet_cfg is not None:
        rp = init(init_referencenet, preset.referencenet_cfg, 3)
        if preset.referencenet_checkpoint and os.path.exists(
            preset.referencenet_checkpoint
        ):
            ref_sd = _load_state_dict(preset.referencenet_checkpoint)
            n, _ = sd_weights.convert_referencenet(
                rp, preset.referencenet_cfg, ref_sd
            )
            logger.info("referencenet: %d tensors loaded", n)
            if strict:
                _strict_check(
                    "referencenet",
                    list(sd_weights.referencenet_key_map(
                        preset.referencenet_cfg)),
                    rp, ref_sd,
                )
        kwargs["referencenet_params"] = rp
        kwargs["referencenet_cfg"] = preset.referencenet_cfg
    if preset.clip_vision_cfg is not None:
        cvp = init(init_clip_vision, preset.clip_vision_cfg, 4)
        if preset.clip_vision_checkpoint and os.path.exists(
            preset.clip_vision_checkpoint
        ):
            cv_sd = _load_state_dict(preset.clip_vision_checkpoint)
            n, _ = sd_weights.convert_clip_vision(
                cvp, preset.clip_vision_cfg, cv_sd
            )
            logger.info("clip_vision: %d tensors loaded", n)
            if strict:
                _strict_check(
                    "clip_vision",
                    list(sd_weights.clip_vision_key_map(
                        preset.clip_vision_cfg)),
                    cvp, cv_sd,
                )
        kwargs["clip_vision_params"] = cvp
        kwargs["clip_vision_cfg"] = preset.clip_vision_cfg
        is_plus = "Plus" in preset.ip_adapter_model_name
        if is_plus:
            # IPAdapterPlus(+face): perceiver Resampler over patch tokens
            # (ip_adapter_loader.py:95-111: dim=cross_attention_dim, depth 4,
            # heads 12, num_queries=clip_extra_context_tokens,
            # embedding_dim=vision hidden size)
            from ..models.ip_adapter import ResamplerConfig, init_resampler

            cross = preset.unet_cfg.cross_attention_dim
            res_cfg = ResamplerConfig(
                dim=cross,
                depth=4,
                # reference: heads=12, dim_head=64 at cross=768; for shrunk
                # test configs fall back to the UNet's head count
                heads=12 if cross % 12 == 0 else preset.unet_cfg.attention_heads,
                num_queries=preset.ip_adapter_tokens,
                embedding_dim=preset.clip_vision_cfg.hidden_size,
                output_dim=cross,
            )
            ip_proj = init_resampler(
                jax.random.fold_in(key, 5), res_cfg, dtype=dtype
            )
            kwargs["ip_proj_kind"] = "resampler"
            kwargs["ip_resampler_cfg"] = res_cfg
        else:
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
            if is_plus:
                n1 = sd_weights.convert_resampler(ip_proj, ip_sd)
            else:
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
            # must match the dim the unet's to_k/v_ip_face consume
            # (unet_blocks.init_attention ip_face_kv_dim)
            cross_dim=preset.unet_cfg.ip_adapter_face_dim,
            num_tokens=preset.ip_adapter_tokens,
            dtype=dtype,
        )
        if preset.ip_adapter_face_checkpoint and os.path.exists(
            preset.ip_adapter_face_checkpoint
        ):
            face_sd = _load_state_dict(preset.ip_adapter_face_checkpoint)
            n1 = sd_weights.convert_mlp_proj(face_proj, face_sd)
            n2 = sd_weights.convert_ip_adapter_unet(
                unet_params, preset.unet_cfg, face_sd, face=True
            )
            logger.info(
                "ip_adapter_face: %d proj + %d unet tensors", n1, n2
            )
        kwargs["ip_face_proj_params"] = face_proj
    if preset.controlnet_cfg is not None:
        cnp = init(init_controlnet, preset.controlnet_cfg, 6)
        if preset.controlnet_checkpoint and os.path.exists(
            preset.controlnet_checkpoint
        ):
            cn_sd = _load_state_dict(preset.controlnet_checkpoint)
            n, _ = sd_weights.convert_controlnet(
                cnp, preset.controlnet_cfg, cn_sd
            )
            logger.info("controlnet: %d tensors loaded", n)
            if strict:
                _strict_check(
                    "controlnet",
                    list(sd_weights.controlnet_key_map(preset.controlnet_cfg)),
                    cnp, cn_sd,
                )
        kwargs["controlnet_params"] = cnp
        kwargs["controlnet_cfg"] = preset.controlnet_cfg
    if preset.pose_guider_checkpoint:
        from ..models.controlnet import ControlNetConfig, init_pose_guider

        # the guider's conv_out must match the UNet's conv_in width
        # (block_out_channels[0]): its emb is added post-conv_in
        pg_cfg = preset.pose_guider_cfg or ControlNetConfig(
            block_out_channels=preset.unet_cfg.block_out_channels,
            cross_attention_dim=preset.unet_cfg.cross_attention_dim,
            attention_heads=preset.unet_cfg.attention_heads,
            norm_num_groups=preset.unet_cfg.norm_num_groups,
        )
        pgp = init(init_pose_guider, pg_cfg, 7)
        if os.path.exists(preset.pose_guider_checkpoint):
            pg_sd = _load_state_dict(preset.pose_guider_checkpoint)
            n, _ = sd_weights.convert_pose_guider(pgp, pg_cfg, pg_sd)
            logger.info("pose_guider: %d tensors loaded", n)
            if strict:
                _strict_check(
                    "pose_guider",
                    list(sd_weights.pose_guider_key_map(pg_cfg)), pgp, pg_sd,
                )
        else:
            logger.warning(
                "pose_guider checkpoint missing: %s (random init)",
                preset.pose_guider_checkpoint,
            )
        kwargs["pose_guider_params"] = pgp
        kwargs["pose_guider_cfg"] = pg_cfg

    tokenizer = _tokenizer_for(preset)

    # textual-inversion negative embeddings: appended to the token table so
    # the V2/V4 negative-prompt triggers actually bind
    # (predictor.py:248-254 loads four of these by default)
    if preset.textual_inversion_checkpoints:
        from ..utils.textual_inversion import (
            InversionTokenizer,
            add_textual_inversion,
            load_inversion_state_dict,
        )

        tokenizer = InversionTokenizer(tokenizer)
        for spec in preset.textual_inversion_checkpoints:
            path, trigger = _split_path_arg(spec)
            if not os.path.exists(path):
                logger.warning("textual inversion missing: %s", path)
                continue
            if trigger is None:
                trigger = os.path.splitext(os.path.basename(path))[0]
            emb = load_inversion_state_dict(_load_state_dict(path))
            add_textual_inversion(text_params, tokenizer, trigger, emb)
            logger.info(
                "textual inversion %r: %d vectors", trigger, emb.shape[0]
            )

    # LoRA fuse-at-load with per-entry scale (model_util.py:108-263)
    from ..models.lora import fuse_lora

    lora_entries = list(preset.lora_checkpoints or [])
    if preset.lcm_lora_checkpoint:
        lora_entries.append(
            f"{preset.lcm_lora_checkpoint}:{preset.lcm_lora_scale}"
        )
    for spec in lora_entries:
        path, suffix = _split_path_arg(spec)
        scale = _parse_scale(suffix, spec)
        if not os.path.exists(path):
            logger.warning("lora missing: %s", path)
            continue
        n, unmatched = fuse_lora(
            unet_params, preset.unet_cfg, _load_state_dict(path),
            scale=scale, text_params=text_params, text_cfg=preset.text_cfg,
        )
        logger.info(
            "lora %s: %d modules fused (scale %.3g), %d unmatched",
            path, n, scale, len(unmatched),
        )

    return MusevModels(
        unet_params=unet_params,
        unet_cfg=preset.unet_cfg,
        vae_params=vae_params,
        vae_cfg=preset.vae_cfg,
        text_params=text_params,
        text_cfg=preset.text_cfg,
        tokenizer=tokenizer,
        **kwargs,
    )


def _split_path_arg(spec: str):
    """Parse 'path', 'path:suffix' or 'path=suffix' -> (path, suffix).

    '=' is the unambiguous form (paths may legally contain ':'); for ':'
    the split is rejected in favour of the whole spec when the whole spec
    names an existing file and the head doesn't (a path with a ':' in it).
    """
    if "=" in spec:
        path, suffix = spec.rsplit("=", 1)
        return path, suffix
    if ":" in spec:
        path, suffix = spec.rsplit(":", 1)
        if os.path.exists(spec) and not os.path.exists(path):
            return spec, None
        return path, suffix
    return spec, None


def _parse_scale(suffix, spec: str) -> float:
    """Scale suffix of a 'path:scale' spec, with a actionable error."""
    if suffix is None:
        return 1.0
    try:
        return float(suffix)
    except ValueError:
        raise ValueError(
            f"malformed LoRA spec {spec!r}: expected 'path', 'path:scale' or "
            f"'path=scale' with a numeric scale, got suffix {suffix!r}. "
            "If the checkpoint path itself contains ':', use the '=' form: "
            "'/my:path/lora.safetensors=0.8'."
        ) from None
