"""ReferenceNet2D: an SD UNet trunk that emits intermediate features.

Behavioral reference: musev/models/referencenet.py — a UNet2DConditionModel
whose forward returns (down_block_embs, mid_block_emb, self_attn_embs) for
fusion into the denoising UNet; with ``need_block_embs`` the decoder head is
pruned entirely (referencenet.py:624-636), so this implementation only builds
conv_in + down blocks + mid (plus optional up blocks for self-attn write
mode parity later).

The self-attn emb write mode stores each BasicTransformerBlock's normalized
hidden states (attention.py:242-259) — here returned as a list of
(B, H*W, C) token tensors indexed by spatial-attention site.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from . import unet_blocks as blk
from .common import Params, conv2d, init_conv, silu
from .embeddings import (
    init_timestep_embedding,
    sinusoidal_embedding,
    timestep_embedding,
)


@dataclasses.dataclass(frozen=True)
class ReferenceNetConfig:
    in_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 768
    attention_heads: int = 8
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    need_self_attn_embs: bool = False

    @property
    def temb_dim(self) -> int:
        return self.block_out_channels[0] * 4


def init_referencenet(key, cfg: ReferenceNetConfig, dtype=jnp.float32) -> Params:
    ks = iter(jax.random.split(key, 128))
    nxt = lambda: next(ks)  # noqa: E731
    ch0 = cfg.block_out_channels[0]
    p: Params = {
        "conv_in": init_conv(nxt(), cfg.in_channels, ch0, 3, dtype=dtype),
        "time_embedding": init_timestep_embedding(nxt(), ch0, cfg.temb_dim, dtype=dtype),
    }
    down_blocks = []
    out_c = ch0
    n_blocks = len(cfg.block_out_channels)
    for i in range(n_blocks):
        in_c = out_c
        out_c = cfg.block_out_channels[i]
        is_final = i == n_blocks - 1
        has_attn = not is_final  # SD1.5: last down block has no cross-attn
        layers = []
        for j in range(cfg.layers_per_block):
            layer = {
                "resnet": blk.init_resnet_block(
                    nxt(), in_c if j == 0 else out_c, out_c, cfg.temb_dim, dtype
                )
            }
            if has_attn:
                layer["attn"] = blk.init_spatial_transformer(
                    nxt(), out_c, cfg.cross_attention_dim, dtype
                )
            layers.append(layer)
        block = {"layers": layers}
        if not is_final:
            block["downsample"] = blk.init_downsample(nxt(), out_c, dtype)
        down_blocks.append(block)
    p["down_blocks"] = down_blocks
    mid_c = cfg.block_out_channels[-1]
    p["mid_block"] = {
        "resnet_0": blk.init_resnet_block(nxt(), mid_c, mid_c, cfg.temb_dim, dtype),
        "attn": blk.init_spatial_transformer(nxt(), mid_c, cfg.cross_attention_dim, dtype),
        "resnet_1": blk.init_resnet_block(nxt(), mid_c, mid_c, cfg.temb_dim, dtype),
    }
    if cfg.need_self_attn_embs:
        # full decoder so write mode covers the 9 up-block self-attn sites
        # (the block-emb-only path prunes it, referencenet.py:624-636)
        skip_channels = [cfg.block_out_channels[0]]
        out_c = cfg.block_out_channels[0]
        for i in range(n_blocks):
            out_c = cfg.block_out_channels[i]
            for _ in range(cfg.layers_per_block):
                skip_channels.append(out_c)
            if i < n_blocks - 1:
                skip_channels.append(out_c)
        up_blocks = []
        rev = list(reversed(cfg.block_out_channels))
        prev_out = rev[0]
        for i in range(n_blocks):
            out_c = rev[i]
            has_attn = i > 0  # SD1.5: first up block has no attn
            layers = []
            for j in range(cfg.layers_per_block + 1):
                skip_c = skip_channels.pop()
                res_in = (prev_out if j == 0 else out_c) + skip_c
                layer = {
                    "resnet": blk.init_resnet_block(
                        nxt(), res_in, out_c, cfg.temb_dim, dtype
                    )
                }
                if has_attn:
                    layer["attn"] = blk.init_spatial_transformer(
                        nxt(), out_c, cfg.cross_attention_dim, dtype
                    )
                layers.append(layer)
            block = {"layers": layers}
            if i < n_blocks - 1:
                block["upsample"] = blk.init_upsample(nxt(), out_c, dtype)
            up_blocks.append(block)
            prev_out = out_c
        p["up_blocks"] = up_blocks
    return p


def referencenet_apply(
    params: Params,
    cfg: ReferenceNetConfig,
    sample: jnp.ndarray,
    timestep,
    encoder_hidden_states: jnp.ndarray,
) -> Tuple[List[jnp.ndarray], jnp.ndarray, Optional[List[jnp.ndarray]]]:
    """Run the trunk on reference latents.

    Args:
      sample: (B, H, W, C) reference-image latents (scaled VAE means).
      timestep: scalar diffusion timestep — the reference always runs the
        ReferenceNet at t=0 (``ref_timestep = torch.zeros_like(timestep)``,
        pipeline_controlnet.py:895); callers should pass 0.0.
      encoder_hidden_states: (B, S, D) text or clip-vision tokens
        (pipeline_controlnet.py:896-900).

    Returns:
      (down_block_embs, mid_block_emb, self_attn_embs):
        down_block_embs: 12 tensors (B, 1, h_i, w_i, c_i) — 5-D with a
          singleton time axis, matching referencenet.py:1017-1034
        mid_block_emb: (B, 1, h, w, c)
        self_attn_embs: list of (B, HW, C) per spatial-attn site, or None
    """
    b = sample.shape[0]
    groups, eps, heads = cfg.norm_num_groups, cfg.norm_eps, cfg.attention_heads

    ts = jnp.asarray(timestep)
    if ts.ndim == 0:
        ts = ts[None]
    ts = jnp.broadcast_to(ts, (b,))
    temb = sinusoidal_embedding(ts, cfg.block_out_channels[0])
    temb = timestep_embedding(params["time_embedding"], temb.astype(sample.dtype))

    self_attn_embs: Optional[List] = (
        [None] * 16 if cfg.need_self_attn_embs else None
    )
    attn_site = [0]

    def run_attn(layer_p, x):
        idx = attn_site[0]
        attn_site[0] += 1
        return blk.spatial_transformer(
            layer_p,
            x,
            encoder_hidden_states,
            heads=heads,
            groups=groups,
            num_frames=1,
            cond_index=None,
            do_cfg=False,
            reference_attn=False,
            self_attn_out=self_attn_embs,
            self_attn_idx=idx if self_attn_embs is not None else None,
        )

    x = conv2d(params["conv_in"], sample, padding=1)
    embs = [x]
    for block in params["down_blocks"]:
        for layer in block["layers"]:
            x = blk.resnet_block(layer["resnet"], x, temb, groups=groups, eps=eps)
            if "attn" in layer:
                x = run_attn(layer["attn"], x)
            embs.append(x)
        if "downsample" in block:
            x = blk.downsample(block["downsample"], x)
            embs.append(x)

    mid = params["mid_block"]
    x = blk.resnet_block(mid["resnet_0"], x, temb, groups=groups, eps=eps)
    x = run_attn(mid["attn"], x)
    x = blk.resnet_block(mid["resnet_1"], x, temb, groups=groups, eps=eps)
    mid_x = x

    if cfg.need_self_attn_embs and "up_blocks" in params:
        skips = list(embs)
        for block in params["up_blocks"]:
            for layer in block["layers"]:
                skip = skips.pop()
                x = jnp.concatenate([x, skip], axis=-1)
                x = blk.resnet_block(layer["resnet"], x, temb, groups=groups, eps=eps)
                if "attn" in layer:
                    x = run_attn(layer["attn"], x)
            if "upsample" in block:
                out_hw = skips[-1].shape[1:3] if skips else None
                x = blk.upsample(block["upsample"], x, out_hw=out_hw)

    down_embs = [e[:, None] for e in embs]  # (B, 1, h, w, c)
    mid_emb = mid_x[:, None]
    return down_embs, mid_emb, self_attn_embs
