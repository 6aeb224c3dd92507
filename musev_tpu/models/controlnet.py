"""ControlNet: SD-UNet trunk with zero-conv residual taps.

Behavioral reference: the diffusers ControlNetModel consumed via mmcm's
load_controlnet_model zoo (SURVEY §2.9) and driven per window at
pipeline_controlnet.py:2022-2038. Structure: a conditioning-embedding stem
(strided convs, zero-init final conv) added to conv_in, the SD1.5 down+mid
trunk, and one zero-init 1x1 conv per skip feature plus one for mid; outputs
are the 12 down residuals and the mid residual, scaled by
``conditioning_scale``.

Also provides PoseGuider (a lightweight stem-only variant used via the
pipeline's ``pose_guider`` input, pipeline_controlnet.py:1774-1783).
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
class ControlNetConfig:
    in_channels: int = 4
    cond_channels: int = 3
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    cond_embed_channels: Tuple[int, ...] = (16, 32, 96, 256)
    layers_per_block: int = 2
    cross_attention_dim: int = 768
    attention_heads: int = 8
    norm_num_groups: int = 32
    norm_eps: float = 1e-5

    @property
    def temb_dim(self) -> int:
        return self.block_out_channels[0] * 4


def init_controlnet(key, cfg: ControlNetConfig, dtype=jnp.float32) -> Params:
    ks = iter(jax.random.split(key, 128))
    nxt = lambda: next(ks)  # noqa: E731
    ch0 = cfg.block_out_channels[0]
    p: Params = {
        "conv_in": init_conv(nxt(), cfg.in_channels, ch0, 3, dtype=dtype),
        "time_embedding": init_timestep_embedding(nxt(), ch0, cfg.temb_dim, dtype=dtype),
    }
    # conditioning stem: conv 3->c0, (conv, strided conv) pairs, zero conv out
    ce = {"conv_in": init_conv(nxt(), cfg.cond_channels, cfg.cond_embed_channels[0], 3, dtype=dtype)}
    blocks = []
    for i in range(len(cfg.cond_embed_channels) - 1):
        c_in = cfg.cond_embed_channels[i]
        c_out = cfg.cond_embed_channels[i + 1]
        blocks.append(
            {
                "conv1": init_conv(nxt(), c_in, c_in, 3, dtype=dtype),
                "conv2": init_conv(nxt(), c_in, c_out, 3, dtype=dtype),  # stride 2
            }
        )
    ce["blocks"] = blocks
    ce["conv_out"] = init_conv(
        nxt(), cfg.cond_embed_channels[-1], ch0, 3, dtype=dtype, zero_init=True
    )
    p["cond_embedding"] = ce

    down_blocks = []
    zero_convs = [init_conv(nxt(), ch0, ch0, 1, dtype=dtype, zero_init=True)]
    out_c = ch0
    n_blocks = len(cfg.block_out_channels)
    for i in range(n_blocks):
        in_c = out_c
        out_c = cfg.block_out_channels[i]
        is_final = i == n_blocks - 1
        has_attn = not is_final
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
            zero_convs.append(init_conv(nxt(), out_c, out_c, 1, dtype=dtype, zero_init=True))
        block = {"layers": layers}
        if not is_final:
            block["downsample"] = blk.init_downsample(nxt(), out_c, dtype)
            zero_convs.append(init_conv(nxt(), out_c, out_c, 1, dtype=dtype, zero_init=True))
        down_blocks.append(block)
    p["down_blocks"] = down_blocks
    p["zero_convs"] = zero_convs
    mid_c = cfg.block_out_channels[-1]
    p["mid_block"] = {
        "resnet_0": blk.init_resnet_block(nxt(), mid_c, mid_c, cfg.temb_dim, dtype),
        "attn": blk.init_spatial_transformer(nxt(), mid_c, cfg.cross_attention_dim, dtype),
        "resnet_1": blk.init_resnet_block(nxt(), mid_c, mid_c, cfg.temb_dim, dtype),
    }
    p["mid_zero_conv"] = init_conv(nxt(), mid_c, mid_c, 1, dtype=dtype, zero_init=True)
    return p


def cond_embedding(p: Params, cond_image: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, 3) in [0,1] -> (N, H/8, W/8, ch0)."""
    x = silu(conv2d(p["conv_in"], cond_image, padding=1))
    for b in p["blocks"]:
        x = silu(conv2d(b["conv1"], x, padding=1))
        x = silu(conv2d(b["conv2"], x, stride=2, padding=1))
    return conv2d(p["conv_out"], x, padding=1)


def controlnet_apply(
    params: Params,
    cfg: ControlNetConfig,
    sample: jnp.ndarray,
    timestep,
    encoder_hidden_states: jnp.ndarray,
    cond_image: jnp.ndarray,
    conditioning_scale: float = 1.0,
) -> Tuple[List[jnp.ndarray], jnp.ndarray]:
    """Run the control trunk.

    sample: (N, h, w, 4) latent frames; cond_image: (N, 8h, 8w, 3) in [0,1];
    encoder_hidden_states: (N, S, D). Returns (down_residuals[12], mid_res).
    """
    n = sample.shape[0]
    groups, eps, heads = cfg.norm_num_groups, cfg.norm_eps, cfg.attention_heads
    ts = jnp.asarray(timestep)
    if ts.ndim == 0:
        ts = ts[None]
    ts = jnp.broadcast_to(ts, (n,))
    temb = sinusoidal_embedding(ts, cfg.block_out_channels[0])
    temb = timestep_embedding(params["time_embedding"], temb.astype(sample.dtype))

    def run_attn(layer_p, x):
        return blk.spatial_transformer(
            layer_p, x, encoder_hidden_states, heads=heads, groups=groups,
            num_frames=1, cond_index=None, do_cfg=False, reference_attn=False,
        )

    x = conv2d(params["conv_in"], sample, padding=1)
    x = x + cond_embedding(params["cond_embedding"], cond_image).astype(x.dtype)
    feats = [x]
    for block in params["down_blocks"]:
        for layer in block["layers"]:
            x = blk.resnet_block(layer["resnet"], x, temb, groups=groups, eps=eps)
            if "attn" in layer:
                x = run_attn(layer["attn"], x)
            feats.append(x)
        if "downsample" in block:
            x = blk.downsample(block["downsample"], x)
            feats.append(x)
    mid = params["mid_block"]
    x = blk.resnet_block(mid["resnet_0"], x, temb, groups=groups, eps=eps)
    x = run_attn(mid["attn"], x)
    x = blk.resnet_block(mid["resnet_1"], x, temb, groups=groups, eps=eps)

    down_res = [
        conv2d(zc, f, padding=0) * conditioning_scale
        for zc, f in zip(params["zero_convs"], feats)
    ]
    mid_res = conv2d(params["mid_zero_conv"], x, padding=0) * conditioning_scale
    return down_res, mid_res


# ---------------------------------------------------------------------------
# PoseGuider: conditioning stem only, added to conv_in activations
# (pipeline_controlnet.py:1774-1783)


def init_pose_guider(key, cfg: ControlNetConfig, dtype=jnp.float32) -> Params:
    ks = iter(jax.random.split(key, 16))
    nxt = lambda: next(ks)  # noqa: E731
    ce = {"conv_in": init_conv(nxt(), cfg.cond_channels, cfg.cond_embed_channels[0], 3, dtype=dtype)}
    blocks = []
    for i in range(len(cfg.cond_embed_channels) - 1):
        c_in = cfg.cond_embed_channels[i]
        c_out = cfg.cond_embed_channels[i + 1]
        blocks.append(
            {
                "conv1": init_conv(nxt(), c_in, c_in, 3, dtype=dtype),
                "conv2": init_conv(nxt(), c_in, c_out, 3, dtype=dtype),
            }
        )
    ce["blocks"] = blocks
    ce["conv_out"] = init_conv(
        nxt(), cfg.cond_embed_channels[-1], cfg.block_out_channels[0], 3,
        dtype=dtype, zero_init=True,
    )
    return ce


def pose_guider_apply(params: Params, cond_image: jnp.ndarray) -> jnp.ndarray:
    return cond_embedding(params, cond_image)
