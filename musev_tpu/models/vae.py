"""AutoencoderKL (SD1.5 VAE) as pure functions, with segmented video codec.

Structure reference: the diffusers AutoencoderKL used throughout the MuseV
pipeline (VAE encode of condition images pipeline_controlnet.py:980, decode
:2157-2171). Encoding uses the distribution *mean* (no sampling), matching
the reference (`latent_dist.mean`, pipeline_controlnet.py:361-367, :980).

Video decode/encode run frame-batched with a time-segment loop so HBM stays
constant for arbitrarily long videos (reference decoder_t_segment=200).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.attention import sdpa
from .common import (
    Params,
    conv2d,
    group_norm,
    init_conv,
    init_linear,
    init_norm,
    linear,
    silu,
)


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215

    @property
    def downscale(self) -> int:
        return 2 ** (len(self.block_out_channels) - 1)


def _init_resnet(key, in_c, out_c, dtype):
    ks = jax.random.split(key, 3)
    p = {
        "norm1": init_norm(in_c),
        "conv1": init_conv(ks[0], in_c, out_c, 3, dtype=dtype),
        "norm2": init_norm(out_c),
        "conv2": init_conv(ks[1], out_c, out_c, 3, dtype=dtype),
    }
    if in_c != out_c:
        p["conv_shortcut"] = init_conv(ks[2], in_c, out_c, 1, dtype=dtype)
    return p


def _resnet(p, x, groups):
    h = silu(group_norm(p["norm1"], x, num_groups=groups, eps=1e-6))
    h = conv2d(p["conv1"], h, padding=1)
    h = silu(group_norm(p["norm2"], h, num_groups=groups, eps=1e-6))
    h = conv2d(p["conv2"], h, padding=1)
    if "conv_shortcut" in p:
        x = conv2d(p["conv_shortcut"], x, padding=0)
    return x + h


def _init_attn(key, c, dtype):
    ks = jax.random.split(key, 4)
    return {
        "norm": init_norm(c),
        "to_q": init_linear(ks[0], c, c, dtype=dtype),
        "to_k": init_linear(ks[1], c, c, dtype=dtype),
        "to_v": init_linear(ks[2], c, c, dtype=dtype),
        "to_out": init_linear(ks[3], c, c, dtype=dtype),
    }


def _attn(p, x, groups):
    n, h, w, c = x.shape
    res = x
    y = group_norm(p["norm"], x, num_groups=groups, eps=1e-6).reshape(n, h * w, c)
    q = linear(p["to_q"], y)[:, :, None, :]
    k = linear(p["to_k"], y)[:, :, None, :]
    v = linear(p["to_v"], y)[:, :, None, :]
    o = sdpa(q, k, v)[:, :, 0, :]
    o = linear(p["to_out"], o).reshape(n, h, w, c)
    return o + res


def init_vae(key, cfg: VAEConfig = VAEConfig(), dtype=jnp.float32) -> Params:
    ks = iter(jax.random.split(key, 64))
    nxt = lambda: next(ks)  # noqa: E731
    chs = cfg.block_out_channels
    enc: Params = {"conv_in": init_conv(nxt(), cfg.in_channels, chs[0], 3, dtype=dtype)}
    down = []
    c_in = chs[0]
    for i, c_out in enumerate(chs):
        layers = []
        for j in range(cfg.layers_per_block):
            layers.append(_init_resnet(nxt(), c_in if j == 0 else c_out, c_out, dtype))
        block = {"layers": layers}
        if i < len(chs) - 1:
            block["downsample"] = init_conv(nxt(), c_out, c_out, 3, dtype=dtype)
        down.append(block)
        c_in = c_out
    enc["down"] = down
    enc["mid"] = {
        "resnet_0": _init_resnet(nxt(), chs[-1], chs[-1], dtype),
        "attn": _init_attn(nxt(), chs[-1], dtype),
        "resnet_1": _init_resnet(nxt(), chs[-1], chs[-1], dtype),
    }
    enc["norm_out"] = init_norm(chs[-1])
    enc["conv_out"] = init_conv(nxt(), chs[-1], 2 * cfg.latent_channels, 3, dtype=dtype)

    dec: Params = {
        "conv_in": init_conv(nxt(), cfg.latent_channels, chs[-1], 3, dtype=dtype)
    }
    dec["mid"] = {
        "resnet_0": _init_resnet(nxt(), chs[-1], chs[-1], dtype),
        "attn": _init_attn(nxt(), chs[-1], dtype),
        "resnet_1": _init_resnet(nxt(), chs[-1], chs[-1], dtype),
    }
    up = []
    rev = list(reversed(chs))
    c_in = rev[0]
    for i, c_out in enumerate(rev):
        layers = []
        for j in range(cfg.layers_per_block + 1):
            layers.append(_init_resnet(nxt(), c_in if j == 0 else c_out, c_out, dtype))
        block = {"layers": layers}
        if i < len(rev) - 1:
            block["upsample"] = init_conv(nxt(), c_out, c_out, 3, dtype=dtype)
        up.append(block)
        c_in = c_out
    dec["up"] = up
    dec["norm_out"] = init_norm(chs[0])
    dec["conv_out"] = init_conv(nxt(), chs[0], cfg.out_channels, 3, dtype=dtype)

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": init_conv(
            nxt(), 2 * cfg.latent_channels, 2 * cfg.latent_channels, 1, dtype=dtype
        ),
        "post_quant_conv": init_conv(
            nxt(), cfg.latent_channels, cfg.latent_channels, 1, dtype=dtype
        ),
    }


def vae_encode(
    params: Params, cfg: VAEConfig, images: jnp.ndarray
) -> jnp.ndarray:
    """(N, H, W, 3) in [-1, 1] -> (N, H/8, W/8, 4) scaled latent means."""
    g = cfg.norm_num_groups
    enc = params["encoder"]
    x = conv2d(enc["conv_in"], images, padding=1)
    for block in enc["down"]:
        for layer in block["layers"]:
            x = _resnet(layer, x, g)
        if "downsample" in block:
            # diffusers pads asymmetrically (0,1) for stride-2 VAE downsample
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            x = conv2d(block["downsample"], x, stride=2, padding=0)
    mid = enc["mid"]
    x = _resnet(mid["resnet_0"], x, g)
    x = _attn(mid["attn"], x, g)
    x = _resnet(mid["resnet_1"], x, g)
    x = silu(group_norm(enc["norm_out"], x, num_groups=g, eps=1e-6))
    x = conv2d(enc["conv_out"], x, padding=1)
    x = conv2d(params["quant_conv"], x, padding=0)
    mean, _logvar = jnp.split(x, 2, axis=-1)
    return mean * cfg.scaling_factor


def vae_decode(params: Params, cfg: VAEConfig, latents: jnp.ndarray) -> jnp.ndarray:
    """(N, h, w, 4) scaled latents -> (N, 8h, 8w, 3) in [-1, 1]."""
    g = cfg.norm_num_groups
    dec = params["decoder"]
    x = latents / cfg.scaling_factor
    x = conv2d(params["post_quant_conv"], x, padding=0)
    x = conv2d(dec["conv_in"], x, padding=1)
    mid = dec["mid"]
    x = _resnet(mid["resnet_0"], x, g)
    x = _attn(mid["attn"], x, g)
    x = _resnet(mid["resnet_1"], x, g)
    for block in dec["up"]:
        for layer in block["layers"]:
            x = _resnet(layer, x, g)
        if "upsample" in block:
            n, h, w, c = x.shape
            x = jax.image.resize(x, (n, h * 2, w * 2, c), method="nearest")
            x = conv2d(block["upsample"], x, padding=1)
    x = silu(group_norm(dec["norm_out"], x, num_groups=g, eps=1e-6))
    return conv2d(dec["conv_out"], x, padding=1)


from functools import lru_cache as _lru_cache, partial as _partial


@_partial(jax.jit, static_argnames=("cfg",))
def _decode_jit(params, cfg: VAEConfig, x):
    return vae_decode(params, cfg, x)


@_partial(jax.jit, static_argnames=("cfg",))
def _encode_jit(params, cfg: VAEConfig, x):
    return vae_encode(params, cfg, x)


@_lru_cache(maxsize=32)
def _mesh_decode_fn(mesh, axis: str, cfg: VAEConfig, per: int, seg: int):
    """Cached jitted shard_map decode for one (mesh, axis, cfg, per, seg).

    Params are an ARGUMENT (replicated spec), not a closure capture: a
    closure would inline the weights as constants into every trace, and a
    fresh jit wrapper per call would retrace + recompile the full decoder
    on each decode (minutes over the TPU tunnel). The cache keys on
    hashables only. The test suite lowers this same function for its
    per-chip peak-HBM assertion, so the bound is checked on the production
    path, not a copy."""
    from jax.sharding import PartitionSpec as P

    def chip_decode(params, x):
        # x: (per, h, w, 4), one chip's contiguous frame shard; the python
        # loop is static and per-chip, so peak activation HBM is one
        # `seg`-frame decode regardless of T
        outs = [
            vae_decode(params, cfg, x[s : s + seg])
            for s in range(0, per, seg)
        ]
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs, 0)

    return jax.jit(
        jax.shard_map(
            chip_decode, mesh=mesh, in_specs=(P(), P(axis)),
            out_specs=P(axis),
        )
    )


def vae_decode_video(
    params: Params,
    cfg: VAEConfig,
    latents: jnp.ndarray,
    segment: int = 16,
    mesh=None,
    axis: str = None,
) -> jnp.ndarray:
    """(B, T, h, w, 4) -> (B, T, H, W, 3), decoded in time segments for
    constant HBM (reference decoder_t_segment loop, :2157-2171).

    With ``mesh``/``axis``, the frame axis is sharded over the mesh axis and
    every chip decodes its own frames — the SD VAE is 2D (per-frame), so
    frame-parallel decode needs no collectives beyond the output gather.
    ``segment`` composes with the sharding: each chip loops its own frame
    shard in ``segment``-frame chunks (shard_map, so the loop is per-chip,
    not global), keeping per-chip peak HBM constant at long T — the
    reference's 200-frame decoder_t_segment regime stays bounded on a mesh
    instead of growing with T/n_chips."""
    b, t, h, w, c = latents.shape
    flat = latents.reshape(b * t, h, w, c)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        n = mesh.shape[axis]
        pad = (-(b * t) % n)
        if pad:
            flat = jnp.concatenate([flat, flat[-1:].repeat(pad, 0)], axis=0)
        flat = jax.device_put(flat, NamedSharding(mesh, P(axis)))
        per = flat.shape[0] // n
        out = _mesh_decode_fn(mesh, axis, cfg, per, min(segment, per))(
            params, flat
        )
        out = jax.device_put(out, NamedSharding(mesh, P()))  # gather pixels
        out = out[: b * t]
        return out.reshape(b, t, *out.shape[1:])
    outs = []
    for start in range(0, b * t, segment):
        outs.append(_decode_jit(params, cfg, flat[start : start + segment]))
    out = jnp.concatenate(outs, axis=0)
    return out.reshape(b, t, *out.shape[1:])


def vae_encode_video(
    params: Params, cfg: VAEConfig, frames: jnp.ndarray, segment: int = 16
) -> jnp.ndarray:
    """(B, T, H, W, 3) -> (B, T, h, w, 4)."""
    b, t = frames.shape[:2]
    flat = frames.reshape(b * t, *frames.shape[2:])
    outs = []
    for start in range(0, b * t, segment):
        outs.append(_encode_jit(params, cfg, flat[start : start + segment]))
    out = jnp.concatenate(outs, axis=0)
    return out.reshape(b, t, *out.shape[1:])
