"""IP-Adapter image-projection heads.

Behavioral reference: the tencent-ailab ip_adapter package as consumed by
musev/models/ip_adapter_loader.py:43-44 (ImageProjModel, Resampler) and
ip_adapter_face_loader.py:36-38 (MLPProjModel). These map CLIP-vision
embeddings to cross-attention token sets consumed by the dual-KV attention
branch (attention_processor.py:267-300).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.attention import sdpa
from .common import (
    Params,
    init_linear,
    init_norm,
    layer_norm,
    linear,
)


# ---------------------------------------------------------------------------
# ImageProjModel: one linear -> N context tokens + LayerNorm


def init_image_proj(
    key,
    clip_dim: int = 1024,
    cross_dim: int = 768,
    num_tokens: int = 4,
    dtype=jnp.float32,
) -> Params:
    return {
        "proj": init_linear(key, clip_dim, cross_dim * num_tokens, dtype=dtype),
        "norm": init_norm(cross_dim),
    }


def image_proj(p: Params, image_emb: jnp.ndarray) -> jnp.ndarray:
    """(B, clip_dim) pooled CLIP embedding -> (B, num_tokens, cross_dim).

    num_tokens is inferred from the param shapes (proj out dim / norm dim) so
    the params tree stays a pure array pytree."""
    cross = p["norm"]["scale"].shape[0]
    x = linear(p["proj"], image_emb)
    x = x.reshape(x.shape[0], -1, cross)
    return layer_norm(p["norm"], x)


# ---------------------------------------------------------------------------
# MLPProjModel (IPAdapterFaceID): Linear -> GELU -> Linear -> LayerNorm


def init_mlp_proj(
    key,
    id_dim: int = 512,
    cross_dim: int = 768,
    num_tokens: int = 4,
    dtype=jnp.float32,
) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "fc1": init_linear(k1, id_dim, id_dim * 2, dtype=dtype),
        "fc2": init_linear(k2, id_dim * 2, cross_dim * num_tokens, dtype=dtype),
        "norm": init_norm(cross_dim),
    }


def mlp_proj(p: Params, id_emb: jnp.ndarray) -> jnp.ndarray:
    """(B, id_dim) face embedding -> (B, num_tokens, cross_dim)."""
    cross = p["norm"]["scale"].shape[0]
    # exact (erf) GELU: torch nn.GELU default in the reference MLPProjModel
    x = jax.nn.gelu(linear(p["fc1"], id_emb), approximate=False)
    x = linear(p["fc2"], x).reshape(id_emb.shape[0], -1, cross)
    return layer_norm(p["norm"], x)


# ---------------------------------------------------------------------------
# Resampler (IP-Adapter Plus): perceiver readout over patch tokens


@dataclasses.dataclass(frozen=True)
class ResamplerConfig:
    dim: int = 1024
    depth: int = 4
    heads: int = 12
    num_queries: int = 16
    embedding_dim: int = 1280  # CLIP ViT-H hidden size
    output_dim: int = 768
    ff_mult: int = 4


def init_resampler(key, cfg: ResamplerConfig, dtype=jnp.float32) -> Params:
    ks = iter(jax.random.split(key, 4 + cfg.depth * 6))
    nxt = lambda: next(ks)  # noqa: E731
    d = cfg.dim
    p: Params = {
        "latents": jax.random.normal(nxt(), (cfg.num_queries, d), dtype) / d**0.5,
        "proj_in": init_linear(nxt(), cfg.embedding_dim, d, dtype=dtype),
        "proj_out": init_linear(nxt(), d, cfg.output_dim, dtype=dtype),
        "norm_out": init_norm(cfg.output_dim),
        "layers": [],
    }
    layers = []
    for _ in range(cfg.depth):
        layers.append(
            {
                "norm1": init_norm(d),
                "norm_media": init_norm(d),
                "to_q": init_linear(nxt(), d, d, use_bias=False, dtype=dtype),
                "to_kv": init_linear(nxt(), d, d * 2, use_bias=False, dtype=dtype),
                "to_out": init_linear(nxt(), d, d, use_bias=False, dtype=dtype),
                "ff_norm": init_norm(d),
                "ff1": init_linear(nxt(), d, d * cfg.ff_mult, use_bias=False, dtype=dtype),
                "ff2": init_linear(nxt(), d * cfg.ff_mult, d, use_bias=False, dtype=dtype),
            }
        )
    p["layers"] = layers
    return p


def resampler(p: Params, cfg: ResamplerConfig, tokens: jnp.ndarray) -> jnp.ndarray:
    """(B, S, embedding_dim) patch tokens -> (B, num_queries, output_dim)."""
    b = tokens.shape[0]
    x = linear(p["proj_in"], tokens)
    lat = jnp.broadcast_to(p["latents"][None], (b, *p["latents"].shape)).astype(x.dtype)
    heads = cfg.heads
    for layer in p["layers"]:
        q_in = layer_norm(layer["norm1"], lat)
        media = layer_norm(layer["norm_media"], x)
        kv_in = jnp.concatenate([media, q_in], axis=1)
        q = linear(layer["to_q"], q_in)
        k, v = jnp.split(linear(layer["to_kv"], kv_in), 2, axis=-1)
        d_h = q.shape[-1] // heads
        q = q.reshape(b, -1, heads, d_h)
        k = k.reshape(b, -1, heads, d_h)
        v = v.reshape(b, -1, heads, d_h)
        o = sdpa(q, k, v).reshape(b, -1, heads * d_h)
        lat = lat + linear(layer["to_out"], o)
        f = layer_norm(layer["ff_norm"], lat)
        lat = lat + linear(layer["ff2"], jax.nn.gelu(linear(layer["ff1"], f)))
    out = linear(p["proj_out"], lat)
    return layer_norm(p["norm_out"], out)


def uncond_image_tokens(proj_fn, emb_shape, dtype=jnp.float32) -> jnp.ndarray:
    """CFG uncond branch: project zeros (reference
    pipeline_controlnet.py:736-774)."""
    return proj_fn(jnp.zeros(emb_shape, dtype))
