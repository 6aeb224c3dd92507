"""CLIP vision transformer (image encoder for IP-Adapter branches).

Functional port of transformers CLIPVisionModel(WithProjection) as used via
mmcm's clip_vision_extractor wrappers (SURVEY §2.9): IP-Adapter consumes the
projected pooled embedding; IP-Adapter-Plus consumes penultimate hidden
states.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.attention import sdpa
from .clip_text import quick_gelu
from .common import Params, init_linear, init_norm, layer_norm, linear


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1280  # ViT-H default (IP-Adapter)
    num_layers: int = 32
    num_heads: int = 16
    intermediate_size: int = 5120
    projection_dim: int = 1024
    layer_norm_eps: float = 1e-5

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


def init_clip_vision(key, cfg: CLIPVisionConfig, dtype=jnp.float32) -> Params:
    ks = iter(jax.random.split(key, 8 + cfg.num_layers * 8))
    nxt = lambda: next(ks)  # noqa: E731
    d = cfg.hidden_size
    p: Params = {
        "patch_embedding": jax.random.normal(
            nxt(), (cfg.patch_size, cfg.patch_size, 3, d), dtype
        )
        * 0.02,
        "class_embedding": jax.random.normal(nxt(), (d,), dtype) * 0.02,
        "position_embedding": jax.random.normal(
            nxt(), (cfg.num_patches + 1, d), dtype
        )
        * 0.02,
        "pre_layrnorm": init_norm(d),
        "post_layernorm": init_norm(d),
        "visual_projection": init_linear(
            nxt(), d, cfg.projection_dim, use_bias=False, dtype=dtype
        ),
        "layers": [],
    }
    layers = []
    for _ in range(cfg.num_layers):
        layers.append(
            {
                "layer_norm1": init_norm(d),
                "q_proj": init_linear(nxt(), d, d, dtype=dtype),
                "k_proj": init_linear(nxt(), d, d, dtype=dtype),
                "v_proj": init_linear(nxt(), d, d, dtype=dtype),
                "out_proj": init_linear(nxt(), d, d, dtype=dtype),
                "layer_norm2": init_norm(d),
                "fc1": init_linear(nxt(), d, cfg.intermediate_size, dtype=dtype),
                "fc2": init_linear(nxt(), cfg.intermediate_size, d, dtype=dtype),
            }
        )
    p["layers"] = layers
    return p


def clip_vision_encode(
    params: Params,
    cfg: CLIPVisionConfig,
    pixels: jnp.ndarray,
    penultimate: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, H, W, 3) normalized pixels -> (hidden_states, projected_pooled).

    hidden_states: (B, 1+P, D) from the last (or penultimate) layer;
    projected_pooled: (B, projection_dim) = visual_projection(post_ln(cls)).
    """
    b = pixels.shape[0]
    d = cfg.hidden_size
    patches = jax.lax.conv_general_dilated(
        pixels,
        params["patch_embedding"].astype(pixels.dtype),
        window_strides=(cfg.patch_size, cfg.patch_size),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    tokens = patches.reshape(b, -1, d)
    cls = jnp.broadcast_to(params["class_embedding"][None, None], (b, 1, d))
    x = jnp.concatenate([cls.astype(tokens.dtype), tokens], axis=1)
    x = x + params["position_embedding"][None, : x.shape[1]].astype(x.dtype)
    x = layer_norm(params["pre_layrnorm"], x, eps=cfg.layer_norm_eps)

    heads = cfg.num_heads
    s = x.shape[1]
    hidden_states = None
    n_layers = len(params["layers"])
    for i, layer in enumerate(params["layers"]):
        if penultimate and i == n_layers - 1:
            hidden_states = x
        res = x
        y = layer_norm(layer["layer_norm1"], x, eps=cfg.layer_norm_eps)
        q = linear(layer["q_proj"], y).reshape(b, s, heads, -1)
        k = linear(layer["k_proj"], y).reshape(b, s, heads, -1)
        v = linear(layer["v_proj"], y).reshape(b, s, heads, -1)
        o = sdpa(q, k, v).reshape(b, s, -1)
        x = res + linear(layer["out_proj"], o)
        res = x
        y = layer_norm(layer["layer_norm2"], x, eps=cfg.layer_norm_eps)
        x = res + linear(layer["fc2"], quick_gelu(linear(layer["fc1"], y)))

    if hidden_states is None:
        hidden_states = x
    pooled = layer_norm(
        params["post_layernorm"], x[:, 0], eps=cfg.layer_norm_eps
    )
    projected = linear(params["visual_projection"], pooled)
    return hidden_states, projected


CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


def preprocess_clip_image(images: jnp.ndarray, size: int = 224) -> jnp.ndarray:
    """(B, H, W, 3) uint8/float [0,255] -> normalized (B, size, size, 3)."""
    x = jnp.asarray(images, jnp.float32) / 255.0
    b, h, w, c = x.shape
    x = jax.image.resize(x, (b, size, size, c), method="bilinear")
    mean = jnp.asarray(CLIP_IMAGE_MEAN)
    std = jnp.asarray(CLIP_IMAGE_STD)
    return (x - mean) / std
