"""CLIP text encoder (SD1.5's openai/clip-vit-large-patch14 topology).

Pure-functional port of the transformers CLIPTextModel used via
``TextEmbExtractor`` (musev/models/text_model.py:5-40) and the weighted-prompt
encoder (musev/utils/text_emb_util.py). Causal pre-LN transformer with
quick-gelu, returning the last hidden state (SD uses no projection).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import sdpa
from .common import Params, init_linear, init_norm, layer_norm, linear


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 77
    layer_norm_eps: float = 1e-5


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def init_clip_text(key, cfg: CLIPTextConfig = CLIPTextConfig(), dtype=jnp.float32) -> Params:
    ks = iter(jax.random.split(key, 8 + cfg.num_layers * 8))
    nxt = lambda: next(ks)  # noqa: E731
    d = cfg.hidden_size
    p: Params = {
        "token_embedding": jax.random.normal(nxt(), (cfg.vocab_size, d), dtype) * 0.02,
        "position_embedding": jax.random.normal(
            nxt(), (cfg.max_position_embeddings, d), dtype
        )
        * 0.01,
        "final_layer_norm": init_norm(d),
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


def clip_text_encode(
    params: Params,
    cfg: CLIPTextConfig,
    input_ids: jnp.ndarray,
) -> jnp.ndarray:
    """(B, S) int32 token ids -> (B, S, hidden) last hidden state."""
    b, s = input_ids.shape
    vocab = params["token_embedding"].shape[0]
    input_ids = jnp.clip(input_ids, 0, vocab - 1)
    x = jnp.take(params["token_embedding"], input_ids, axis=0)
    x = x + params["position_embedding"][None, :s].astype(x.dtype)
    heads = cfg.num_heads
    causal = jnp.triu(jnp.full((s, s), -jnp.inf, dtype=jnp.float32), k=1)
    bias = causal[None, None]  # (1, 1, S, S) added to (B, H, Sq, Sk) logits
    for layer in params["layers"]:
        res = x
        y = layer_norm(layer["layer_norm1"], x, eps=cfg.layer_norm_eps)
        q = linear(layer["q_proj"], y).reshape(b, s, heads, -1)
        k = linear(layer["k_proj"], y).reshape(b, s, heads, -1)
        v = linear(layer["v_proj"], y).reshape(b, s, heads, -1)
        o = sdpa(q, k, v, bias=bias)
        x = res + linear(layer["out_proj"], o.reshape(b, s, -1))
        res = x
        y = layer_norm(layer["layer_norm2"], x, eps=cfg.layer_norm_eps)
        y = quick_gelu(linear(layer["fc1"], y))
        x = res + linear(layer["fc2"], y)
    return layer_norm(params["final_layer_norm"], x, eps=cfg.layer_norm_eps)
