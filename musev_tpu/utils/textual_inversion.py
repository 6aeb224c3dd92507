"""Textual-inversion embeddings (negative-embedding presets).

Reference: DiffusersPipelinePredictor loads four negative textual-inversion
embeddings (easynegative, badhandv4, ng_deepnegative_v1_75t,
bad_prompt_version2-neg) at pipeline_controlnet_predictor.py:248-254. A
learned embedding maps a trigger word to one or more new token vectors that
are appended to the CLIP token-embedding table.
"""

from __future__ import annotations

from typing import Dict, List

import jax.numpy as jnp
import numpy as np


class InversionTokenizer:
    """Wraps a tokenizer, mapping registered trigger words to appended ids."""

    def __init__(self, base):
        self._base = base
        self._triggers: Dict[str, List[int]] = {}
        self.bos_token_id = base.bos_token_id
        self.eos_token_id = base.eos_token_id
        self.pad_token_id = base.pad_token_id
        self.model_max_length = base.model_max_length
        self.vocab_size = getattr(base, "vocab_size", None)

    def register(self, trigger: str, n_vectors: int, first_id: int) -> List[int]:
        ids = list(range(first_id, first_id + n_vectors))
        self._triggers[trigger.lower()] = ids
        return ids

    def encode(self, text: str) -> List[int]:
        if not self._triggers:
            return self._base.encode(text)
        out: List[int] = []
        for word in text.replace(",", " , ").split():
            ids = self._triggers.get(word.lower())
            if ids is not None:
                out.extend(ids)
            else:
                out.extend(self._base.encode(word))
        return out


def load_inversion_state_dict(sd: Dict[str, np.ndarray]) -> np.ndarray:
    """Extract the (n_vectors, dim) embedding from the common file layouts:
    {'emb_params': ...} (safetensors), {'string_to_param': {'*': ...}} (A1111
    .pt), or a single-tensor dict."""
    if "emb_params" in sd:
        emb = sd["emb_params"]
    elif "string_to_param" in sd:
        emb = list(sd["string_to_param"].values())[0]
    else:
        emb = list(sd.values())[0]
    emb = np.asarray(emb)
    if emb.ndim == 1:
        emb = emb[None]
    return emb


def add_textual_inversion(
    text_params: dict,
    tokenizer: InversionTokenizer,
    trigger: str,
    embedding: np.ndarray,
) -> None:
    """Append embedding rows to the token table and register the trigger."""
    table = np.asarray(text_params["token_embedding"])
    emb = np.asarray(embedding, table.dtype)
    if emb.shape[-1] != table.shape[-1]:
        raise ValueError(
            f"inversion dim {emb.shape[-1]} != text hidden {table.shape[-1]}"
        )
    first_id = table.shape[0]
    text_params["token_embedding"] = jnp.asarray(
        np.concatenate([table, emb], axis=0)
    )
    tokenizer.register(trigger, emb.shape[0], first_id)
