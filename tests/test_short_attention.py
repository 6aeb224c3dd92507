"""Packed-lane short-sequence attention kernel vs the head-split reference.

The kernel (ops/pallas/short_attention.py) must be bit-comparable to
reshape->sdpa->reshape: masked full-width contractions are exactly the
per-head contractions because head lanes are disjoint.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from musev_tpu.ops.attention import _xla_sdpa
from musev_tpu.ops.pallas.short_attention import (
    MAX_SHORT_SEQ,
    _pick_block_n,
    short_attention_packed,
)


def _ref(q, k, v, heads):
    n, t, c = q.shape
    d = c // heads
    o = _xla_sdpa(
        q.reshape(n, t, heads, d), k.reshape(n, t, heads, d), v.reshape(n, t, heads, d)
    )
    return o.reshape(n, t, c)


@pytest.mark.parametrize(
    "n,t,c,heads",
    [(12, 25, 64, 8), (6, 24, 96, 8), (27, 25, 40, 5), (9, 3, 16, 2)],
)
def test_matches_head_split_sdpa(n, t, c, heads):
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(n * 7 + t), 3)
    q = jax.random.normal(kq, (n, t, c), jnp.float32)
    k = jax.random.normal(kk, (n, t, c), jnp.float32)
    v = jax.random.normal(kv, (n, t, c), jnp.float32)
    out = short_attention_packed(q, k, v, heads, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_ref(q, k, v, heads)), atol=2e-5, rtol=1e-5
    )


def test_rejects_long_sequences():
    q = jnp.zeros((4, MAX_SHORT_SEQ + 1, 32))
    with pytest.raises(ValueError):
        short_attention_packed(q, q, q, 4, interpret=True)


def test_block_picker_divides():
    for n in (10368, 2592, 648, 162, 7, 1):
        bn = _pick_block_n(n, 25, 320)
        assert n % bn == 0 and bn >= 1


def test_kv_len_masks_padded_tail():
    """T-padded rows with kv_len must equal the unpadded result on the
    valid prefix (the sublane-alignment path in temporal_transformer)."""
    n, t, c, heads = 16, 25, 64, 4
    tp = 32
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(3), 3)
    q = jax.random.normal(kq, (n, t, c), jnp.float32)
    k = jax.random.normal(kk, (n, t, c), jnp.float32)
    v = jax.random.normal(kv, (n, t, c), jnp.float32)
    ref = short_attention_packed(q, k, v, heads, interpret=True)
    pad = lambda x: jnp.pad(x, ((0, 0), (0, tp - t), (0, 0)))  # noqa: E731
    # padded k/v tails are NONZERO garbage to prove masking works
    junk = jnp.ones((n, tp - t, c), jnp.float32) * 7.0
    kp = jnp.concatenate([k, junk], axis=1)
    vp = jnp.concatenate([v, junk], axis=1)
    out = short_attention_packed(pad(q), kp, vp, heads, interpret=True,
                                 kv_len=t)
    np.testing.assert_allclose(
        np.asarray(out[:, :t]), np.asarray(ref), atol=2e-5, rtol=1e-5
    )


def test_flash_block_heuristics():
    """Tuned block-choice helpers (v5e-measured, see flash_attention.py
    docstrings): 1024-q only where it tiles exactly and KV fits; split
    sub-kv flat 2048 clamped by lane-scaled VMEM capacity."""
    from musev_tpu.ops.pallas.flash_attention import (
        _bq_target,
        _kv_capacity,
        _pick_block,
        _split_sub_kv,
    )

    assert _bq_target(4096, 4096, 128) == 1024   # 512^2 refnet shape
    assert _bq_target(5184, 5184, 128) == 576    # 576^2 flagship shape
    assert _bq_target(4096, 8192, 128) == 576    # concat-KV: too much KV
    assert _bq_target(4096, 4096, 512) == 576    # wide heads shrink VMEM
    assert _split_sub_kv(128) == 2048
    assert _split_sub_kv(512) == _kv_capacity(512, 8)  # clamped
    # split part sizes stay balanced at the measured shapes
    assert _kv_capacity(128, 2048) == 4096       # sk=8192 -> 2 x 4096
    assert _pick_block(4096, 576) == 512         # exact tiling beats target
    assert _pick_block(5184, 576) == 576
