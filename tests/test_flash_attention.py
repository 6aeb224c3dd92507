"""Flash-attention long-KV carry kernel vs a dense softmax reference.

The carry kernel (ops/pallas/flash_attention.py:_carry_kernel) streams KV
parts through an inner grid dimension with the online-softmax state in VMEM
scratch; it replaces the XLA split-merge for KV extents beyond the unroll
kernel's VMEM capacity (the ReferenceOnly concat-KV sites, reference
attention_processor.py:258-335). These tests run the kernel in interpret
mode with exactly the dispatcher's block/part selection math.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from musev_tpu.ops.pallas import flash_attention as fa


def _dense_ref(q, k, v, scale):
    s = jnp.einsum(
        "bqhd,bkhd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)
    ) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v.astype(jnp.float32))


def _run_carry(q, k, v, scale, n_qsub=None):
    """Drive _flash_carry with the dispatcher's own padding/plan math."""
    b, sq, h, d = q.shape
    sk = k.shape[1]
    d_p = d if d % 8 == 0 else fa._cdiv(d, 8) * 8

    def to_bh(x, s):
        x = x.transpose(0, 2, 1, 3).reshape(b * h, s, d)
        if d_p != d:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, d_p - d)))
        return x

    bq = fa._pick_block(sq, fa._bq_target(sq, sk, d_p))
    sq_p = fa._cdiv(sq, bq) * bq
    n_parts, part, sub = fa._carry_plan(sk, d_p)
    if n_qsub is None:
        n_qsub = fa._carry_qsub(bq)
    sk_p = n_parts * part
    out = fa._flash_carry(
        fa._pad_rows(to_bh(q, sq), sq_p),
        fa._pad_rows(to_bh(k, sk), sk_p),
        fa._pad_rows(to_bh(v, sk), sk_p),
        float(scale), int(bq), int(sub), int(part), int(sk),
        n_qsub=int(n_qsub), interpret=True,
    )
    return out[:, :sq, :d].reshape(b, h, sq, d).transpose(0, 2, 1, 3)


@pytest.mark.parametrize(
    "sq,sk,d,h,n_qsub",
    [
        (640, 8192, 40, 2, None),   # 512^2 ReferenceOnly concat-KV (2 parts)
        (192, 10368, 40, 1, None),  # 576^2 concat-KV (3 uneven parts + tail)
        (200, 6000, 64, 2, None),   # non-lane-aligned sk tail masking
        (640, 8192, 40, 1, 2),      # q split in two register-state chunks
        (576, 10368, 40, 1, 3),     # three q chunks, uneven parts + tail
    ],
)
def test_carry_matches_dense(sq, sk, d, h, n_qsub):
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(sq + sk), 3)
    q = jax.random.normal(kq, (1, sq, h, d), jnp.float32)
    k = jax.random.normal(kk, (1, sk, h, d), jnp.float32)
    v = jax.random.normal(kv, (1, sk, h, d), jnp.float32)
    scale = d**-0.5
    out = _run_carry(q, k, v, scale, n_qsub=n_qsub)
    want = _dense_ref(q, k, v, scale)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(want), atol=2e-3, rtol=2e-3
    )


def test_carry_plan_covers_and_aligns():
    for sk in (8192, 10368, 6000, 16384, 26752, 5185):
        for d_p in (40, 64, 128, 512):
            n_parts, part, sub = fa._carry_plan(sk, d_p)
            assert n_parts * part >= sk
            assert part % fa._LANE == 0 and part % sub == 0
            # every part must fit the unroll kernel's VMEM capacity
            assert part <= fa._kv_capacity(d_p, fa._LANE)


def test_carry_only_used_beyond_unroll_capacity():
    # the dispatcher must keep small-KV sites on the single-invocation
    # unroll kernel (carry's extra grid dim costs grid overhead there)
    d_p = 40
    assert fa._kv_capacity(max(d_p, fa._LANE), 8) >= 4096


def _run_stream(q, k, v, scale, qc, sub, bqi):
    """Drive _flash_stream with explicit chunk/sub-block choices."""
    b, sq, h, d = q.shape
    sk = k.shape[1]
    d_p = d if d % 8 == 0 else fa._cdiv(d, 8) * 8

    def to_bh(x, s):
        x = x.transpose(0, 2, 1, 3).reshape(b * h, s, d)
        if d_p != d:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, d_p - d)))
        return x

    sq_p = fa._cdiv(sq, qc) * qc
    sk_p = fa._cdiv(sk, sub) * sub
    out = fa._flash_stream(
        fa._pad_rows(to_bh(q, sq), sq_p),
        fa._pad_rows(to_bh(k, sk), sk_p),
        fa._pad_rows(to_bh(v, sk), sk_p),
        float(scale), int(qc), int(sub), int(sk), int(bqi),
        interpret=True,
    )
    return out[:, :sq, :d].reshape(b, h, sq, d).transpose(0, 2, 1, 3)


@pytest.mark.parametrize(
    "sq,sk,d,h,qc,sub,bqi",
    [
        (1296, 10368, 40, 1, 648, 1152, 216),  # 576^2 concat-KV shape family
        (1024, 8192, 40, 2, 512, 1024, 256),   # 512^2, two heads
        (200, 6000, 64, 1, 200, 1024, 200),    # ragged: sk pad-masked tail
    ],
)
def test_stream_matches_dense(sq, sk, d, h, qc, sub, bqi):
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(3 * sq + sk), 3)
    q = jax.random.normal(kq, (1, sq, h, d), jnp.float32)
    k = jax.random.normal(kk, (1, sk, h, d), jnp.float32)
    v = jax.random.normal(kv, (1, sk, h, d), jnp.float32)
    scale = d**-0.5
    out = _run_stream(q, k, v, scale, qc, sub, bqi)
    want = _dense_ref(q, k, v, scale)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(want), atol=2e-3, rtol=2e-3
    )
