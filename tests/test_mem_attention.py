"""Memory-efficient training attention: custom flash-style VJP vs autodiff."""

import jax
import jax.numpy as jnp
import numpy as np

import musev_tpu.ops.attention as A


def _inputs(seed=0, sq=20, sk=13, h=2, d=8, b=2):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    return (
        jax.random.normal(ks[0], (b, sq, h, d)),
        jax.random.normal(ks[1], (b, sk, h, d)),
        jax.random.normal(ks[2], (b, sk, h, d)),
        jax.random.normal(ks[3], (b, sq, h, d)),
    )


def test_mem_efficient_grads_match_autodiff(monkeypatch):
    monkeypatch.setattr(A, "_TRAIN_CHUNK", 8)  # exercise padding + chunks
    q, k, v, co = _inputs()

    def loss_ref(q_, k_, v_):
        return jnp.sum(A._xla_sdpa(q_, k_, v_) * co)

    def loss_new(q_, k_, v_):
        return jnp.sum(A._xla_chunked_sdpa(q_, k_, v_) * co)

    np.testing.assert_allclose(
        np.asarray(A._xla_chunked_sdpa(q, k, v)),
        np.asarray(A._xla_sdpa(q, k, v)),
        atol=1e-5,
    )
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_new = jax.grad(loss_new, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_ref, g_new):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)


def test_training_ctx_routes_and_restores():
    q, k, v, _ = _inputs(sq=512 + 8, sk=512 + 8, h=2, d=8, b=1)
    assert not A.training_active()
    with A.training_ctx():
        assert A.training_active()
        out = A.sdpa(q, k, v, impl="auto")
    assert not A.training_active()
    ref = A._xla_sdpa(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_grad_flows_through_sdpa_under_training_ctx():
    q, k, v, co = _inputs(sq=520, sk=520, h=2, d=8, b=1)

    def loss(q_):
        with A.training_ctx():
            return jnp.sum(A.sdpa(q_, k, v, impl="auto") * co)

    g = jax.grad(loss)(q)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.max(jnp.abs(g))) > 0
