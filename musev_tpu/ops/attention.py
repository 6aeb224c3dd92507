"""Scaled-dot-product attention dispatch.

One entry point, ``sdpa``, with pluggable implementations:
  * ``"xla"`` — einsum + fp32 softmax; XLA fuses this well for the short
    sequences of temporal attention
  * ``"flash"`` — Pallas TPU flash-attention kernel (ops/pallas) for the
    long-sequence spatial paths; falls back to xla off-TPU
  * ``"auto"`` — picks by platform and sequence length

Replaces every xformers ``memory_efficient_attention`` call site in the
reference (attention_processor.py:258, 292, 328, 519, 724; SURVEY §2.10 N1).

Shapes: q ``(B, Sq, H, D)``, k/v ``(B, Sk, H, D)``; returns ``(B, Sq, H, D)``.
"""

from __future__ import annotations

import contextlib
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

_FLASH_MIN_SEQ = 512

# trace-time flag: under jax.grad the Pallas flash kernel has no VJP, so
# training routes long-sequence attention to the chunked XLA path (exact,
# differentiable, O(chunk*S) logits memory instead of O(S^2))
_TRAINING = False


def training_active() -> bool:
    return _TRAINING


@contextlib.contextmanager
def training_ctx():
    """Route attention off the Pallas kernels for differentiable tracing."""
    global _TRAINING
    prev = _TRAINING
    _TRAINING = True
    try:
        yield
    finally:
        _TRAINING = prev


_TRAIN_CHUNK = 512


def _chunk_fwd(q, k, v, scale):
    """q-chunked attention returning (out, lse); logits bounded to
    (B, H, chunk, Sk). q comes pre-padded to a chunk multiple."""
    b, sq, h, d = q.shape
    n = sq // _TRAIN_CHUNK
    qc = q.reshape(b, n, _TRAIN_CHUNK, h, d).transpose(1, 0, 2, 3, 4)

    def one(q_):
        logits = (
            jnp.einsum("bqhd,bkhd->bhqk", q_, k).astype(jnp.float32) * scale
        )
        lse = jax.scipy.special.logsumexp(logits, axis=-1)  # (B,H,chunk)
        p = jnp.exp(logits - lse[..., None]).astype(q_.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", p, v), lse

    out, lse = jax.lax.map(one, (qc))
    out = out.transpose(1, 0, 2, 3, 4).reshape(b, sq, h, d)
    lse = lse.transpose(1, 2, 0, 3).reshape(b, h, sq)
    return out, lse


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _mem_efficient_sdpa(q, k, v, scale):
    """Exact attention with an O(chunk*Sk) flash-style VJP.

    Plain autodiff through chunked attention still stores every chunk's
    softmax weights (the full S^2 residual set) for the backward pass; this
    custom VJP saves only (q, k, v, out, lse) and rematerializes each
    chunk's probabilities inside the backward scan — the standard
    flash-attention backward, expressed in XLA."""
    out, _ = _chunk_fwd(q, k, v, scale)
    return out


def _mem_sdpa_fwd(q, k, v, scale):
    out, lse = _chunk_fwd(q, k, v, scale)
    return out, (q, k, v, out, lse)


def _mem_sdpa_bwd(scale, res, do):
    q, k, v, out, lse = res
    b, sq, h, d = q.shape
    n = sq // _TRAIN_CHUNK
    # delta_i = sum_d do_i * out_i  (the dP->dS softmax correction term)
    delta = jnp.einsum("bqhd,bqhd->bhq", do.astype(jnp.float32),
                       out.astype(jnp.float32))

    def split(x):  # (B, Sq, H, D) -> (n, B, chunk, H, D)
        return x.reshape(b, n, _TRAIN_CHUNK, h, d).transpose(1, 0, 2, 3, 4)

    qc, doc = split(q), split(do)
    lsec = lse.reshape(b, h, n, _TRAIN_CHUNK).transpose(2, 0, 1, 3)
    deltac = delta.reshape(b, h, n, _TRAIN_CHUNK).transpose(2, 0, 1, 3)

    def body(carry, xs):
        dk_acc, dv_acc = carry
        q_, do_, lse_, delta_ = xs
        logits = (
            jnp.einsum("bqhd,bkhd->bhqk", q_, k).astype(jnp.float32) * scale
        )
        p = jnp.exp(logits - lse_[..., None])  # (B,H,chunk,Sk) f32
        dv_acc = dv_acc + jnp.einsum(
            "bhqk,bqhd->bkhd", p.astype(do_.dtype), do_
        ).astype(jnp.float32)
        dp = jnp.einsum("bqhd,bkhd->bhqk", do_, v).astype(jnp.float32)
        ds = p * (dp - delta_[..., None]) * scale  # (B,H,chunk,Sk)
        ds = ds.astype(q_.dtype)
        dq_ = jnp.einsum("bhqk,bkhd->bqhd", ds, k)
        dk_acc = dk_acc + jnp.einsum(
            "bhqk,bqhd->bkhd", ds, q_
        ).astype(jnp.float32)
        return (dk_acc, dv_acc), dq_

    zeros = jnp.zeros(k.shape, jnp.float32)
    (dk, dv), dqs = jax.lax.scan(
        body, (zeros, zeros), (qc, doc, lsec, deltac)
    )
    dq = dqs.transpose(1, 0, 2, 3, 4).reshape(b, sq, h, d)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype)


_mem_efficient_sdpa.defvjp(_mem_sdpa_fwd, _mem_sdpa_bwd)


def _xla_chunked_sdpa(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Memory-efficient exact attention for training (see _mem_efficient_sdpa)."""
    b, sq, h, d = q.shape
    if scale is None:
        scale = d**-0.5
    pad = (-sq) % _TRAIN_CHUNK
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
    out = _mem_efficient_sdpa(q, k, v, float(scale))
    return out[:, :sq]


def _xla_sdpa(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    if scale is None:
        scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    logits = logits.astype(jnp.float32)
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", weights, v)


def sdpa(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    bias: Optional[jnp.ndarray] = None,
    impl: str = "auto",
) -> jnp.ndarray:
    """Attention over (B, S, H, D) tensors."""
    if impl == "auto":
        from ..parallel.context import mesh_active, sp_axis

        sp = sp_axis()
        if (
            sp is not None
            and bias is None
            and q.shape[1] == k.shape[1]  # self-attention sites only
            and q.shape[1] >= _FLASH_MIN_SEQ
        ):
            from jax.sharding import get_abstract_mesh

            mesh = get_abstract_mesh()
            n = mesh.shape.get(sp, 1) if mesh.shape else 1
            if n > 1 and q.shape[1] % n == 0:
                from ..parallel.ring_attention import sp_sdpa

                return sp_sdpa(q, k, v, axis=sp, scale=scale)
        on_tpu = jax.default_backend() not in ("cpu", "gpu")
        if _TRAINING:
            # differentiable path; chunk long sequences to bound logits HBM
            if q.shape[1] >= _FLASH_MIN_SEQ and bias is None:
                return _xla_chunked_sdpa(q, k, v, scale=scale)
            return _xla_sdpa(q, k, v, scale=scale, bias=bias)
        if (
            not on_tpu
            and bias is None
            and q.shape[1] >= _FLASH_MIN_SEQ
            and q.shape[1] * k.shape[1] >= (1 << 22)
        ):
            # off-TPU flash fallback at high-res shapes (e.g. the 704x1216
            # config's 13376-token rows): full S^2 logits would be GBs per
            # head; the chunked path is exact at O(chunk*Sk)
            return _xla_chunked_sdpa(q, k, v, scale=scale)
        impl = (
            "flash"
            if on_tpu and bias is None and q.shape[1] >= _FLASH_MIN_SEQ
            # tiny-KV sites (cross-attn over 77 text tokens) are
            # grid-overhead bound in the kernel; XLA measured faster (v5e:
            # 4.2 vs 4.4-6.0 ms at the L0 cross shape) with no transposes
            and k.shape[1] >= 256
            and not mesh_active()  # custom calls aren't SPMD-partitionable
            else "xla"
        )
    if impl == "flash":
        from .pallas.flash_attention import flash_attention

        try:
            return flash_attention(q, k, v, scale=scale)
        except NotImplementedError:
            impl = "xla"
    return _xla_sdpa(q, k, v, scale=scale, bias=bias)
