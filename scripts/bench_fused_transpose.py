"""Experiment: Pallas transpose(+GN-apply) kernel vs XLA's materialized copy.

The round-2 profile shows ~1.2 s / 10 steps of layout copies, dominated by
the temporal-rows relayout (b, T, h, w, c) -> (b*h*w, T, c) feeding the
packed-lane temporal attention kernel, and its inverse. XLA materializes
these as separate copy ops at ~540 GB/s (2 reads + 2 writes counting the
producer's store). A Pallas kernel that reads the source layout in blocks
and stores the transposed block from VMEM pays 1 read + 1 write, and can
carry the GN scale/shift apply for free.

Cases (flagship L0 shape: b=2 (CFG), T=25, 72x72, C=320, bf16):
  A. XLA transpose (baseline copy)
  B. Pallas transpose (in-kernel swapaxes)
  C. Pallas transpose + fused scale/shift apply (GN-apply fusion)
  D. inverse direction (rows -> video)
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

jax.config.update("jax_compilation_cache_dir", "/tmp/musev_tpu_jax_cache")

N_ITERS = 30
_LATENCY = None


def sync(x):
    _ = float(jnp.ravel(x)[0])


def measure_latency():
    global _LATENCY
    f = jax.jit(lambda a: a + 1.0)
    x = jnp.zeros((8, 128), jnp.float32)
    sync(f(x))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        sync(f(x))
        best = min(best, time.perf_counter() - t0)
    _LATENCY = best
    return best


def timeit(fn, *args):
    out = fn(*args)
    sync(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(N_ITERS):
            out = fn(*args)
        sync(out)
        best = min(best, time.perf_counter() - t0)
    return max((best - _LATENCY) / N_ITERS, 1e-9)


# --- kernels ---------------------------------------------------------------


def _t_kernel(x_ref, o_ref):
    # x block (1, T, bn, c) -> out block (1, bn, T, c)
    o_ref[0] = jnp.swapaxes(x_ref[0], 0, 1)


def _t_gn_kernel(x_ref, sc_ref, sh_ref, o_ref):
    # GN-apply: per-(row, channel) scale/shift (stats broadcast to channels
    # by the matmul-trick GN), fused into the relayout store
    x = x_ref[0].astype(jnp.float32)
    y = x * sc_ref[0][:, None, :] + sh_ref[0][:, None, :]
    o_ref[0] = jnp.swapaxes(y.astype(o_ref.dtype), 0, 1)


@partial(jax.jit, static_argnames=("bn",))
def pallas_transpose(x, bn=128):
    b, t, hw, c = x.shape
    out = pl.pallas_call(
        _t_kernel,
        grid=(b, hw // bn),
        in_specs=[pl.BlockSpec((1, t, bn, c), lambda i, j: (i, 0, j, 0))],
        out_specs=pl.BlockSpec((1, bn, t, c), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hw, t, c), x.dtype),
    )(x)
    return out


@partial(jax.jit, static_argnames=("bn",))
def pallas_transpose_gn(x, scale, shift, bn=128):
    b, t, hw, c = x.shape
    out = pl.pallas_call(
        _t_gn_kernel,
        grid=(b, hw // bn),
        in_specs=[
            pl.BlockSpec((1, t, bn, c), lambda i, j: (i, 0, j, 0)),
            pl.BlockSpec((1, t, c), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, t, c), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bn, t, c), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hw, t, c), x.dtype),
    )(x, scale, shift)
    return out


def _inv_kernel(x_ref, o_ref):
    o_ref[0] = jnp.swapaxes(x_ref[0], 0, 1)


@partial(jax.jit, static_argnames=("bn",))
def pallas_transpose_inv(x, bn=128):
    b, hw, t, c = x.shape
    out = pl.pallas_call(
        _inv_kernel,
        grid=(b, hw // bn),
        in_specs=[pl.BlockSpec((1, bn, t, c), lambda i, j: (i, j, 0, 0))],
        out_specs=pl.BlockSpec((1, t, bn, c), lambda i, j: (i, 0, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, t, hw, c), x.dtype),
    )(x)
    return out


def main():
    lat = measure_latency()
    print(f"latency {lat*1e3:.1f} ms")
    b, t, hw, c = 2, 25, 72 * 72, 320
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, t, hw, c), jnp.bfloat16)
    xr = jax.random.normal(key, (b, hw, t, c), jnp.bfloat16)
    sc = jnp.ones((b, t, c), jnp.float32)
    sh = jnp.zeros((b, t, c), jnp.float32)
    bytes_moved = 2 * x.size * x.dtype.itemsize  # 1 read + 1 write

    xla_t = jax.jit(lambda a: jnp.swapaxes(a, 1, 2).copy())
    cases = [
        ("A xla transpose", lambda: xla_t(x)),
    ]
    try:
        np.testing.assert_array_equal(
            np.asarray(pallas_transpose(x)), np.swapaxes(np.asarray(x), 1, 2)
        )
        cases.append(("B pallas transpose", lambda: pallas_transpose(x)))
        cases.append(
            ("C pallas transpose+gn", lambda: pallas_transpose_gn(x, sc, sh))
        )
    except Exception as e:
        print("pallas fwd failed:", str(e)[:400])
    try:
        np.testing.assert_array_equal(
            np.asarray(pallas_transpose_inv(xr)),
            np.swapaxes(np.asarray(xr), 1, 2),
        )
        cases.append(("D pallas inverse", lambda: pallas_transpose_inv(xr)))
    except Exception as e:
        print("pallas inv failed:", str(e)[:400])

    for name, fn in cases:
        try:
            dt = timeit(lambda: fn())
            print(f"{name:24s} {dt*1e3:7.2f} ms  {bytes_moved/dt/1e9:6.0f} GB/s")
        except Exception as e:
            print(f"{name:24s} FAILED: {str(e)[:300]}")


if __name__ == "__main__":
    main()
