"""Reproduce the in-graph conv slowdown: temporal consumers drive XLA to a
batch-minor activation layout ({3,0,2,1}) that wrecks the conv emitter.

The denoise profile shows conv+GN fusions at 42-56 TF/s in-graph vs
95-185 TF/s isolated. Suspect: the temporal-attention/conv reshape
((B*T,H,W,C) -> (B,HW,T,C)) makes layout assignment pick (H,W)-major.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/musev_tpu_jax_cache")


def sync(x):
    _ = float(jnp.ravel(jax.tree_util.tree_leaves(x)[0])[0])


_LAT = 0.0


def measure_latency():
    global _LAT
    f = jax.jit(lambda a: a + 1.0)
    x = jnp.zeros((8, 128), jnp.float32)
    sync(f(x))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        sync(f(x))
        best = min(best, time.perf_counter() - t0)
    _LAT = best
    return best


def timeit(fn, *args, iters=3, inner=8):
    out = fn(*args)
    sync(out)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn(*args)
        sync(out)
        best = min(best, time.perf_counter() - t0)
    return max((best - _LAT) / inner, 1e-9)


def main():
    from musev_tpu.models.common import group_norm, init_norm

    print(f"tunnel latency {measure_latency()*1e3:.1f} ms", flush=True)
    key = jax.random.PRNGKey(0)
    n, hw, c = 50, 72, 320
    b, t = 2, 25
    x = jax.random.normal(key, (n, hw, hw, c), jnp.bfloat16)
    w1 = jax.random.normal(key, (3, 3, c, c), jnp.bfloat16) * 0.02
    w2 = jax.random.normal(jax.random.fold_in(key, 1), (3, 3, c, c), jnp.bfloat16) * 0.02
    wt = jax.random.normal(jax.random.fold_in(key, 2), (c, c), jnp.bfloat16) * 0.02
    gn1, gn2 = init_norm(c), init_norm(c)
    flops = 2 * 2 * n * hw * hw * 9 * c * c  # two convs

    def conv(x_, w_):
        return lax.conv_general_dilated(
            x_, w_, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def resnet(x_):
        y = conv(jax.nn.silu(group_norm(gn1, x_)), w1)
        y = conv(jax.nn.silu(group_norm(gn2, y)), w2)
        return x_ + y

    def temporal_rows(y):
        # (B*T,H,W,C) -> (B, HW, T, C) micro "temporal attention" consumer
        v5 = y.reshape(b, t, hw, hw, c)
        rows = v5.transpose(0, 2, 3, 1, 4).reshape(b, hw * hw, t, c)
        rows = rows @ wt
        back = rows.reshape(b, hw, hw, t, c).transpose(0, 3, 1, 2, 4)
        return back.reshape(n, hw, hw, c)

    cases = {
        "resnet alone": jax.jit(resnet),
        "resnet+temporal": jax.jit(lambda a: temporal_rows(resnet(a))),
        "resnet+bar+temporal": jax.jit(
            lambda a: temporal_rows(lax.optimization_barrier(resnet(a)))
        ),
        "2x(resnet+temporal)": jax.jit(
            lambda a: temporal_rows(resnet(temporal_rows(resnet(a))))
        ),
    }
    for label, fn in cases.items():
        tt = timeit(fn, x)
        mult = 2.0 if label.startswith("2x") else 1.0
        print(f"  {label:22s}: {tt*1e3:7.2f} ms {mult*flops/tt/1e12:6.1f} TF/s(conv)",
              flush=True)


if __name__ == "__main__":
    main()
