"""Does fusing GroupNorm stats into a conv wreck XLA's conv emitter?

Trace evidence (profile_denoise --detail): conv fusions that carry the GN
s1/s2 reduction outputs run at 40-60 TFLOP/s while pure conv+bias(+add)
fusions hit ~173 TFLOP/s on v5e. This measures conv -> GN(+SiLU) chains
with and without an optimization_barrier between them.
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

    for n, hw, c in [(50, 72, 320), (50, 36, 640), (50, 18, 1280)]:
        x = jax.random.normal(key, (n, hw, hw, c), jnp.bfloat16)
        w = jax.random.normal(key, (3, 3, c, c), jnp.bfloat16) * 0.02
        b = jnp.zeros((c,), jnp.bfloat16)
        gn = init_norm(c)
        flops = 2 * n * hw * hw * 9 * c * c

        def conv(x_):
            y = lax.conv_general_dilated(
                x_, w, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return y + b

        def chain(x_, barrier):
            y = conv(x_)
            if barrier:
                y = lax.optimization_barrier(y)
            return jax.nn.silu(group_norm(gn, y, num_groups=32))

        print(f"== ({n},{hw},{hw},{c}) conv {flops/1e12:.2f} TFLOP", flush=True)
        t = timeit(jax.jit(conv), x)
        print(f"  conv alone        : {t*1e3:7.2f} ms {flops/t/1e12:6.1f} TF/s",
              flush=True)
        t = timeit(jax.jit(functools.partial(chain, barrier=False)), x)
        print(f"  conv+GN+silu fused: {t*1e3:7.2f} ms {flops/t/1e12:6.1f} TF/s",
              flush=True)
        t = timeit(jax.jit(functools.partial(chain, barrier=True)), x)
        print(f"  conv |bar| GN+silu: {t*1e3:7.2f} ms {flops/t/1e12:6.1f} TF/s",
              flush=True)


if __name__ == "__main__":
    main()
