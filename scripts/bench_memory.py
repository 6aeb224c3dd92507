"""HBM-bandwidth micro-bench at the flagship activation shapes.

The 576^2 profile shows ~330 ms/step of elementwise fusions + converts +
copies. This measures what silu / group-norm / transpose cost on the real
chip at the level-0 activation shape, to separate 'fusions are pathological'
from 'thats just the bandwidth bill'.

Timing methodology: the axon tunnel adds ~30 ms of host round-trip latency
per readback, dwarfing sub-ms device ops. Each case therefore issues N async
dispatches and syncs once; per-op time = (wall - measured_latency) / N.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/musev_tpu_jax_cache")

N_ITERS = 30


def sync(x):
    _ = float(jnp.ravel(x)[0])


_LATENCY = None


def measure_latency():
    """One-element readback round-trip, amortized dispatch excluded."""
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


def main():
    from musev_tpu.models.common import group_norm, init_norm

    lat = measure_latency()
    print(f"tunnel readback latency: {lat*1e3:.2f} ms")

    n, h, w, c = 50, 72, 72, 320
    x = jax.random.normal(jax.random.PRNGKey(0), (n, h, w, c), jnp.bfloat16)
    nbytes = x.size * 2

    cases = {
        "silu (r+w)": (jax.jit(jax.nn.silu), 2 * nbytes),
        "x+x (r+w)": (jax.jit(lambda a: a + a), 2 * nbytes),
        "transpose NHWC->NCHW": (
            jax.jit(lambda a: jnp.transpose(a, (0, 3, 1, 2))), 2 * nbytes),
        "bshd->bhsd attn transpose": (
            jax.jit(lambda a: a.reshape(n, h * w, 8, 40 * c // 320)
                    .transpose(0, 2, 1, 3).reshape(n * 8, h * w, -1) * 1.0),
            2 * nbytes),
        "astype f32 (r+2w)": (
            jax.jit(lambda a: a.astype(jnp.float32)), 3 * nbytes),
    }
    for name, (fn, traffic) in cases.items():
        t = timeit(fn, x)
        print(f"{name:26s}: {t*1e3:7.3f} ms  {traffic/t/1e9:7.1f} GB/s")

    gn = init_norm(c)
    fn = jax.jit(lambda a: group_norm(gn, a, num_groups=32))
    t = timeit(fn, x)
    print(f"{'group_norm':26s}: {t*1e3:7.3f} ms  {2*nbytes/t/1e9:7.1f} GB/s eff")

    fn = jax.jit(lambda a: jax.nn.silu(group_norm(gn, a, num_groups=32)))
    t = timeit(fn, x)
    print(f"{'group_norm+silu':26s}: {t*1e3:7.3f} ms  {2*nbytes/t/1e9:7.1f} GB/s eff")

    # temporal-rows transpose used by temporal attention
    v5 = x.reshape(2, 25, h, w, c)
    fn = jax.jit(
        lambda a: jnp.transpose(a, (0, 2, 3, 1, 4)).reshape(2, h * w, 25, c)
        * 1.0
    )
    t = timeit(fn, v5)
    print(f"{'temporal rows transpose':26s}: {t*1e3:7.3f} ms  {2*nbytes/t/1e9:7.1f} GB/s")


if __name__ == "__main__":
    main()
