"""Shared timing helpers for the kernel micro-bench scripts.

One copy of the sync/timeit/canary trio so cross-script TF/s numbers stay
comparable (bench.py keeps its own pipelined/per-call-sync machinery — its
methodology is part of the recorded artifact, not a micro-bench).
"""

import time

import jax
import jax.numpy as jnp


def sync(x):
    """Over the axon tunnel block_until_ready can return before the device
    finishes; a host fetch of one element is a reliable barrier."""
    _ = float(jnp.ravel(x)[0])


def timeit(f, *args, iters=10, **kw):
    """Best-of-3 rounds of ``iters`` pipelined dispatches + one sync."""
    sync(f(*args, **kw))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args, **kw)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def chip_canary():
    """Fixed-work chip-speed canary (best-of-3 x 10 pipelined 4096^3 bf16
    matmuls, TF/s). Sessions on this tunnel vary ~30% in speed; print this
    alongside every sweep so cross-session numbers can be normalized."""
    x = jax.random.normal(jax.random.PRNGKey(9), (4096, 4096), jnp.bfloat16)
    mm = jax.jit(lambda a: a @ a)
    return 2 * 4096**3 / timeit(mm, x) / 1e12
