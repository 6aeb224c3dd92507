"""Round-3 shard-shape micro-experiments (run on the axon TPU).

Two candidate wins identified from the per-shard trace
(profile_denoise --shard; see README perf notes):

1. GN(+SiLU) fused as a *prologue* into the following 3x3 conv repeats the
   f32 scale/shift once per conv-window read (9x per element) — prologue
   convs measure 113-129 TF/s vs 155-173 for clean convs. Does an
   optimization_barrier after the GN apply (materialize the normalized
   activation, run the conv clean) win at the shard shapes?

2. The concat-KV spatial attention (sk = 2*5184 = 10368, d=40) exceeds the
   flash kernel's empirical KV capacity rule (5184 at 128 lanes) and takes
   the split+merge path: 2 kernel calls emitting (o, m, l) + XLA merge
   fusions — ~12 ms/step of overhead. At d=40 the resident K/V block is
   only ~5.3 MB (lane-padded), so a single call with the whole 10368 KV
   may fit VMEM with a smaller q block. Measure one-shot vs split.
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


def bench_gn_prologue():
    from musev_tpu.models.common import group_norm, init_norm

    key = jax.random.PRNGKey(0)
    # (N, hw, cin, cout) at the shard workload's hot GN->conv sites
    cases = [
        (13, 72, 320, 320),
        (13, 72, 960, 320),   # skip-concat resnet conv1
        (13, 72, 640, 640),
        (13, 36, 640, 640),
        (13, 36, 1920, 640),
        (13, 18, 2560, 1280),
    ]
    for n, hw, cin, cout in cases:
        x = jax.random.normal(key, (n, hw, hw, cin), jnp.bfloat16)
        w = jax.random.normal(key, (3, 3, cin, cout), jnp.bfloat16) * 0.02
        b = jnp.zeros((cout,), jnp.bfloat16)
        gn = init_norm(cin)
        flops = 2 * n * hw * hw * 9 * cin * cout

        def conv(x_):
            y = lax.conv_general_dilated(
                x_, w, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return y + b

        def chain(x_, out_barrier):
            g = jax.nn.silu(group_norm(gn, x_, num_groups=32))
            if out_barrier:
                g = lax.optimization_barrier(g)
            return conv(g)

        print(f"== GN+silu->conv ({n},{hw},{hw},{cin})->{cout} "
              f"{flops/1e12:.2f} TFLOP", flush=True)
        t0 = timeit(jax.jit(conv), x)
        print(f"  conv alone         : {t0*1e3:7.2f} ms {flops/t0/1e12:6.1f} TF/s",
              flush=True)
        t1 = timeit(jax.jit(functools.partial(chain, out_barrier=False)), x)
        print(f"  GN fused prologue  : {t1*1e3:7.2f} ms {flops/t1/1e12:6.1f} TF/s",
              flush=True)
        t2 = timeit(jax.jit(functools.partial(chain, out_barrier=True)), x)
        print(f"  GN |bar| conv      : {t2*1e3:7.2f} ms {flops/t2/1e12:6.1f} TF/s"
              f"   delta {1e3*(t1-t2):+6.2f} ms", flush=True)


def bench_flash_concat_kv():
    from musev_tpu.ops.pallas.flash_attention import (
        _flash_unroll,
        flash_attention,
    )

    key = jax.random.PRNGKey(1)
    bh, sq, sk, d = 104, 5184, 10368, 40
    q = jax.random.normal(key, (bh, sq, d), jnp.bfloat16)
    k = jax.random.normal(key, (bh, sk, d), jnp.bfloat16)
    v = jax.random.normal(key, (bh, sk, d), jnp.bfloat16)
    scale = d ** -0.5
    flops = 4 * bh * sq * sk * d
    print(f"== concat-KV flash bh={bh} sq={sq} sk={sk} d={d} "
          f"({flops/1e12:.2f} TFLOP)", flush=True)

    # production path (split+merge) via the public API
    qf = q.reshape(bh // 8, 8, sq, d).transpose(0, 2, 1, 3)
    kf = k.reshape(bh // 8, 8, sk, d).transpose(0, 2, 1, 3)
    vf = v.reshape(bh // 8, 8, sk, d).transpose(0, 2, 1, 3)
    t = timeit(functools.partial(flash_attention, scale=scale), qf, kf, vf)
    print(f"  prod split+merge   : {t*1e3:7.2f} ms {flops/t/1e12:6.1f} TF/s",
          flush=True)
    ref = None

    # one-shot: whole 10368 KV resident
    for bq, sub in [(576, 864), (432, 864), (288, 864), (576, 1296),
                    (288, 1296), (216, 648)]:
        if sq % bq or sk % sub:
            continue
        try:
            f = jax.jit(functools.partial(
                _flash_unroll, scale=scale, block_q=bq, sub_kv=sub, sk=sk))
            t = timeit(f, q, k, v)
            out = f(q, k, v)
            if ref is None:
                lg = (jnp.einsum("bqd,bkd->bqk", q[:2], k[:2])
                      * scale).astype(jnp.float32)
                wts = jax.nn.softmax(lg, -1).astype(q.dtype)
                ref = jnp.einsum("bqk,bkd->bqd", wts, v[:2])
            err = float(jnp.max(jnp.abs(
                out[:2].astype(jnp.float32) - ref.astype(jnp.float32))))
            print(f"  oneshot bq={bq:4d} sub={sub:4d}: {t*1e3:7.2f} ms "
                  f"{flops/t/1e12:6.1f} TF/s  max_err {err:.4f}", flush=True)
        except Exception as e:
            msg = str(e).replace("\n", " | ")
            print(f"  oneshot bq={bq:4d} sub={sub:4d}: FAIL {msg[:180]}",
                  flush=True)


if __name__ == "__main__":
    print(f"tunnel latency {measure_latency()*1e3:.1f} ms", flush=True)
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "gn"):
        bench_gn_prologue()
    if which in ("all", "flash"):
        bench_flash_concat_kv()
