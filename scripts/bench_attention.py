"""Micro-bench of spatial-attention implementations at the flagship shapes.

Shapes from the 576^2 24-frame profile: level-0 sites run
(B*T=50, S=5184, H=8, D=40) with KV 5184 (uncond/plain) or 10368
(ReferenceOnly concat-KV cond half); level-1 runs S=1296, D=80.
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/musev_tpu_jax_cache")


def sync(x):
    _ = float(jnp.ravel(x)[0])


def timeit(fn, *args, iters=3):
    out = fn(*args)
    sync(out)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        best = min(best, time.perf_counter() - t0)
    return best


def xla_chunked(q, k, v, chunk=512):
    """q-chunked XLA attention: logits never exceed (BH, chunk, Sk)."""
    b, sq, h, d = q.shape
    scale = d**-0.5
    outs = []
    for lo in range(0, sq, chunk):
        qc = q[:, lo : lo + chunk]
        s = jnp.einsum("bqhd,bkhd->bhqk", qc, k) * scale
        p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
        outs.append(jnp.einsum("bhqk,bkhd->bqhd", p, v))
    return jnp.concatenate(outs, axis=1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bt", type=int, default=50)
    args = ap.parse_args()

    from musev_tpu.ops.pallas.flash_attention import flash_attention

    key = jax.random.PRNGKey(0)
    cases = [
        ("L0 plain", args.bt, 5184, 5184, 8, 40),
        ("L0 refKV", args.bt // 2, 5184, 10368, 8, 40),
        ("L1 plain", args.bt, 1296, 1296, 8, 80),
    ]
    for name, bt, sq, sk, h, d in cases:
        q = jax.random.normal(key, (bt, sq, h, d), jnp.bfloat16)
        k = jax.random.normal(key, (bt, sk, h, d), jnp.bfloat16)
        v = jax.random.normal(key, (bt, sk, h, d), jnp.bfloat16)
        flops = 4 * bt * h * sq * sk * d
        print(f"== {name}: bt={bt} sq={sq} sk={sk} h={h} d={d} "
              f"({flops/1e12:.2f} TFLOP)")
        for bq, bkv in [(1024, 1024), (2048, 1024), (1024, 2048),
                        (2048, 2048), (512, 2048), (896, 1792)]:
            fn = jax.jit(functools.partial(
                flash_attention, block_q=bq, block_kv=bkv))
            t = timeit(fn, q, k, v)
            print(f"  flash bq={bq:5d} bkv={bkv:5d}: {t*1e3:8.2f} ms "
                  f"{flops/t/1e12:6.1f} TFLOP/s")
        for chunk in (512, 1024):
            fn = jax.jit(functools.partial(xla_chunked, chunk=chunk))
            t = timeit(fn, q, k, v)
            print(f"  xla chunk={chunk:5d}     : {t*1e3:8.2f} ms "
                  f"{flops/t/1e12:6.1f} TFLOP/s")


if __name__ == "__main__":
    main()
