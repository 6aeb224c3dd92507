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


_LATENCY = 0.0


def measure_latency():
    """Axon-tunnel readback round trip (~30 ms) — subtracted from timings."""
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


def timeit(fn, *args, iters=3, inner=5):
    out = fn(*args)
    sync(out)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn(*args)
        sync(out)
        best = min(best, time.perf_counter() - t0)
    return max((best - _LATENCY) / inner, 1e-9)


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

    print(f"tunnel readback latency: {measure_latency()*1e3:.2f} ms")
    key = jax.random.PRNGKey(0)
    cases = [
        ("L0 plain", args.bt, 5184, 5184, 8, 40),
        ("L0 refKV", args.bt // 2, 5184, 10368, 8, 40),
        ("L1 plain", args.bt, 1296, 1296, 8, 80),
    ]
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        flash_attention as jax_flash,
    )

    for name, bt, sq, sk, h, d in cases:
        q = jax.random.normal(key, (bt, sq, h, d), jnp.bfloat16)
        k = jax.random.normal(key, (bt, sk, h, d), jnp.bfloat16)
        v = jax.random.normal(key, (bt, sk, h, d), jnp.bfloat16)
        flops = 4 * bt * h * sq * sk * d
        print(f"== {name}: bt={bt} sq={sq} sk={sk} h={h} d={d} "
              f"({flops/1e12:.2f} TFLOP)", flush=True)
        for bq, bkv in [(1024, 1024), (1024, 2048), (512, 1728),
                        (864, 1728), (1728, 1728)]:
            fn = jax.jit(functools.partial(
                flash_attention, block_q=bq, block_kv=bkv))
            try:
                t = timeit(fn, q, k, v)
            except Exception as e:
                print(f"  flash bq={bq:5d} bkv={bkv:5d}: FAIL {str(e)[:50]}")
                continue
            print(f"  flash bq={bq:5d} bkv={bkv:5d}: {t*1e3:8.2f} ms "
                  f"{flops/t/1e12:6.1f} TFLOP/s", flush=True)
        # official jax pallas kernel wants (b, h, s, d)
        qh = q.transpose(0, 2, 1, 3)
        kh = k.transpose(0, 2, 1, 3)
        vh = v.transpose(0, 2, 1, 3)
        for bsz in (512, 1024):
            try:
                bs = BlockSizes(
                    block_q=min(bsz, sq), block_k_major=min(bsz, sk),
                    block_k=min(bsz, sk), block_b=1,
                    block_q_major_dkv=min(bsz, sq),
                    block_k_major_dkv=min(bsz, sk),
                    block_q_dkv=min(bsz, sq), block_k_dkv=min(bsz, sk),
                    block_q_dq=min(bsz, sq), block_k_dq=min(bsz, sk),
                    block_k_major_dq=min(bsz, sk),
                )
                fn = jax.jit(functools.partial(
                    jax_flash, causal=False, block_sizes=bs))
                t = timeit(fn, qh, kh, vh)
                print(f"  jax-flash blk={bsz:4d}    : {t*1e3:8.2f} ms "
                      f"{flops/t/1e12:6.1f} TFLOP/s", flush=True)
            except Exception as e:
                print(f"  jax-flash blk={bsz}: FAIL {str(e)[:60]}")
        for chunk in (512,):
            fn = jax.jit(functools.partial(xla_chunked, chunk=chunk))
            try:
                t = timeit(fn, q, k, v)
            except Exception as e:
                print(f"  xla chunk={chunk}: FAIL {str(e)[:50]}")
                continue
            print(f"  xla chunk={chunk:5d}     : {t*1e3:8.2f} ms "
                  f"{flops/t/1e12:6.1f} TFLOP/s", flush=True)


if __name__ == "__main__":
    main()
