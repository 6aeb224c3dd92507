"""Split-merge vs carry for the fp-shard long-KV shapes.

The refnet fp-shard profile attributes 797 ms/step-loop (28.8%) to
_flash_carry at ~38 TF/s vs the unroll kernel's 47. The concat-KV is
exactly two unroll-capacity halves ([refer 5184; self 5184]), and at the
per-chip batch sizes of the fp program (bh=40 cond-half ReferenceOnly,
bh=80 refer_emb_fuse) the split path's fp32 lane-padded merge temps are
only ~0.2-0.4 GB — the 19 GB OOM that killed split at full batch does not
apply. If split wins here, the dispatcher should pick it by (bh, sk).

Run on the axon TPU env: python scripts/bench_longkv_split_vs_carry.py
"""

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
sys.path.insert(0, __file__.rsplit("/", 1)[0])

from musev_tpu.ops.pallas import flash_attention as fa  # noqa: E402


from _bench_util import sync, timeit, chip_canary  # noqa: E402


def main():
    assert jax.default_backend() == "tpu"
    x = jax.random.normal(jax.random.PRNGKey(9), (4096, 4096), jnp.bfloat16)
    mm = jax.jit(lambda a: a @ a)
    t = timeit(mm, x)
    print(f"canary 4096^3 bf16: {2 * 4096**3 / t / 1e12:.1f} TF/s",
          flush=True)

    d = 40
    for bh, sq, sk in [(40, 5184, 10368), (80, 5184, 10368),
                       (96, 5184, 10368)]:
        kq, kk, kv = jax.random.split(jax.random.PRNGKey(bh), 3)
        # dispatcher-shaped inputs: (B, S, H, D) with H=8 heads
        h = 8
        b = bh // h
        q = jax.random.normal(kq, (b, sq, h, d), jnp.bfloat16)
        k = jax.random.normal(kk, (b, sk, h, d), jnp.bfloat16)
        v = jax.random.normal(kv, (b, sk, h, d), jnp.bfloat16)
        flops = 4 * bh * sq * sk * d
        for impl in ("carry", "split"):
            fa._LONGKV_IMPL = impl
            fn = jax.jit(fa.flash_attention)
            try:
                t = timeit(fn, q, k, v)
            except Exception as e:
                print(f"bh={bh:3d} {impl:5s}  FAIL {type(e).__name__}: "
                      f"{str(e)[:60]}", flush=True)
                continue
            print(f"bh={bh:3d} {impl:5s}  {t * 1e3:7.2f} ms  "
                  f"{flops / t / 1e12:5.1f} TF/s", flush=True)
    fa._LONGKV_IMPL = "carry"


if __name__ == "__main__":
    main()
