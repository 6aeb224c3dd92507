"""Training-step throughput on the real chip (the reference never shipped
training at all — README.md:36 — so the comparison point is capability,
not a torch number).

Measures one SGD step of the 3D-UNet diffusion loss (epsilon MSE,
video-fusion noise, jax.checkpoint remat) at a configurable operating
point, dispatch-amortized like the other benches.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/musev_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def sync(x):
    _ = float(jnp.ravel(jax.tree_util.tree_leaves(x)[0])[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--no-remat", action="store_true")
    args = ap.parse_args()

    from musev_tpu.models.init_util import fast_init
    from musev_tpu.models.unet3d import init_unet3d, musev_config
    from musev_tpu.train import TrainSpec, train_step

    dtype = jnp.bfloat16
    cfg = musev_config()
    params = jax.device_put(fast_init(init_unet3d, cfg, dtype=dtype))
    spec = TrainSpec(unet_cfg=cfg, grad_checkpoint=not args.no_remat)

    key = jax.random.PRNGKey(0)
    hw = args.size // 8
    lat = jax.random.normal(
        jax.random.fold_in(key, 1), (args.batch, args.frames, hw, hw, 4), dtype
    )
    text = jax.random.normal(
        jax.random.fold_in(key, 2), (args.batch, 77, cfg.cross_attention_dim),
        dtype,
    )

    # donate params: the update is written in-place, halving peak HBM
    fn = jax.jit(train_step, static_argnames=("spec",), donate_argnums=(0,))
    params, loss = fn(params, spec, lat, text, key)
    sync(loss)
    print(f"compiled; loss={float(loss):.4f}", flush=True)

    best = float("inf")
    for _ in range(args.iters):
        t0 = time.perf_counter()
        params, loss = fn(params, spec, lat, text, key)
        sync(loss)
        best = min(best, time.perf_counter() - t0)
    frames = args.batch * args.frames
    print(
        f"train step {args.batch}x{args.frames}f @ {args.size}^2: "
        f"{best:.3f} s = {frames/best:.2f} frames/s/chip "
        f"(remat={'off' if args.no_remat else 'on'})",
        flush=True,
    )


if __name__ == "__main__":
    main()
