"""Headline benchmark: frames/sec/chip at 576^2, 24-frame VCPD window.

Runs the flagship musev UNet (SD1.5-scale, bf16) end to end for one second of
24 fps 576x576 video: 10 denoise steps (the reference default
video_num_inference_steps) over a single 24-frame window with CFG and one
vision-condition frame, plus the segmented VAE decode.

Prints ONE JSON line:
  {"metric": ..., "value": frames_per_sec_per_chip, "unit": "frames/s/chip",
   "vs_baseline": <north-star 3s-per-1s-video ratio>, ...}

North star (BASELINE.md): 1 s of video in <= 3 s wall-clock on v5e-8; this
single-chip run reports chip-normalized throughput and the e2e ratio.
"""

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# per-backend cache dirs: TPU-session caches contain foreign-host CPU AOT
# entries that segfault local CPU runs
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get(
        "MUSEV_JAX_CACHE",
        "/tmp/musev_tpu_jax_cache"
        + ("_cpu" if os.environ.get("JAX_PLATFORMS") == "cpu" else ""),
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--size", type=int, default=576)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--tiny", action="store_true", help="tiny model smoke run")
    ap.add_argument("--no-decode", action="store_true")
    ap.add_argument("--preset", type=str, default="musev",
                    choices=["musev", "musev_referencenet"],
                    help="musev_referencenet adds ReferenceNet embs + "
                         "IP-Adapter tokens to the denoise step (BASELINE "
                         "config #2)")
    args = ap.parse_args()

    from musev_tpu.models.init_util import fast_init
    from musev_tpu.models.referencenet import (
        ReferenceNetConfig,
        init_referencenet,
        referencenet_apply,
    )
    from musev_tpu.models.unet3d import (
        UNet3DConfig,
        init_unet3d,
        musev_config,
        musev_referencenet_config,
    )
    from musev_tpu.models.vae import VAEConfig, init_vae, vae_decode_video
    from musev_tpu.ops.context import make_window_plan
    from musev_tpu.ops.guidance import guidance_schedule
    from musev_tpu.pipelines.denoiser import denoise_loop, DenoiseSpec
    from musev_tpu.schedulers.euler_discrete import EulerDiscreteScheduler

    dtype = jnp.bfloat16
    if args.tiny:
        cfg = UNet3DConfig(block_out_channels=(16, 16, 32, 32), layers_per_block=1,
                           cross_attention_dim=16, attention_heads=4,
                           norm_num_groups=8)
        vae_cfg = VAEConfig(block_out_channels=(16, 16, 32, 32),
                            layers_per_block=1, norm_num_groups=8)
        text_dim = 16
    elif args.preset == "musev_referencenet":
        cfg = musev_referencenet_config()
        vae_cfg = VAEConfig()
        text_dim = cfg.cross_attention_dim
    else:
        cfg = musev_config()
        vae_cfg = VAEConfig()
        text_dim = cfg.cross_attention_dim

    key = jax.random.PRNGKey(0)
    # device_put: fast_init returns host numpy; without this every call
    # re-uploads the full param set through the tunnel
    params = jax.device_put(fast_init(init_unet3d, cfg, dtype=dtype))
    vae_params = jax.device_put(fast_init(init_vae, vae_cfg, dtype=dtype, seed=1))

    t = args.frames
    hw = args.size // 8
    spec = DenoiseSpec(
        unet_cfg=cfg,
        scheduler=EulerDiscreteScheduler.create(args.steps),
        plan=make_window_plan(t, t, context_overlap=4),
        guidance=guidance_schedule(3.5, args.steps),
        n_vision_cond=1,
        do_cfg=True,
    )
    lat = jax.random.normal(jax.random.fold_in(key, 2), (1, t, hw, hw, 4), dtype)
    cond = jax.random.normal(jax.random.fold_in(key, 3), (1, 1, hw, hw, 4), dtype)
    tu = jax.random.normal(jax.random.fold_in(key, 4), (1, 77, text_dim), dtype)
    tc = jax.random.normal(jax.random.fold_in(key, 5), (1, 77, text_dim), dtype)

    extra = {}
    if args.preset == "musev_referencenet" and not args.tiny:
        rcfg = ReferenceNetConfig()
        rparams = jax.device_put(fast_init(init_referencenet, rcfg, seed=2, dtype=dtype))
        refer_lat = jax.random.normal(jax.random.fold_in(key, 6), (1, hw, hw, 4), dtype)
        down, mid, _ = referencenet_apply(
            rparams, rcfg, refer_lat, 999.0, tc
        )
        extra = dict(
            refer_embs=down,
            mid_refer_emb=mid,
            vision_clip_emb=jax.random.normal(
                jax.random.fold_in(key, 7), (2, 4, text_dim), dtype
            ),
        )

    fn = jax.jit(denoise_loop, static_argnames=("spec",))

    def sync(x):
        # the axon tunnel's block_until_ready does not reliably block; a
        # host readback of one element forces completion
        _ = float(jnp.ravel(x)[0])

    # warmup/compile
    out = fn(params, spec, lat, tu, tc, key, condition_latents=cond, **extra)
    sync(out)

    times = []
    for i in range(args.iters):
        lat_i = lat + jnp.bfloat16(i * 1e-6)
        sync(lat_i)
        t0 = time.perf_counter()
        out = fn(params, spec, lat_i, tu, tc, key, condition_latents=cond, **extra)
        sync(out)
        times.append(time.perf_counter() - t0)
    denoise_s = min(times)

    decode_s = 0.0
    if not args.no_decode:
        dec = lambda l: vae_decode_video(vae_params, vae_cfg, l, segment=8)
        video = dec(out)
        sync(video)
        t0 = time.perf_counter()
        video = dec(out + jnp.bfloat16(1e-6))
        sync(video)
        decode_s = time.perf_counter() - t0

    e2e = denoise_s + decode_s
    fps_chip = args.frames / e2e
    result = {
        "metric": "frames/sec/chip at 576^2 24-frame window; e2e sec per 1s of video",
        "value": round(fps_chip, 3),
        "unit": "frames/s/chip",
        # north star: 1s of video in <=3s on v5e-8; single-chip budget with
        # linear dp scaling over 8 chips = 24s per 1s of video
        "vs_baseline": round(24.0 / e2e, 3),
        "e2e_seconds_per_1s_video": round(e2e, 3),
        "denoise_seconds": round(denoise_s, 3),
        "decode_seconds": round(decode_s, 3),
        "config": {
            "frames": args.frames, "size": args.size, "steps": args.steps,
            "tiny": bool(args.tiny), "preset": args.preset,
            "backend": jax.default_backend(),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
