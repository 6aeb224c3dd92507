"""Headline benchmark: 1 s of 24 fps 576^2 video through the VCPD engine.

Flagship plan (shardable): 24 frames, context_frames=12, context_overlap=4
-> 3 windows x 2 CFG halves = a 6-row window batch, the unit that shards
over the mesh ``dp`` axis on v5e-8 (an overlap-8 variant gives 4 windows x 2
= 8 rows for full-chip dp). 10 denoise steps (the reference default
video_num_inference_steps) + segmented VAE decode.

Reports, in ONE JSON line:
  * measured single-chip e2e for the full plan (``value`` = frames/s/chip)
  * measured per-shard workload: ONE 12-frame window x ONE CFG half x 10
    steps — exactly what each of 8 chips owns under the overlap-8 dp plan
    (and each of 6 chips under the overlap-4 plan), so the v5e-8 projection
    is arithmetic: per_shard + derived ICI time + decode/n. The ICI term is
    computed from the actual per-step payloads (overlap scatter-add psum of
    the noise buffer + latents all-gather, reference
    pipeline_controlnet.py:2076-2079) at ring-collective cost over v5e ICI
    bandwidth, plus launch latency — printed as ici_seconds_derived /
    ici_bytes_per_step in the JSON.
  * ``vs_baseline`` = north-star ratio (3 s per 1 s of video on v5e-8,
    BASELINE.md) against the projected 8-chip e2e; >= 1.0 means target met.
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
    ap.add_argument("--height", type=int, default=None,
                    help="pixel height (default --size); use with --width "
                         "for non-square runs, e.g. BASELINE config #5's "
                         "704x1216")
    ap.add_argument("--width", type=int, default=None)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--context-frames", type=int, default=12)
    ap.add_argument("--context-overlap", type=int, default=4)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--tiny", action="store_true", help="tiny model smoke run")
    ap.add_argument("--no-decode", action="store_true")
    ap.add_argument("--no-shard-probe", action="store_true",
                    help="skip the per-shard workload measurement")
    ap.add_argument("--single-window", action="store_true",
                    help="round-1 comparability config: one 24-frame window")
    ap.add_argument("--preset", type=str, default="musev",
                    choices=["musev", "musev_referencenet",
                             "musev_referencenet_pose",
                             "musev_referencenet_faceid"],
                    help="musev_referencenet adds ReferenceNet embs + "
                         "IP-Adapter tokens to the denoise step (BASELINE "
                         "config #2); _pose additionally runs a pose "
                         "ControlNet over per-frame pose maps (config #3); "
                         "_faceid is the multi-reference IPAdapterFaceID "
                         "branch (config #5: ReferenceNet + 2-image IP "
                         "tokens + FaceID tokens), typically with "
                         "--height 704 --width 1216")
    ap.add_argument("--scheduler", type=str, default="euler",
                    choices=["euler", "lcm"],
                    help="lcm = the reference's LCM-LoRA fast path "
                         "(predictor.py:296-306): LCMScheduler, typically "
                         "with --steps 4")
    ap.add_argument("--topology", type=str, default="fp",
                    choices=["fp", "dp"],
                    help="multi-chip projection topology: fp shards every "
                         "(window, cfg, frame) row over all 8 chips "
                         "(parallel/frame_parallel.py; per-chip share "
                         "measured via the StubComm single-chip program); "
                         "dp is the window-batch sharding (one window x one "
                         "CFG half per chip)")
    ap.add_argument("--per-call-sync", action="store_true",
                    help="time with a host readback after EVERY call "
                         "(round-3 methodology) instead of pipelined "
                         "dispatch; charges a full tunnel RTT per iteration "
                         "but gives an r3-comparable number")
    ap.add_argument("--no-canary", action="store_true",
                    help="skip the chip-speed canary matmul")
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
    elif args.preset.startswith("musev_referencenet"):
        over = {}
        if args.preset == "musev_referencenet_faceid":
            over = dict(need_ip_adapter_face=True)
        cfg = musev_referencenet_config(**over)
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
    height = args.height or args.size
    width = args.width or args.size
    h0, w0 = height // 8, width // 8
    ctx = t if args.single_window else min(args.context_frames, t)
    overlap = 0 if args.single_window else args.context_overlap
    plan = make_window_plan(t, ctx, context_overlap=overlap)

    if args.scheduler == "lcm":
        from musev_tpu.schedulers.lcm import LCMScheduler

        make_sched = LCMScheduler.create
    else:
        make_sched = EulerDiscreteScheduler.create

    cn_cfg = None
    if args.preset == "musev_referencenet_pose" and not args.tiny:
        from musev_tpu.models.controlnet import ControlNetConfig

        cn_cfg = ControlNetConfig()

    def build_spec(p, do_cfg=True, **over):
        return DenoiseSpec(
            unet_cfg=cfg,
            scheduler=make_sched(args.steps),
            controlnet_cfg=cn_cfg,
            plan=p,
            guidance=guidance_schedule(3.5, args.steps),
            n_vision_cond=1,
            do_cfg=do_cfg,
            **over,
        )

    spec = build_spec(plan)
    lat = jax.random.normal(jax.random.fold_in(key, 2), (1, t, h0, w0, 4), dtype)
    cond = jax.random.normal(jax.random.fold_in(key, 3), (1, 1, h0, w0, 4), dtype)
    tu = jax.random.normal(jax.random.fold_in(key, 4), (1, 77, text_dim), dtype)
    tc = jax.random.normal(jax.random.fold_in(key, 5), (1, 77, text_dim), dtype)

    extra = {}
    if args.preset.startswith("musev_referencenet") and not args.tiny:
        rcfg = ReferenceNetConfig()
        rparams = jax.device_put(fast_init(init_referencenet, rcfg, seed=2, dtype=dtype))
        refer_lat = jax.random.normal(jax.random.fold_in(key, 6), (1, h0, w0, 4), dtype)
        down, mid, _ = referencenet_apply(
            rparams, rcfg, refer_lat, 0.0, tc
        )
        # multi-reference (config #5): IP tokens from 2 reference images
        n_ip_tok = 8 if args.preset == "musev_referencenet_faceid" else 4
        extra = dict(
            refer_embs=down,
            mid_refer_emb=mid,
            vision_clip_emb=jax.random.normal(
                jax.random.fold_in(key, 7), (2, n_ip_tok, text_dim), dtype
            ),
        )
        if args.preset == "musev_referencenet_faceid":
            extra["ip_adapter_face_emb"] = jax.random.normal(
                jax.random.fold_in(key, 9), (2, 4, cfg.ip_adapter_face_dim),
                dtype,
            )
        if cn_cfg is not None:
            from musev_tpu.models.controlnet import init_controlnet

            extra["controlnet_params"] = jax.device_put(
                fast_init(init_controlnet, cn_cfg, seed=3, dtype=dtype)
            )
            # per-frame pose maps in [0,1]: (B, n_vc + T, 8h, 8w, 3)
            extra["control_images"] = jax.random.uniform(
                jax.random.fold_in(key, 8),
                (1, 1 + t, height, width, 3), dtype,
            )

    fn = jax.jit(denoise_loop, static_argnames=("spec",))

    def sync(x):
        # the axon tunnel's block_until_ready does not reliably block; a
        # host readback of one element forces completion
        _ = float(jnp.ravel(x)[0])

    def time_call(f, *a, vary=None, **kw):
        """Best-of-2 timing; pipelined dispatch by default.

        Queues ``iters`` dispatches back-to-back and syncs once: a per-call
        readback charges a full tunnel RTT + host dispatch to every
        iteration (~0.38 s on the 10-step 576^2 shard program — device-busy
        2.834 s vs 3.214 s measured per-call), overhead a real deployment's
        pipelined dispatch never pays. --per-call-sync restores the round-3
        readback-per-iteration methodology for comparable deltas. ``vary``:
        index of a float-array positional arg to perturb per call, defeating
        the relay's by-value result cache without a readback between calls.
        """
        out = f(*a, **kw)  # warmup/compile
        sync(out)
        variants = []
        for i in range(args.iters):
            av = list(a)
            if vary is not None:
                eps = jnp.asarray(1e-6 * (i + 1), a[vary].dtype)
                av[vary] = a[vary] + eps
            variants.append(av)
        if vary is not None:
            jax.block_until_ready([av[vary] for av in variants])
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for av in variants:
                out = f(*av, **kw)
                if args.per_call_sync:
                    sync(out)
            if not args.per_call_sync:
                sync(out)
            best = min(best, (time.perf_counter() - t0) / args.iters)
        return best, out

    def chip_canary():
        """Fixed-work chip-speed canary: best-of-10 pipelined 4096^3 bf16
        matmul, reported as TF/s. Sessions on this tunnel show ~30% speed
        variance (commit 50f4c3b); recording the canary alongside every
        bench row separates regressions from session luck."""
        k = jax.random.PRNGKey(42)
        x = jax.random.normal(k, (4096, 4096), jnp.bfloat16)
        mm = jax.jit(lambda a: a @ a)
        o = mm(x)
        sync(o)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(10):
                o = mm(o)
            sync(o)
            best = min(best, (time.perf_counter() - t0) / 10)
        return 2 * 4096**3 / best / 1e12

    # NOTE on inputs: the axon relay caches by value, but denoise_loop output
    # depends on the RNG key path; perturbing latents each iter (round-1
    # scheme) forced a fresh transfer into the timed region instead. The
    # readback sync already defeats result caching.
    oom_single = False
    try:
        denoise_s, out = time_call(
            fn, params, spec, lat, tu, tc, key, vary=2,
            condition_latents=cond, **extra
        )
    except Exception as e:
        # BASELINE config #5 (704x1216, 78 rows) exceeds one chip's 16 GB
        # HBM for the FULL single-chip plan — a real property of the shape,
        # not a bug: the fp per-shard program (1/8 of the rows) is the
        # production path. Record the OOM and carry on with the projection.
        # Match the specific XLA HBM-exhaustion message — a loose
        # "memory" match would also swallow Mosaic scoped-VMEM compile
        # errors (kernel bugs) and report a plausible projected row.
        if "memory space hbm" not in str(e).lower():
            raise
        oom_single = True
        denoise_s = float("nan")
        out = lat  # same shape/dtype as the denoised latents: decode timing

    decode_s = 0.0
    decode_shard_s = 0.0
    if not args.no_decode:
        dec = lambda l: vae_decode_video(vae_params, vae_cfg, l, segment=8)
        decode_s, _ = time_call(dec, out, vary=0)
        # per-chip share of the mesh-sharded frame-parallel decode
        # (vae_decode_video(mesh=, axis=)): ceil(T/8) frames, MEASURED —
        # the projection no longer assumes decode_s/8
        shard_frames = -(-args.frames // 8)
        dec_shard = lambda l: vae_decode_video(
            vae_params, vae_cfg, l, segment=shard_frames
        )
        decode_shard_s, _ = time_call(
            dec_shard, out[:, :shard_frames], vary=0
        )

    # per-chip workload under the chosen topology
    shard_denoise_s = None
    fp_model = None
    n_chips = 8
    if not args.no_shard_probe and not args.single_window:
        if args.topology == "fp":
            # frame-parallel: ONE chip's row shard of the FULL overlap-4
            # plan (all windows x CFG x 10 steps), measured by running the
            # identical per-device SPMD program with StubComm (collective-
            # shaped local data movement; ICI time added arithmetically
            # below from the derived payload model)
            from musev_tpu.parallel.frame_parallel import fp_collective_model

            fp_spec = build_spec(plan, fp_stub_devices=n_chips)
            shard_denoise_s, _ = time_call(
                fn, params, fp_spec, lat, tu, tc, key, vary=2,
                condition_latents=cond, **extra,
            )
            fp_model = fp_collective_model(
                cfg, t=ctx + 1, h0=h0, w0=w0, n=n_chips,
                n_windows=plan.n_windows, do_cfg=True, n_vc=1,
            )
        else:
            # window-dp: 1 window x 1 CFG half x all steps = one chip's
            # share (6-way with overlap 4; 8-way with overlap 8)
            shard_plan = make_window_plan(ctx, ctx, context_overlap=0)
            shard_spec = build_spec(shard_plan, do_cfg=False)
            shard_lat = lat[:, :ctx]
            def shard_slice(k, v):
                if k == "controlnet_params":
                    return v
                if k == "control_images":  # pose maps, viscond + ctx frames
                    return v[:, : 1 + ctx]
                if k.startswith(("refer", "mid")):
                    return v
                # pre-doubled [uncond; cond] tensors keep only the cond half
                return v[-1:]

            shard_extra = {k: shard_slice(k, v) for k, v in extra.items()}
            shard_denoise_s, _ = time_call(
                fn, params, shard_spec, shard_lat, None, tc, key, vary=2,
                condition_latents=cond, **shard_extra,
            )

    e2e = denoise_s + decode_s
    fps_chip = args.frames / e2e
    res_str = f"{height}^2" if height == width else f"{height}x{width}"
    if oom_single:
        fps_chip = float("nan")  # patched from the projection below
    result = {
        "metric": f"frames/sec/chip at {res_str}, {t}f VCPD plan "
                  f"({plan.n_windows}x{ctx}f windows, CFG); projected "
                  "v5e-8 e2e from measured per-shard work",
        "value": round(fps_chip, 3),
        "unit": "frames/s/chip",
        "e2e_seconds_per_1s_video": round(e2e, 3),
        "denoise_seconds": round(denoise_s, 3),
        "decode_seconds": round(decode_s, 3),
        "config": {
            "frames": args.frames, "height": height, "width": width,
            "steps": args.steps,
            "context_frames": ctx, "context_overlap": overlap,
            "n_windows": plan.n_windows, "tiny": bool(args.tiny),
            "preset": args.preset, "scheduler": args.scheduler,
            "topology": args.topology,
            "backend": jax.default_backend(),
        },
        "timing_method": (
            "per_call_sync" if args.per_call_sync else "pipelined_dispatch"
        ),
    }
    if not args.no_canary and not args.tiny:
        result["canary_matmul_tflops"] = round(chip_canary(), 1)
    # projected per-chip decode = measured ceil(T/8)-frame decode + the
    # decoded-pixel all-gather (b*T*H*W*3 bf16) over ICI
    pixel_bytes = args.frames * height * width * 3 * 2

    def proj_decode(ici_bw):
        return decode_shard_s + pixel_bytes * (n_chips - 1) / n_chips / ici_bw

    if shard_denoise_s is not None and fp_model is not None:
        # v5e-8 frame-parallel projection: every chip runs the measured
        # 1/8-row shard of the full plan; ICI time is derived from the
        # per-step collective payloads the program actually issues (see
        # fp_collective_model). Decode is the MEASURED per-chip share of
        # the mesh-sharded frame-parallel vae_decode_video.
        #
        # The headline uses 50% achievable ICI bandwidth (100 GB/s/chip of
        # the 1600 Gbit/s aggregate) + 5 us launch per collective; because
        # the fp program issues ~366 collectives/step, the projection is
        # also printed at its assumption CORNERS (launch 5/25 us x ICI
        # efficiency 50%/30%) and the worst corner is reported alongside.
        # Caveat (stated in README too): the per-shard time is measured via
        # the StubComm per-device program on one chip — real collectives pin
        # layouts and serialize in ways a local stub cannot, so treat the
        # corners as the honest uncertainty band.
        itemsize = 2
        lat_bytes = int(np.prod(lat.shape)) * itemsize

        def fp_proj(coll_lat, ici_eff):
            ici_bw = 200e9 * ici_eff
            per_step_ici = (
                fp_model["bytes_per_step"] / ici_bw
                + fp_model["collectives_per_step"] * coll_lat
                + lat_bytes * (n_chips - 1) / n_chips / ici_bw
            )
            ici_s = args.steps * per_step_ici
            return 1.02 * shard_denoise_s + ici_s + proj_decode(ici_bw), ici_s

        proj, ici_s = fp_proj(5e-6, 0.50)
        corners = {
            f"launch{int(l*1e6)}us_ici{int(e*100)}": round(fp_proj(l, e)[0], 3)
            for l in (5e-6, 25e-6) for e in (0.50, 0.30)
        }
        worst = max(corners.values())
        result["per_shard_denoise_seconds"] = round(shard_denoise_s, 3)
        result["per_shard_decode_seconds"] = round(decode_shard_s, 3)
        result["ici_seconds_derived"] = round(ici_s, 6)
        result["ici_bytes_per_step"] = int(fp_model["bytes_per_step"])
        result["ici_collectives_per_step"] = int(
            fp_model["collectives_per_step"]
        )
        result["projected_v5e8_e2e_seconds"] = round(proj, 3)
        result["projection_corners"] = corners
        result["projection_worst_case"] = round(worst, 3)
        result["vs_baseline_worst_case"] = round(3.0 / worst, 3)
        result["vs_baseline"] = round(3.0 / proj, 3)
        if oom_single:
            # single-chip e2e impossible at this shape (HBM): the headline
            # becomes the per-chip rate on the projected v5e-8 machine
            result["single_chip_oom_hbm"] = True
            result["e2e_seconds_per_1s_video"] = None
            result["denoise_seconds"] = None
            result["value"] = round(args.frames / (proj * n_chips), 3)
            result["metric"] = (
                f"frames/sec/chip at {res_str}, {t}f VCPD plan "
                f"({plan.n_windows}x{ctx}f windows, CFG) on projected "
                "v5e-8 (single-chip plan exceeds 16 GB HBM)"
            )
    elif shard_denoise_s is not None:
        # v5e-8 projection: every chip runs one window x one CFG half
        # concurrently under the overlap-8 plan (4 windows x 2 CFG = 8
        # shards, all chips busy; the measured shard workload is identical
        # for the overlap-4 plan). Decode is frame-parallel across all 8
        # chips. The ICI term is DERIVED, not assumed: per step the dp plan
        # needs (a) the overlap scatter-add + CFG combine as one psum over
        # the (reps, b, T, h, w, c) noise buffer (the single mandatory
        # collective, reference pipeline_controlnet.py:2076-2079) and (b)
        # an all-gather of the stepped (b, T, h, w, c) latents so every
        # chip can gather its next window rows. Ring collectives move
        # 2(n-1)/n (all-reduce) and (n-1)/n (all-gather) of the payload per
        # chip over ICI. v5e ICI: 1600 Gbit/s/chip aggregate; use 50%
        # achievable (100 GB/s) + 25 us launch latency per collective.
        n_chips = 8
        itemsize = 2  # bf16
        lat_bytes = int(np.prod(lat.shape)) * itemsize
        noise_buf_bytes = 2 * lat_bytes  # reps=2 CFG halves

        def dp_proj(coll_lat, ici_eff):
            ici_bw = 200e9 * ici_eff
            per_step_ici = (
                noise_buf_bytes * 2 * (n_chips - 1) / n_chips / ici_bw  # psum
                + lat_bytes * (n_chips - 1) / n_chips / ici_bw  # all-gather
                + 2 * coll_lat
            )
            ici_s = args.steps * per_step_ici
            # 2% residual for step-boundary jitter the arithmetic can't see
            return 1.02 * shard_denoise_s + ici_s + proj_decode(ici_bw), ici_s

        proj, ici_s = dp_proj(25e-6, 0.50)
        corners = {
            f"launch{int(l*1e6)}us_ici{int(e*100)}": round(dp_proj(l, e)[0], 3)
            for l in (5e-6, 25e-6) for e in (0.50, 0.30)
        }
        worst = max(corners.values())
        result["per_shard_denoise_seconds"] = round(shard_denoise_s, 3)
        result["per_shard_decode_seconds"] = round(decode_shard_s, 3)
        result["ici_seconds_derived"] = round(ici_s, 6)
        result["ici_bytes_per_step"] = noise_buf_bytes * 2 + lat_bytes
        result["projected_v5e8_e2e_seconds"] = round(proj, 3)
        result["projection_corners"] = corners
        result["projection_worst_case"] = round(worst, 3)
        result["vs_baseline_worst_case"] = round(3.0 / worst, 3)
        result["vs_baseline"] = round(3.0 / proj, 3)
    else:
        # no projection measured: report the single-chip ratio honestly
        result["vs_baseline"] = round(3.0 / e2e, 3)
    for k in ("value", "e2e_seconds_per_1s_video", "denoise_seconds",
              "vs_baseline"):
        v = result.get(k)
        if isinstance(v, float) and v != v:  # leftover NaN -> null
            result[k] = None
    print(json.dumps(result))


if __name__ == "__main__":
    main()
