"""Attribution profiling of the VCPD denoise path on real TPU.

Methodology notes (hard-earned; see memory/axon-tpu-quirks):
  * host timings below ~100ms are tunnel-RTT floor — only trust the trace
  * block_until_ready does not block over the tunnel: force a host readback
  * fresh inputs per call, or the relay serves cached results

Produces a jax.profiler trace of one full 10-step denoise and prints the
device-op aggregation.
"""

import argparse
import collections
import glob
import gzip
import json
import re

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/musev_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main(trace_dir: str = "/tmp/musev_trace_prof", detail: int = 0,
         windows: bool = False, shard: bool = False, preset: str = "musev",
         fp: bool = False):
    from musev_tpu.models.init_util import fast_init
    from musev_tpu.models.unet3d import (
        init_unet3d,
        musev_config,
        musev_referencenet_config,
    )
    from musev_tpu.ops.context import make_window_plan
    from musev_tpu.ops.guidance import guidance_schedule
    from musev_tpu.pipelines.denoiser import DenoiseSpec, denoise_loop
    from musev_tpu.schedulers.euler_discrete import EulerDiscreteScheduler

    dtype = jnp.bfloat16
    if preset.startswith("musev_referencenet"):
        cfg = musev_referencenet_config()
    else:
        cfg = musev_config()
    params = jax.device_put(fast_init(init_unet3d, cfg, dtype=dtype))
    _ = float(jax.tree_util.tree_leaves(params)[0].ravel()[0])
    t, hw = 24, 72
    if fp:
        # EXACTLY bench.py's fp per-shard program: the full overlap-4 plan
        # with every (window, CFG, frame) row sharded 8 ways via StubComm.
        ctx, overlap = 12, 4
    elif shard:
        # EXACTLY bench.py's dp per-shard workload: one 12-frame window, one
        # CFG half (the unit each v5e-8 chip owns under the overlap-8 dp
        # plan) — this is the number the projection multiplies.
        t, ctx, overlap = 12, 12, 0
    else:
        ctx = 12 if windows else t
        overlap = 4
    do_cfg = fp or not shard
    spec = DenoiseSpec(
        unet_cfg=cfg,
        scheduler=EulerDiscreteScheduler.create(10),
        plan=make_window_plan(t, ctx, context_overlap=overlap),
        guidance=guidance_schedule(3.5, 10),
        n_vision_cond=1,
        do_cfg=do_cfg,
        fp_stub_devices=8 if fp else None,
    )
    key = jax.random.PRNGKey(0)
    lat = jax.random.normal(key, (1, t, hw, hw, 4), dtype)
    cond = jax.random.normal(key, (1, 1, hw, hw, 4), dtype)
    tu = None if not do_cfg else jax.random.normal(key, (1, 77, 768), dtype)
    tc = jax.random.normal(key, (1, 77, 768), dtype)
    extra = {}
    if preset.startswith("musev_referencenet"):
        from musev_tpu.models.referencenet import (
            ReferenceNetConfig,
            init_referencenet,
            referencenet_apply,
        )

        rcfg = ReferenceNetConfig()
        rparams = jax.device_put(
            fast_init(init_referencenet, rcfg, seed=2, dtype=dtype)
        )
        refer_lat = jax.random.normal(
            jax.random.fold_in(key, 6), (1, hw, hw, 4), dtype
        )
        down, mid, _ = referencenet_apply(rparams, rcfg, refer_lat, 0.0, tc)
        extra = dict(
            refer_embs=down,
            mid_refer_emb=mid,
            vision_clip_emb=jax.random.normal(
                jax.random.fold_in(key, 7),
                (2 if do_cfg else 1, 4, cfg.cross_attention_dim), dtype,
            ),
        )
    fn = jax.jit(denoise_loop, static_argnames=("spec",))
    out = fn(params, spec, lat, tu, tc, key, condition_latents=cond, **extra)
    _ = float(out.ravel()[0])

    jax.profiler.start_trace(trace_dir)
    out = fn(params, spec, lat + jnp.bfloat16(1e-6), tu, tc, key,
             condition_latents=cond, **extra)
    _ = float(out.ravel()[0])
    jax.profiler.stop_trace()

    f = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True))[-1]
    with gzip.open(f) as fh:
        trace = json.load(fh)
    events = trace["traceEvents"]
    pids = {
        e["pid"]: e["args"].get("name", "?")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    dev = [p for p, n in pids.items() if "TPU" in n]
    durs = collections.defaultdict(float)
    t0, t1 = float("inf"), 0.0
    for e in events:
        if e.get("ph") == "X" and "dur" in e and e.get("pid") in dev:
            t0 = min(t0, e["ts"])
            t1 = max(t1, e["ts"] + e["dur"])
            name = re.sub(r"\.\d+$", "", e["name"])
            if not name.startswith(("jit_", "while")):
                durs[name] += e["dur"]
    total = sum(durs.values())
    print(f"device op total {total/1e6:.2f}s (10 steps); "
          f"device span {(t1-t0)/1e6:.2f}s "
          f"(span-op gap = device idle/bubbles)")
    for name, d in sorted(durs.items(), key=lambda kv: -kv[1])[:15]:
        print(f"{d/1e3:9.1f}ms {100*d/total:5.1f}%  {name[:80]}")

    if detail:
        # per-HLO-op attribution: full op name + invocation count
        full = collections.defaultdict(lambda: [0.0, 0])
        for e in events:
            if e.get("ph") == "X" and "dur" in e and e.get("pid") in dev:
                if not e["name"].startswith(("jit_", "while")):
                    full[e["name"]][0] += e["dur"]
                    full[e["name"]][1] += 1
        print(f"\ntop {detail} individual ops:")
        for name, (d, n) in sorted(full.items(), key=lambda kv: -kv[1][0])[
            :detail
        ]:
            print(f"{d/1e3:9.1f}ms  x{n:4d}  {name[:90]}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--detail", type=int, default=0,
                    help="also print top-N individual HLO ops")
    ap.add_argument("--windows", action="store_true",
                    help="3x12-frame flagship window plan instead of 1x24")
    ap.add_argument("--shard", action="store_true",
                    help="bench.py per-shard workload: 1x12f window, no CFG")
    ap.add_argument("--fp", action="store_true",
                    help="bench.py fp per-shard program (StubComm, 8-way)")
    ap.add_argument("--preset", type=str, default="musev",
                    choices=["musev", "musev_referencenet"])
    ap.add_argument("--trace-dir", type=str, default="/tmp/musev_trace_prof")
    a = ap.parse_args()
    main(a.trace_dir, a.detail, a.windows, a.shard, a.preset, a.fp)
