"""Attribution profiling of the VCPD denoise step on real TPU.

Times each sub-component in a compiled 3-iteration loop (dispatch-free) to
find where the 28.5s/10-step budget goes at 576^2 / 24 frames.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/musev_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timed(fn, *args, iters=2, loop=3):
    """Wrap fn in an in-jit fori loop of `loop` iterations; report per-iter."""

    @jax.jit
    def looped(*a):
        def out_sum(out):
            leaves = jax.tree_util.tree_leaves(out)
            return sum(l.astype(jnp.float32).sum() for l in leaves)

        def body(i, carry):
            return carry + out_sum(fn(*a))

        return jax.lax.fori_loop(0, loop, body, jnp.float32(0))

    r = looped(*args)
    jax.block_until_ready(r)
    best = np.inf
    for _ in range(iters):
        t0 = time.perf_counter()
        r = looped(*args)
        jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    return best / loop


def main():
    from musev_tpu.models.init_util import fast_init
    from musev_tpu.models.unet3d import musev_config, init_unet3d, unet3d_apply
    from musev_tpu.models.unet_blocks import temporal_transformer, temporal_conv_layer
    from musev_tpu.ops.attention import _xla_sdpa
    from musev_tpu.ops.pallas.flash_attention import flash_attention
    from musev_tpu.ops.context import make_window_plan
    from musev_tpu.ops.guidance import guidance_schedule
    from musev_tpu.pipelines.denoiser import DenoiseSpec, predict_noise
    from musev_tpu.schedulers.euler_discrete import EulerDiscreteScheduler

    dtype = jnp.bfloat16
    cfg = musev_config()
    params = fast_init(init_unet3d, cfg, dtype=dtype)
    t, hw = 24, 72
    spec = DenoiseSpec(
        unet_cfg=cfg,
        scheduler=EulerDiscreteScheduler.create(10),
        plan=make_window_plan(t, t, context_overlap=4),
        guidance=guidance_schedule(3.5, 10),
        n_vision_cond=1,
        do_cfg=True,
    )
    key = jax.random.PRNGKey(0)
    lat = jax.random.normal(key, (1, t, hw, hw, 4), dtype)
    cond = jax.random.normal(key, (1, 1, hw, hw, 4), dtype)
    tu = jax.random.normal(key, (1, 77, 768), dtype)
    tc = jax.random.normal(key, (1, 77, 768), dtype)

    results = {}

    # full predict_noise (one step; bench showed ~2.85s/step)
    results["predict_noise_step"] = timed(
        lambda p, l, a, b, c: predict_noise(p, spec, l, 0, a, b, c),
        params, lat, tu, tc, cond, loop=1,
    )

    # unet forward only (the CFG-doubled spliced batch): 2 x 25 frames
    sample = jax.random.normal(key, (2, t, hw, hw, 4), dtype)
    cnd2 = jnp.concatenate([cond, cond])
    text2 = jnp.concatenate([tu, tc])

    def unet_fwd(p, s, c_, txt):
        return unet3d_apply(
            p, cfg, s, jnp.asarray(500.0), txt, condition_latents=c_,
            cond_index=(0,), gen_index=tuple(range(1, t + 1)), do_cfg=True,
        )

    results["unet_forward"] = timed(unet_fwd, params, sample, cnd2, text2, loop=1)

    def unet_fwd_noref(p, s, c_, txt):
        import dataclasses
        cfg2 = dataclasses.replace(cfg, reference_attn=False)
        return unet3d_apply(
            p, cfg2, s, jnp.asarray(500.0), txt, condition_latents=c_,
            cond_index=(0,), gen_index=tuple(range(1, t + 1)), do_cfg=True,
        )

    results["unet_forward_plain_attn"] = timed(
        unet_fwd_noref, params, sample, cnd2, text2, loop=1
    )

    def unet_fwd_2d(p, s, c_, txt):
        return unet3d_apply(
            p, cfg, s, jnp.asarray(500.0), txt, condition_latents=c_,
            cond_index=(0,), gen_index=tuple(range(1, t + 1)), do_cfg=True,
            skip_temporal=True,
        )

    results["unet_forward_skip_temporal"] = timed(
        unet_fwd_2d, params, sample, cnd2, text2, loop=1
    )

    # flash attention at the three spatial levels (cond half KV concat)
    for (b, s, skv, d) in [(25, 5184, 10368, 40), (50, 1296, 2592, 80),
                           (50, 324, 648, 160)]:
        q = jax.random.normal(key, (b, s, 8, d), dtype)
        k = jax.random.normal(key, (b, skv, 8, d), dtype)
        v = jax.random.normal(key, (b, skv, 8, d), dtype)
        results[f"flash_{s}x{skv}_d{d}"] = timed(flash_attention, q, k, v, loop=3)

    # temporal transformer at level 0: rows (2*72*72, 25, 320)
    from musev_tpu.models.unet_blocks import init_temporal_transformer
    tt = fast_init(init_temporal_transformer, 320, 8, 1280, seed=3, dtype=dtype)
    x = jax.random.normal(key, (2 * (t + 1), hw, hw, 320), dtype)
    femb = jax.random.normal(key, (2, t + 1, 1280), dtype)
    results["temporal_transformer_L0"] = timed(
        lambda p, xx, f: temporal_transformer(p, xx, f, num_frames=t + 1, heads=8),
        tt, x, femb, loop=2,
    )
    from musev_tpu.models.unet_blocks import init_temporal_conv
    tcv = fast_init(init_temporal_conv, 320, seed=4, dtype=dtype)
    results["temporal_conv_L0"] = timed(
        lambda p, xx: temporal_conv_layer(p, xx, num_frames=t + 1),
        tcv, x, loop=2,
    )

    print(json.dumps({k: round(v, 4) for k, v in results.items()}, indent=1))


if __name__ == "__main__":
    main()
