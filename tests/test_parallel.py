"""Sharded-vs-unsharded equality of the VCPD denoise step on a virtual
8-device CPU mesh (SURVEY §4 item 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from musev_tpu.models.unet3d import UNet3DConfig, init_unet3d
from musev_tpu.ops.context import make_window_plan
from musev_tpu.ops.guidance import guidance_schedule
from musev_tpu.parallel.mesh import batch_sharding, make_mesh, replicated
from musev_tpu.pipelines.denoiser import DenoiseSpec, denoise_loop
from musev_tpu.schedulers.euler_discrete import EulerDiscreteScheduler

CFG = UNet3DConfig(
    block_out_channels=(16, 16, 32, 32),
    layers_per_block=1,
    cross_attention_dim=16,
    attention_heads=4,
    norm_num_groups=8,
)


def _spec(dp_axis=None):
    # T=36, window 12, overlap 4 -> 4 windows; x2 CFG = 8 sharded rows
    return DenoiseSpec(
        unet_cfg=CFG,
        scheduler=EulerDiscreteScheduler.create(2),
        plan=make_window_plan(36, 12, context_overlap=4),
        guidance=guidance_schedule(3.5, 2),
        n_vision_cond=1,
        do_cfg=True,
        dp_axis=dp_axis,
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_denoise_matches_single_device():
    params = init_unet3d(jax.random.PRNGKey(0), CFG)
    b, h, w_, c = 1, 4, 4, 4
    lat = jax.random.normal(jax.random.PRNGKey(1), (b, 36, h, w_, c))
    cond = jax.random.normal(jax.random.PRNGKey(2), (b, 1, h, w_, c))
    tu = jax.random.normal(jax.random.PRNGKey(3), (b, 5, 16))
    tc = jax.random.normal(jax.random.PRNGKey(4), (b, 5, 16))
    key = jax.random.PRNGKey(5)

    spec0 = _spec(dp_axis=None)
    assert spec0.plan.n_windows == 4
    ref = denoise_loop(params, spec0, lat, tu, tc, key, condition_latents=cond)

    mesh = make_mesh((8,), ("dp",))
    spec = _spec(dp_axis="dp")
    with jax.set_mesh(mesh):
        fn = jax.jit(
            lambda p, l, a, b_, k, cd: denoise_loop(
                p, spec, l, a, b_, k, condition_latents=cd
            )
        )
        out = fn(params, lat, tu, tc, key, cond)
    # cross-device scatter-add reorders fp32 accumulation; tolerance covers
    # the reorder noise (observed <= 0.3% relative on a few elements)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=1e-2, rtol=5e-3)
    assert bool(jnp.isfinite(out).all())
