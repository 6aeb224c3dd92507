"""Ring attention (sequence parallelism, §2.10 SP) on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from musev_tpu.ops.attention import _xla_sdpa, sdpa
from musev_tpu.parallel.mesh import make_mesh
from musev_tpu.parallel.ring_attention import ring_attention, sp_sdpa

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _inputs(b=2, s=64, h=4, d=8, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (b, s, h, d))
    k = jax.random.normal(ks[1], (b, s, h, d))
    v = jax.random.normal(ks[2], (b, s, h, d))
    return q, k, v


def test_ring_matches_full_attention():
    q, k, v = _inputs()
    ref = _xla_sdpa(q, k, v)
    mesh = make_mesh((8,), ("sp",))
    with jax.set_mesh(mesh):
        out = jax.jit(sp_sdpa)(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ring_matches_with_scale_and_sizes():
    q, k, v = _inputs(b=1, s=40, h=2, d=16, seed=3)
    ref = _xla_sdpa(q, k, v, scale=0.11)
    mesh = make_mesh((4,), ("sp",), devices=jax.devices()[:4])
    with jax.set_mesh(mesh):
        out = jax.jit(lambda *a: sp_sdpa(*a, scale=0.11))(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ring_single_device_axis():
    # degenerate 1-device axis: no ppermute, must still match
    q, k, v = _inputs(b=1, s=16, h=2, d=8, seed=4)
    ref = _xla_sdpa(q, k, v)
    mesh = make_mesh((1,), ("sp",), devices=jax.devices()[:1])
    with jax.set_mesh(mesh):
        out = jax.jit(sp_sdpa)(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_sdpa_auto_routes_to_ring_under_sp_ctx():
    from musev_tpu.parallel.context import sharding_ctx

    q, k, v = _inputs(b=1, s=512, h=2, d=8, seed=5)
    ref = _xla_sdpa(q, k, v)
    mesh = make_mesh((8,), ("sp",))
    with jax.set_mesh(mesh):
        with sharding_ctx(sp="sp"):
            out = jax.jit(lambda *a: sdpa(*a, impl="auto"))(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_denoise_sp_matches_unsharded():
    """Full tiny-UNet denoise: sp_axis sharded == unsharded."""
    from musev_tpu.models.unet3d import UNet3DConfig, init_unet3d
    from musev_tpu.ops.context import make_window_plan
    from musev_tpu.ops.guidance import guidance_schedule
    from musev_tpu.pipelines.denoiser import DenoiseSpec, denoise_loop
    from musev_tpu.schedulers.euler_discrete import EulerDiscreteScheduler

    cfg = UNet3DConfig(
        block_out_channels=(16, 16, 32, 32),
        layers_per_block=1,
        cross_attention_dim=16,
        attention_heads=4,
        norm_num_groups=8,
    )

    def spec(sp_axis=None):
        return DenoiseSpec(
            unet_cfg=cfg,
            scheduler=EulerDiscreteScheduler.create(2),
            plan=make_window_plan(12, 12, context_overlap=0),
            guidance=guidance_schedule(3.5, 2),
            n_vision_cond=1,
            do_cfg=True,
            sp_axis=sp_axis,
        )

    params = init_unet3d(jax.random.PRNGKey(0), cfg)
    # h*w = 16*16 = 256 tokens at level 0 -> divisible by 8; >= _FLASH_MIN_SEQ
    # not required for xla path, ring routing needs >= 512 -- use 32x16
    b, hh, ww, c = 1, 32, 16, 4
    lat = jax.random.normal(jax.random.PRNGKey(1), (b, 12, hh, ww, c))
    cond = jax.random.normal(jax.random.PRNGKey(2), (b, 1, hh, ww, c))
    tu = jax.random.normal(jax.random.PRNGKey(3), (b, 5, 16))
    tc = jax.random.normal(jax.random.PRNGKey(4), (b, 5, 16))
    key = jax.random.PRNGKey(5)

    ref = denoise_loop(params, spec(), lat, tu, tc, key, condition_latents=cond)

    mesh = make_mesh((8,), ("sp",))
    sp_spec = spec(sp_axis="sp")
    with jax.set_mesh(mesh):
        out = jax.jit(
            lambda p, l, a, b_, k, cd: denoise_loop(
                p, sp_spec, l, a, b_, k, condition_latents=cd
            )
        )(params, lat, tu, tc, key, cond)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)
