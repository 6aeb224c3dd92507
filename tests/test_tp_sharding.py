"""(dp, tp) 2-D mesh: column-split kernels must give identical results."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from musev_tpu.models.unet3d import UNet3DConfig, init_unet3d
from musev_tpu.parallel.sharding import shard_batch, shard_params_tp
from musev_tpu.train import TrainSpec, train_step

CFG = UNet3DConfig(
    block_out_channels=(16, 16, 32, 32), layers_per_block=1,
    cross_attention_dim=16, attention_heads=4, norm_num_groups=8,
)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_tp_train_step_matches_replicated():
    params = init_unet3d(jax.random.PRNGKey(0), CFG)
    spec = TrainSpec(unet_cfg=CFG, n_vision_cond=1, grad_checkpoint=False)
    lat = jax.random.normal(jax.random.PRNGKey(1), (4, 4, 4, 4, 4))
    text = jax.random.normal(jax.random.PRNGKey(2), (4, 5, 16))
    step = jax.jit(train_step, static_argnames=("spec",))
    _, loss_ref = step(params, spec, lat, text, jax.random.PRNGKey(3))

    devices = np.asarray(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devices, ("dp", "tp"))
    params_tp = shard_params_tp(params, mesh, axis="tp")
    lat_s = shard_batch(lat, mesh)
    text_s = shard_batch(text, mesh)
    _, loss_tp = step(params_tp, spec, lat_s, text_s, jax.random.PRNGKey(3))
    assert float(loss_tp) == pytest.approx(float(loss_ref), rel=1e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_tp_inference_denoise_matches_replicated():
    """The flagship v5e-8 topology (dp=2 over CFG x windows, tp=4 over
    kernels): the full VCPD denoise loop under dp x tp must match the
    unsharded single-device result (VERDICT r1 item 1)."""
    from musev_tpu.ops.context import make_window_plan
    from musev_tpu.ops.guidance import guidance_schedule
    from musev_tpu.pipelines.denoiser import DenoiseSpec, denoise_loop
    from musev_tpu.schedulers.euler_discrete import EulerDiscreteScheduler

    params = init_unet3d(jax.random.PRNGKey(0), CFG)
    base = dict(
        unet_cfg=CFG,
        scheduler=EulerDiscreteScheduler.create(2),
        plan=make_window_plan(10, 4, context_overlap=2),  # 3 windows x2 CFG
        guidance=guidance_schedule(3.5, 2),
        n_vision_cond=1,
        do_cfg=True,
    )
    lat = jax.random.normal(jax.random.PRNGKey(4), (1, 10, 4, 4, 4))
    cond = jax.random.normal(jax.random.PRNGKey(5), (1, 1, 4, 4, 4))
    tu = jax.random.normal(jax.random.PRNGKey(6), (1, 5, 16))
    tc = jax.random.normal(jax.random.PRNGKey(7), (1, 5, 16))
    fn = jax.jit(denoise_loop, static_argnames=("spec",))
    ref = fn(params, DenoiseSpec(**base), lat, tu, tc, jax.random.PRNGKey(8),
             condition_latents=cond)

    devices = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devices, ("dp", "tp"))
    params_tp = shard_params_tp(params, mesh, axis="tp")
    spec_tp = DenoiseSpec(**base, dp_axis="dp", tp_axis="tp")
    with jax.set_mesh(mesh):
        out = fn(params_tp, spec_tp, lat, tu, tc, jax.random.PRNGKey(8),
                 condition_latents=cond)
        out = jax.device_get(out)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-4, rtol=1e-3
    )
