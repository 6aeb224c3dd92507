import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from musev_tpu.models.unet3d import UNet3DConfig, init_unet3d
from musev_tpu.ops.context import make_window_plan
from musev_tpu.ops.guidance import guidance_schedule
from musev_tpu.pipelines.denoiser import DenoiseSpec, denoise_loop
from musev_tpu.schedulers.euler_discrete import EulerDiscreteScheduler

CFG = UNet3DConfig(
    block_out_channels=(16, 16, 32, 32), layers_per_block=1,
    cross_attention_dim=16, attention_heads=4, norm_num_groups=8,
)


def test_serial_denoise_record_and_replay():
    params = init_unet3d(jax.random.PRNGKey(0), CFG)
    steps = 3
    spec = DenoiseSpec(
        unet_cfg=CFG,
        scheduler=EulerDiscreteScheduler.create(steps),
        plan=make_window_plan(6, 4, context_overlap=2),
        guidance=guidance_schedule(3.5, steps),
        n_vision_cond=0,
        do_cfg=False,
        video_overlap=2,
        record_mid_video=True,
    )
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 4, 4, 4))
    tc = jax.random.normal(jax.random.PRNGKey(2), (1, 5, 16))
    out, (mid_lat, mid_noise) = denoise_loop(
        params, spec, lat, None, tc, jax.random.PRNGKey(3)
    )
    assert out.shape == lat.shape
    assert mid_lat.shape == (steps + 1, 1, 2, 4, 4, 4)
    assert mid_noise.shape == (steps + 1, 1, 2, 4, 4, 4)

    # replay into a second shot: must run and differ from a non-fused run
    spec2 = dataclasses.replace(spec, record_mid_video=False)
    lat2 = jax.random.normal(jax.random.PRNGKey(4), (1, 6, 4, 4, 4))
    fused = denoise_loop(
        params, spec2, lat2, None, tc, jax.random.PRNGKey(5),
        last_mid_latents=mid_lat, last_mid_noises=mid_noise,
    )
    plain_spec = dataclasses.replace(spec2, video_overlap=0)
    plain = denoise_loop(
        params, plain_spec, lat2, None, tc, jax.random.PRNGKey(5)
    )
    assert np.abs(np.asarray(fused - plain)).max() > 1e-6
    assert bool(jnp.isfinite(fused).all())
