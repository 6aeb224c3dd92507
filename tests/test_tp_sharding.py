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
