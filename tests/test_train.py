import jax
import jax.numpy as jnp
import numpy as np

from musev_tpu.models.unet3d import UNet3DConfig, init_unet3d
from musev_tpu.train import TrainSpec, diffusion_loss, train_step

CFG = UNet3DConfig(
    block_out_channels=(16, 16, 32, 32), layers_per_block=1,
    cross_attention_dim=16, attention_heads=4, norm_num_groups=8,
)


def test_train_step_decreases_nothing_breaks():
    params = init_unet3d(jax.random.PRNGKey(0), CFG)
    spec = TrainSpec(unet_cfg=CFG, n_vision_cond=1, learning_rate=1e-4)
    latents = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 4, 4))
    text = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 16))
    step = jax.jit(train_step, static_argnames=("spec",))
    p, loss0 = step(params, spec, latents, text, jax.random.PRNGKey(3))
    assert np.isfinite(float(loss0))
    # same key -> same batch; loss must drop after the update
    p, loss1 = step(p, spec, latents, text, jax.random.PRNGKey(3))
    assert np.isfinite(float(loss1))
    assert float(loss1) < float(loss0)


def test_loss_without_condition():
    params = init_unet3d(jax.random.PRNGKey(0), CFG)
    spec = TrainSpec(unet_cfg=CFG, n_vision_cond=0, grad_checkpoint=False)
    latents = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 4, 4, 4))
    text = jax.random.normal(jax.random.PRNGKey(2), (1, 5, 16))
    loss = diffusion_loss(params, spec, latents, text, jax.random.PRNGKey(3))
    assert np.isfinite(float(loss))
