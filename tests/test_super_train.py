import jax
import jax.numpy as jnp
import numpy as np

from musev_tpu.models.controlnet import ControlNetConfig, init_controlnet
from musev_tpu.models.ip_adapter import init_image_proj
from musev_tpu.models.referencenet import ReferenceNetConfig, init_referencenet
from musev_tpu.models.unet3d import init_unet3d, musev_referencenet_config
from musev_tpu.train import SuperTrainSpec, super_train_step


def test_super_bundle_training_decreases_loss():
    ucfg = musev_referencenet_config(
        block_out_channels=(8, 8, 16, 16), layers_per_block=1,
        cross_attention_dim=16, attention_heads=4, norm_num_groups=4,
        ip_adapter_dim=16,
    )
    rcfg = ReferenceNetConfig(
        block_out_channels=(8, 8, 16, 16), layers_per_block=1,
        cross_attention_dim=16, attention_heads=4, norm_num_groups=4,
    )
    ccfg = ControlNetConfig(
        block_out_channels=(8, 8, 16, 16), cond_embed_channels=(4, 4, 4, 4),
        layers_per_block=1, cross_attention_dim=16, attention_heads=4,
        norm_num_groups=4,
    )
    k = jax.random.PRNGKey(0)
    bundle = {
        "unet": init_unet3d(k, ucfg),
        "referencenet": init_referencenet(k, rcfg),
        "controlnet": init_controlnet(k, ccfg),
        "ip_proj": init_image_proj(k, clip_dim=12, cross_dim=16, num_tokens=4),
    }
    spec = SuperTrainSpec(
        unet_cfg=ucfg, referencenet_cfg=rcfg, controlnet_cfg=ccfg,
        learning_rate=1e-4,
    )
    batch = {
        "latents": jax.random.normal(k, (2, 4, 4, 4, 4)),
        "text_emb": jax.random.normal(k, (2, 5, 16)),
        "refer_latents": jax.random.normal(k, (2, 4, 4, 4)),
        "clip_pooled": jax.random.normal(k, (2, 12)),
        "control_images": jax.random.uniform(k, (2, 4, 32, 32, 3)),
    }
    step = jax.jit(super_train_step, static_argnames=("spec",))
    b2, l0 = step(bundle, spec, batch, jax.random.PRNGKey(1))
    b3, l1 = step(b2, spec, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(l0)) and np.isfinite(float(l1))
    assert float(l1) < float(l0)
    # branch gradients: refnet/controlnet see zero gradient at step 1 (their
    # fusion projections are zero-init, so d loss/d branch == 0 — same as the
    # torch reference at init); after step 1 unblocks the projections, step 2
    # must update every branch
    for name in ("referencenet", "controlnet", "ip_proj"):
        before = jax.tree_util.tree_leaves(b2[name])
        after = jax.tree_util.tree_leaves(b3[name])
        changed = any(
            np.abs(np.asarray(x) - np.asarray(y)).max() > 0
            for x, y in zip(before, after)
        )
        assert changed, f"{name} params did not update after unblocking"
