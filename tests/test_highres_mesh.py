"""BASELINE config #5: high-res multi-reference generation on the mesh.

704x1216 (latent 88x152) multi-reference IPAdapterFaceID generation sharded
over v5e-8, served through the gradio path (BASELINE.json configs[4];
reference shape caps scripts/gradio/app.py:92-131). On the 8-device CPU
mesh this proves:

  * the frame-parallel program is exact at the NON-SQUARE 88x152 latent
    grid (hw = 13376 px -> 1672 px/chip pixel pivot; odd downsampled levels
    44x76 -> 22x38 -> ...), with the IPAdapter + FaceID conditioning
    branches live — sharded == unsharded;
  * the gradio serving path (serve.app.OnlineInference) drives the fp
    topology end-to-end, including the mesh-sharded VAE decode;
  * the reference's gradio shape caps admit the 704x1216 operating point.

Off-TPU the 13376-token rows route through the chunked exact-attention
fallback (ops/attention.py), bounding logits memory at O(chunk * Sk).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from musev_tpu.models.unet3d import UNet3DConfig, init_unet3d, unet3d_apply
from musev_tpu.parallel.frame_parallel import unet3d_apply_fp
from musev_tpu.parallel.mesh import make_mesh


def test_fp_highres_88x152_faceid_matches_base():
    """One denoise-step UNet call at the 704x1216 latent grid, CFG +
    ReferenceOnly viscond + IPAdapter tokens + FaceID tokens: the fp
    row-sharded program must equal the unsharded forward."""
    cfg = UNet3DConfig(
        block_out_channels=(8, 16),
        down_block_types=("CrossAttnDownBlock3D", "DownBlock3D"),
        up_block_types=("UpBlock3D", "CrossAttnUpBlock3D"),
        layers_per_block=1,
        norm_num_groups=4,
        attention_heads=2,
        cross_attention_dim=16,
        keep_vision_condition=True,
        keep_content_condition=True,
        ip_adapter_cross_attn=True,
        ip_adapter_dim=16,
        need_ip_adapter_face=True,
        ip_adapter_face_dim=16,
    )
    params = init_unet3d(jax.random.key(0), cfg)
    h, w = 88, 152  # 704x1216 / 8
    b, t = 2, 3  # CFG pair, 2 gen frames + 1 vision-condition frame
    k = jax.random.key(1)
    ks = jax.random.split(k, 5)
    sample = jax.random.normal(ks[0], (b, t - 1, h, w, 4), jnp.float32)
    cond = jax.random.normal(ks[1], (b, 1, h, w, 4), jnp.float32)
    text = jax.random.normal(ks[2], (b, 7, 16), jnp.float32)
    clip_tokens = jax.random.normal(ks[3], (b, 4, 16), jnp.float32)
    face_tokens = jax.random.normal(ks[4], (b, 4, 16), jnp.float32)
    kwargs = dict(
        sample=sample, timestep=jnp.asarray(5.0), text_emb=text,
        condition_latents=cond, gen_index=(1, 2), cond_index=(0,),
        do_cfg=True, vision_clip_emb=clip_tokens,
        ip_adapter_face_emb=face_tokens,
    )
    ref = unet3d_apply(params, cfg, **kwargs)
    assert ref.shape == (b, t, h, w, 4)
    mesh = make_mesh((8,), ("fp",))
    with jax.set_mesh(mesh):
        fp = unet3d_apply_fp(params, cfg, axis="fp", **kwargs)
    np.testing.assert_allclose(
        np.asarray(fp), np.asarray(ref), atol=3e-4, rtol=3e-4
    )


def test_serve_t2v_drives_fp_topology():
    """The gradio serving path runs the fp topology end-to-end: denoise
    sharded over the mesh, VAE decode frame-sharded (pipeline.decode_latents
    mesh path), output identical in shape/dtype to the single-device serve."""
    from musev_tpu.models.clip_text import CLIPTextConfig, init_clip_text
    from musev_tpu.models.vae import VAEConfig, init_vae
    from musev_tpu.pipelines.pipeline import MusevModels, MusevPipeline
    from musev_tpu.serve.app import OnlineInference
    from musev_tpu.utils.tokenizer import HashTokenizer

    unet_cfg = UNet3DConfig(
        block_out_channels=(16, 16, 32, 32), layers_per_block=1,
        cross_attention_dim=24, attention_heads=4, norm_num_groups=8,
    )
    vae_cfg = VAEConfig(block_out_channels=(16, 16, 32, 32),
                        layers_per_block=1, norm_num_groups=8)
    text_cfg = CLIPTextConfig(vocab_size=500, hidden_size=24, num_layers=1,
                              num_heads=4, intermediate_size=48)
    k = jax.random.PRNGKey(0)
    models = MusevModels(
        unet_params=init_unet3d(jax.random.fold_in(k, 0), unet_cfg),
        unet_cfg=unet_cfg,
        vae_params=init_vae(jax.random.fold_in(k, 1), vae_cfg),
        vae_cfg=vae_cfg,
        text_params=init_clip_text(jax.random.fold_in(k, 2), text_cfg),
        text_cfg=text_cfg,
        tokenizer=HashTokenizer(500),
    )
    mesh = make_mesh((8,), ("fp",))
    pipe = MusevPipeline(models, fp_axis="fp", mesh=mesh)
    infer = OnlineInference(pipe, time_size=2)
    with jax.set_mesh(mesh):
        out = infer.online_t2v_inference(
            "a portrait", None, seed=3, w=32, h=32, video_length=2
        )
    assert out.dtype == np.uint8
    assert out.shape[1:3] == (32, 32)
    assert out.shape[0] >= 2


def test_limit_shape_admits_704x1216():
    """The reference gradio caps (max edge 1280, /8 snap) admit the
    704x1216 config #5 operating point unchanged."""
    from musev_tpu.serve.app import limit_shape

    w, h, ratio = limit_shape(None, 704, 1216, 1.0)
    assert (w, h) == (704, 1216)
    # and clamp a 2x request of it back under the cap, /8-aligned
    w2, h2, r2 = limit_shape(None, 1408, 2432, 1.0)
    assert max(w2, h2) <= 1280 and w2 % 8 == 0 and h2 % 8 == 0
