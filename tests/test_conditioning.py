import jax
import jax.numpy as jnp
import numpy as np
import pytest

from musev_tpu.models.clip_vision import (
    CLIPVisionConfig,
    clip_vision_encode,
    init_clip_vision,
    preprocess_clip_image,
)
from musev_tpu.models.ip_adapter import (
    ResamplerConfig,
    image_proj,
    init_image_proj,
    init_mlp_proj,
    init_resampler,
    mlp_proj,
    resampler,
)
from musev_tpu.models.referencenet import (
    ReferenceNetConfig,
    init_referencenet,
    referencenet_apply,
)
from musev_tpu.models.unet3d import init_unet3d, musev_referencenet_config
from musev_tpu.ops.context import make_window_plan
from musev_tpu.ops.guidance import guidance_schedule
from musev_tpu.pipelines.denoiser import DenoiseSpec, denoise_loop
from musev_tpu.schedulers.euler_discrete import EulerDiscreteScheduler


def test_referencenet_emb_shapes():
    cfg = ReferenceNetConfig(
        block_out_channels=(8, 8, 16, 16), layers_per_block=2,
        cross_attention_dim=16, attention_heads=4, norm_num_groups=4,
    )
    params = init_referencenet(jax.random.PRNGKey(0), cfg)
    sample = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 4))
    text = jax.random.normal(jax.random.PRNGKey(2), (2, 7, 16))
    down, mid, sa = referencenet_apply(params, cfg, sample, 0.0, text)
    assert len(down) == 12  # conv_in + 4 blocks x 2 layers + 3 downsamples
    assert down[0].shape == (2, 1, 16, 16, 8)
    assert down[-1].shape == (2, 1, 2, 2, 16)
    assert mid.shape == (2, 1, 2, 2, 16)
    assert sa is None


def test_unet_with_referencenet_embs():
    """Full musev_referencenet path: ReferenceNet embs fused in the denoiser."""
    ucfg = musev_referencenet_config(
        block_out_channels=(8, 8, 16, 16), layers_per_block=2,
        cross_attention_dim=16, attention_heads=4, norm_num_groups=4,
        ip_adapter_dim=16,
    )
    rcfg = ReferenceNetConfig(
        block_out_channels=(8, 8, 16, 16), layers_per_block=2,
        cross_attention_dim=16, attention_heads=4, norm_num_groups=4,
    )
    uparams = init_unet3d(jax.random.PRNGKey(0), ucfg)
    # refer-fusion to_out is zero-init (starts as identity); perturb it so the
    # zero-embs comparison below is meaningful
    for i, block in enumerate(uparams["down_blocks"]):
        for j, fuse in enumerate(block.get("refer_emb_attns", [])):
            fuse["to_out"]["kernel"] = jax.random.normal(
                jax.random.PRNGKey(100 + i * 10 + j),
                fuse["to_out"]["kernel"].shape,
            ) * 0.1
    uparams["mid_block_refer_emb_attns"]["to_out"]["kernel"] = (
        jax.random.normal(jax.random.PRNGKey(99),
                          uparams["mid_block_refer_emb_attns"]["to_out"]["kernel"].shape)
        * 0.1
    )
    rparams = init_referencenet(jax.random.PRNGKey(1), rcfg)
    refer_lat = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 4))
    text = jax.random.normal(jax.random.PRNGKey(3), (1, 7, 16))
    down, mid, _ = referencenet_apply(rparams, rcfg, refer_lat, 999.0, text)

    spec = DenoiseSpec(
        unet_cfg=ucfg,
        scheduler=EulerDiscreteScheduler.create(2),
        plan=make_window_plan(6, 4, context_overlap=2),
        guidance=guidance_schedule(3.5, 2),
        n_vision_cond=1,
        do_cfg=True,
    )
    lat = jax.random.normal(jax.random.PRNGKey(4), (1, 6, 2, 2, 4))
    cond = jax.random.normal(jax.random.PRNGKey(5), (1, 1, 2, 2, 4))
    clip_tokens = jax.random.normal(jax.random.PRNGKey(6), (1, 4, 16))
    out = denoise_loop(
        uparams, spec, lat, text, text, jax.random.PRNGKey(7),
        condition_latents=cond,
        vision_clip_emb=clip_tokens,
        refer_embs=down, mid_refer_emb=mid,
    )
    assert out.shape == lat.shape
    assert bool(jnp.isfinite(out).all())
    # refer embs must influence the output: zeroing them changes the result
    down0 = [jnp.zeros_like(e) for e in down]
    out0 = denoise_loop(
        uparams, spec, lat, text, text, jax.random.PRNGKey(7),
        condition_latents=cond, vision_clip_emb=clip_tokens,
        refer_embs=down0, mid_refer_emb=jnp.zeros_like(mid),
    )
    assert np.abs(np.asarray(out - out0)).max() > 1e-6


def test_image_proj_tokens():
    p = init_image_proj(jax.random.PRNGKey(0), clip_dim=32, cross_dim=16,
                        num_tokens=4)
    emb = jax.random.normal(jax.random.PRNGKey(1), (2, 32))
    out = image_proj(p, emb)
    assert out.shape == (2, 4, 16)


def test_mlp_proj_tokens():
    p = init_mlp_proj(jax.random.PRNGKey(0), id_dim=32, cross_dim=16, num_tokens=4)
    emb = jax.random.normal(jax.random.PRNGKey(1), (2, 32))
    assert mlp_proj(p, emb).shape == (2, 4, 16)


def test_resampler():
    cfg = ResamplerConfig(dim=32, depth=2, heads=4, num_queries=8,
                          embedding_dim=48, output_dim=16)
    p = init_resampler(jax.random.PRNGKey(0), cfg)
    tokens = jax.random.normal(jax.random.PRNGKey(1), (2, 10, 48))
    out = resampler(p, cfg, tokens)
    assert out.shape == (2, 8, 16)
    assert bool(jnp.isfinite(out).all())


def test_clip_vision_shapes():
    cfg = CLIPVisionConfig(image_size=32, patch_size=8, hidden_size=24,
                           num_layers=2, num_heads=4, intermediate_size=48,
                           projection_dim=16)
    p = init_clip_vision(jax.random.PRNGKey(0), cfg)
    img = preprocess_clip_image(
        jnp.asarray(np.random.rand(2, 40, 50, 3) * 255), size=32
    )
    hidden, proj = clip_vision_encode(p, cfg, img)
    assert hidden.shape == (2, 17, 24)
    assert proj.shape == (2, 16)


def test_clip_vision_golden_vs_transformers():
    torch = pytest.importorskip("torch")
    from transformers import CLIPVisionConfig as HFCfg, CLIPVisionModelWithProjection

    hf_cfg = HFCfg(image_size=32, patch_size=8, hidden_size=24,
                   num_hidden_layers=2, num_attention_heads=4,
                   intermediate_size=48, projection_dim=16,
                   hidden_act="quick_gelu")
    torch.manual_seed(0)
    hf = CLIPVisionModelWithProjection(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}

    cfg = CLIPVisionConfig(image_size=32, patch_size=8, hidden_size=24,
                           num_layers=2, num_heads=4, intermediate_size=48,
                           projection_dim=16)
    params = init_clip_vision(jax.random.PRNGKey(0), cfg)
    vm = "vision_model."
    params["patch_embedding"] = jnp.asarray(
        sd[vm + "embeddings.patch_embedding.weight"].transpose(2, 3, 1, 0)
    )
    params["class_embedding"] = jnp.asarray(sd[vm + "embeddings.class_embedding"])
    params["position_embedding"] = jnp.asarray(
        sd[vm + "embeddings.position_embedding.weight"]
    )
    for name, tree in [("pre_layrnorm", params["pre_layrnorm"]),
                       ("post_layernorm", params["post_layernorm"])]:
        tree["scale"] = jnp.asarray(sd[vm + name + ".weight"])
        tree["bias"] = jnp.asarray(sd[vm + name + ".bias"])
    params["visual_projection"]["kernel"] = jnp.asarray(
        sd["visual_projection.weight"].T
    )
    for i, layer in enumerate(params["layers"]):
        pre = f"{vm}encoder.layers.{i}."
        for tgt, src in [("q_proj", "self_attn.q_proj"), ("k_proj", "self_attn.k_proj"),
                         ("v_proj", "self_attn.v_proj"), ("out_proj", "self_attn.out_proj"),
                         ("fc1", "mlp.fc1"), ("fc2", "mlp.fc2")]:
            layer[tgt]["kernel"] = jnp.asarray(sd[pre + src + ".weight"].T)
            layer[tgt]["bias"] = jnp.asarray(sd[pre + src + ".bias"])
        for tgt in ["layer_norm1", "layer_norm2"]:
            layer[tgt]["scale"] = jnp.asarray(sd[pre + tgt + ".weight"])
            layer[tgt]["bias"] = jnp.asarray(sd[pre + tgt + ".bias"])

    img = np.random.RandomState(0).rand(1, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        ref = hf(pixel_values=torch.from_numpy(img.transpose(0, 3, 1, 2)))
    _, proj = clip_vision_encode(params, cfg, jnp.asarray(img))
    np.testing.assert_allclose(
        np.asarray(proj), ref.image_embeds.numpy(), atol=2e-4, rtol=1e-3
    )
