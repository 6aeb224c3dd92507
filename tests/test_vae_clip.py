import jax
import jax.numpy as jnp
import numpy as np
import pytest

from musev_tpu.models.clip_text import CLIPTextConfig, clip_text_encode, init_clip_text
from musev_tpu.models.vae import (
    VAEConfig,
    init_vae,
    vae_decode,
    vae_decode_video,
    vae_encode,
    vae_encode_video,
)

TINY_VAE = VAEConfig(block_out_channels=(16, 16, 32, 32), layers_per_block=1,
                     norm_num_groups=8)


def test_vae_shapes():
    params = init_vae(jax.random.PRNGKey(0), TINY_VAE)
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    lat = vae_encode(params, TINY_VAE, img)
    assert lat.shape == (2, 4, 4, 4)
    out = vae_decode(params, TINY_VAE, lat)
    assert out.shape == (2, 32, 32, 3)
    assert bool(jnp.isfinite(out).all())


def test_vae_video_segmented_equals_full():
    params = init_vae(jax.random.PRNGKey(0), TINY_VAE)
    vid = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 32, 32, 3))
    lat = vae_encode_video(params, TINY_VAE, vid, segment=2)
    assert lat.shape == (1, 5, 4, 4, 4)
    lat_full = vae_encode_video(params, TINY_VAE, vid, segment=100)
    np.testing.assert_allclose(np.asarray(lat), np.asarray(lat_full), atol=1e-5)
    dec = vae_decode_video(params, TINY_VAE, lat, segment=2)
    assert dec.shape == (1, 5, 32, 32, 3)


def test_vae_video_mesh_sharded_equals_unsharded():
    """Frame-parallel decode over the device mesh must match the single-
    device segmented decode exactly — this is the decode the v5e-8 bench
    projection bills for (bench.py decode/n_chips term)."""
    from jax.sharding import Mesh

    params = init_vae(jax.random.PRNGKey(0), TINY_VAE)
    # T=5 is deliberately NOT a multiple of 8: exercises the pad path
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 4, 4, 4))
    want = vae_decode_video(params, TINY_VAE, lat, segment=2)
    mesh = Mesh(np.array(jax.devices()[:8]), ("fp",))
    got = vae_decode_video(params, TINY_VAE, lat, mesh=mesh, axis="fp")
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_vae_video_mesh_segment_long_form():
    """Long-form mesh decode (T=65 on 8 chips, segment=2): the per-chip
    segment loop must keep peak HBM bounded at `segment` frames per decode
    while matching the unsharded segmented decode exactly (reference
    decoder_t_segment regime, pipeline_controlnet.py:2157-2171)."""
    from jax.sharding import Mesh

    params = init_vae(jax.random.PRNGKey(0), TINY_VAE)
    # T=65: 9 frames per chip after pad -> 5 per-chip segments of <=2
    lat = jax.random.normal(jax.random.PRNGKey(2), (1, 65, 4, 4, 4))
    want = vae_decode_video(params, TINY_VAE, lat, segment=2)
    mesh = Mesh(np.array(jax.devices()[:8]), ("fp",))
    got = vae_decode_video(params, TINY_VAE, lat, segment=2, mesh=mesh,
                           axis="fp")
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    # bounded per-chip peak: lower the PRODUCTION mesh-decode function (the
    # exact cached jit vae_decode_video dispatches to) and compare XLA's
    # memory analysis — the segmented program must hold strictly less temp
    # than the one-shot shard decode
    from musev_tpu.models.vae import _mesh_decode_fn

    def peak_bytes(segment):
        flat = lat.reshape(-1, 4, 4, 4)
        n = mesh.shape["fp"]
        pad = (-flat.shape[0]) % n
        flat = jnp.concatenate([flat, flat[-1:].repeat(pad, 0)], 0)
        from jax.sharding import NamedSharding, PartitionSpec as P

        flat = jax.device_put(flat, NamedSharding(mesh, P("fp")))
        per = flat.shape[0] // n
        f = _mesh_decode_fn(mesh, "fp", TINY_VAE, per, min(segment, per))
        mem = f.lower(params, flat).compile().memory_analysis()
        return mem.temp_size_in_bytes

    assert peak_bytes(2) < peak_bytes(100)


def test_clip_text_shapes():
    cfg = CLIPTextConfig(vocab_size=100, hidden_size=32, num_layers=2,
                         num_heads=4, intermediate_size=64)
    params = init_clip_text(jax.random.PRNGKey(0), cfg)
    ids = jnp.asarray([[1, 5, 7, 2] + [0] * 73], jnp.int32)
    out = clip_text_encode(params, cfg, ids)
    assert out.shape == (1, 77, 32)
    assert bool(jnp.isfinite(out).all())


def test_clip_causal_mask():
    """A token change at position j must not affect positions < j."""
    cfg = CLIPTextConfig(vocab_size=100, hidden_size=32, num_layers=2,
                         num_heads=4, intermediate_size=64)
    params = init_clip_text(jax.random.PRNGKey(0), cfg)
    ids_a = jnp.asarray([[1, 5, 7, 2, 9, 9, 9, 9]], jnp.int32)
    ids_b = ids_a.at[0, 4].set(42)
    a = clip_text_encode(params, cfg, ids_a)
    b = clip_text_encode(params, cfg, ids_b)
    np.testing.assert_allclose(np.asarray(a[:, :4]), np.asarray(b[:, :4]), atol=1e-5)
    assert np.abs(np.asarray(a[:, 4:]) - np.asarray(b[:, 4:])).max() > 1e-4


def test_clip_golden_vs_transformers():
    """Golden parity vs the torch CLIPTextModel on random weights."""
    torch = pytest.importorskip("torch")
    from transformers import CLIPTextConfig as HFConfig, CLIPTextModel

    hf_cfg = HFConfig(
        vocab_size=99, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=77, hidden_act="quick_gelu",
    )
    torch.manual_seed(0)
    hf = CLIPTextModel(hf_cfg).eval()

    cfg = CLIPTextConfig(vocab_size=99, hidden_size=32, num_layers=2,
                         num_heads=4, intermediate_size=64)
    sd = hf.state_dict()

    def t2j(name):
        return jnp.asarray(sd[name].numpy())

    params = {
        "token_embedding": t2j("text_model.embeddings.token_embedding.weight"),
        "position_embedding": t2j("text_model.embeddings.position_embedding.weight"),
        "final_layer_norm": {
            "scale": t2j("text_model.final_layer_norm.weight"),
            "bias": t2j("text_model.final_layer_norm.bias"),
        },
        "layers": [],
    }
    for i in range(2):
        pre = f"text_model.encoder.layers.{i}"
        params["layers"].append(
            {
                "layer_norm1": {"scale": t2j(f"{pre}.layer_norm1.weight"),
                                "bias": t2j(f"{pre}.layer_norm1.bias")},
                "q_proj": {"kernel": t2j(f"{pre}.self_attn.q_proj.weight").T,
                           "bias": t2j(f"{pre}.self_attn.q_proj.bias")},
                "k_proj": {"kernel": t2j(f"{pre}.self_attn.k_proj.weight").T,
                           "bias": t2j(f"{pre}.self_attn.k_proj.bias")},
                "v_proj": {"kernel": t2j(f"{pre}.self_attn.v_proj.weight").T,
                           "bias": t2j(f"{pre}.self_attn.v_proj.bias")},
                "out_proj": {"kernel": t2j(f"{pre}.self_attn.out_proj.weight").T,
                             "bias": t2j(f"{pre}.self_attn.out_proj.bias")},
                "layer_norm2": {"scale": t2j(f"{pre}.layer_norm2.weight"),
                                "bias": t2j(f"{pre}.layer_norm2.bias")},
                "fc1": {"kernel": t2j(f"{pre}.mlp.fc1.weight").T,
                        "bias": t2j(f"{pre}.mlp.fc1.bias")},
                "fc2": {"kernel": t2j(f"{pre}.mlp.fc2.weight").T,
                        "bias": t2j(f"{pre}.mlp.fc2.bias")},
            }
        )

    ids = np.array([[1, 5, 7, 2, 9, 11, 3, 0, 0, 0]], dtype=np.int64)
    with torch.no_grad():
        ref = hf(input_ids=torch.from_numpy(ids)).last_hidden_state.numpy()
    out = np.asarray(clip_text_encode(params, cfg, jnp.asarray(ids, jnp.int32)))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


def test_clip_vision_golden_vs_transformers():
    """convert_clip_vision: golden parity vs the torch
    CLIPVisionModelWithProjection on random weights (the IP-Adapter image
    encoder path, reference ip_adapter_loader.py:50-66)."""
    import numpy as np
    import torch
    from transformers import CLIPVisionConfig as HFVisionConfig
    from transformers import CLIPVisionModelWithProjection

    from musev_tpu.models.clip_vision import (
        CLIPVisionConfig,
        clip_vision_encode,
        init_clip_vision,
    )
    from musev_tpu.models.sd_weights import convert_clip_vision

    hf_cfg = HFVisionConfig(
        image_size=28, patch_size=14, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64, projection_dim=16,
    )
    torch.manual_seed(0)
    hf = CLIPVisionModelWithProjection(hf_cfg).eval()

    cfg = CLIPVisionConfig(
        image_size=28, patch_size=14, hidden_size=32, num_layers=2,
        num_heads=4, intermediate_size=64, projection_dim=16,
    )
    params = init_clip_vision(jax.random.PRNGKey(0), cfg)
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    n, leftover = convert_clip_vision(params, cfg, sd)
    assert n >= 2 * 8 + 5, f"only {n} tensors loaded"
    # every torch tensor must land somewhere (no silent drops)
    assert not [k for k in leftover if "position_ids" not in k], leftover

    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((2, 28, 28, 3)).astype(np.float32)
    hidden, projected = clip_vision_encode(params, cfg, jnp.asarray(pixels))
    with torch.no_grad():
        out = hf(
            pixel_values=torch.from_numpy(pixels.transpose(0, 3, 1, 2)),
            output_hidden_states=True,
        )
    np.testing.assert_allclose(
        np.asarray(projected), out.image_embeds.numpy(), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(hidden), out.hidden_states[-1].numpy(), atol=2e-5
    )
    # penultimate variant (IP-Adapter-Plus consumes hidden_states[-2])
    pen, _ = clip_vision_encode(params, cfg, jnp.asarray(pixels), penultimate=True)
    np.testing.assert_allclose(
        np.asarray(pen), out.hidden_states[-2].numpy(), atol=2e-5
    )
