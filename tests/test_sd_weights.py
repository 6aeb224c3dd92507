import jax
import numpy as np
import pytest

from musev_tpu.models.sd_weights import (
    convert_clip_text,
    convert_mlp_proj,
    convert_unet3d,
    export_unet3d,
    unet3d_key_map,
)
from musev_tpu.models.unet3d import UNet3DConfig, init_unet3d

CFG = UNet3DConfig(
    block_out_channels=(16, 16, 32, 32),
    layers_per_block=2,
    cross_attention_dim=16,
    attention_heads=4,
    norm_num_groups=8,
)


def test_key_map_covers_all_params():
    """Every array leaf in the init tree must be reachable from the key map."""
    params = init_unet3d(jax.random.PRNGKey(0), CFG)
    leaves_total = len(jax.tree_util.tree_leaves(params))
    n_mapped = 0
    for tk, path, kind in unet3d_key_map(CFG):
        n_mapped += 1 if kind in ("raw", "embedding") else 2
    # norm entries always have scale+bias; linear may lack bias; conv_shortcut
    # entries exist in the map even when absent in the tree -> mapped >= leaves
    assert n_mapped >= leaves_total


def test_roundtrip_export_convert():
    params = init_unet3d(jax.random.PRNGKey(0), CFG)
    sd = export_unet3d(params, CFG)
    assert len(sd) > 100
    # perturb a fresh tree, then restore from exported state dict
    params2 = init_unet3d(jax.random.PRNGKey(1), CFG)
    n, leftover = convert_unet3d(params2, CFG, sd)
    assert leftover == []
    a = jax.tree_util.tree_leaves(params)
    b = jax.tree_util.tree_leaves(params2)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


def test_2d_base_merge_keeps_temporal():
    """Applying a 2D-only state dict must overwrite spatial weights and leave
    temporal ones untouched (update_unet_with_sd semantics)."""
    params = init_unet3d(jax.random.PRNGKey(0), CFG)
    sd = export_unet3d(params, CFG)
    sd_2d = {k: v * 0 + 7.0 for k, v in sd.items() if "temp_" not in k
             and "frame_embedding" not in k and "transformer_in" not in k}
    before_temporal = np.asarray(
        params["down_blocks"][0]["layers"][0]["temp_conv"]["conv1"]["conv"]["kernel"]
    ).copy()
    n, leftover = convert_unet3d(params, CFG, sd_2d)
    assert leftover == []
    after_temporal = np.asarray(
        params["down_blocks"][0]["layers"][0]["temp_conv"]["conv1"]["conv"]["kernel"]
    )
    np.testing.assert_array_equal(before_temporal, after_temporal)
    spatial = np.asarray(params["conv_in"]["bias"])
    np.testing.assert_array_equal(spatial, np.full_like(spatial, 7.0))


def test_convert_mlp_proj_matches_torch_layout():
    """FaceID MLPProjModel (proj.0 -> GELU -> proj.2 -> LayerNorm) checkpoint
    loads into mlp_proj and reproduces the torch forward
    (ip_adapter_face_loader.py:132 image_proj load)."""
    from musev_tpu.models.ip_adapter import init_mlp_proj, mlp_proj

    rng = np.random.RandomState(0)
    id_dim, cross, tokens = 8, 6, 4
    sd = {
        "image_proj": {
            "proj.0.weight": rng.randn(id_dim * 2, id_dim).astype(np.float32),
            "proj.0.bias": rng.randn(id_dim * 2).astype(np.float32),
            "proj.2.weight": rng.randn(cross * tokens, id_dim * 2).astype(np.float32),
            "proj.2.bias": rng.randn(cross * tokens).astype(np.float32),
            "norm.weight": rng.randn(cross).astype(np.float32),
            "norm.bias": rng.randn(cross).astype(np.float32),
        }
    }
    params = init_mlp_proj(
        jax.random.PRNGKey(0), id_dim=id_dim, cross_dim=cross, num_tokens=tokens
    )
    n = convert_mlp_proj(params, sd)
    assert n == 6
    x = rng.randn(2, id_dim).astype(np.float32)
    got = np.asarray(mlp_proj(params, x))
    # manual torch-layout forward
    p = sd["image_proj"]
    import math

    h = x @ p["proj.0.weight"].T + p["proj.0.bias"]
    h = 0.5 * h * (1.0 + np.vectorize(math.erf)(h / np.sqrt(2.0)))
    h = (h @ p["proj.2.weight"].T + p["proj.2.bias"]).reshape(2, tokens, cross)
    mu = h.mean(-1, keepdims=True)
    var = h.var(-1, keepdims=True)
    want = (h - mu) / np.sqrt(var + 1e-5) * p["norm.weight"] + p["norm.bias"]
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_convert_mlp_proj_shape_mismatch_raises():
    from musev_tpu.models.ip_adapter import init_mlp_proj

    params = init_mlp_proj(jax.random.PRNGKey(0), id_dim=8, cross_dim=6, num_tokens=4)
    bad = {"image_proj": {"proj.0.weight": np.zeros((32, 16), np.float32)}}
    with pytest.raises(ValueError, match="shape"):
        convert_mlp_proj(params, bad)


def test_embedding_shape_mismatch_raises():
    """The raw/embedding converter branch must reject wrong-vocab tables
    instead of silently installing them."""
    from musev_tpu.models.clip_text import CLIPTextConfig, init_clip_text

    cfg = CLIPTextConfig(vocab_size=100, hidden_size=16, num_layers=1,
                         intermediate_size=32)
    params = init_clip_text(jax.random.PRNGKey(0), cfg)
    sd = {"text_model.embeddings.token_embedding.weight":
          np.zeros((200, 16), np.float32)}
    with pytest.raises(ValueError, match="shape"):
        convert_clip_text(params, cfg, sd)
