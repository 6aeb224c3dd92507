"""Direct-import parity vs the reference's ACTUAL pure modules.

VERDICT r4 item 5(b): earlier golden tests compared against torch modules
rebuilt from documented semantics; these import the reference's own code
(`/root/reference/musev/...`) and call it, so a behavior drift in our
re-implementation fails against the real thing, not our reading of it.

Only the reference's pure layers are importable without its heavy deps:
``data_util`` and ``timesteps_util`` import clean; ``noise_util`` and
``text_emb_util`` need a 20-line stub of the two diffusers symbols they
touch at module scope (randn_tensor / DiffusionPipeline), provided here
without importing any reference behavior.
"""

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"


def _install_diffusers_stub():
    """Minimal stand-ins for the diffusers symbols the reference's pure
    modules import at module scope (noise_util: randn_tensor;
    text_emb_util: DiffusionPipeline / TextualInversionLoaderMixin).
    Only installed if diffusers is absent from the env."""
    try:
        # the reference ships an EMPTY diffusers/ submodule dir that imports
        # as a namespace package — probe for the actual symbol, not the name
        from diffusers.utils.torch_utils import randn_tensor  # noqa: F401
        return
    except ImportError:
        for name in [m for m in sys.modules if m.split(".")[0] == "diffusers"]:
            del sys.modules[name]

    def randn_tensor(shape, generator=None, device=None, dtype=None):
        if isinstance(generator, list):
            return torch.cat(
                [torch.randn(shape, generator=g, dtype=dtype)
                 for g in generator]
            )
        return torch.randn(shape, generator=generator, dtype=dtype)

    root = types.ModuleType("diffusers")
    root.DiffusionPipeline = type("DiffusionPipeline", (), {})
    utils = types.ModuleType("diffusers.utils")
    torch_utils = types.ModuleType("diffusers.utils.torch_utils")
    torch_utils.randn_tensor = randn_tensor
    utils.torch_utils = torch_utils
    loaders = types.ModuleType("diffusers.loaders")
    loaders.TextualInversionLoaderMixin = type(
        "TextualInversionLoaderMixin", (), {}
    )
    root.utils = utils
    root.loaders = loaders
    sys.modules["diffusers"] = root
    sys.modules["diffusers.utils"] = utils
    sys.modules["diffusers.utils.torch_utils"] = torch_utils
    sys.modules["diffusers.loaders"] = loaders


@pytest.fixture(scope="module")
def ref():
    """The reference's pure modules, imported directly."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    _install_diffusers_stub()
    import musev.data.data_util as data_util
    import musev.utils.noise_util as noise_util
    import musev.utils.timesteps_util as timesteps_util

    return types.SimpleNamespace(
        data_util=data_util,
        noise_util=noise_util,
        timesteps_util=timesteps_util,
    )


# -- timesteps_util: guidance schedules ----------------------------------


@pytest.mark.parametrize("method", ["linear", "two_stage", "three_stage",
                                    "fix_two_stage"])
@pytest.mark.parametrize("start,stop,num", [(3.5, 7.5, 10), (7.5, 2.0, 7),
                                            (5.0, 5.0, 4)])
def test_guidance_schedule_matches_reference(ref, method, start, stop, num):
    from musev_tpu.ops.guidance import guidance_schedule

    want = ref.timesteps_util.generate_parameters_with_timesteps(
        start=start, num=num, stop=stop, method=method, n_fix_start=3
    )
    got = guidance_schedule(start, num, stop=stop, method=method,
                            n_fix_start=3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want, np.float32),
                               atol=1e-6)


# -- data_util: index algebra --------------------------------------------


def test_take_frames_matches_batch_index_select(ref):
    from musev_tpu.ops.index_ops import take_frames

    x = np.random.default_rng(0).standard_normal((2, 5, 7, 3, 4)).astype(
        np.float32
    )
    idx = [3, 0, 4]
    for dim in (1, 2):
        want = ref.data_util.batch_index_select(
            torch.from_numpy(x), dim=dim, index=torch.LongTensor(idx)
        ).numpy()
        got = np.asarray(take_frames(jnp.asarray(x), idx, axis=dim))
        np.testing.assert_allclose(got, want, atol=0)


def test_splice_matches_concat_two_tensor_with_index(ref):
    from musev_tpu.ops.index_ops import splice_with_index

    rng = np.random.default_rng(1)
    d1 = rng.standard_normal((2, 3, 4, 4, 2)).astype(np.float32)
    d2 = rng.standard_normal((2, 2, 4, 4, 2)).astype(np.float32)
    i1, i2 = [0, 2, 4], [1, 3]
    want = ref.data_util.concat_two_tensor_with_index(
        torch.from_numpy(d1), torch.LongTensor(i1),
        torch.from_numpy(d2), torch.LongTensor(i2), dim=1,
    ).numpy()
    got = np.asarray(
        splice_with_index(jnp.asarray(d1), i1, jnp.asarray(d2), i2, axis=1)
    )
    np.testing.assert_allclose(got, want, atol=0)


@pytest.mark.parametrize("src_len,target", [(2, 6), (6, 4), (3, 3), (5, 7)])
def test_align_repeat_matches_reference(ref, src_len, target):
    from musev_tpu.ops.index_ops import align_repeat

    x = np.random.default_rng(2).standard_normal((src_len, 3, 4)).astype(
        np.float32
    )
    want = ref.data_util.align_repeat_tensor_single_dim(
        torch.from_numpy(x), target, dim=0
    ).numpy()
    got = np.asarray(align_repeat(jnp.asarray(x), target, axis=0))
    np.testing.assert_allclose(got, want, atol=0)


def test_fuse_part_tensor_matches_reference(ref):
    from musev_tpu.ops.index_ops import fuse_part_tensor

    rng = np.random.default_rng(3)
    # reference layout is b c t h w with the time axis at 2
    src = rng.standard_normal((1, 4, 6, 2, 2)).astype(np.float32)
    dst = rng.standard_normal((1, 4, 6, 2, 2)).astype(np.float32)
    for overlap, weight, skip in [(2, 0.5, 0), (3, 0.25, 1), (0, 0.5, 0)]:
        want = ref.data_util.fuse_part_tensor(
            torch.from_numpy(src), torch.from_numpy(dst.copy()),
            overlap, weight=weight, skip_step=skip,
        ).numpy()
        got = np.asarray(
            fuse_part_tensor(jnp.asarray(src), jnp.asarray(dst), overlap,
                             weight=weight, skip_step=skip, axis=2)
        )
        np.testing.assert_allclose(got, want, atol=1e-6)


# -- data_util: AdaIN (including the upstream quirks we must mirror) -----


def test_reference_adain_statistic_swap_documented(ref):
    """The reference's adaptive_instance_normalization unpacks
    ``mean_acc, var_acc = torch.var_mean(dst, ...)`` — var_mean returns
    (var, mean), so its dst statistics are SWAPPED (data_util.py:522).
    Our ops.adain implements the correct form. This test pins both facts
    against the real code: the reference output equals our adain only
    after emulating the swap, and differs from the correct form."""
    from musev_tpu.ops.adain import adain

    rng = np.random.default_rng(4)
    src = (3 * rng.standard_normal((2, 4, 3, 5, 5)) + 1).astype(np.float32)
    dst = (2 * rng.standard_normal((2, 4, 3, 5, 5)) - 1).astype(np.float32)
    want = ref.data_util.adaptive_instance_normalization(
        torch.from_numpy(src), torch.from_numpy(dst)
    ).numpy()

    # emulate upstream's swap in numpy: std_acc=sqrt(max(mean,eps)),
    # shift=var
    eps = 1e-6
    axes = (2, 3, 4)
    mean = src.mean(axes, keepdims=True)
    std = np.sqrt(np.maximum(src.var(axes, keepdims=True), eps))
    swapped_shift = dst.var(axes, keepdims=True)
    swapped_scale = np.sqrt(np.maximum(dst.mean(axes, keepdims=True), eps))
    emulated = ((src - mean) / std) * swapped_scale + swapped_shift
    np.testing.assert_allclose(want, emulated, atol=1e-4, rtol=1e-4)

    # our adain (B,T,H,W,C layout) implements the CORRECT statistics; it
    # must differ from the reference's swapped ones on this data
    ours = np.asarray(
        adain(jnp.asarray(src.transpose(0, 2, 3, 4, 1)),
              jnp.asarray(dst.transpose(0, 2, 3, 4, 1)))
    ).transpose(0, 4, 1, 2, 3)
    assert np.abs(ours - want).max() > 1e-2


def test_reference_adain_4d_noop_documented(ref):
    """batch_adain_conditioned_tensor discards its result for 4-D inputs
    (data_util.py:600-601 rearranges ``tensor`` instead of ``src``) — the
    basis for our default ``adain_fix=False`` skipping the compute. Pin it
    against the real code."""
    einops = pytest.importorskip("einops")
    rng = np.random.default_rng(5)
    bt, c, h, w = 6, 4, 3, 3
    x = rng.standard_normal((bt, c, h, w)).astype(np.float32)
    out = ref.data_util.batch_adain_conditioned_tensor(
        torch.from_numpy(x.copy()), num_frames=3,
        src_index=torch.LongTensor([1, 2]),
        dst_index=torch.LongTensor([0]),
    )
    np.testing.assert_allclose(np.asarray(out), x, atol=0)


# -- noise_util: video_fusion_noise --------------------------------------


def test_video_fusion_noise_matches_reference_mixing(ref):
    """Same (common, ind) draws through both implementations must agree
    exactly: drive the reference with fixed torch draws via
    initial_common_noise + a seeded generator, then rebuild the exact same
    draws and apply our mixing identity. Pins sqrt-weights and broadcast
    semantics to the reference's actual code, not our reading of it."""
    w = 0.3
    shape = (2, 4, 5, 3, 3)  # reference layout b c t h w
    common = torch.randn(
        (shape[0], shape[1], 1, shape[3], shape[4]),
        generator=torch.Generator().manual_seed(7),
    )
    gen = torch.Generator().manual_seed(11)
    want = ref.noise_util.video_fusion_noise(
        shape=shape, dtype=torch.float32, device="cpu", w_ind_noise=w,
        generator=gen, initial_common_noise=common,
    ).numpy()
    # the reference consumed `gen` only for the individual draw; replay it
    ind = torch.randn(shape, generator=torch.Generator().manual_seed(11))
    ours = (
        jnp.sqrt(1.0 - jnp.float32(w)) * jnp.asarray(common.numpy())
        + jnp.sqrt(jnp.float32(w)) * jnp.asarray(ind.numpy())
    )
    np.testing.assert_allclose(np.asarray(ours), want, atol=1e-6)

    # and our video_fusion_noise uses the identical mixing law: given the
    # same pinned common component, the residual (out - sqrt(1-w)*common)
    # must be N(0, w) i.i.d. per frame
    from musev_tpu.ops.noise import video_fusion_noise

    key = jax.random.PRNGKey(0)
    big = (1, 8, 64, 64, 4)
    cm = jnp.zeros((1, 1, 64, 64, 4))
    out = video_fusion_noise(key, big, w_ind_noise=w,
                             initial_common_noise=cm)
    # with common pinned to zero the output IS sqrt(w) * ind
    assert abs(float(jnp.var(out)) - w) < 0.01
    # inter-frame correlation of the fused field ~ (1-w) when common drawn
    out2 = video_fusion_noise(key, big, w_ind_noise=w)
    f = np.asarray(out2)[0].reshape(8, -1)
    corr = np.corrcoef(f)[np.triu_indices(8, 1)]
    assert abs(corr.mean() - (1 - w)) < 0.05


# -- text_emb_util: the A1111 prompt grammar -----------------------------


def test_parse_prompt_attention_matches_reference():
    """Our parser is a disclosed port of the community grammar the
    reference vendored (text_emb_util.py:32-115); run the reference's
    actual parser over the grammar's corner cases and diff."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    _install_diffusers_stub()
    try:
        import musev.utils.text_emb_util as teu
    except Exception as e:  # stub too thin for this module on this env
        pytest.skip(f"text_emb_util not importable: {e}")
    from musev_tpu.utils.text_emb import parse_prompt_attention

    cases = [
        "a (red) cat",
        "a ((red)) cat",
        "a (red:1.3) cat [blue] dog",
        "\\(escaped\\) (nested (weights:1.2))",
        "(a:2.0) AND plain text",
        "trailing (open",
        "]stray close[",
        "",
    ]
    for text in cases:
        assert parse_prompt_attention(text) == teu.parse_prompt_attention(
            text
        ), text
