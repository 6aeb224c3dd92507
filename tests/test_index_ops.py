import jax.numpy as jnp
import numpy as np

from musev_tpu.ops import index_ops


def test_take_frames():
    x = jnp.arange(2 * 5 * 3).reshape(2, 5, 3)
    out = index_ops.take_frames(x, [0, 2], axis=1)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x)[:, [0, 2]])


def test_splice_with_index_roundtrip():
    b, t, h, w, c = 2, 6, 4, 4, 3
    rng = np.random.RandomState(0)
    full = rng.randn(b, t, h, w, c).astype(np.float32)
    cond_idx = [0, 3]
    gen_idx = [1, 2, 4, 5]
    cond = full[:, cond_idx]
    gen = full[:, gen_idx]
    out = index_ops.splice_with_index(
        jnp.asarray(cond), cond_idx, jnp.asarray(gen), gen_idx, axis=1
    )
    np.testing.assert_allclose(np.asarray(out), full, rtol=1e-6)


def test_splice_then_take_inverts():
    cond = jnp.ones((1, 2, 2, 2, 1))
    gen = jnp.zeros((1, 3, 2, 2, 1))
    out = index_ops.splice_with_index(cond, [0, 4], gen, [1, 2, 3], axis=1)
    assert out.shape == (1, 5, 2, 2, 1)
    np.testing.assert_array_equal(
        np.asarray(index_ops.take_frames(out, [0, 4], axis=1)), np.asarray(cond)
    )
    np.testing.assert_array_equal(
        np.asarray(index_ops.take_frames(out, [1, 2, 3], axis=1)), np.asarray(gen)
    )


def test_frame_mask():
    m = index_ops.frame_mask(5, [0, 2])
    np.testing.assert_array_equal(np.asarray(m), [0.0, 1.0, 0.0, 1.0, 1.0])


def test_align_repeat():
    x = jnp.asarray(np.arange(6).reshape(2, 3))
    out = index_ops.align_repeat(x, 4, axis=0)
    np.testing.assert_array_equal(
        np.asarray(out), [[0, 1, 2], [0, 1, 2], [3, 4, 5], [3, 4, 5]]
    )
    out = index_ops.align_repeat(x, 1, axis=0)
    np.testing.assert_array_equal(np.asarray(out), [[0, 1, 2]])
    out = index_ops.align_repeat(x, 2, axis=0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_fuse_part_tensor():
    src = jnp.ones((1, 4, 1)) * 10.0
    dst = jnp.zeros((1, 6, 1))
    out = index_ops.fuse_part_tensor(src, dst, overlap=2, weight=0.5, skip_step=1)
    expect = np.zeros((1, 6, 1))
    expect[:, 1:3] = 5.0
    np.testing.assert_allclose(np.asarray(out), expect)
    out0 = index_ops.fuse_part_tensor(src, dst, overlap=0)
    np.testing.assert_array_equal(np.asarray(out0), np.asarray(dst))
