"""Broadened controlnet processor zoo: ONNX-backed depth/hed/scribble/
lineart kinds, tile, and the pose render family (reference name list:
mmcm controlnet.py:513, README.md:403-406)."""

import numpy as np
import pytest

from musev_tpu.io.processors import (
    OnnxImageProcessor,
    get_processor,
    register_onnx_processor,
    tile_video,
)
from musev_tpu.onnx.proto import Graph, Model, Node, save_model
from musev_tpu.onnx.runtime import OnnxModel


def _mean_channel_model():
    """NCHW (1,3,H,W) float -> (1,1,H,W): channel mean via 1x1 conv."""
    w = np.full((1, 3, 1, 1), 1.0 / 3.0, np.float32)
    g = Graph(
        [Node("Conv", ["x", "w"], ["y"], {})],
        {"w": w},
        [("x", [1, 3, 0, 0])],
        ["y"],
        "g",
    )
    return Model(g, opset=13)


FRAMES = (np.random.RandomState(0).rand(2, 40, 48, 3) * 255).astype(np.uint8)


def test_depth_kind_minmax_golden():
    proc = OnnxImageProcessor(
        OnnxModel(_mean_channel_model()), "depth", input_size=None,
        multiple_of=8,
    )
    out = proc(FRAMES)
    assert out.shape == FRAMES.shape and out.dtype == np.uint8
    # golden: reproduce the pipeline in numpy for frame 0
    f = FRAMES[0]
    x = (f.astype(np.float32) / 255.0 - 0.5) / 0.5
    y = x.mean(axis=-1)
    y = (y - y.min()) / (y.max() - y.min())
    np.testing.assert_allclose(
        out[0, ..., 0].astype(np.int32),
        (y * 255).astype(np.uint8).astype(np.int32), atol=1,
    )
    # grayscale map replicated across channels
    np.testing.assert_array_equal(out[..., 0], out[..., 1])


def test_hed_unit_and_scribble_binary():
    m = OnnxModel(_mean_channel_model())
    hed = OnnxImageProcessor(m, "hed", multiple_of=8)
    out = hed(FRAMES)
    # raw 0-255 input, channel mean, clipped to [0,1] -> saturates at 255
    f = FRAMES[0].astype(np.float32).mean(axis=-1)
    expect = (np.clip(f, 0, 1.0) * 255).astype(np.uint8)
    np.testing.assert_array_equal(out[0, ..., 0], expect)

    scr = OnnxImageProcessor(m, "scribble", multiple_of=8, threshold=0.5)
    o2 = scr(FRAMES)
    assert set(np.unique(o2)).issubset({0, 255})


def test_lineart_invert():
    m = OnnxModel(_mean_channel_model())
    la = OnnxImageProcessor(m, "lineart", multiple_of=8)
    out = la(FRAMES)
    f = FRAMES[0].astype(np.float32) / 255.0  # mean=0, std=1 normalization
    y = np.clip(f.mean(axis=-1), 0, 1)
    np.testing.assert_allclose(
        out[0, ..., 0].astype(np.int32),
        ((1.0 - y) * 255).astype(np.uint8).astype(np.int32),
        atol=1,  # f32 conv vs f64 numpy rounding
    )


def test_resize_roundtrip_and_multiple_of():
    """input_size caps the long side; the map resizes back to source."""
    proc = OnnxImageProcessor(
        OnnxModel(_mean_channel_model()), "depth", input_size=32,
        multiple_of=16,
    )
    frames = (np.random.RandomState(1).rand(1, 100, 60, 3) * 255).astype(np.uint8)
    out = proc(frames)
    assert out.shape == frames.shape


def test_register_onnx_processor_by_name(tmp_path):
    path = str(tmp_path / "midas.onnx")
    save_model(_mean_channel_model(), path)
    register_onnx_processor("depth", path)
    proc = get_processor("depth")
    assert isinstance(proc, OnnxImageProcessor) and proc.kind == "depth"
    register_onnx_processor("hed", path)
    register_onnx_processor("lineart", path)
    register_onnx_processor("hed_scribble", path)
    with pytest.raises(ValueError, match="cannot infer"):
        register_onnx_processor("mystery", path)
    # the zoo now covers >= 5 of the reference's headline names
    from musev_tpu.io.processors import _REGISTRY

    assert {"none", "canny", "tile", "depth", "hed", "lineart",
            "hed_scribble"} <= set(_REGISTRY)


def test_tile_blur():
    out = tile_video(FRAMES)
    assert out.shape == FRAMES.shape and out.dtype == np.uint8
    # low-pass: variance drops, mean roughly preserved
    assert out.astype(np.float32).var() < FRAMES.astype(np.float32).var()
    assert abs(out.mean() - FRAMES.astype(np.float32).mean()) < 8.0


def test_content_shuffle():
    from musev_tpu.io.processors import content_shuffle_video

    out = content_shuffle_video(FRAMES, seed=3)
    assert out.shape == FRAMES.shape and out.dtype == np.uint8
    # deterministic under a fixed seed
    np.testing.assert_array_equal(out, content_shuffle_video(FRAMES, seed=3))
    # one flow shared across the clip: identical frames map identically
    same = np.stack([FRAMES[0], FRAMES[0]])
    o = content_shuffle_video(same, seed=1)
    np.testing.assert_array_equal(o[0], o[1])
    # content preserved, structure destroyed: mean close, layout changed
    assert abs(out.mean() - FRAMES.astype(np.float32).mean()) < 16.0
    assert np.abs(out.astype(np.int32) - FRAMES.astype(np.int32)).mean() > 1.0


def test_normal_bae_kind():
    """3-channel ONNX output rendered as a unit-normal RGB map."""

    class Identity3:
        input_names = ["x"]

        def run(self, feeds):
            return [feeds["x"]]

    proc = OnnxImageProcessor(Identity3(), "normal", input_size=None,
                              multiple_of=8)
    out = proc(FRAMES)
    assert out.shape == FRAMES.shape and out.dtype == np.uint8
    # golden for frame 0: imagenet-normalize, unit-normalize, (n+1)/2
    f = FRAMES[0].astype(np.float32) / 255.0
    x = (f - np.array([0.485, 0.456, 0.406], np.float32)) / np.array(
        [0.229, 0.224, 0.225], np.float32
    )
    v = x.transpose(2, 0, 1)
    n = v / np.maximum(np.linalg.norm(v, axis=0, keepdims=True), 1e-6)
    expect = ((n + 1.0) * 0.5 * 255.0).astype(np.uint8).transpose(1, 2, 0)
    np.testing.assert_array_equal(out[0], expect)

    from musev_tpu.io.processors import _NAME_TO_KIND

    assert _NAME_TO_KIND["normal_bae"] == "normal"


def test_content_registered():
    from musev_tpu.io.processors import _REGISTRY

    assert "content" in _REGISTRY


def test_pose_family_variants_registered():
    from musev_tpu.io.dwpose import _DWPOSE_VARIANTS

    for name in ("pose", "pose_body", "pose_hand", "pose_face",
                 "pose_hand_body", "pose_hand_face"):
        assert name in _DWPOSE_VARIANTS
    assert _DWPOSE_VARIANTS["pose"] == dict(
        include_body=True, include_hand=False, include_face=False
    )
    assert _DWPOSE_VARIANTS["pose_hand_face"] == dict(
        include_body=False, include_hand=True, include_face=True
    )
