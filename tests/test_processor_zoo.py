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


# -- SAM automatic masks + face_detector (io/sam.py) -------------------------


class _FakeSamEncoder:
    """Records the preprocessed input; returns a tiny 'embedding'."""

    input_names = ["x"]

    def __init__(self, size=64):
        self.size = size
        self.last = None

    def run(self, feeds):
        x = feeds["x"]
        self.last = x
        assert x.shape == (1, 3, self.size, self.size)
        return [np.zeros((1, 256, self.size // 16, self.size // 16), np.float32)]


class _FakeSamDecoder:
    """Disk of logits around the prompt point, scaled to orig size.

    Points in the left half get high predicted IoU; right half low (to
    exercise the pred_iou filter). A point in the top-left corner yields an
    unstable ring (to exercise the stability filter).
    """

    input_names = [
        "image_embeddings", "point_coords", "point_labels", "mask_input",
        "has_mask_input", "orig_im_size",
    ]

    def __init__(self, enc_size=64):
        self.enc_size = enc_size

    def run(self, feeds):
        px, py = feeds["point_coords"][0, 0]
        h, w = feeds["orig_im_size"].astype(int)
        scale = max(h, w) / self.enc_size
        cx, cy = px * scale, py * scale
        ys, xs = np.mgrid[:h, :w].astype(np.float32)
        r = np.hypot(xs - cx, ys - cy)
        if px < 4 and py < 4:
            # unstable: logits hug the threshold so +/-1 moves the area a lot
            logits = 0.9 - 0.05 * r
            iou = 0.99
        else:
            logits = 50.0 * (8.0 - r)  # crisp disk of radius 8
            iou = 0.95 if px < self.enc_size / 2 else 0.2
        return [logits[None, None], np.array([[iou]], np.float32), logits]


def test_sam_automatic_masks():
    from musev_tpu.io.sam import SamAutomaticMaskProcessor

    enc = _FakeSamEncoder()
    proc = SamAutomaticMaskProcessor(
        enc, _FakeSamDecoder(), encoder_size=64, points_per_side=4,
        min_mask_area=4, seed=7,
    )
    frames = (np.random.RandomState(2).rand(2, 48, 64, 3) * 255).astype(np.uint8)
    out = proc(frames)
    assert out.shape == frames.shape and out.dtype == np.uint8
    # left-half points (iou 0.95) painted; right-half (iou 0.2) filtered:
    # some color on the left, black on the far right
    assert out[0, :, :24].any()
    assert not out[0, :, 56:].any()
    # deterministic palette: identical frames -> identical maps
    np.testing.assert_array_equal(out[0], out[1])
    # encoder saw an ImageNet-normalized, bottom-right padded input
    assert enc.last is not None and enc.last.dtype == np.float32


def test_sam_filters_and_preprocess():
    from musev_tpu.io.sam import (
        SamAutomaticMaskProcessor, build_point_grid, sam_preprocess,
        stability_score,
    )

    # stability: crisp step -> 1.0; shallow slope -> < 1
    crisp = np.where(np.arange(100) < 50, 10.0, -10.0)
    assert stability_score(crisp, 0.0, 1.0) == 1.0
    shallow = 1.0 - 0.02 * np.arange(100)
    assert stability_score(shallow, 0.0, 1.0) < 0.95

    # preprocess: long side -> encoder_size, pad to square, (h, w) returned
    frame = (np.random.RandomState(0).rand(30, 60, 3) * 255).astype(np.uint8)
    inp, (nh, nw) = sam_preprocess(frame, 64)
    assert inp.shape == (1, 3, 64, 64) and (nh, nw) == (32, 64)
    assert np.abs(inp[0, :, nh:, :]).max() == 0  # pad region zero

    # grid covers the un-padded region only
    grid = build_point_grid(4, (32, 64))
    assert grid.shape == (16, 2)
    assert grid[:, 0].max() < 64 and grid[:, 1].max() < 32

    # unknown decoder input names raise with the contract message
    class BadDecoder(_FakeSamDecoder):
        input_names = ["image_embeddings", "mystery"]

    proc = SamAutomaticMaskProcessor(
        _FakeSamEncoder(), BadDecoder(), encoder_size=64, points_per_side=2
    )
    with pytest.raises(ValueError, match="unrecognized inputs"):
        proc(np.zeros((1, 16, 16, 3), np.uint8))


def test_face_detector_boxes():
    from musev_tpu.io.sam import FaceDetectorProcessor

    class FakeDet:
        """yolox-format raw head: one confident box at image center."""

        input_names = ["images"]

        def run(self, feeds):
            x = feeds["images"]
            assert x.shape == (1, 3, 64, 64)
            n = (64 // 8) ** 2 + (64 // 16) ** 2 + (64 // 32) ** 2
            raw = np.zeros((1, n, 6), np.float32)
            # stride-8 grid cell (4, 4) -> center (32+dx, 32+dy)
            idx = 4 * 8 + 4
            raw[0, idx] = [0.0, 0.0, np.log(2.0), np.log(2.0), 0.9, 0.9]
            return [raw]

    proc = FaceDetectorProcessor(FakeDet(), input_size=(64, 64))
    frames = np.zeros((1, 64, 64, 3), np.uint8)
    out = proc(frames)
    assert out.shape == frames.shape
    # a filled white box: center (4*8, 4*8)=(32, 32), wh=exp(log 2)*8=16
    assert (out[0, 24:40, 24:40] == 255).all()
    assert not out[0, :16, :16].any()
    assert not out[0, 48:, 48:].any()


def test_sam_face_registration():
    """All 26 reference names resolve given registered models."""
    from musev_tpu.io.processors import _REGISTRY, register_processor
    from musev_tpu.io.dwpose import _DWPOSE_VARIANTS
    from musev_tpu.io.sam import FaceDetectorProcessor, SamAutomaticMaskProcessor

    sam = SamAutomaticMaskProcessor(_FakeSamEncoder(), _FakeSamDecoder())
    for name in ("sam", "mobile_sam"):
        register_processor(name, sam)
    register_processor("face_detector", FaceDetectorProcessor(None))
    reference_names = [
        "pose", "pose_body", "pose_hand", "pose_face", "pose_hand_body",
        "pose_hand_face", "dwpose", "dwpose_face", "dwpose_hand",
        "dwpose_body", "dwpose_body_hand", "canny", "tile", "hed",
        "hed_scribble", "depth", "pidi", "normal_bae", "lineart",
        "lineart_anime", "zoe", "sam", "mobile_sam", "leres", "content",
        "face_detector",
    ]  # mmcm controlnet.py:513 via README.md:403-406
    from musev_tpu.io.processors import _NAME_TO_KIND

    for name in reference_names:
        assert (
            name in _REGISTRY
            or name in _DWPOSE_VARIANTS
            or name in _NAME_TO_KIND
        ), name
