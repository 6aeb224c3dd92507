"""First-party ONNX layer: protobuf round-trip, op lowering vs numpy,
dwpose pre/post stages and rendering goldens."""

import numpy as np
import pytest

from musev_tpu.onnx.proto import Graph, Model, Node, encode_model, parse_model
from musev_tpu.onnx.runtime import OnnxModel


def make_model(nodes, inits, inputs, outputs, opset=13):
    return Model(Graph(nodes, inits, inputs, outputs, "g"), opset=opset)


def test_proto_roundtrip():
    w = np.arange(12, dtype=np.float32).reshape(3, 4)
    m = make_model(
        [Node("MatMul", ["x", "w"], ["y"], {}),
         Node("Relu", ["y"], ["z"], {}, "act")],
        {"w": w},
        [("x", [2, 3])],
        ["z"],
    )
    m2 = parse_model(encode_model(m))
    assert [n.op_type for n in m2.graph.nodes] == ["MatMul", "Relu"]
    assert m2.graph.nodes[0].inputs == ["x", "w"]
    np.testing.assert_array_equal(m2.graph.initializers["w"], w)
    assert m2.graph.inputs == [("x", [2, 3])]
    assert m2.graph.outputs == ["z"]
    assert m2.opset == 13


def test_proto_attribute_kinds():
    t = np.ones((2, 2), np.int64)
    m = make_model(
        [Node("X", [], ["o"], {
            "f": 2.5, "i": -3, "s": b"abc", "t": t,
            "floats": [1.0, 2.0], "ints": [4, 5, 6],
        })],
        {}, [], ["o"],
    )
    n = parse_model(encode_model(m)).graph.nodes[0]
    assert n.attrs["f"] == pytest.approx(2.5)
    assert n.attrs["i"] == -3
    assert n.attrs["s"] == b"abc"
    np.testing.assert_array_equal(n.attrs["t"], t)
    assert n.attrs["floats"] == [1.0, 2.0]
    assert n.attrs["ints"] == [4, 5, 6]


def _run1(node, inits, feeds, outputs=("y",), opset=13):
    inputs = [(k, list(v.shape)) for k, v in feeds.items()]
    m = make_model([node], inits, inputs, list(outputs), opset)
    return OnnxModel(m).run(feeds)


def test_conv_vs_torch():
    torch = pytest.importorskip("torch")
    rs = np.random.RandomState(0)
    x = rs.randn(1, 3, 16, 16).astype(np.float32)
    w = rs.randn(8, 3, 3, 3).astype(np.float32)
    b = rs.randn(8).astype(np.float32)
    (y,) = _run1(
        Node("Conv", ["x", "w", "b"], ["y"],
             {"kernel_shape": [3, 3], "strides": [2, 2], "pads": [1, 1, 1, 1]}),
        {"w": w, "b": b}, {"x": x},
    )
    ref = torch.nn.functional.conv2d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
        stride=2, padding=1,
    ).numpy()
    np.testing.assert_allclose(y, ref, atol=1e-4)


def test_grouped_conv_and_bn():
    torch = pytest.importorskip("torch")
    rs = np.random.RandomState(1)
    x = rs.randn(1, 4, 8, 8).astype(np.float32)
    w = rs.randn(4, 2, 3, 3).astype(np.float32)
    scale = rs.rand(4).astype(np.float32) + 0.5
    bias = rs.randn(4).astype(np.float32)
    mean = rs.randn(4).astype(np.float32)
    var = rs.rand(4).astype(np.float32) + 0.5
    m = make_model(
        [Node("Conv", ["x", "w"], ["c"],
              {"kernel_shape": [3, 3], "pads": [1, 1, 1, 1], "group": 2}),
         Node("BatchNormalization", ["c", "s", "b", "m", "v"], ["y"],
              {"epsilon": 1e-5})],
        {"w": w, "s": scale, "b": bias, "m": mean, "v": var},
        [("x", [1, 4, 8, 8])], ["y"],
    )
    (y,) = OnnxModel(m).run({"x": x})
    c = torch.nn.functional.conv2d(
        torch.from_numpy(x), torch.from_numpy(w), padding=1, groups=2
    )
    ref = torch.nn.functional.batch_norm(
        c, torch.from_numpy(mean), torch.from_numpy(var),
        torch.from_numpy(scale), torch.from_numpy(bias), eps=1e-5,
    ).numpy()
    np.testing.assert_allclose(y, ref, atol=1e-4)


def test_maxpool_ceil_and_avgpool():
    torch = pytest.importorskip("torch")
    rs = np.random.RandomState(2)
    x = rs.randn(1, 2, 7, 7).astype(np.float32)
    (y,) = _run1(
        Node("MaxPool", ["x"], ["y"],
             {"kernel_shape": [3, 3], "strides": [2, 2], "ceil_mode": 1}),
        {}, {"x": x},
    )
    ref = torch.nn.functional.max_pool2d(
        torch.from_numpy(x), 3, 2, ceil_mode=True
    ).numpy()
    np.testing.assert_allclose(y, ref, atol=1e-5)
    (y2,) = _run1(
        Node("AveragePool", ["x"], ["y"],
             {"kernel_shape": [2, 2], "strides": [2, 2]}),
        {}, {"x": x},
    )
    ref2 = torch.nn.functional.avg_pool2d(torch.from_numpy(x), 2, 2).numpy()
    np.testing.assert_allclose(y2, ref2, atol=1e-5)


def test_shape_algebra_folds_static():
    """Shape -> Gather -> Concat -> Reshape chains must keep static shapes
    (the torch-export idiom)."""
    x = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    m = make_model(
        [
            Node("Shape", ["x"], ["sh"], {}),
            Node("Gather", ["sh", "i0"], ["d0"], {"axis": 0}),
            Node("Unsqueeze", ["d0", "ax"], ["d0u"], {}),
            Node("Concat", ["d0u", "minus1"], ["newshape"], {"axis": 0}),
            Node("Reshape", ["x", "newshape"], ["y"], {}),
        ],
        {
            "i0": np.asarray(0, np.int64),
            "ax": np.asarray([0], np.int64),
            "minus1": np.asarray([-1], np.int64),
        },
        [("x", [2, 3, 4])], ["y"],
    )
    (y,) = OnnxModel(m).run({"x": x})
    np.testing.assert_array_equal(y, x.reshape(2, 12))


def test_resize_slice_concat_softmax():
    rs = np.random.RandomState(3)
    x = rs.randn(1, 2, 4, 4).astype(np.float32)
    (y,) = _run1(
        Node("Resize", ["x", "", "scales"], ["y"], {"mode": b"nearest"}),
        {"scales": np.asarray([1, 1, 2, 2], np.float32)}, {"x": x},
    )
    np.testing.assert_allclose(y, x.repeat(2, 2).repeat(2, 3), atol=1e-6)
    (s,) = _run1(
        Node("Slice", ["x", "st", "en", "ax", "sp"], ["y"], {}),
        {"st": np.asarray([1], np.int64), "en": np.asarray([3], np.int64),
         "ax": np.asarray([2], np.int64), "sp": np.asarray([1], np.int64)},
        {"x": x},
    )
    np.testing.assert_allclose(s, x[:, :, 1:3], atol=1e-6)
    (sm,) = _run1(Node("Softmax", ["x"], ["y"], {"axis": 1}), {}, {"x": x})
    e = np.exp(x - x.max(1, keepdims=True))
    np.testing.assert_allclose(sm, e / e.sum(1, keepdims=True), atol=1e-5)


def test_gemm_transb_split():
    rs = np.random.RandomState(4)
    a = rs.randn(2, 3).astype(np.float32)
    b = rs.randn(5, 3).astype(np.float32)
    c = rs.randn(5).astype(np.float32)
    (y,) = _run1(
        Node("Gemm", ["a", "b", "c"], ["y"], {"transB": 1}),
        {"b": b, "c": c}, {"a": a},
    )
    np.testing.assert_allclose(y, a @ b.T + c, atol=1e-5)
    x = rs.randn(1, 6, 4).astype(np.float32)
    m = make_model(
        [Node("Split", ["x"], ["p", "q"], {"axis": 1, "split": [2, 4]})],
        {}, [("x", [1, 6, 4])], ["p", "q"],
    )
    p, q = OnnxModel(m).run({"x": x})
    np.testing.assert_allclose(p, x[:, :2])
    np.testing.assert_allclose(q, x[:, 2:])


def test_silu_style_subgraph():
    """Sigmoid+Mul (how torch exports SiLU) end to end through a save/load."""
    import tempfile, os

    from musev_tpu.onnx.proto import save_model
    rs = np.random.RandomState(5)
    x = rs.randn(2, 8).astype(np.float32)
    m = make_model(
        [Node("Sigmoid", ["x"], ["s"], {}), Node("Mul", ["x", "s"], ["y"], {})],
        {}, [("x", [2, 8])], ["y"],
    )
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "m.onnx")
        save_model(m, p)
        om = OnnxModel.from_file(p)
        (y,) = om.run({"x": x})
    np.testing.assert_allclose(y, x / (1 + np.exp(-x)), atol=1e-5)
    assert om.input_names == ["x"]


# -- dwpose stages ---------------------------------------------------------------


def test_yolox_grid_decode_and_nms():
    from musev_tpu.io.dwpose import nms, yolox_grid_decode

    size = (64, 64)
    n = (64 // 8) ** 2 + (64 // 16) ** 2 + (64 // 32) ** 2
    raw = np.zeros((n, 6), np.float32)
    raw[:, 2:4] = 0.0  # exp(0)*stride = stride-sized boxes
    dec = yolox_grid_decode(raw, size)
    # first anchor: stride 8, grid (0,0) -> center (0,0), size 8x8
    np.testing.assert_allclose(dec[0, :4], [0, 0, 8, 8])
    # anchor at grid (1, 2) of stride 8 row-major: index 1*8+2
    np.testing.assert_allclose(dec[10, :4], [16, 8, 8, 8])
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]],
                     np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    keep = nms(boxes, scores, 0.5)
    assert keep == [0, 2]


def test_simcc_decode():
    from musev_tpu.io.dwpose import simcc_decode

    sx = np.zeros((1, 3, 20), np.float32)
    sy = np.zeros((1, 3, 30), np.float32)
    sx[0, 0, 10] = 1.0
    sy[0, 0, 6] = 0.9
    sx[0, 1, 4] = 0.2
    sy[0, 1, 8] = 0.4
    # keypoint 2 left at zero -> score 0 -> masked to -1
    k, s = simcc_decode(sx, sy, split_ratio=2.0)
    np.testing.assert_allclose(k[0, 0], [5.0, 3.0])
    assert s[0, 0] == pytest.approx(0.9)
    np.testing.assert_allclose(k[0, 1], [2.0, 4.0])
    assert (k[0, 2] == -1).all()


def test_wholebody_to_openpose_layout():
    from musev_tpu.io.dwpose import wholebody_to_openpose

    kpts = np.zeros((1, 133, 2), np.float32)
    scores = np.full((1, 133), 0.9, np.float32)
    kpts[0, 5] = [20, 40]   # left shoulder
    kpts[0, 6] = [60, 40]   # right shoulder
    kpts[0, 0] = [40, 10]   # nose
    pose = wholebody_to_openpose(kpts, scores, 100, 100)
    np.testing.assert_allclose(pose.bodies[0, 1], [0.4, 0.4])  # neck = mid
    np.testing.assert_allclose(pose.bodies[0, 0], [0.4, 0.1])  # nose
    np.testing.assert_allclose(pose.bodies[0, 2], [0.6, 0.4])  # r-shoulder
    assert pose.hands.shape == (2, 21, 2)
    assert pose.faces.shape == (1, 68, 2)


def test_render_pose_golden():
    from musev_tpu.io.dwpose import PoseResult, render_pose

    bodies = np.zeros((1, 18, 2), np.float32)
    scores = np.zeros((1, 18), np.float32)
    bodies[0, 2] = [0.25, 0.5]
    bodies[0, 3] = [0.75, 0.5]
    scores[0, 2] = scores[0, 3] = 1.0
    pose = PoseResult(
        bodies, scores,
        np.zeros((2, 21, 2), np.float32), np.zeros((2, 21), np.float32),
        np.zeros((1, 68, 2), np.float32), np.zeros((1, 68), np.float32),
    )
    canvas = render_pose(pose, 64, 64)
    assert canvas.shape == (64, 64, 3)
    # the limb between the two visible joints passes the canvas center
    assert canvas[32, 32].any()
    # corners stay black
    assert not canvas[0, 0].any() and not canvas[-1, -1].any()
    # rendering without any visible joints is all black
    empty = render_pose(
        PoseResult(bodies, np.zeros_like(scores),
                   pose.hands, pose.hand_scores, pose.faces, pose.face_scores),
        64, 64,
    )
    assert not empty.any()


def test_dwpose_processor_end_to_end_synthetic():
    """Full DWPoseProcessor over ONNX models authored first-party: a
    detector that always proposes one box and a pose net with fixed SimCC
    peaks. Exercises letterbox, grid decode, NMS, affine crop, SimCC decode
    and rendering in one pass."""
    from musev_tpu.io.dwpose import DWPoseProcessor

    # detector: input (1,3,640,640) -> (1, 8400, 6) constant logits.
    # Set one anchor (stride 32, grid (10,10)) to a confident person.
    n_anchors = 80 * 80 + 40 * 40 + 20 * 20
    det_out = np.full((1, n_anchors, 6), -20.0, np.float32)
    i = 80 * 80 + 40 * 40 + 10 * 20 + 10
    det_out[0, i] = [0.0, 0.0, np.log(10.0), np.log(10.0), 10.0, 10.0]
    det_out[0, i, 4] = 1.0  # objectness (already prob-like in export)
    det_out[0, i, 5] = 1.0
    det = OnnxModel(make_model(
        [Node("ReduceMean", ["img"], ["r"], {"keepdims": 0}),
         Node("Mul", ["r", "zero"], ["rz"], {}),
         Node("Add", ["out", "rz"], ["y"], {})],
        {"out": det_out, "zero": np.asarray(0.0, np.float32)},
        [("img", [1, 3, 640, 640])], ["y"],
    ))
    # pose: input (1,3,384,288) -> simcc_x (1,133,576), simcc_y (1,133,768)
    sx = np.zeros((1, 133, 576), np.float32)
    sy = np.zeros((1, 133, 768), np.float32)
    sx[0, :, 288] = 5.0  # all keypoints at crop center x
    sy[0, :, 384] = 5.0
    pose = OnnxModel(make_model(
        [Node("ReduceMean", ["img"], ["r"], {"keepdims": 0}),
         Node("Mul", ["r", "zero"], ["rz"], {}),
         Node("Add", ["sx0", "rz"], ["simcc_x"], {}),
         Node("Add", ["sy0", "rz"], ["simcc_y"], {})],
        {"sx0": sx, "sy0": sy, "zero": np.asarray(0.0, np.float32)},
        [("img", [1, 3, 384, 288])], ["simcc_x", "simcc_y"],
    ))
    frames = np.zeros((2, 96, 96, 3), np.uint8)
    proc = DWPoseProcessor(det, pose)
    maps = proc(frames)
    assert maps.shape == (2, 96, 96, 3)
    assert maps.dtype == np.uint8
    assert maps.any(), "pose map should contain drawn keypoints"


def _varint(v):
    out = b""
    while True:
        b7 = v & 0x7F
        v >>= 7
        out += bytes([b7 | (0x80 if v else 0)])
        if not v:
            return out


def _tag(f, wt):
    return _varint((f << 3) | wt)


def test_proto3_omitted_zero_scalar_attrs():
    """proto3 serializers drop zero-valued fields: type=INT with no i field
    must decode as 0, not None (real Gather.axis=0 / MaxPool.ceil_mode=0)."""
    from musev_tpu.onnx.proto import _parse_attribute

    buf = _tag(1, 2) + _varint(4) + b"axis" + _tag(20, 0) + _varint(2)
    a = _parse_attribute(memoryview(buf))
    assert a.name == "axis" and a.value == 0
    buf = _tag(1, 2) + _varint(1) + b"f" + _tag(20, 0) + _varint(1)
    assert _parse_attribute(memoryview(buf)).value == 0.0


def test_fp16_int32_data_bit_reinterpret():
    """fp16 without raw_data stores bit patterns in int32_data."""
    from musev_tpu.onnx.proto import _parse_tensor

    t = _tag(2, 0) + _varint(10) + _tag(5, 0) + _varint(0x3C00)
    _, arr = _parse_tensor(memoryview(t))
    assert arr.dtype == np.float16 and float(arr) == 1.0


def test_resize_coordinate_transformation_modes():
    from musev_tpu.onnx.runtime import _op_resize

    x = np.arange(16, dtype=np.float32).reshape(1, 1, 4, 4)
    sc = np.array([1, 1, 2, 2], np.float32)
    # asymmetric + floor = plain index repetition (yolox upsample convention)
    y = np.asarray(_op_resize(
        {"mode": b"nearest", "coordinate_transformation_mode": b"asymmetric",
         "nearest_mode": b"floor"}, x, None, sc))
    ref = np.repeat(np.repeat(x, 2, axis=2), 2, axis=3)
    np.testing.assert_array_equal(y, ref)
    # align_corners linear: corners map exactly
    y = np.asarray(_op_resize(
        {"mode": b"linear",
         "coordinate_transformation_mode": b"align_corners"}, x, None, sc))
    assert y[0, 0, 0, 0] == x[0, 0, 0, 0]
    assert y[0, 0, -1, -1] == x[0, 0, -1, -1]
    import pytest

    with pytest.raises(NotImplementedError):
        _op_resize({"mode": b"linear",
                    "coordinate_transformation_mode": b"bogus"}, x, None, sc)


def test_dwpose_detect_resolution_downscales(monkeypatch):
    """detect_resolution caps the frame fed to the detector; normalized
    keypoints keep the full-res render unchanged."""
    import musev_tpu.io.dwpose as D

    frames_fed = []

    def rec(det, frame):
        frames_fed.append(frame.shape)
        raise RuntimeError("stop")

    monkeypatch.setattr(D, "detect_persons", rec)
    proc = D.DWPoseProcessor(None, None, detect_resolution=48)
    with np.testing.assert_raises(RuntimeError):
        proc.detect_frame(np.zeros((96, 64, 3), np.uint8))
    # without the cap, full resolution goes through
    proc_full = D.DWPoseProcessor(None, None)
    with np.testing.assert_raises(RuntimeError):
        proc_full.detect_frame(np.zeros((96, 64, 3), np.uint8))
    assert frames_fed == [(48, 32, 3), (96, 64, 3)]
