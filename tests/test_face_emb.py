"""First-party InsightFace-style face embedding (io/face_emb.py) vs the
reference's mmcm insight_face_extractor contract (SURVEY §2.9)."""

import numpy as np
import pytest

from musev_tpu.io.face_emb import (
    ARCFACE_DST,
    FaceEmbExtractor,
    detect_faces,
    norm_crop,
    scrfd_decode,
    umeyama_similarity,
    warp_affine,
)


def test_umeyama_recovers_similarity():
    rng = np.random.default_rng(0)
    src = rng.uniform(0, 100, (5, 2)).astype(np.float32)
    theta, scale, t = 0.3, 1.7, np.array([5.0, -3.0])
    rot = np.array([[np.cos(theta), -np.sin(theta)],
                    [np.sin(theta), np.cos(theta)]])
    dst = scale * src @ rot.T + t
    m = umeyama_similarity(src, dst)
    mapped = src @ m[:, :2].T + m[:, 2]
    np.testing.assert_allclose(mapped, dst, atol=1e-3)
    # recovered scale
    assert np.isclose(np.linalg.norm(m[:, 0]), scale, atol=1e-3)


def test_warp_affine_identity_and_shift():
    img = (np.arange(16 * 16 * 3) % 255).reshape(16, 16, 3).astype(np.uint8)
    ident = np.array([[1, 0, 0], [0, 1, 0]], np.float32)
    np.testing.assert_array_equal(warp_affine(img, ident, (16, 16)), img)
    shift = np.array([[1, 0, -2], [0, 1, 0]], np.float32)  # dst x = src x - 2
    out = warp_affine(img, shift, (16, 16))
    np.testing.assert_array_equal(out[:, :14], img[:, 2:])


def test_norm_crop_lands_landmarks_on_template():
    # paint single-pixel markers at known source landmarks; after norm_crop
    # each marker must land within 1.5 px of the arcface template point
    src_kps = ARCFACE_DST * 2.0 + np.array([30.0, 10.0])  # scaled+shifted face
    img = np.zeros((300, 300, 3), np.uint8)
    for x, y in src_kps:
        yi, xi = int(round(y)), int(round(x))
        img[yi - 1:yi + 2, xi - 1:xi + 2, :] = 255  # 3x3 marker blocks
    out = norm_crop(img, src_kps, 112).sum(-1)
    assert out.max() > 0
    ys, xs = np.mgrid[0:112, 0:112]
    mask = out > out.max() * 0.2
    for x, y in ARCFACE_DST:
        d = np.sqrt((xs - x) ** 2 + (ys - y) ** 2)
        assert d[mask].min() < 1.5


def _scrfd_outputs(input_size=(64, 64), face=None):
    """Build the 9 SCRFD head tensors with one face at ``face``
    (cx, cy, half, score) on the stride-8 grid."""
    iw, ih = input_size
    outs = []
    sizes = [(ih // s) * (iw // s) * 2 for s in (8, 16, 32)]
    scores = [np.zeros((n, 1), np.float32) for n in sizes]
    bboxes = [np.zeros((n, 4), np.float32) for n in sizes]
    kpss = [np.zeros((n, 10), np.float32) for n in sizes]
    if face is not None:
        cx, cy, half, score = face
        gw = iw // 8
        cell = (int(cy) // 8) * gw + (int(cx) // 8)
        idx = cell * 2  # anchor 0
        ax, ay = (int(cx) // 8) * 8, (int(cy) // 8) * 8  # anchor center
        scores[0][idx, 0] = score
        # distances left/top/right/bottom in stride units
        bboxes[0][idx] = [
            (ax - (cx - half)) / 8, (ay - (cy - half)) / 8,
            ((cx + half) - ax) / 8, ((cy + half) - ay) / 8,
        ]
        kps = (ARCFACE_DST - 56.0) * (2 * half / 112.0) + [cx, cy]
        kpss[0][idx] = ((kps - [ax, ay]) / 8).reshape(-1)
    outs = scores + bboxes + kpss
    return outs


def test_scrfd_decode_golden():
    outs = _scrfd_outputs((64, 64), face=(32.0, 28.0, 12.0, 0.9))
    boxes, scores, kps = scrfd_decode(outs, (64, 64), score_thr=0.5)
    assert len(boxes) == 1
    np.testing.assert_allclose(boxes[0], [20, 16, 44, 40], atol=1e-4)
    assert scores[0] == pytest.approx(0.9)
    expect = (ARCFACE_DST - 56.0) * (24 / 112.0) + [32, 28]
    np.testing.assert_allclose(kps[0], expect, atol=1e-3)


class _StubDet:
    input_names = ["input"]

    def __init__(self, input_size=(64, 64), face=(32.0, 28.0, 12.0, 0.9)):
        self.input_size = input_size
        self.face = face
        self.last_input = None

    def run(self, feeds):
        self.last_input = feeds["input"]
        return _scrfd_outputs(self.input_size, self.face)


class _StubRec:
    """Deterministic 'recognition' net: fixed random projection of the
    aligned crop, so alignment changes are observable in the embedding."""

    input_names = ["img"]

    def __init__(self, dim=512, size=112):
        rng = np.random.default_rng(7)
        self.w = rng.standard_normal((dim, 3 * size * size)).astype(np.float32)

    def run(self, feeds):
        x = np.asarray(feeds["img"], np.float32).reshape(1, -1)
        return [x @ self.w.T]


def test_detect_faces_frame_coords():
    det = _StubDet()
    frame = np.zeros((128, 128, 3), np.uint8)  # ratio = 0.5 into 64x64
    boxes, scores, kps = detect_faces(det, frame, input_size=(64, 64))
    assert det.last_input.shape == (1, 3, 64, 64)
    # normalization contract
    assert det.last_input.min() >= -1.0 and det.last_input.max() <= 1.0
    assert len(boxes) == 1
    np.testing.assert_allclose(boxes[0], [40, 32, 88, 80], atol=1e-3)


def test_extractor_norm_and_shape():
    det = _StubDet()
    rec = _StubRec()
    imgs = np.random.default_rng(1).integers(
        0, 255, (2, 128, 128, 3), np.uint8
    )
    emb = FaceEmbExtractor(det, rec)(imgs)
    assert emb.shape == (2, 512)
    emb_n = FaceEmbExtractor(det, rec, norm=True)(imgs)
    np.testing.assert_allclose(np.linalg.norm(emb_n, axis=1), 1.0, atol=1e-5)
    np.testing.assert_allclose(
        emb_n, emb / np.linalg.norm(emb, axis=1, keepdims=True), atol=1e-5
    )


def test_extractor_no_face_fallback():
    det = _StubDet(face=None)  # detector finds nothing
    rec = _StubRec()
    img = np.random.default_rng(2).integers(0, 255, (96, 64, 3), np.uint8)
    emb = FaceEmbExtractor(det, rec)(img)
    assert emb.shape == (1, 512)
    assert np.isfinite(emb).all()


def test_alignment_feeds_recognition():
    # moving the face moves the aligned crop content -> embedding differs;
    # but the same face at two scales aligns to (nearly) the same crop
    rec = _StubRec()
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (128, 128, 3), np.uint8)
    e1 = FaceEmbExtractor(_StubDet(face=(32, 28, 12, 0.9)), rec)(img)
    e2 = FaceEmbExtractor(_StubDet(face=(20, 40, 12, 0.9)), rec)(img)
    assert not np.allclose(e1, e2)


def test_cli_face_emb_wiring(tmp_path, monkeypatch):
    """--face_det_onnx/--face_rec_onnx: the CLI extracts face_emb from the
    condition image and routes it into the FaceID branch (reference
    text2video.py:931-991 extractor plumbing)."""
    import dataclasses

    import yaml
    from PIL import Image

    import musev_tpu.cli.text2video as cli
    import musev_tpu.io.face_emb as fe

    calls = {"n": 0}

    class FakeExtractor:
        def __call__(self, imgs):
            imgs = np.asarray(imgs)
            b = imgs.shape[0] if imgs.ndim == 4 else 1
            calls["n"] += 1
            return np.ones((b, 8), np.float32)

    monkeypatch.setattr(
        fe, "build_face_emb_extractor", lambda *a, **k: FakeExtractor()
    )
    orig_shrink = cli._shrink_preset

    def shrink_face(preset):
        preset = orig_shrink(preset)
        preset.unet_cfg = dataclasses.replace(
            preset.unet_cfg, need_ip_adapter_face=True, ip_adapter_face_dim=32
        )
        preset.ip_adapter_face_id_dim = 8
        return preset

    monkeypatch.setattr(cli, "_shrink_preset", shrink_face)

    img_path = tmp_path / "cond.png"
    Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (16, 16, 3), np.uint8)
    ).save(img_path)
    task_file = tmp_path / "tasks.yaml"
    task_file.write_text(yaml.safe_dump([{
        "name": "t0", "prompt": "a girl", "height": 16, "width": 16,
        "condition_images": str(img_path),
    }]))
    out_dir = tmp_path / "out"
    cli.main([
        "--test_data_path", str(task_file),
        "--output_dir", str(out_dir),
        "--tiny",
        "--face_det_onnx", "det.onnx", "--face_rec_onnx", "rec.onnx",
        "--time_size", "4", "--context_frames", "4", "--context_overlap", "1",
        "--video_num_inference_steps", "2", "--num_inference_steps", "2",
        "--height", "16", "--width", "16",
    ])
    assert calls["n"] == 1
    assert list(out_dir.iterdir()), "CLI produced no output"
