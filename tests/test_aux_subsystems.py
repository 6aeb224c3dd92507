import numpy as np
import pytest

from musev_tpu.autoprompt import generate_prompts
from musev_tpu.serve.app import limit_length, limit_shape
from musev_tpu.utils.image_util import (
    dynamic_crop_resize,
    hist_match_frame,
    hist_match_video_to_frame,
)
from musev_tpu.utils.profiling import PhaseTimers


def test_hist_match_matches_statistics():
    rng = np.random.RandomState(0)
    src = np.clip(rng.normal(0.7, 0.1, (32, 32, 3)), 0, 1).astype(np.float32)
    dst = np.clip(rng.normal(0.3, 0.1, (32, 32, 3)), 0, 1).astype(np.float32)
    out = hist_match_frame(src, dst)
    assert abs(out.mean() - src.mean()) < 0.1
    vid = np.stack([dst, dst])
    matched = hist_match_video_to_frame(vid, src)
    assert matched.shape == vid.shape


def test_dynamic_crop_resize():
    img = np.zeros((100, 40, 3), np.uint8)
    out = dynamic_crop_resize(img, 32, 32)
    assert out.shape == (32, 32, 3)
    img = np.zeros((40, 100, 3), np.uint8)
    out = dynamic_crop_resize(img, 16, 64)
    assert out.shape == (16, 64, 3)


def test_limit_shape():
    w, h, r = limit_shape(None, 2000, 1000, 1.0)
    assert max(w, h) <= 1280
    assert w % 8 == 0 and h % 8 == 0
    w, h, r = limit_shape(np.zeros((100, 200, 3)), -1, -1, 1.0)
    assert (w, h) == (200, 96)  # h=100 -> //8*8 = 96


def test_limit_length():
    assert limit_length(100) == 12  # 100*12 > 144 -> 144//12
    assert limit_length(5) == 5


def test_generate_prompts_passthrough():
    tasks = [{"prompt": "a cat", "name": "x"}]
    out = generate_prompts(tasks)
    assert out[0]["prompt"] == "a cat"
    assert out[0]["origin_prompt"] == "a cat"


def test_generate_prompts_template():
    # templating is brace-triggered (attr2template.py semantics); an empty
    # prompt maps to OnlySpacePromptTemplate -> "" (load_template.py:25-26)
    tasks = [{"prompt": "a portrait of {}", "sex": "girl", "hair": "black",
              "clothes": "red dress"}]
    out = generate_prompts(tasks)
    assert len(out) == 1
    p = out[0]["prompt"]
    assert "girl" in p and "black hair" in p and "red dress" in p


def test_generate_prompts_fanout():
    tasks = [{"prompt": "a portrait of {}", "sex": "girl|boy",
              "hair": "black"}]
    out = generate_prompts(tasks)
    assert len(out) == 2
    assert {("girl" in t["prompt"], "boy" in t["prompt"]) for t in out} == {
        (True, False), (False, True)
    }


def test_phase_timers():
    t = PhaseTimers()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    assert t.counts["a"] == 2
    assert "a" in t.report()
    assert "a" in t.as_json()


def test_device_status():
    """TPU counterpart of mmcm get_gpu_status (SURVEY §2.9; imported at
    reference temporal_transformer.py:35)."""
    import jax

    from musev_tpu.utils.profiling import device_status, log_device_status

    s = device_status()
    assert len(s) == len(jax.local_devices())
    for e in s:
        assert {"id", "platform", "device_kind"} <= set(e)
        if "bytes_in_use" in e:
            assert e["bytes_in_use"] >= 0
    log_device_status()  # must not raise on backends without memory stats
