"""End-to-end regression for the musev_referencenet_pose preset (the tiny
loader path once produced NaN via a tokenizer/vocab mismatch)."""

import numpy as np
import pytest

from musev_tpu.cli.text2video import _shrink_preset
from musev_tpu.configs.model_registry import get_model_preset
from musev_tpu.pipelines.loader import build_models
from musev_tpu.pipelines.pipeline import MusevPipeline


@pytest.fixture(scope="module")
def pose_pipe():
    preset = _shrink_preset(get_model_preset("musev_referencenet_pose"))
    return MusevPipeline(build_models(preset))


def test_pose_v2v_finite(pose_pipe):
    video = (np.random.RandomState(0).rand(4, 32, 32, 3) * 255).astype(np.uint8)
    cond = (np.random.RandomState(1).rand(1, 1, 32, 32, 3) * 255).astype(np.uint8)
    res = pose_pipe.video2video(
        "a dancer", video, video_is_middle=True, condition_images=cond,
        time_size=4, context_frames=4, context_overlap=1, height=32, width=32,
        video_num_inference_steps=1, num_inference_steps=1,
    )
    assert res.videos.shape == (1, 5, 32, 32, 3)
    assert np.isfinite(res.videos).all()
    assert np.isfinite(res.latents).all()


def test_pose_t2v_with_all_branches(pose_pipe):
    cond = (np.random.RandomState(2).rand(1, 1, 32, 32, 3) * 255).astype(np.uint8)
    res = pose_pipe.text2video(
        "(a girl:1.2)", "bad", height=32, width=32, video_length=3, n_batch=1,
        condition_images=cond, video_num_inference_steps=1,
        num_inference_steps=1, context_frames=3, context_overlap=1, seed=4,
    )
    assert np.isfinite(res.videos).all()
