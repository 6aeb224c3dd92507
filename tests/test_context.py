import numpy as np
import pytest

from musev_tpu.ops import context


def test_ordered_halving_known_values():
    assert context.ordered_halving(0) == 0.0
    assert context.ordered_halving(1) == 0.5
    assert context.ordered_halving(2) == 0.25
    assert context.ordered_halving(3) == 0.75


def test_uniform_v2_basic():
    wins = context.uniform_v2_windows(num_frames=12, context_size=12)
    assert wins == [list(range(12))]
    wins = context.uniform_v2_windows(num_frames=8, context_size=12)
    assert wins == [list(range(8))]


def test_uniform_v2_overlap():
    wins = context.uniform_v2_windows(24, 12, context_overlap=4)
    # step 8: [0..12), [8..20), tail snapped to [12..24)
    assert wins[0] == list(range(0, 12))
    assert wins[1] == list(range(8, 20))
    assert wins[-1] == list(range(12, 24))
    # every frame covered
    covered = sorted({f for w in wins for f in w})
    assert covered == list(range(24))


def test_uniform_v2_drops_redundant_tail():
    # 20 frames, window 12, step 8 -> [0..12), [8..20); a third window would
    # duplicate [8..20)
    wins = context.uniform_v2_windows(20, 12, context_overlap=4)
    assert len(wins) == 2
    assert wins[1] == list(range(8, 20))


def test_window_plan_counts():
    plan = context.make_window_plan(24, 12, context_overlap=4)
    assert plan.windows.shape[1] == 12
    total = plan.windows.size
    assert float(plan.counts.sum()) == pytest.approx(total)
    # overlap frames counted twice
    assert plan.counts[8] >= 2.0
    assert plan.counts[0] == 1.0


def test_uniform_schedule_wraps():
    wins = list(
        context.uniform_windows(
            step=0, num_frames=24, context_size=12, context_stride=1, context_overlap=4
        )
    )
    for w in wins:
        assert len(w) == 12
        assert all(0 <= f < 24 for f in w)


def test_make_window_plan_uniform():
    plan = context.make_window_plan(
        24, 12, context_overlap=4, context_stride=1, schedule="uniform", step=0
    )
    assert plan.window_size == 12
    assert plan.counts.min() >= 1.0


def test_make_window_plan_raises_on_uncovered_frames(monkeypatch):
    # No public schedule produces an uncovered frame (uniform wraps,
    # uniform_v2 tail-snaps), so fabricate one: a frame no window touches
    # must raise instead of silently denoising with noise_pred=0.
    monkeypatch.setattr(
        context, "uniform_v2_windows",
        lambda num_frames, context_size, context_overlap=4: [[0, 1], [4, 5]],
    )
    with pytest.raises(ValueError, match="uncovered"):
        context.make_window_plan(6, 2, context_overlap=0)
