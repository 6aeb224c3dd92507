import numpy as np
import pytest

from musev_tpu.io.video import (
    PrefetchingWindows,
    VideoReader,
    native_available,
    write_video,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native libmusevio not built"
)


@pytest.fixture(scope="module")
def ramp_mp4(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("vio") / "ramp.mp4")
    t, h, w = 25, 64, 96
    frames = np.zeros((t, h, w, 3), np.uint8)
    for i in range(t):
        frames[i, :, :, 0] = i * 10
        frames[i, :, :, 2] = 255 - i * 10
    write_video(path, frames, fps=12)
    return path


def test_roundtrip_all_frames(ramp_mp4):
    with VideoReader(ramp_mp4) as r:
        assert (r.width, r.height) == (96, 64)
        assert abs(r.fps - 12.0) < 0.01
        f = r.read(0, 30)
    assert f.shape == (25, 64, 96, 3)
    for i in range(25):
        assert abs(int(f[i, 0, 0, 0]) - i * 10) < 6


def test_windows_contract(ramp_mp4):
    with VideoReader(ramp_mp4) as r:
        wins = list(r.windows(12, overlap=4))
    assert [w.shape[0] for w in wins] == [12, 12, 9]
    # second window starts at frame 8
    assert abs(int(wins[1][0, 0, 0, 0]) - 80) < 6


def test_sample_rate(ramp_mp4):
    with VideoReader(ramp_mp4) as r:
        f = r.read(0, 5, sample_rate=2)
    assert f.shape[0] == 5
    for i in range(5):
        assert abs(int(f[i, 0, 0, 0]) - i * 20) < 6


def test_backward_seek(ramp_mp4):
    with VideoReader(ramp_mp4) as r:
        _ = r.read(10, 5)
        f = r.read(2, 3)  # backwards
    for i, frame_idx in enumerate([2, 3, 4]):
        assert abs(int(f[i, 0, 0, 0]) - frame_idx * 10) < 6


def test_prefetching_windows(ramp_mp4):
    with VideoReader(ramp_mp4) as r:
        wins = [w.copy() for w in PrefetchingWindows(r.windows(12, overlap=4))]
    assert [w.shape[0] for w in wins] == [12, 12, 9]


def test_missing_file():
    with pytest.raises(IOError):
        VideoReader("/tmp/definitely_not_here.mp4")


def test_prefetching_windows_map_fn_runs_in_worker():
    """map_fn output matches the serial path and executes off the consumer
    thread (the host-processor overlap contract, SURVEY §2.10 N3)."""
    import threading

    import numpy as np

    from musev_tpu.io.video import PrefetchingWindows

    wins = [np.full((2, 4, 4, 3), i, np.uint8) for i in range(5)]
    seen_threads = []

    def proc(w):
        seen_threads.append(threading.current_thread())
        return w, (255 - w)

    out = list(PrefetchingWindows(iter(wins), map_fn=proc))
    assert len(out) == 5
    for i, (w, m) in enumerate(out):
        np.testing.assert_array_equal(w, wins[i])
        np.testing.assert_array_equal(m, 255 - wins[i])
    assert all(t is not threading.main_thread() for t in seen_threads)
