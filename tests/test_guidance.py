import numpy as np

from musev_tpu.ops.guidance import guidance_schedule


def test_constant():
    s = guidance_schedule(3.5, 10)
    np.testing.assert_array_equal(s, np.full(10, 3.5, np.float32))
    s = guidance_schedule(3.5, 4, stop=3.5)
    np.testing.assert_array_equal(s, np.full(4, 3.5, np.float32))


def test_linear():
    s = guidance_schedule(1.0, 5, stop=5.0, method="linear")
    np.testing.assert_allclose(s, [1, 2, 3, 4, 5])


def test_two_stage():
    s = guidance_schedule(1.0, 5, stop=3.0, method="two_stage")
    np.testing.assert_array_equal(s, [1, 1, 3, 3, 3])


def test_fix_two_stage():
    s = guidance_schedule(1.0, 5, stop=3.0, method="fix_two_stage", n_fix_start=2)
    np.testing.assert_array_equal(s, [1, 1, 3, 3, 3])


def test_three_stage():
    s = guidance_schedule(2.0, 6, stop=6.0, method="three_stage")
    np.testing.assert_array_equal(s, [2, 2, 4, 4, 6, 6])
