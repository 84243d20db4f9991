"""Tap-generator parity tests.

Golden vectors are the reference's own truth tables
(/root/reference/src/util/math.rs:359-520), asserted to the same
tolerances (f32 epsilon for rc/rrc/gaussian, f64 epsilon for qfilt).
"""

import numpy as np
import pytest

from comms_tpu.ops import taps

F32_EPS = np.finfo(np.float32).eps

RRC_TRUTH = np.array([
    -0.00982617, -0.01020256, 0.00807753, 0.02391673, 0.00978662,
    -0.02953471, -0.0488395, -0.00823527, 0.06838797, 0.09486125,
    0.00622454, -0.14706016, -0.20088982, -0.00457254, 0.42552248,
    0.87324694, 1.06393805, 0.87324694, 0.42552248, -0.00457254,
    -0.20088982, -0.14706016, 0.00622454, 0.09486125, 0.06838797,
    -0.00823527, -0.0488395, -0.02953471, 0.00978662, 0.02391673,
    0.00807753, -0.01020256, -0.00982617,
])

RC_TRUTH = np.array([
    -0.0011653229685676335, 0.012816317493783883, 0.021147755355340796,
    0.00791903759636216, -0.024253219358036038, -0.0465161104657352,
    -0.025723996627094965, 0.036996624996837396, 0.08999421769005823,
    0.06609535709951565, -0.048727623832534546, -0.17340916580147755,
    -0.16888992011002318, 0.05701023237025582, 0.4558112530148015,
    0.8408212451367716, 1.0, 0.8408212451367716, 0.4558112530148015,
    0.05701023237025582, -0.16888992011002318, -0.17340916580147755,
    -0.048727623832534546, 0.06609535709951565, 0.08999421769005823,
    0.036996624996837396, -0.025723996627094965, -0.0465161104657352,
    -0.024253219358036038, 0.00791903759636216, 0.021147755355340796,
    0.012816317493783883, -0.0011653229685676335,
])

GAUSSIAN_TRUTH = np.array([
    0.0007300494185482611, 0.0014958492117118187, 0.0029263367824777266,
    0.005465900570629832, 0.0097476534361888, 0.016597373400549398,
    0.02698233817269414, 0.041881355492128326, 0.06206729366026605,
    0.08782250506026018, 0.11864508840813756, 0.15303636428781775,
    0.1884692257990131, 0.22160889352023885, 0.248791108947204,
    0.26667570890130865, 0.27291851048803384, 0.26667570890130865,
    0.248791108947204, 0.22160889352023885, 0.1884692257990131,
    0.15303636428781775, 0.11864508840813756, 0.08782250506026018,
    0.06206729366026605, 0.041881355492128326, 0.02698233817269414,
    0.016597373400549398, 0.0097476534361888, 0.005465900570629832,
    0.0029263367824777266, 0.0014958492117118187, 0.0007300494185482611,
])

QFILT_TRUTH = np.array([
    0.010718051382822693, 0.018097230082535474, 0.026525823848649224,
    0.03564605925347896, 0.045015815807855304, 0.05413863102246848,
    0.0625, 0.06960681131460235, 0.07502635967975885, 0.07842133035765372,
    0.07957747154594767, 0.07842133035765372, 0.07502635967975885,
    0.06960681131460235, 0.0625, 0.05413863102246848, 0.045015815807855304,
    0.03564605925347896, 0.026525823848649224, 0.018097230082535474,
])


def test_rrc_taps_golden():
    got = taps.rrc_taps(33, 3.18, 0.234)
    assert got.shape == (33,)
    assert np.all(np.abs(got - RRC_TRUTH) < F32_EPS)
    assert np.all(got.imag == 0.0)


def test_rc_taps_golden():
    got = taps.rc_taps(33, 3.18, 0.234)
    assert np.all(np.abs(got - RC_TRUTH) < F32_EPS)


def test_gaussian_taps_golden():
    got = taps.gaussian_taps(33, 3.18, 0.234)
    assert np.all(np.abs(got - GAUSSIAN_TRUTH) < F32_EPS)


def test_qfilt_taps_golden():
    got = taps.qfilt_taps(21, 0.25, 2)
    # n_taps=21 is odd already; reference emits 21 taps, truth has first 20.
    assert got.shape == (21,)
    assert np.all(np.abs(got[:20] - QFILT_TRUTH) < np.finfo(np.float64).eps * 4)


def test_qfilt_even_becomes_odd():
    assert taps.qfilt_taps(20, 0.25, 2).shape == (21,)


def test_qfilt_lhopital_branch():
    # alpha=0.5, sps=1 puts |2*alpha*tt| == 1 exactly on the grid.
    got = taps.qfilt_taps(9, 0.5, 1)
    assert np.all(np.isfinite(got))
    d = 4
    tt = (np.arange(9) - d) / 1.0
    idx = np.where(np.abs(2 * 0.5 * tt) == 1.0)[0]
    for i in idx:
        expect = np.sin(np.pi * 0.5 * tt[i]) / (8.0 * tt[i])
        assert abs(got[i] - expect) < 1e-15


def test_rect_taps():
    got = taps.rect_taps(12)
    assert got.shape == (12,)
    assert np.all(got == 1.0 + 0.0j)


def test_sinc():
    assert abs(taps.sinc(0.0) - 1.0) < 1e-15
    for x in (1.0, 2.0, 3.0):
        assert abs(taps.sinc(x)) < 1e-15


def test_rolloff_validation():
    with pytest.raises(taps.InvalidRolloffError):
        taps.rc_taps(8, 4.0, -0.1)
    with pytest.raises(taps.InvalidRolloffError):
        taps.rrc_taps(8, 4.0, 1.5)
    with pytest.raises(taps.InvalidRolloffError):
        taps.qfilt_taps(8, 2.0, 2)


def test_rrc_zero_beta_is_sinc():
    got = taps.rrc_taps(17, 4.0, 0.0)
    t = (np.arange(17) - 8) / 4.0
    assert np.allclose(got.real, np.sinc(t), atol=1e-12)
