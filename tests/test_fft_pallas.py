"""VMEM-resident Pallas FFT / PSD kernel vs numpy f64 oracles.

Interpret mode on CPU (the compiled kernel runs on hardware; its
parity there is recorded in docs/PERF.md).  Tolerances follow the
reference FFT node's per-bin bound (fft_node.rs:242-244, < 1e-5)
scaled to relative error.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from comms_tpu.kernels import fft_pallas as FP
from comms_tpu.ops import spectrum


def _rel(y, ref):
    return np.max(np.abs(y - ref)) / np.max(np.abs(ref))


@pytest.mark.parametrize("n", [256, 512, 1024, 2048, 4096, 16384])
def test_fft_parity(n):
    rng = np.random.default_rng(0)
    rows = 5
    x = (rng.standard_normal((rows, n)) +
         1j * rng.standard_normal((rows, n))).astype(np.complex64)
    ref = np.fft.fft(x.astype(np.complex128), axis=1)
    y = np.asarray(FP.fft_pallas(x, n=n, interpret=True))
    assert _rel(y, ref) < 1e-5          # split_bf16 default
    y = np.asarray(FP.fft_pallas(x, n=n, precision="highest",
                                 interpret=True))
    assert _rel(y, ref) < 1e-6


def test_fft_row_padding():
    """Row counts that don't divide the tile are padded and sliced."""
    rng = np.random.default_rng(1)
    x = (rng.standard_normal((3, 1024)) +
         1j * rng.standard_normal((3, 1024))).astype(np.complex64)
    y = np.asarray(FP.fft_pallas(x, interpret=True))
    ref = np.fft.fft(x.astype(np.complex128), axis=1)
    assert y.shape == (3, 1024)
    assert _rel(y, ref) < 1e-5


def test_fft_rejects_unsupported():
    with pytest.raises(ValueError, match="supports n"):
        FP.fft_pallas_planar(np.zeros((4, 100), np.float32),
                             np.zeros((4, 100), np.float32), n=100)
    with pytest.raises(ValueError, match="planar"):
        FP.fft_pallas_planar(np.zeros((4, 512), np.float32),
                             np.zeros((4, 1024), np.float32), n=1024)


def test_psd_accumulator():
    rng = np.random.default_rng(2)
    rows, n = 6, 1024
    x = (rng.standard_normal((rows, n)) +
         1j * rng.standard_normal((rows, n))).astype(np.complex64)
    win = spectrum.hann(n)
    acc = np.asarray(FP.psd_pallas_planar(
        x.real.astype(np.float32), x.imag.astype(np.float32), win,
        n=n, interpret=True))
    xm = x.astype(np.complex128)
    xm = xm - xm.mean(axis=1, keepdims=True)
    ref = (np.abs(np.fft.fft(xm * win[None, :], axis=1)) ** 2).sum(axis=0)
    assert _rel(acc, ref) < 1e-5


def test_psd_row_weights_exclude_rows():
    rng = np.random.default_rng(3)
    rows, n = 5, 512
    x = (rng.standard_normal((rows, n)) +
         1j * rng.standard_normal((rows, n))).astype(np.complex64)
    win = spectrum.hann(n)
    wts = np.array([1, 0, 1, 0, 1], np.float32)
    acc = np.asarray(FP.psd_pallas_planar(
        x.real.astype(np.float32), x.imag.astype(np.float32), win,
        n=n, row_weights=wts, interpret=True))
    xm = x.astype(np.complex128)
    xm = xm - xm.mean(axis=1, keepdims=True)
    ref = (np.abs(np.fft.fft(xm * win[None, :], axis=1)) ** 2 *
           wts[:, None]).sum(axis=0)
    assert _rel(acc, ref) < 1e-5


def test_welch_psd_pallas_matches_xla():
    """The pallas-backed welch_psd equals the XLA formulation (segment
    interleave order cannot matter) and scipy-style normalization."""
    rng = np.random.default_rng(4)
    x = (rng.standard_normal(1 << 14) +
         1j * rng.standard_normal(1 << 14)).astype(np.complex64)
    f1, p_x = spectrum.welch_psd(x, nperseg=1024, use_pallas=False)
    f2, p_p = spectrum.welch_psd(x, nperseg=1024, use_pallas=True,
                                 interpret=True)
    np.testing.assert_array_equal(f1, f2)
    assert _rel(np.asarray(p_p), np.asarray(p_x)) < 1e-4


def test_welch_psd_pallas_real_input_onesided():
    rng = np.random.default_rng(5)
    x = rng.standard_normal(1 << 13).astype(np.float32)
    _, p_x = spectrum.welch_psd(x, nperseg=512, onesided=True,
                                use_pallas=False)
    _, p_p = spectrum.welch_psd(x, nperseg=512, onesided=True,
                                use_pallas=True, interpret=True)
    assert _rel(np.asarray(p_p), np.asarray(p_x)) < 1e-4


def test_welch_psd_pallas_nondividing_overlap_falls_back():
    """Gather-pattern overlaps (step does not divide nperseg) fall
    back to the XLA path rather than erroring."""
    rng = np.random.default_rng(6)
    x = (rng.standard_normal(1 << 13) +
         1j * rng.standard_normal(1 << 13)).astype(np.complex64)
    _, p_x = spectrum.welch_psd(x, nperseg=1024, noverlap=300,
                                use_pallas=False)
    _, p_p = spectrum.welch_psd(x, nperseg=1024, noverlap=300,
                                use_pallas=True, interpret=True)
    assert _rel(np.asarray(p_p), np.asarray(p_x)) < 1e-6


def test_spectrogram_pallas_matches_xla():
    rng = np.random.default_rng(7)
    x = (rng.standard_normal(1 << 13) +
         1j * rng.standard_normal(1 << 13)).astype(np.complex64)
    s_x = np.asarray(spectrum.spectrogram(x, nperseg=256,
                                          use_pallas=False))
    s_p = np.asarray(spectrum.spectrogram(x, nperseg=256,
                                          use_pallas=True,
                                          interpret=True))
    assert s_x.shape == s_p.shape
    assert _rel(s_p, s_x) < 1e-4


def test_fft_pallas_folded_scale():
    """``scale`` folds into the host DFT matrices at zero cost and
    must match a post-multiplied jnp.fft exactly at kernel precision."""
    import jax

    rng = np.random.default_rng(8)
    z = (rng.standard_normal((8, 1024)) +
         1j * rng.standard_normal((8, 1024))).astype(np.complex64)
    s = 1.0 / 32.0
    yr, yi = FP.fft_pallas_planar(
        jnp.asarray(z.real.astype(np.float32)),
        jnp.asarray(z.imag.astype(np.float32)), 1024, scale=s,
        interpret=True)
    ref = np.fft.fft(z, axis=1) * s
    got = np.asarray(yr) + 1j * np.asarray(yi)
    assert _rel(got, ref) < 1e-5


def test_fft_plane_swap_involution():
    """The bench's in-place chaining identity: with unitary scale
    s = 1/sqrt(n), step(z) = swap(s*fft(swap(z))) applied twice is an
    exact bin reversal — magnitudes (and L2 norm) are preserved
    forever, which is what makes the chained streaming row stable."""
    rng = np.random.default_rng(9)
    n = 1024
    z = (rng.standard_normal((4, n)) +
         1j * rng.standard_normal((4, n))).astype(np.complex64)
    s = 1.0 / np.sqrt(n)
    re = jnp.asarray(z.real.astype(np.float32))
    im = jnp.asarray(z.imag.astype(np.float32))
    # step(z): call on swapped planes, swap the outputs back
    ur, ui = FP.fft_pallas_planar(im, re, n, scale=s, interpret=True)
    r1, i1 = ui, ur
    ur2, ui2 = FP.fft_pallas_planar(jnp.asarray(i1), jnp.asarray(r1),
                                    n, scale=s, interpret=True)
    got = np.asarray(ui2) + 1j * np.asarray(ur2)
    rev = z[:, np.mod(-np.arange(n), n)]
    assert _rel(got, rev) < 1e-4
    assert abs(np.linalg.norm(got) / np.linalg.norm(z) - 1.0) < 1e-5


def _welch_oracle(x, n, w):
    ref = np.zeros(n)
    for s0 in np.arange(0, len(x) - n + 1, n // 2):
        seg = x[s0:s0 + n].astype(np.complex128)
        seg = seg - seg.mean()
        ref += np.abs(np.fft.fft(seg * w)) ** 2
    return ref


def test_psd_stream_matches_welch_oracle():
    """Segment-free streaming accumulator == materialized-segments
    Welch, including the zero-weighted final odd segment and the
    multi-grid-step path."""
    rng = np.random.default_rng(10)
    n = 1024
    t = FP.rows_per_step(n)
    w = spectrum.hann(n).astype(np.float32)
    for steps in (1, 3):
        N = t * n * steps
        x = (rng.standard_normal(N) +
             1j * rng.standard_normal(N)).astype(np.complex64)
        acc = FP.psd_stream_pallas_planar(
            jnp.asarray(x.real.astype(np.float32)),
            jnp.asarray(x.imag.astype(np.float32)), w, n=n,
            interpret=True)
        ref = _welch_oracle(x, n, w)
        assert _rel(np.asarray(acc, np.float64), ref) < 1e-4, steps


def test_welch_psd_planar_matches_complex_entry():
    rng = np.random.default_rng(11)
    n = 1024
    N = FP.rows_per_step(n) * n
    x = (rng.standard_normal(N) +
         1j * rng.standard_normal(N)).astype(np.complex64)
    _, p_ref = spectrum.welch_psd(x, nperseg=n, use_pallas=False)
    _, p_got = spectrum.welch_psd_planar(
        jnp.asarray(x.real.astype(np.float32)),
        jnp.asarray(x.imag.astype(np.float32)), nperseg=n,
        interpret=True)
    assert _rel(np.asarray(p_got), np.asarray(p_ref)) < 1e-4


def test_psd_accumulator_extended_size():
    """Round-5 size extension (VERDICT r4 item 5): the PSD accumulator
    at a wideband window size (4096) against the f64 oracle."""
    rng = np.random.default_rng(12)
    rows, n = 4, 4096
    x = (rng.standard_normal((rows, n)) +
         1j * rng.standard_normal((rows, n))).astype(np.complex64)
    win = spectrum.hann(n)
    acc = np.asarray(FP.psd_pallas_planar(
        x.real.astype(np.float32), x.imag.astype(np.float32), win,
        n=n, interpret=True))
    xm = x.astype(np.complex128)
    xm = xm - xm.mean(axis=1, keepdims=True)
    ref = (np.abs(np.fft.fft(xm * win[None, :], axis=1)) ** 2).sum(axis=0)
    assert _rel(acc, ref) < 1e-5
