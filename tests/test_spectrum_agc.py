"""Welch PSD / spectrogram / AGC."""

import numpy as np
import jax.numpy as jnp

from comms_tpu.ops import agc, spectrum


def test_welch_psd_tone_and_floor():
    rng = np.random.default_rng(0)
    fs = 1.0
    n = 1 << 15
    w0 = 0.2  # cycles/sample
    x = (np.exp(2j * np.pi * w0 * np.arange(n))
         + 0.01 * (rng.normal(size=n) + 1j * rng.normal(size=n))
         ).astype(np.complex64)
    freqs, psd = spectrum.welch_psd(jnp.asarray(x), nperseg=1024)
    psd = np.asarray(psd)
    peak = freqs[np.argmax(psd)]
    assert abs(peak - w0) < 2.0 / 1024
    # tone-to-floor dynamic range is large
    floor = np.median(psd)
    assert psd.max() / floor > 1e3


def test_welch_parseval_white_noise():
    # integral of the PSD ~ signal power for white noise.
    rng = np.random.default_rng(1)
    x = rng.normal(size=1 << 14).astype(np.float32)
    freqs, psd = spectrum.welch_psd(jnp.asarray(x), nperseg=512)
    power = float(np.sum(np.asarray(psd))) / 512
    assert abs(power - 1.0) < 0.15


def test_spectrogram_chirp_moves():
    n = 1 << 14
    t = np.arange(n)
    inst = 0.05 + 0.3 * t / n
    x = np.exp(2j * np.pi * np.cumsum(inst)).astype(np.complex64)
    S = np.asarray(spectrum.spectrogram(jnp.asarray(x), nperseg=256))
    first = np.argmax(S[0])
    last = np.argmax(S[-1])
    assert last > first  # frequency ridge moves up


def test_agc_block_converges():
    rng = np.random.default_rng(2)
    x = (0.01 * (rng.normal(size=(20, 4096))
                 + 1j * rng.normal(size=(20, 4096)))).astype(np.complex64)
    g = agc.agc_init()
    for b in range(20):
        y, g = agc.agc_block(jnp.asarray(x[b]), g, target_rms=1.0)
    rms = float(np.sqrt(np.mean(np.abs(np.asarray(y)) ** 2)))
    assert abs(rms - 1.0) < 0.05


def test_agc_scan_tracks_step():
    # gain step in the middle of the stream: the loop re-converges.
    rng = np.random.default_rng(3)
    n = 4000
    amp = np.where(np.arange(n) < n // 2, 0.1, 2.0)
    x = (amp * np.exp(1j * 0.3 * np.arange(n))).astype(np.complex64)
    y, g = agc.agc_scan(jnp.asarray(x), agc.agc_init(), rate=5e-2)
    tail = np.abs(np.asarray(y)[-200:])
    assert abs(float(tail.mean()) - 1.0) < 0.1


def test_segments_matches_naive_slicing():
    rng = np.random.default_rng(3)
    x = rng.normal(size=4097).astype(np.float32)
    for nperseg, noverlap in [(256, 128), (256, 192), (100, 37), (64, 0)]:
        step = nperseg - noverlap
        nseg = (len(x) - noverlap) // step
        want = np.stack([x[i * step: i * step + nperseg]
                         for i in range(nseg)])
        got = np.asarray(spectrum._segments(jnp.asarray(x), nperseg,
                                            noverlap))
        assert got.shape == want.shape, (nperseg, noverlap)
        assert np.array_equal(got, want), (nperseg, noverlap)
