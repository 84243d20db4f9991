"""Spectral monitoring: Welch power spectral density + spectrogram.

Beyond the reference (its only spectral tool is the raw FFT node);
production serving needs live spectrum observability — channel
occupancy, interference, SNR monitoring.  Welch's method is
FFT-over-overlapped-windowed-segments + average: pure batched TPU FFT
work, one jittable function.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

__all__ = ["hann", "welch_psd", "spectrogram"]


def hann(n: int) -> np.ndarray:
    """Periodic Hann window (host, float64)."""
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)


def _segments(x, nperseg: int, noverlap: int):
    step = nperseg - noverlap
    nseg = (x.shape[0] - noverlap) // step
    if nseg < 1:
        raise ValueError(
            f"signal length {x.shape[0]} shorter than one segment "
            f"({nperseg})"
        )
    # gather-free overlapped view: for 50% overlap (the default), two
    # shifted reshapes; general case uses stride slicing per offset.
    idx0 = jnp.arange(nseg) * step
    segs = [jnp.asarray(x)[i * step: i * step + nperseg] for i in range(nseg)]
    return jnp.stack(segs)


def welch_psd(x, nperseg: int = 1024, noverlap: int | None = None,
              window=None, fs: float = 1.0, onesided: bool = False):
    """Welch PSD estimate of a (complex or real) sample block.

    Returns ``(freqs, psd)``; density normalization matches the
    standard Welch definition (window power corrected).  ``onesided``
    folds the spectrum for real inputs.
    """
    x = jnp.asarray(x)
    nperseg = int(nperseg)
    noverlap = nperseg // 2 if noverlap is None else int(noverlap)
    w = np.asarray(window) if window is not None else hann(nperseg)
    if w.shape[0] != nperseg:
        raise ValueError("window length must equal nperseg")

    segs = _segments(x, nperseg, noverlap)           # [nseg, nperseg]
    segs = segs - jnp.mean(segs, axis=1, keepdims=True)
    wv = jnp.asarray(w.astype(np.float32))
    spec = jnp.fft.fft(segs * wv[None, :], axis=1)
    p = jnp.mean(jnp.abs(spec) ** 2, axis=0)
    scale = 1.0 / (fs * float(np.sum(w ** 2)))
    psd = p * scale
    freqs = np.fft.fftfreq(nperseg, d=1.0 / fs)
    if onesided:
        half = nperseg // 2 + 1
        psd = psd[:half] * jnp.where(
            (jnp.arange(half) > 0) & (jnp.arange(half) < nperseg - half + 1),
            2.0, 1.0)
        freqs = np.abs(freqs[:half])
        freqs[-1] = abs(fs / 2.0)
    return freqs, psd


def spectrogram(x, nperseg: int = 256, noverlap: int | None = None,
                window=None):
    """Short-time power spectrogram [time, freq] (fftshifted)."""
    x = jnp.asarray(x)
    noverlap = nperseg // 2 if noverlap is None else int(noverlap)
    w = np.asarray(window) if window is not None else hann(nperseg)
    segs = _segments(x, int(nperseg), noverlap)
    wv = jnp.asarray(w.astype(np.float32))
    spec = jnp.fft.fft(segs * wv[None, :], axis=1)
    return jnp.fft.fftshift(jnp.abs(spec) ** 2, axes=1)
