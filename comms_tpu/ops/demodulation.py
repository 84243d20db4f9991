"""Demodulation and synchronization estimators.

Functional parity with the reference:

* FM quadrature demod (``/root/reference/src/modulation/analog.rs:22-34``):
  ``y[n] = arg(x[n] * conj(x[n-1]))`` with ``prev`` carried across
  blocks (zero-initialized; arg(0) = 0).
* Frequency-offset estimator
  (``src/demodulation/frequency_estimator.rs:27-42``):
  ``arg(sum(x[1:] * conj(x[:-1])))`` rad/sample (Meyr/Moeneclaey/
  Fechtel ch. 8.2.2).
* PSK/QAM phase estimators (``src/demodulation/phase_estimator.rs:26-65``):
  ``arg(sum(x^m))/m`` and ``arg(sum(-x^4))/4`` (Mengali 5.7.4/5.7.5).
* Feedforward NDA ML timing estimator
  (``src/demodulation/timing_estimator.rs:13-113``, Mengali ch. 8.4):
  mix by ``exp(-j*pi*n/N)``, run parallel q-filter and ND-sample
  delay, ``-N * arg(sum(q .* d)) / (2*pi)`` samples.

All estimators are elementwise products + one reduction — VPU work
that XLA fuses; on a sharded time axis the sums become ``psum``.
The FM demod's lag-1 product is the 1-sample-halo op of the
framework (SURVEY.md section 5).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from comms_tpu.ops import fir as _fir
from comms_tpu.ops import taps as _taps

__all__ = [
    "fm_demod_init",
    "fm_demod_block",
    "frequency_offset_estimate",
    "psk_phase_estimate",
    "qam_phase_estimate",
    "TimingEstimator",
    "costas_loop_block",
]


def fm_demod_init(dtype=jnp.complex64):
    """Carried ``prev`` sample, zero-initialized (analog.rs:44-47)."""
    return jnp.zeros((), dtype=dtype)


def fm_demod_block(x, prev):
    """Quadrature FM demod of one block.  Returns ``(y, new_prev)``;
    y is real with the dtype of ``x.real``."""
    x = jnp.asarray(x)
    shifted = jnp.concatenate([prev[None].astype(x.dtype), x[:-1]])
    y = jnp.angle(x * jnp.conj(shifted))
    return y.astype(x.real.dtype), x[-1]


def frequency_offset_estimate(x):
    """Carrier-offset estimate in rad/sample (pre-matched-filter)."""
    x = jnp.asarray(x)
    acc = jnp.sum(x[1:] * jnp.conj(x[:-1]))
    return jnp.angle(acc)


def psk_phase_estimate(symbols, m: int):
    """Mengali 5.7.4: ``arg(sum(x^m)) / m`` for M-PSK symbols."""
    x = jnp.asarray(symbols)
    return jnp.angle(jnp.sum(x ** int(m))) / float(m)


def qam_phase_estimate(symbols):
    """Mengali 5.7.5: ``arg(sum(-x^4)) / 4`` for square QAM."""
    x = jnp.asarray(symbols)
    return jnp.angle(jnp.sum(-(x ** 4))) / 4.0


def costas_loop_block(symbols, state, alpha: float, beta: float,
                      order: int = 4):
    """Decision-directed Costas carrier-tracking loop over one block.

    The closed-loop use of the reference's NCO (nco.rs:71-78: each
    step ``phase += dphase + perr``): a second-order loop where the
    M-th-power phase detector output drives the NCO.  The per-sample
    recurrence is irreducible, so it runs as a ``lax.scan`` — the one
    op class the block framework keeps sequential by design
    (SURVEY.md section 7, "hard parts"); track at symbol rate, off the
    sample-rate hot path.

    Args:
      symbols: [N] complex symbol-rate input.
      state: ``(phase, freq)`` float32 scalars (start ``(0, 0)``).
      alpha, beta: proportional / integrator gains.
      order: constellation order (4 = QPSK).

    Returns ``(corrected, (phase, freq))``.
    """
    x = jnp.asarray(symbols)
    phase0, freq0 = state

    def step(carry, s):
        ph, fr = carry
        c = s * jnp.exp(-1j * ph)
        # M-th power detector with the -x^M sign (as
        # qam_phase_estimate): for M-PSK at the +-1+-1j-style
        # constellation, c^M = -|c|^M at lock, so the error zero sits
        # at the constellation points, not the decision boundaries.
        err = jnp.angle(-(c ** order)) / order
        fr = fr + beta * err
        ph = ph + fr + alpha * err
        return (ph, fr), c

    (ph, fr), y = jax.lax.scan(step, (phase0, freq0), x)
    return y, (ph, fr)


class TimingEstimator:
    """Feedforward NDA ML timing estimator (Mengali ch. 8.4).

    Mirrors the reference construction (timing_estimator.rs:42-58):
    q-filter = ``qfilt_taps(2*N*D + 1, alpha, N)``; delay filter =
    ND zeros followed by 1 (a pure ND-sample delay).  Each ``push``
    uses fresh zero filter state (timing_estimator.rs:97-103), so the
    estimate is a pure function of the block — ideal for jit.

    The mixing ramp ``exp(-j*pi*n/N)`` is precomputed on the host in
    f64 for the configured block length and cached per length.
    """

    def __init__(self, n: int, d: int, alpha: float):
        if not 0.0 <= alpha <= 1.0:
            raise _taps.InvalidRolloffError(f"alpha={alpha} not in [0, 1]")
        self.n = int(n)
        self.d = int(d)
        self.alpha = float(alpha)
        q = _taps.qfilt_taps(2 * self.n * self.d + 1, alpha, self.n)
        # q(t) is real (math.rs:307-342); real taps let fir_block run
        # two real GEMMs on the re/im planes instead of a complex one.
        self.qfilt = np.real(q).astype(np.float64)
        self._ramps: dict[int, np.ndarray] = {}

    def _ramp(self, length: int) -> np.ndarray:
        r = self._ramps.get(length)
        if r is None:
            k = np.arange(length, dtype=np.float64)
            r = np.exp(-1j * np.pi * k / self.n)
            self._ramps[length] = r
        return r

    def _mixed(self, x):
        """``(conj(x)*r, x*r)`` for ``r = exp(-j*pi*k/N)``.

        r is periodic with period 2N; when the period divides the
        128-lane tile and the block length, the ramp is a [128]
        broadcast against the reshaped signal instead of an N-sized
        complex constant (8 B/sample of pure HBM read)."""
        L = int(x.shape[0])
        per = 2 * self.n
        if L % 128 == 0 and 128 % per == 0:
            r128 = np.tile(self._ramp(per), 128 // per)
            r = jnp.asarray(r128.astype(x.dtype))[None, :]
            X2 = x.reshape(-1, 128)
            return (jnp.conj(X2) * r).reshape(L), (X2 * r).reshape(L)
        r = jnp.asarray(self._ramp(L), dtype=x.dtype)
        return jnp.conj(x) * r, x * r

    def estimate(self, samples):
        """Timing estimate in samples for one block (push semantics)."""
        x = jnp.asarray(samples)
        qin, din = self._mixed(x)
        qout = _fir.fir_apply(qin, self.qfilt.astype(np.float32)
                              if x.dtype == jnp.complex64 else self.qfilt)
        nd = self.n * self.d
        # Delay filter = [0]*ND + [1]: pure ND-sample causal delay.
        # Folded into the reduction as a sliced dot (the delayed
        # products for m < ND are zero) — materializing the shifted
        # array via concatenate cost a full-rate write+read pass.
        if nd:
            s = jnp.sum(qout[nd:] * din[:-nd])
        else:
            s = jnp.sum(qout * din)
        return -float(self.n) * jnp.angle(s) / (2.0 * np.pi)

    __call__ = estimate
