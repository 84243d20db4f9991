"""QPSK receiver: matched filter -> sync -> symbol decisions -> bits.

The reference ships the *pieces* of a digital receiver — frequency
(frequency_estimator.rs), phase (phase_estimator.rs) and timing
(timing_estimator.rs) estimators — but never a receiver that closes
the loop.  This model composes them into the full feedforward
synchronization chain for the qpsk_tx waveform
(RRC sps=4, beta=0.25, consecutive-bit-pair map):

    i16 IQ -> frequency estimate (pre-matched-filter, Meyr 8.2.2)
           -> mixer de-rotation (closed-form ramp)
           -> RRC matched filter
           -> NDA ML timing estimate (Mengali 8.4) -> cubic-Lagrange
              fractional-delay correction + symbol downsample
           -> M-power phase estimate (Mengali 5.7.4) -> de-rotation
           -> hard decisions -> bits (+ differential resolution of the
              4-fold phase ambiguity is left to the caller / pilots;
              the loopback test resolves it by trying the 4 rotations)

Everything is one jittable block function; estimates are reductions
(psum-ready under sharding).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from comms_tpu.ops import demodulation, fir, interp, mixer, taps

__all__ = ["QpskRxConfig", "make_rx_fn", "decide_bits", "resolve_ambiguity"]


class QpskRxConfig:
    def __init__(self, sps: int = 4, num_taps: int = 32,
                 beta: float = 0.25, timing_d: int = 5):
        self.sps = int(sps)
        self.num_taps = int(num_taps)
        self.beta = float(beta)
        self.timing_d = int(timing_d)
        t = taps.rrc_taps(num_taps, float(sps), beta)
        # Unit-energy matched filter so decisions are scale-free.
        t = t / np.sqrt(np.sum(np.abs(t) ** 2))
        self.mf = fir.banded_tap_matrix(t.astype(np.complex64))
        self.timing = demodulation.TimingEstimator(
            n=self.sps, d=self.timing_d, alpha=self.beta)


def make_rx_fn(cfg: QpskRxConfig):
    """Returns ``rx(iq_pairs_f32[N, 2]) -> (sym_pairs_f32[M, 2],
    diag)``: synchronized symbols as re/im pairs (complex cannot cross
    the axon jit boundary, runtime/boundary.py) plus a diagnostics
    dict of the estimates.  N should be a multiple of sps."""

    def rx(iq_pairs):
        x = jax.lax.complex(iq_pairs[:, 0], iq_pairs[:, 1])
        n = x.shape[0]

        # --- coarse carrier frequency (pre-matched-filter; reference
        # tolerance is 0.01 rad/sample — a fine stage follows at
        # symbol rate).
        f_est = demodulation.frequency_offset_estimate(x)
        k = jnp.arange(n, dtype=jnp.float32)
        x = x * jnp.exp(-1j * f_est * k)

        # --- matched filter.
        y, _ = fir.fir_block(x, cfg.mf, fir.init_ctx(cfg.num_taps))

        # --- timing (Mengali 8.4): estimate ~ -(sampling delay);
        # correct with a traced-mu cubic Lagrange interpolator.
        t_est = cfg.timing.estimate(y)
        delay = -t_est
        mu = delay - jnp.floor(delay)
        d_int = jnp.floor(delay).astype(jnp.int32)
        tmu = 1.0 + mu
        pts = jnp.asarray([0.0, 1.0, 2.0, 3.0], dtype=jnp.float32)
        num = jnp.prod(
            jnp.where(jnp.eye(4, dtype=bool),
                      1.0, tmu - pts[None, :]), axis=1)
        den = jnp.prod(
            jnp.where(jnp.eye(4, dtype=bool),
                      1.0, pts[:, None] - pts[None, :]), axis=1)
        lag = (num / den).astype(jnp.complex64)
        yd = (lag[0] * y
              + lag[1] * jnp.roll(y, 1)
              + lag[2] * jnp.roll(y, 2)
              + lag[3] * jnp.roll(y, 3))
        shift = d_int + 1  # +1: interpolator basepoint
        yd = jnp.roll(yd, shift)
        # roll is circular: a positive shift wraps tail samples to the
        # block head, a negative one wraps head samples (already
        # Lagrange-contaminated by the roll(y, 1..3) above) to the
        # tail — zero BOTH contaminated ends so they cannot masquerade
        # as valid symbols (callers should skip the first few symbols
        # either way; see module docstring).
        lo = 3 + jnp.maximum(shift, 0)
        hi = yd.shape[0] + jnp.minimum(shift, 0)
        idx = jnp.arange(yd.shape[0])
        yd = jnp.where((idx < lo) | (idx >= hi), 0.0 + 0.0j, yd)

        # --- symbol downsample: pick the max-energy phase (static
        # shape; traced index).
        frames = yd[: (yd.shape[0] // cfg.sps) * cfg.sps].reshape(
            -1, cfg.sps)
        energy = jnp.sum(jnp.abs(frames) ** 2, axis=0)
        p_star = jnp.argmax(energy)
        sym = jnp.take(frames, p_star, axis=1)

        # --- fine carrier frequency at symbol rate: 4th power removes
        # the QPSK modulation from the lag-1 product.
        lag1 = (sym[1:] * jnp.conj(sym[:-1])) ** 4
        w_fine = jnp.angle(jnp.sum(lag1)) / 4.0
        m = jnp.arange(sym.shape[0], dtype=jnp.float32)
        sym = sym * jnp.exp(-1j * w_fine * m)

        # --- carrier phase (Mengali 5.7.4, M=4).  The estimator
        # aligns s^4 to the real axis, leaving the constellation on
        # the axes; rotate a further pi/4 back onto +-1+-1j.
        p_est = demodulation.psk_phase_estimate(sym, 4)
        sym = sym * jnp.exp(1j * (jnp.pi / 4 - p_est))

        diag = {"freq": f_est, "timing": t_est, "freq_fine": w_fine,
                "phase": p_est, "sym_phase": p_star}
        sym_pairs = jnp.stack([jnp.real(sym), jnp.imag(sym)], axis=-1)
        return sym_pairs, diag

    return jax.jit(rx)


def decide_bits(symbols) -> np.ndarray:
    """Hard decisions back to the tx bit convention
    (single_thread_qpsk.rs:29-36: re = 2*b0 - 1, im = 2*b1 - 1).
    Accepts complex [M] or re/im pairs [M, 2]."""
    s = np.asarray(symbols)
    if s.ndim == 2 and s.shape[-1] == 2:
        s = s[:, 0] + 1j * s[:, 1]
    b0 = (s.real > 0).astype(np.uint8)
    b1 = (s.imag > 0).astype(np.uint8)
    out = np.empty(2 * len(s), dtype=np.uint8)
    out[0::2] = b0
    out[1::2] = b1
    return out


def resolve_ambiguity(symbols, reference_bits, search: int = 1024,
                      max_lag: int = 16):
    """Resolve the 4-fold phase ambiguity and the pipeline's symbol
    lag (tx+rx group delay, ~(2*num_taps-1)/sps symbols) against known
    bits: try the 4 rotations x lags in [0, max_lag], return
    ``((rot, lag), errors, bits_compared)`` for the best candidate.
    A real system resolves this with pilots/differential coding; the
    loopback tests use the transmitted bits."""
    best = None
    s = np.asarray(symbols)
    if s.ndim == 2 and s.shape[-1] == 2:
        s = s[:, 0] + 1j * s[:, 1]
    for rot in range(4):
        cand = decide_bits(s * np.exp(1j * np.pi / 2 * rot))
        for lag in range(0, max_lag + 1):
            a = cand[2 * lag:]
            m = min(len(a), len(reference_bits), search * 2)
            if m <= 0:
                continue
            errs = int(np.sum(a[:m] != reference_bits[:m]))
            if best is None or errs < best[1]:
                best = ((rot, lag), errs, m)
    return best
