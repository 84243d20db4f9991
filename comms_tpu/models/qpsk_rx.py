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

__all__ = ["QpskRxConfig", "make_rx_fn", "make_rx_fn_planar",
           "decide_bits", "resolve_ambiguity"]


class QpskRxConfig:
    def __init__(self, sps: int = 4, num_taps: int = 32,
                 beta: float = 0.25, timing_d: int = 5):
        self.sps = int(sps)
        self.num_taps = int(num_taps)
        self.beta = float(beta)
        self.timing_d = int(timing_d)
        t = taps.rrc_taps(num_taps, float(sps), beta)
        # Unit-energy matched filter so decisions are scale-free.
        # Real taps: fir_block runs two real GEMMs on the re/im planes
        # instead of a zero-imag complex GEMM.
        t = t / np.sqrt(np.sum(np.abs(t) ** 2))
        self.mf = fir.banded_tap_matrix(np.real(t).astype(np.float32))
        self.timing = demodulation.TimingEstimator(
            n=self.sps, d=self.timing_d, alpha=self.beta)
        # One-hot banded matrices for the cubic-Lagrange interpolator:
        # the traced 4-tap filter becomes sum_j lag[j] * E_j, one
        # device scalar-matrix product per tap, then ONE banded GEMM
        # replaces 3 full-rate rolls + weighted sum.
        eye4 = np.eye(4, dtype=np.float32)
        self.lag_bands = np.stack(
            [fir.banded_tap_matrix(eye4[j]) for j in range(4)])


def make_rx_fn(cfg: QpskRxConfig):
    """Returns ``rx(iq_pairs_f32[N, 2]) -> (sym_planes_f32[2, M],
    diag)``: synchronized symbols as re/im PLANES (row 0 = re, row 1 =
    im — the planar layout is ~free on device, unlike an [M, 2]
    interleave which is a 2/128-lane relayout; complex cannot cross
    the axon jit boundary either, runtime/boundary.py) plus a
    diagnostics dict of the estimates.  N should be a multiple of sps.

    TPU formulation notes (each measured on v5e, docs/PERF.md):
    derotations by the traced estimates use
    :func:`comms_tpu.ops.mixer.derotate_traced` (transcendentals on
    N/128-sized vectors, not N); the Lagrange interpolation, the
    traced integer timing shift, the max-energy phase pick AND the
    symbol downsample all fold into ONE traced-tap decimating GEMM
    (:func:`comms_tpu.ops.fir.fir_decimate_traced`) — a traced
    ``jnp.roll`` of the full-rate block costs ~10x that GEMM.
    """

    def rx(iq_pairs):
        return _rx_core(cfg, iq_pairs[:, 0], iq_pairs[:, 1])

    return jax.jit(rx)


def make_rx_fn_planar(cfg: QpskRxConfig):
    """Planar twin of :func:`make_rx_fn`: ``rx(re[N], im[N])`` —
    avoids the [N, 2] pair deinterleave, a 2/128-lane relayout that
    measured 3.4 ms at 33M samples (~25% of the optimized receiver)
    on v5e.  The production ingest unpacks interleaved i16 IQ into
    planes lane-parallel (io/raw_iq), so planes are the native rx
    input; the pairs entry point exists for reference-parity callers.
    """

    def rx(re, im):
        return _rx_core(cfg, re, im)

    return jax.jit(rx)


def _rx_core(cfg: QpskRxConfig, re, im):
        x = jax.lax.complex(re, im)
        n = x.shape[0]

        # --- coarse carrier frequency (pre-matched-filter; reference
        # tolerance is 0.01 rad/sample — a fine stage follows at
        # symbol rate).
        f_est = demodulation.frequency_offset_estimate(x)
        x = mixer.derotate_traced(x, f_est)

        # --- matched filter (real-tap planar GEMM).
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
        lag = num / den                       # [4] traced f32
        # Lagrange as one banded GEMM: B = sum_j lag[j] * E_j.  With
        # zero context the first 3 outputs differ from the circular
        # rolls; both are contaminated and masked below.
        B_lag = jnp.tensordot(lag, jnp.asarray(cfg.lag_bands), axes=1)
        yd, _ = fir.fir_block(y, B_lag, jnp.zeros((3,), y.dtype))

        # --- symbol phase: pick the max-energy phase.  Computed on
        # the unrolled yd (edge contamination is O(taps) of O(N)
        # samples), then mapped through the shift so it matches the
        # post-shift column argmax exactly.
        e4 = jnp.sum(
            (jnp.real(yd) ** 2 + jnp.imag(yd) ** 2)[
                : (n // cfg.sps) * cfg.sps].reshape(-1, cfg.sps), axis=0)
        shift = d_int + 1  # +1: interpolator basepoint
        p_star = jnp.mod(jnp.argmax(e4).astype(jnp.int32) + shift,
                         cfg.sps)

        # Fold the integer timing shift, the phase pick AND the
        # Lagrange interpolation + symbol downsample into ONE traced-
        # tap decimating GEMM:
        #   sym[m] = yd[sps*m - shift2] = sum_j lag[j]*y[sps*m-shift2-j]
        # i.e. a 3*sps-tap decimating FIR with lag placed at traced
        # offset t0 = shift2 + sps (one extra leading frame via
        # tail_zeros keeps t0 >= 0; the first output is dropped).  A
        # traced jnp.roll of the full-rate block — the previous
        # formulation — measured 16 ms at 33M samples on v5e, ~40% of
        # the whole receiver (docs/PERF.md).
        shift2 = shift - p_star          # in [-sps..2] for |delay|<~2
        t0 = shift2 + cfg.sps
        tt = jnp.arange(3 * cfg.sps)
        flat = jnp.where((tt >= t0) & (tt < t0 + 4),
                         lag[jnp.clip(tt - t0, 0, 3)], 0.0)
        sym_all = fir.fir_decimate_traced(y, flat, cfg.sps,
                                          tail_zeros=cfg.sps)
        sym = sym_all[1:]

        # Zero the contaminated block edges (Lagrange zero-context
        # head, shifted-off-the-end tail) — the same lo/hi rule the
        # full-rate mask used, applied at symbol resolution (callers
        # should skip the first few symbols either way).
        lo = 3 + jnp.maximum(shift2, 0)
        hi = n + jnp.minimum(shift2, 0)
        m4 = jnp.arange(sym.shape[0]) * cfg.sps
        sym = jnp.where((m4 < lo) | (m4 >= hi), 0.0 + 0.0j, sym)

        # --- fine carrier frequency at symbol rate: 4th power removes
        # the QPSK modulation from the lag-1 product.
        lag1 = (sym[1:] * jnp.conj(sym[:-1])) ** 4
        w_fine = jnp.angle(jnp.sum(lag1)) / 4.0
        sym = mixer.derotate_traced(sym, w_fine)

        # --- carrier phase (Mengali 5.7.4, M=4).  The estimator
        # aligns s^4 to the real axis, leaving the constellation on
        # the axes; rotate a further pi/4 back onto +-1+-1j.
        p_est = demodulation.psk_phase_estimate(sym, 4)
        sym = sym * jnp.exp(1j * (jnp.pi / 4 - p_est))  # scalar phasor

        diag = {"freq": f_est, "timing": t_est, "freq_fine": w_fine,
                "phase": p_est, "sym_phase": p_star}
        sym_planes = jnp.stack([jnp.real(sym), jnp.imag(sym)], axis=0)
        return sym_planes, diag


def _as_complex(symbols) -> np.ndarray:
    """Accept complex [M], planar [2, M] (rx output), or pairs [M, 2]."""
    s = np.asarray(symbols)
    if s.ndim == 2 and s.shape[0] == 2 and s.shape[1] != 2:
        return s[0] + 1j * s[1]
    if s.ndim == 2 and s.shape[-1] == 2:
        return s[:, 0] + 1j * s[:, 1]
    return s


def decide_bits(symbols) -> np.ndarray:
    """Hard decisions back to the tx bit convention
    (single_thread_qpsk.rs:29-36: re = 2*b0 - 1, im = 2*b1 - 1).
    Accepts complex [M], planar [2, M], or re/im pairs [M, 2]."""
    s = _as_complex(symbols)
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
    s = _as_complex(symbols)
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
