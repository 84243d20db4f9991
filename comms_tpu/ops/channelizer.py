"""Critically-sampled polyphase DFT-filterbank channelizer.

The reference has no channelizer; this op fulfils the BASELINE config
"64-channel polyphase channelizer: FFT-based channelization, channels
sharded across chips" and is the EP-analogue of the framework
(SURVEY.md section 2.4): channel k's stream equals

    y_k[m] = decimate_K( FIR(h, x * exp(-j*2*pi*k*n/K)) )[m]
           = sum_n h[n] * x[m*K - n] * exp(+j*2*pi*k*n/K)

computed for ALL K channels at once via the polyphase decomposition:
branch filters v[m, p] = sum_j h[j*K+p] * x[(m-j)*K - p] (M small
MACs on [frames, K] arrays, VPU-fused), then a length-K DFT across
the branch axis (one batched TPU FFT).  Cost per input sample: M MACs
+ log K, vs K*T for the naive bank — the classic ~K x win.

Implementation shares :func:`comms_tpu.ops.fir.poly_mac_frames` with
the decimating FIR: the within-row tap reversal is folded into the
host-side coefficient matrix (device-side flips measured as the
dominant temp-memory cost on TPU), and the branch reversal c = K-1-p
folds into the DFT direction plus a constant per-channel phase
e^{-2i pi ch / K}:

    y[m, ch] = e^{-2i pi ch / K} * FFT_c(V[m, :])[ch]

Carried state: the last T-1 input samples (identical halo shape to
the streaming FIR, so time-sharding uses the same ppermute exchange).

Prototype filter: any lowpass with cutoff ~pi/K; :func:`design_prototype`
gives a windowed-sinc (Hamming), computed on host in float64.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from comms_tpu.ops import fir as _fir

__all__ = [
    "design_prototype",
    "branch_taps",
    "channelizer_init_ctx",
    "channelize_block",
    "channelize_oracle",
]


def design_prototype(num_channels: int, taps_per_branch: int) -> np.ndarray:
    """Hamming-windowed sinc lowpass, cutoff 1/(2K), unit DC gain,
    length K * taps_per_branch (host, float64)."""
    K, M = int(num_channels), int(taps_per_branch)
    T = K * M
    n = np.arange(T, dtype=np.float64) - (T - 1) / 2.0
    h = np.sinc(n / K)
    h *= np.hamming(T)
    return h / h.sum()


def branch_taps(prototype, num_channels: int) -> np.ndarray:
    """h[T] -> coefficient matrix [M, K] for :func:`channelize_block`
    (tap reversal pre-applied; see module docstring).  T must be a
    multiple of K."""
    h = np.asarray(prototype)
    K = int(num_channels)
    if h.shape[0] % K:
        raise ValueError(f"prototype length {h.shape[0]} not a multiple "
                         f"of num_channels {K}")
    return _fir.decimating_branch_taps(h, K)


def channelizer_init_ctx(prototype_len: int, dtype=jnp.complex64):
    """Zero carried context of T-1 input samples."""
    return jnp.zeros((int(prototype_len) - 1,), dtype=dtype)


def channelize_block(x, Hb, ctx):
    """Channelize one block.

    Args:
      x: [N] complex, N % K == 0.
      Hb: [M, K] branch-tap matrix from :func:`branch_taps`.
      ctx: carried [M*K - 1] input tail.

    Returns ``(y[N//K, K], new_ctx)`` — frame m, channel k.
    """
    x = jnp.asarray(x)
    Hb = jnp.asarray(Hb)
    M, K = Hb.shape
    V, new_ctx = _fir.poly_mac_frames(x, Hb, ctx)   # [frames, K]
    # V[m, c] holds branch p = K-1-c; the reversal folds into the DFT:
    #   sum_p v[m,p] e^{+2i pi ch p / K} = e^{-2i pi ch / K} FFT(V)[ch]
    y = jnp.fft.fft(V, axis=1)
    ch = np.arange(K)
    fix = np.exp(-2j * np.pi * ch / K)
    y = y * jnp.asarray(fix, dtype=jnp.result_type(y.dtype, jnp.complex64))
    return y.astype(jnp.result_type(x.dtype, jnp.complex64)), new_ctx


def channelize_oracle(x, prototype, num_channels: int) -> np.ndarray:
    """Direct per-channel mix->FIR->decimate oracle (float64 host).
    For tests: must equal :func:`channelize_block` from zero context."""
    x = np.asarray(x, dtype=np.complex128)
    h = np.asarray(prototype, dtype=np.float64)
    K = int(num_channels)
    N = len(x)
    out = np.zeros((N // K, K), dtype=np.complex128)
    n = np.arange(N)
    for k in range(K):
        z = x * np.exp(-2j * np.pi * k * n / K)
        w = np.convolve(z, h)[:N]  # causal FIR, zero initial state
        out[:, k] = w[::K][: N // K]
    return out
