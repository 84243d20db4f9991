"""Decimation and zero-stuffing upsampling.

Functional parity with ``/root/reference/src/util/resample_node.rs``:

* ``DecimateNode.decimate`` (resample_node.rs:53-65): keep every
  ``rate``-th sample starting at index 0, **index resets each batch**;
  rate 0/1 = passthrough.
* ``UpsampleNode.upsample`` (resample_node.rs:120-131): each sample
  followed by ``rate - 1`` zeros; rate 0/1 = passthrough.

Both are static-shape strided slices / scatters that XLA fuses into
neighbours.  A streaming decimator variant carries the phase offset
across blocks (the semantically-correct streaming behavior the
reference lacks); the per-block-reset variant is kept for exact
reference parity.  Rates are static Python ints (shapes under jit
must be static).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

__all__ = [
    "decimate_block",
    "decimate_stream",
    "decimate_stream_init",
    "upsample_block",
    "rational_taps",
    "rational_resample_init",
    "rational_resample_block",
]


def decimate_block(x, rate: int):
    """Per-block decimation, phase reset at block start (reference
    semantics).  Output length = ceil(len(x)/rate)."""
    rate = int(rate)
    if rate in (0, 1):
        return jnp.asarray(x)
    return jnp.asarray(x)[::rate]


def decimate_stream_init():
    """Initial carried offset (0 = first sample kept)."""
    return jnp.zeros((), dtype=jnp.int32)


def decimate_stream(x, offset, rate: int):
    """Streaming decimation with carried phase.

    Keeps ``x[offset::rate]``.  For jit-compatibility the output shape
    must be static, so block length N must be a multiple of ``rate``:
    exactly N//rate samples are produced for any offset in [0, rate).
    Returns ``(y, new_offset)``.
    """
    x = jnp.asarray(x)
    rate = int(rate)
    if rate in (0, 1):
        return x, offset
    n = x.shape[0]
    if n % rate != 0:
        raise ValueError(
            f"streaming decimation needs len(x) % rate == 0, got {n} % {rate}"
        )
    frames = x.reshape(n // rate, rate)
    y = jnp.take(frames, offset.astype(jnp.int32), axis=1)
    new_offset = jnp.mod(offset.astype(jnp.int32) - jnp.int32(n), rate)
    return y, new_offset


def upsample_block(x, rate: int):
    """Zero-stuff by ``rate`` (resample_node.rs:120-131)."""
    x = jnp.asarray(x)
    rate = int(rate)
    if rate in (0, 1):
        return x
    out = jnp.zeros((x.shape[0], rate), dtype=x.dtype)
    out = out.at[:, 0].set(x)
    return out.reshape(-1)


# ----------------------- rational P/Q resampling -----------------------
# Beyond the reference (it has only integer zero-stuff/decimate): the
# standard polyphase rational resampler, y running at rate P/Q of x,
# equal to zero-stuff-by-P -> FIR(h) -> keep-every-Q.  Output class
# r = m mod P (gcd normalization applied) is a decimate-by-Q FIR on a
# shifted input with sub-filter phase r*Q mod P — P reuses of the same
# poly-MAC machinery as the decimating FIR / channelizer.


def rational_taps(h, up: int, down: int):
    """Prototype lowpass h -> per-class coefficient matrices.

    Returns ``(C[P][M, Q], offsets[P], L)`` host-side, where class r
    of the output (m = r + k*P) is computed from input samples at
    stride Q starting at class offset, with coefficient matrix C[r].
    The zero-stuffed identity: y[m] = sum_t h[t] u[m*Q - t] with
    u = zero-stuff-by-P of x, i.e. y[m] = sum_j h[m*Q mod P + j*P] *
    x[floor(m*Q/P) - j].
    """
    import math as _math

    from comms_tpu.ops import fir as _fir

    h = np.asarray(h)
    g = _math.gcd(int(up), int(down))
    P, Q = int(up) // g, int(down) // g
    # per-class sub-filter: h_r[j] = h[(r*Q) % P + j*P]
    mats = []
    offsets = []
    for r in range(P):
        phase = (r * Q) % P
        sub = h[phase::P]
        # class-r output k uses x[floor((r + kP) Q / P) - j]
        #   = x[ (rQ - phase)/P + kQ - j ]
        offsets.append((r * Q - phase) // P)
        mats.append(_fir.decimating_branch_taps(sub, Q))
    return mats, offsets, P


def rational_resample_init(mats, dtype=jnp.complex64):
    """Carried input tail long enough for every class (max halo)."""
    halo = max(m.size - 1 for m in mats)
    return jnp.zeros((halo,), dtype=dtype)


def rational_resample_block(x, mats, offsets, P: int, ctx):
    """Resample one block by P/Q (from :func:`rational_taps`).

    ``len(x) % Q == 0``; output length = len(x) * P / Q.  Returns
    ``(y, new_ctx)``; streaming-correct for any block chopping.
    """
    from comms_tpu.ops import fir as _fir

    x = jnp.asarray(x)
    Q = mats[0].shape[1]
    N = x.shape[0]
    if N % Q:
        raise ValueError(f"block {N} not a multiple of down-rate {Q}")
    halo = ctx.shape[0]
    xe = jnp.concatenate([ctx.astype(x.dtype), x])
    new_ctx = xe[-halo:]
    # classes with positive start offsets slice up to Q-1 past the
    # block end; pad (values never reach a valid output).
    xe = jnp.concatenate([xe, jnp.zeros((Q,), x.dtype)])
    K = N // Q  # outputs per class
    outs = []
    for r in range(P):
        Mr = mats[r].shape[0]
        hr = mats[r].size - 1  # this class's own halo
        # class-r inputs start at offsets[r] within the block; the
        # class's poly MAC wants its ctx immediately before that.
        start = halo + offsets[r]
        seg = jax.lax.dynamic_slice_in_dim(xe, start - hr, hr + N)
        yr, _ = _fir.fir_decimate_poly(seg[hr:], mats[r], seg[:hr])
        outs.append(yr)
    y = jnp.stack(outs, axis=1).reshape(K * P)
    return y, new_ctx
