"""Complex mixer and NCO as closed-form phase ramps.

Functional parity with the reference's per-sample recurrences:

* ``Mixer`` (``/root/reference/src/mixer.rs:17-85``):
  ``y[n] = x[n] * exp(j*phase); phase += dphase`` (wrap to [0, 2*pi)).
* ``Nco``  (``/root/reference/src/demodulation/nco.rs:15-78``):
  ``push(perr): phase += dphase + perr; emit exp(j*phase)``.

TPU-first design: the mixer's phase recurrence has the closed form
``phase[n] = phase0 + n*dphase`` — a precomputed complex ramp times a
carried scalar phasor, so the whole block is one fused elementwise
multiply on the VPU instead of a sequential loop.  The NCO's phase
error feedback is a *cumulative sum* (associative), so a block of
phase errors becomes ``cumsum`` + elementwise ``exp`` — parallel, not
a scan.

Precision: ``n*dphase mod 2*pi`` is precomputed **on the host in
float64** for the block ramp (n up to ~1e6 would lose ~0.5 rad in
f32); the carried phase stays wrapped in [0, 2*pi) where f32 holds
~1e-7 relative error per block, so error does not accumulate over
stream length.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

__all__ = [
    "normalize_dphase",
    "mixer_ramp",
    "mixer_block",
    "nco_block",
]

_TWO_PI = 2.0 * np.pi


def normalize_dphase(dphase: float) -> float:
    """Wrap dphase to [0, 2*pi) in float64, as Mixer::new (mixer.rs:43-51)."""
    return float(np.mod(np.float64(dphase), _TWO_PI))


def mixer_ramp(n: int, dphase: float, dtype=np.complex64):
    """Host-precomputed unit ramp ``exp(j * (k*dphase mod 2*pi))`` for
    k in [0, n) plus the per-block phase advance ``n*dphase mod 2*pi``.

    Returns ``(ramp[n] ndarray, block_advance float)``.  Computed in
    float64 so block position never degrades the ramp.
    """
    dphase = np.float64(normalize_dphase(dphase))
    k = np.arange(n, dtype=np.float64)
    ph = np.mod(k * dphase, _TWO_PI)
    ramp = np.exp(1j * ph).astype(dtype)
    advance = float(np.mod(np.float64(n) * dphase, _TWO_PI))
    return ramp, advance


def mixer_block(x, phase, ramp, advance):
    """Mix one block: ``y[k] = x[k] * exp(j*(phase + k*dphase))``.

    ``phase`` is the carried scalar (float32 array, wrapped); ``ramp``/
    ``advance`` come from :func:`mixer_ramp` for ``len(x)``.  Returns
    ``(y, new_phase)``.

    Matches Mixer::mix (mixer.rs:73-84): the sample is multiplied by
    ``exp(j*phase)`` *before* the phase step, so sample k sees
    ``phase0 + k*dphase``.
    """
    x = jnp.asarray(x)
    phasor = jnp.exp(1j * phase.astype(jnp.float32)).astype(x.dtype)
    y = x * (phasor * jnp.asarray(ramp))
    new_phase = jnp.mod(phase + jnp.float32(advance), jnp.float32(_TWO_PI))
    return y, new_phase


def nco_block(perr, phase, dphase: float):
    """Run a block of phase errors through the NCO.

    Reference semantics (nco.rs:71-78): for each input
    ``phase += dphase + perr[k]`` *then* emit ``exp(j*phase)`` — i.e.
    output k carries ``phase0 + (k+1)*dphase + cumsum(perr)[k]``.

    ``cumsum`` is associative so the whole block is parallel on the
    VPU.  Returns ``(iq, new_phase)`` with ``new_phase`` wrapped.
    """
    perr = jnp.asarray(perr)
    dphase = normalize_dphase(dphase)
    n = perr.shape[0]
    # k*dphase precomputed exactly like the mixer ramp (host f64).
    k_dph = np.mod(
        (np.arange(1, n + 1, dtype=np.float64)) * np.float64(dphase), _TWO_PI
    ).astype(np.float32)
    ph = phase.astype(perr.dtype) + jnp.asarray(k_dph).astype(perr.dtype) \
        + jnp.cumsum(perr)
    iq = jnp.exp(1j * ph)
    new_phase = jnp.mod(ph[-1], jnp.float32(_TWO_PI)).astype(phase.dtype)
    return iq, new_phase
