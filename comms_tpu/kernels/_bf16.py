"""Shared bf16 hi/lo split-operand helpers for the Pallas kernels.

Mosaic does not lower ``lax.Precision.HIGH`` (the bf16_x3 algorithm),
so the kernels split f32 operands into hi/lo bfloat16 halves by hand
and run each logical matmul as three bf16 MXU passes
(hi*hi + hi*lo + lo*hi — the ~2^-32 lo*lo term is dropped): ~1e-5
relative error at 2x the MXU rate of Mosaic's 6-pass f32 HIGHEST.
One definition here keeps the four kernels' precision behavior from
silently diverging.
"""

from __future__ import annotations

import functools

import numpy as np

import jax.numpy as jnp

__all__ = ["device_split", "dot3", "host_split"]

_BF = jnp.bfloat16
_F32 = jnp.float32


def device_split(a):
    """In-kernel hi/lo bf16 split of an f32 array (VPU: 2 converts +
    1 subtract)."""
    hi = a.astype(_BF)
    lo = (a - hi.astype(_F32)).astype(_BF)
    return hi, lo


def dot3(ah, al, bh, bl):
    """f32-grade ``a @ b`` via 3 bf16 MXU passes."""
    d = functools.partial(jnp.dot, preferred_element_type=_F32)
    return d(ah, bh) + (d(ah, bl) + d(al, bh))


def host_split(a64):
    """Host-side hi/lo bf16 split of an f64 array — the lo term
    captures the full f32-grade residual (computed in f64), so
    hi + lo reproduces the f64 value to ~2^-16 relative and the
    split itself adds no device work.

    Returns NUMPY arrays (ml_dtypes bf16): a ``jnp.asarray`` here
    would yield tracers when the caller runs under an outer trace
    (e.g. a bench fori_loop body), and callers that np-convert or
    cache the result would then blow up (`_dft128` did)."""
    a64 = np.asarray(a64, np.float64)
    hi = a64.astype(np.float32).astype(_BF)
    lo = (a64 - np.asarray(hi, np.float64)).astype(np.float32).astype(_BF)
    return np.asarray(hi), np.asarray(lo)
