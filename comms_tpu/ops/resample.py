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

import jax.numpy as jnp

__all__ = [
    "decimate_block",
    "decimate_stream",
    "decimate_stream_init",
    "upsample_block",
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
