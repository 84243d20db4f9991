"""Digital modulation maps (BPSK / QPSK), fully vectorized.

Functional parity with ``/root/reference/src/modulation/digital.rs``:

* ``bpsk_bit_mod``  (digital.rs:6-14):  0 -> 1+0j, 1 -> -1+0j
* ``bpsk_byte_mod`` (digital.rs:17-21): 8 samples/byte, LSB first
* ``qpsk_bit_mod``  (digital.rs:24-36): 2-bit value v -> (1-2*(v&1)) +
  j*(1-2*((v>>1)&1)), i.e. 0 -> 1+j, 1 -> -1+j, 2 -> 1-j, 3 -> -1-j
* ``qpsk_byte_mod`` (digital.rs:39-44): 4 symbols/byte, LSB pair first

The reference's examples use the *opposite* BPSK sign convention
(``2*b - 1``, examples/single_thread_bpsk.rs:31) and build QPSK from
consecutive bit pairs (single_thread_qpsk.rs:31-36); those maps are
provided as ``*_example`` variants so each flagship model can match
its reference chain exactly.

All functions are shape-polymorphic jnp code — elementwise selects on
the VPU; no per-sample control flow.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "bpsk_bit_mod",
    "bpsk_byte_mod",
    "qpsk_pair_mod",
    "qpsk_bit_mod",
    "qpsk_byte_mod",
    "bpsk_bit_mod_example",
    "qpsk_bits_mod_example",
    "unpack_bits_lsb_first",
]


def unpack_bits_lsb_first(bytes_, dtype=jnp.int32):
    """[..., B] uint8 -> [..., B*8] bits, LSB of each byte first."""
    b = jnp.asarray(bytes_).astype(jnp.int32)
    shifts = jnp.arange(8, dtype=jnp.int32)
    bits = (b[..., None] >> shifts) & 1
    return bits.reshape(*b.shape[:-1], -1).astype(dtype)


def bpsk_bit_mod(bits, dtype=jnp.complex64):
    """bit 0 -> +1, bit 1 -> -1 (digital.rs:6-14)."""
    bits = jnp.asarray(bits)
    return (1 - 2 * bits.astype(jnp.float32)).astype(dtype)


def bpsk_byte_mod(bytes_, dtype=jnp.complex64):
    """Each byte -> 8 BPSK samples, LSB first (digital.rs:17-21)."""
    return bpsk_bit_mod(unpack_bits_lsb_first(bytes_), dtype=dtype)


def qpsk_pair_mod(b0, b1, dtype=jnp.complex64):
    """Map bit pair (b0 = LSB, b1 = MSB) to (1-2*b0) + j*(1-2*b1)."""
    b0 = jnp.asarray(b0).astype(jnp.float32)
    b1 = jnp.asarray(b1).astype(jnp.float32)
    return ((1 - 2 * b0) + 1j * (1 - 2 * b1)).astype(dtype)


def qpsk_bit_mod(two_bit_vals, dtype=jnp.complex64):
    """2-bit values in [0, 4) -> QPSK constellation (digital.rs:24-36)."""
    v = jnp.asarray(two_bit_vals).astype(jnp.int32)
    return qpsk_pair_mod(v & 1, (v >> 1) & 1, dtype=dtype)


def qpsk_byte_mod(bytes_, dtype=jnp.complex64):
    """Each byte -> 4 QPSK symbols, LSB pair first (digital.rs:39-44)."""
    b = jnp.asarray(bytes_).astype(jnp.int32)
    shifts = jnp.arange(0, 8, 2, dtype=jnp.int32)
    vals = (b[..., None] >> shifts) & 3
    return qpsk_bit_mod(vals.reshape(*b.shape[:-1], -1), dtype=dtype)


def bpsk_bit_mod_example(bits, dtype=jnp.complex64):
    """Example-chain convention: bit b -> 2*b - 1 + 0j
    (single_thread_bpsk.rs:29-32)."""
    bits = jnp.asarray(bits)
    return (2 * bits.astype(jnp.float32) - 1).astype(dtype)


def qpsk_bits_mod_example(bits, dtype=jnp.complex64):
    """Example-chain convention: consecutive bit pairs (x, y) ->
    (2x-1) + j(2y-1) (single_thread_qpsk.rs:29-36).  ``bits`` length
    must be even; returns len/2 symbols."""
    bits = jnp.asarray(bits).astype(jnp.float32)
    pairs = bits.reshape(*bits.shape[:-1], -1, 2)
    sym = (2 * pairs[..., 0] - 1) + 1j * (2 * pairs[..., 1] - 1)
    return sym.astype(dtype)
