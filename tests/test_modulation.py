"""Modulation map parity with the reference's own test vectors
(digital.rs:51-157) and example-chain conventions."""

import numpy as np
import jax.numpy as jnp

from comms_tpu.ops import modulation as m


def test_bpsk_bit():
    got = np.asarray(m.bpsk_bit_mod(jnp.array([0, 1])))
    assert np.array_equal(got, [1 + 0j, -1 + 0j])


def test_bpsk_byte_lsb_first():
    # 0b10110001 -> bits LSB first: 1,0,0,0,1,1,0,1
    got = np.asarray(m.bpsk_byte_mod(jnp.array([0b10110001], dtype=jnp.uint8)))
    bits = [1, 0, 0, 0, 1, 1, 0, 1]
    expected = [1 - 2 * b for b in bits]
    assert np.array_equal(got.real, expected)
    assert np.array_equal(got.imag, np.zeros(8))


def test_qpsk_bit_map():
    got = np.asarray(m.qpsk_bit_mod(jnp.array([0, 1, 2, 3])))
    assert np.array_equal(got, [1 + 1j, -1 + 1j, 1 - 1j, -1 - 1j])


def test_qpsk_byte_lsb_pairs():
    # byte 0b11100100 -> pairs (LSB first): 00, 01, 10, 11
    got = np.asarray(m.qpsk_byte_mod(jnp.array([0b11100100], dtype=jnp.uint8)))
    assert np.array_equal(got, [1 + 1j, -1 + 1j, 1 - 1j, -1 - 1j])


def test_example_conventions():
    got = np.asarray(m.bpsk_bit_mod_example(jnp.array([0, 1])))
    assert np.array_equal(got, [-1 + 0j, 1 + 0j])

    got = np.asarray(m.qpsk_bits_mod_example(jnp.array([0, 1, 1, 0])))
    assert np.array_equal(got, [-1 + 1j, 1 - 1j])


def test_unpack_bits():
    got = np.asarray(m.unpack_bits_lsb_first(
        jnp.array([1, 128], dtype=jnp.uint8)))
    assert np.array_equal(
        got, [1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1]
    )
