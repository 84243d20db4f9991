"""LFSR block generator vs the reference's bit-serial semantics.

Golden vector: PRBS7 (poly 0xC0, seed 0x01 on an 8-bit register)
first 128 bits, harvested from the reference test (prns.rs:189-243):
a maximal 7-bit LFSR repeats with period 127.
"""

import numpy as np
import jax.numpy as jnp

from comms_tpu.ops import prns


def test_doc_example_first_bit():
    # prns.rs doc: poly 0xC0, state 0xFF -> first next_byte() == 1.
    bits = prns.prn_bits_host(0xC0, 0xFF, 8, 1)
    assert bits[0] == 1


def test_block_matches_bit_serial_oracle():
    spec = prns.PrnSpec.make(0xC0, 8, 256)
    state = spec.init_state(0xFF)
    got, new_state = prns.prn_block(spec, state)
    expected = prns.prn_bits_host(0xC0, 0xFF, 8, 256)
    assert np.array_equal(np.asarray(got), expected)


def test_state_advance_streams_correctly():
    spec = prns.PrnSpec.make(0xC0, 8, 64)
    state = spec.init_state(0x01)
    got = []
    for _ in range(4):
        bits, state = prns.prn_block(spec, state)
        got.append(np.asarray(bits))
    expected = prns.prn_bits_host(0xC0, 0x01, 8, 256)
    assert np.array_equal(np.concatenate(got), expected)


def test_prbs7_golden_vector():
    # Reference golden data: first 128 bits for poly 0xC0, seed 0x01
    # (prns.rs:191-224).
    golden = [
        0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 1, 1, 0,
        0, 0, 0, 0, 1, 0, 1, 0, 0, 0, 0, 1, 1, 1, 1, 0, 0,
        0, 1, 0, 0, 0, 1, 0, 0, 1, 1, 0, 0, 1, 1, 0, 1, 0,
        1, 0, 1, 0, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0,
        0, 0, 1, 0, 0, 0, 0, 0, 0, 1, 1, 0, 0, 0, 0, 0, 1,
        0, 1, 0, 0, 0, 0, 1, 1, 1, 1, 0, 0, 0, 1, 0, 0, 0,
        1, 0, 0, 1, 1, 0, 0, 1, 1, 0, 1, 0, 1, 0, 1, 0, 1,
        1, 1, 1, 1, 1, 1, 1, 0, 0,
    ]
    spec = prns.PrnSpec.make(0xC0, 8, 128)
    bits, _ = prns.prn_block(spec, spec.init_state(0x01))
    assert np.array_equal(np.asarray(bits), golden)


def test_wide_register_u16():
    spec = prns.PrnSpec.make(0xC000, 16, 200)
    state = spec.init_state(0x0001)
    got, _ = prns.prn_block(spec, state)
    expected = prns.prn_bits_host(0xC000, 0x0001, 16, 200)
    assert np.array_equal(np.asarray(got), expected)
