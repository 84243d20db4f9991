"""Polyphase pulse shaping == zero-stuff + streaming FIR (the
reference PulseNode composition, pulse.rs:85-93)."""

import numpy as np
import jax.numpy as jnp

from comms_tpu.ops import fir, pulse, resample, taps


def _oracle_upsample_fir(sym, t, sps):
    ups = np.zeros(len(sym) * sps, dtype=np.complex128)
    ups[::sps] = sym
    return np.asarray(fir.fir_apply(jnp.asarray(ups), t))


def test_pulse_shape_equals_upsample_fir():
    rng = np.random.default_rng(0)
    sps = 4
    t = taps.rrc_taps(32, float(sps), 0.25)
    sym = (rng.normal(size=100) + 1j * rng.normal(size=100)).astype(
        np.complex128)

    expected = _oracle_upsample_fir(sym, t, sps)
    got = np.asarray(pulse.pulse_shape_apply(jnp.asarray(sym), t, sps))
    assert np.allclose(got, expected, atol=1e-9)


def test_pulse_shape_taps_not_multiple_of_sps():
    rng = np.random.default_rng(1)
    sps = 4
    t = taps.rc_taps(33, float(sps), 0.3)  # 33 % 4 != 0
    sym = (rng.normal(size=64)).astype(np.complex128)

    expected = _oracle_upsample_fir(sym, t, sps)
    got = np.asarray(pulse.pulse_shape_apply(jnp.asarray(sym), t, sps))
    assert np.allclose(got, expected, atol=1e-9)


def test_pulse_shape_streaming_across_blocks():
    rng = np.random.default_rng(2)
    sps = 4
    t = taps.rrc_taps(32, float(sps), 0.25)
    sym = (rng.normal(size=256) + 1j * rng.normal(size=256)).astype(
        np.complex128)
    expected = _oracle_upsample_fir(sym, t, sps)

    H = pulse.polyphase_taps(t, sps)
    ctx = pulse.pulse_init_ctx(len(t), sps, dtype=jnp.complex128)
    got = []
    for i in range(4):
        y, ctx = pulse.pulse_shape_block(jnp.asarray(sym[i*64:(i+1)*64]),
                                         H, ctx)
        got.append(np.asarray(y))
    assert np.allclose(np.concatenate(got), expected, atol=1e-9)


def test_rect_pulse_doc_example():
    # PulseNode with rect taps: each symbol becomes sps copies summed
    # with overlap — for rect(sps) taps it's a hold of length sps.
    sps = 4
    t = taps.rect_taps(sps)
    sym = np.array([1.0 + 0j, -1.0 + 0j])
    got = np.asarray(pulse.pulse_shape_apply(jnp.asarray(sym), t, sps))
    assert np.allclose(got, [1, 1, 1, 1, -1, -1, -1, -1])
