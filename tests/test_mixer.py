"""Mixer / NCO parity against per-sample float64 oracles implementing
the reference recurrences (mixer.rs:73-84, nco.rs:71-78)."""

import numpy as np
import jax.numpy as jnp

from comms_tpu.ops import mixer

TWO_PI = 2.0 * np.pi


def oracle_mixer(x, phase, dphase):
    # Mixer::new normalizes dphase; mix multiplies then steps phase.
    while dphase >= TWO_PI:
        dphase -= TWO_PI
    while dphase < 0.0:
        dphase += TWO_PI
    out = []
    for s in x:
        out.append(s * np.exp(1j * phase))
        phase += dphase
        if phase > TWO_PI:
            phase -= TWO_PI
    return np.array(out), phase


def oracle_nco(perrs, phase, dphase):
    while dphase >= TWO_PI:
        dphase -= TWO_PI
    while dphase < 0.0:
        dphase += TWO_PI
    out = []
    for p in perrs:
        phase += dphase + p
        if phase > TWO_PI:
            phase -= TWO_PI
        out.append(np.exp(1j * phase))
    return np.array(out), phase


def test_mixer_block_matches_oracle():
    rng = np.random.default_rng(1)
    x = (rng.normal(size=257) + 1j * rng.normal(size=257)).astype(np.complex128)
    phase0, dphase = np.pi / 4, 0.1
    expected, _ = oracle_mixer(x, phase0, dphase)

    ramp, adv = mixer.mixer_ramp(len(x), dphase, dtype=np.complex128)
    y, new_phase = mixer.mixer_block(
        jnp.asarray(x), jnp.float32(phase0), ramp, adv
    )
    assert np.allclose(np.asarray(y), expected, atol=1e-6)


def test_mixer_phase_carries_across_blocks():
    rng = np.random.default_rng(2)
    x = (rng.normal(size=512) + 1j * rng.normal(size=512)).astype(np.complex128)
    dphase = 1.7
    expected, _ = oracle_mixer(x, 0.3, dphase)

    ramp, adv = mixer.mixer_ramp(128, dphase, dtype=np.complex128)
    phase = jnp.float32(0.3)
    got = []
    for i in range(4):
        y, phase = mixer.mixer_block(jnp.asarray(x[i*128:(i+1)*128]),
                                     phase, ramp, adv)
        got.append(np.asarray(y))
    assert np.allclose(np.concatenate(got), expected, atol=1e-5)


def test_mixer_dphase_normalization():
    # dphase outside [0, 2pi) must behave as the wrapped value.
    assert np.isclose(mixer.normalize_dphase(7.0), 7.0 - TWO_PI)
    assert np.isclose(mixer.normalize_dphase(-0.5), TWO_PI - 0.5)


def test_nco_block_matches_oracle():
    rng = np.random.default_rng(3)
    perr = (0.01 * rng.normal(size=300)).astype(np.float64)
    phase0, dphase = np.pi / 4, 0.1
    expected, _ = oracle_nco(perr, phase0, dphase)

    iq, _ = mixer.nco_block(jnp.asarray(perr), jnp.float64(phase0), dphase)
    assert np.allclose(np.asarray(iq), expected, atol=1e-6)


def test_nco_phase_carries_across_blocks():
    rng = np.random.default_rng(4)
    perr = (0.02 * rng.normal(size=256)).astype(np.float64)
    expected, _ = oracle_nco(perr, 0.0, 0.37)

    phase = jnp.float64(0.0)
    got = []
    for i in range(4):
        iq, phase = mixer.nco_block(jnp.asarray(perr[i*64:(i+1)*64]),
                                    phase, 0.37)
        got.append(np.asarray(iq))
    assert np.allclose(np.concatenate(got), expected, atol=1e-6)
