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


def test_mixer_no_drift_over_long_stream():
    # The design claim (ops/mixer.py): the f64 host ramp + wrapped
    # carried phase keep error bounded over arbitrarily long streams.
    # 256 blocks x 8192 samples = 2.1M samples; compare the LAST block
    # against the exact closed form.
    dphase = 1.2345678
    nblk, blk = 256, 8192
    ramp, adv = mixer.mixer_ramp(blk, dphase, dtype=np.complex64)
    phase = jnp.float32(0.0)
    x = jnp.ones(blk, dtype=jnp.complex64)
    for _ in range(nblk):
        y, phase = mixer.mixer_block(x, phase, ramp, adv)

    n0 = (nblk - 1) * blk
    k = np.arange(n0, n0 + blk, dtype=np.float64)
    expected = np.exp(1j * np.mod(k * np.float64(mixer.normalize_dphase(dphase)),
                                  TWO_PI))
    got = np.asarray(y)
    # phase error stays at f32 rounding level, no linear drift
    err = np.abs(np.angle(got * np.conj(expected)))
    assert err.max() < 5e-4


def test_fixed_point_phase_drift_free():
    # 64-bit fixed-point carried phase: initialize as if 10^7 blocks
    # already elapsed (host-exact), run one more block, compare to the
    # exact closed form — error stays at f32 conversion level.
    dphase = 1.2345678
    blk = 8192
    big = 10_000_000
    dn = mixer.normalize_dphase(dphase)
    # state after `big` blocks: compose the exact per-block advance
    # in python ints
    frac_blk = int(round((np.mod(np.float64(blk) * np.float64(dn), TWO_PI)
                          / TWO_PI) * 2.0**64)) % (1 << 64)
    q = (frac_blk * big) % (1 << 64)
    p = (jnp.uint32(q >> 32), jnp.uint32(q & 0xFFFFFFFF))

    ramp, _ = mixer.mixer_ramp(blk, dphase, dtype=np.complex64)
    adv_fix = mixer.advance_fix(blk, dphase)
    x = jnp.ones(blk, dtype=jnp.complex64)
    y, p2 = mixer.mixer_block_fix(x, p, ramp, adv_fix)

    # exact expected phase of sample k in block `big`
    phi0 = (q / 2.0**64) * TWO_PI
    k = np.arange(blk, dtype=np.float64)
    expected = np.exp(1j * np.mod(phi0 + k * dn, TWO_PI))
    err = np.abs(np.angle(np.asarray(y) * np.conj(expected)))
    assert err.max() < 5e-6  # no drift after 10^7 blocks


def test_fixed_point_add_carry():
    p = (jnp.uint32(0), jnp.uint32(0xFFFFFFFF))
    a = (np.uint32(0), np.uint32(1))
    hi, lo = mixer.add_fix(p, a)
    assert int(hi) == 1 and int(lo) == 0
