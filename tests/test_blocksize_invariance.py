"""Property tests: streaming output is independent of block chopping
(SURVEY.md section 7 "halo correctness": output independent of B and
of chip count — the property that makes time-sharding correct).

Each stateful op is run once on the whole stream and once over a
RANDOM chop pattern; outputs must agree to f64 precision.
"""

import numpy as np
import jax.numpy as jnp

from comms_tpu.ops import channelizer as chan
from comms_tpu.ops import demodulation, fir, mixer, prns, pulse


def random_chops(n, rng, multiple=1):
    """Random partition of n into chunks (each a multiple of
    ``multiple``)."""
    cuts = []
    pos = 0
    while pos < n:
        step = int(rng.integers(1, 8)) * multiple
        step = min(step, n - pos)
        step -= step % multiple
        if step == 0:
            step = n - pos
        cuts.append((pos, pos + step))
        pos += step
    return cuts


def test_fir_random_chops():
    rng = np.random.default_rng(0)
    T = 47
    t = (rng.normal(size=T) + 1j * rng.normal(size=T)).astype(np.complex128)
    x = (rng.normal(size=977) + 1j * rng.normal(size=977)).astype(
        np.complex128)
    B = fir.banded_tap_matrix(t)

    y_once, _ = fir.fir_block(jnp.asarray(x), B,
                              fir.init_ctx(T, jnp.complex128))
    for trial in range(3):
        ctx = fir.init_ctx(T, jnp.complex128)
        parts = []
        for a, b in random_chops(len(x), rng):
            y, ctx = fir.fir_block(jnp.asarray(x[a:b]), B, ctx)
            parts.append(np.asarray(y))
        assert np.allclose(np.concatenate(parts), np.asarray(y_once),
                           atol=1e-12)


def test_fir_decimate_poly_random_chops():
    rng = np.random.default_rng(1)
    T, D = 63, 5
    t = rng.normal(size=T).astype(np.float64)
    n = 200 * D
    x = rng.normal(size=n).astype(np.float64)
    C = fir.decimating_branch_taps(t, D)

    y_once, _ = fir.fir_decimate_poly(
        jnp.asarray(x), C, jnp.zeros(C.size - 1, jnp.float64))
    for trial in range(3):
        ctx = jnp.zeros(C.size - 1, jnp.float64)
        parts = []
        for a, b in random_chops(n, rng, multiple=D):
            y, ctx = fir.fir_decimate_poly(jnp.asarray(x[a:b]), C, ctx)
            parts.append(np.asarray(y))
        assert np.allclose(np.concatenate(parts), np.asarray(y_once),
                           atol=1e-12)


def test_pulse_shape_random_chops():
    rng = np.random.default_rng(2)
    sps = 4
    from comms_tpu.ops import taps as taps_mod
    t = taps_mod.rrc_taps(32, float(sps), 0.25)
    H = pulse.polyphase_taps(t, sps)
    sym = (rng.normal(size=333) + 1j * rng.normal(size=333)).astype(
        np.complex128)

    y_once, _ = pulse.pulse_shape_block(
        jnp.asarray(sym), H, pulse.pulse_init_ctx(32, sps, jnp.complex128))
    ctx = pulse.pulse_init_ctx(32, sps, dtype=jnp.complex128)
    parts = []
    for a, b in random_chops(len(sym), rng):
        y, ctx = pulse.pulse_shape_block(jnp.asarray(sym[a:b]), H, ctx)
        parts.append(np.asarray(y))
    assert np.allclose(np.concatenate(parts), np.asarray(y_once),
                       atol=1e-12)


def test_fm_demod_random_chops():
    rng = np.random.default_rng(3)
    x = np.exp(1j * np.cumsum(0.2 * rng.normal(size=500))).astype(
        np.complex128)
    y_once, _ = demodulation.fm_demod_block(
        jnp.asarray(x), demodulation.fm_demod_init(jnp.complex128))
    prev = demodulation.fm_demod_init(jnp.complex128)
    parts = []
    for a, b in random_chops(len(x), rng):
        y, prev = demodulation.fm_demod_block(jnp.asarray(x[a:b]), prev)
        parts.append(np.asarray(y))
    assert np.allclose(np.concatenate(parts), np.asarray(y_once),
                       atol=1e-12)


def test_prn_random_chops():
    rng = np.random.default_rng(4)
    full = prns.prn_bits_host(0xC0, 0x37, 8, 400)
    # Chopping = different block sizes -> different PrnSpecs sharing
    # the advanced state.
    state_int = 0x37
    pos = 0
    out = []
    for a, b in random_chops(400, rng):
        spec = prns.PrnSpec.make(0xC0, 8, b - a)
        state = spec.init_state(state_int)
        bits, new_state = prns.prn_block(spec, state)
        out.append(np.asarray(bits))
        # reconstruct integer state from bit vector for the next spec
        sbits = np.asarray(new_state)
        state_int = int("".join(str(int(v)) for v in sbits), 2)
        pos = b
    assert np.array_equal(np.concatenate(out), full)


def test_channelizer_random_chops():
    rng = np.random.default_rng(5)
    K, M = 8, 4
    h = chan.design_prototype(K, M)
    Hb = chan.branch_taps(h, K)
    n = 64 * K
    x = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex128)

    y_once, _ = chan.channelize_block(
        jnp.asarray(x), Hb, chan.channelizer_init_ctx(len(h), jnp.complex128))
    ctx = chan.channelizer_init_ctx(len(h), dtype=jnp.complex128)
    parts = []
    for a, b in random_chops(n, rng, multiple=K):
        y, ctx = chan.channelize_block(jnp.asarray(x[a:b]), Hb, ctx)
        parts.append(np.asarray(y))
    assert np.allclose(np.concatenate(parts, axis=0), np.asarray(y_once),
                       atol=1e-12)
