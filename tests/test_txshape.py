"""Fused tx shaping (ops.txshape): parity with the staged op chain,
streaming invariance, planar mixer, and the packed-i16 IQ format."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from comms_tpu.ops import (
    mixer, modulation, pulse, random as crandom, taps, txshape,
)
from comms_tpu.models import bpsk_tx, qpsk_tx
from tests.test_models import tx_oracle


@pytest.mark.parametrize("nbits,T,sps", [
    (1024, 32, 4),   # the reference chain config
    (2000, 31, 4),   # T not a multiple of sps; partial last GEMM row
    (512, 32, 8),
    (96, 5, 2),
])
def test_qpsk_fused_matches_staged_ops(nbits, T, sps):
    rng = np.random.default_rng(0)
    t = taps.rrc_taps(T, float(sps), 0.25)
    bits = rng.integers(0, 2, nbits).astype(np.float32)

    sym = modulation.qpsk_bits_mod_example(bits)
    H = pulse.polyphase_taps(t.astype(np.complex64), sps)
    y_ref, _ = pulse.pulse_shape_block(sym, H, pulse.pulse_init_ctx(T, sps))
    y_ref = np.asarray(y_ref)

    mats = txshape.tx_shape_matrices(t, sps, bits_per_sym=2)
    ctxb = jnp.full((mats.ctx_bits,), 0.5, jnp.float32)
    yre, yim, _, nv = txshape.tx_shape_block(jnp.asarray(bits), ctxb, mats)
    got = (np.asarray(yre).reshape(-1)[:nv]
           + 1j * np.asarray(yim).reshape(-1)[:nv])
    assert nv == (nbits // 2) * sps
    np.testing.assert_allclose(got, y_ref, atol=2e-6)


def test_bpsk_fused_matches_staged_ops():
    rng = np.random.default_rng(1)
    t = taps.rrc_taps(32, 4.0, 0.25)
    bits = rng.integers(0, 2, 300).astype(np.float32)

    sym = modulation.bpsk_bit_mod_example(bits)
    H = pulse.polyphase_taps(t.astype(np.complex64), 4)
    y_ref, _ = pulse.pulse_shape_block(sym, H, pulse.pulse_init_ctx(32, 4))

    mats = txshape.tx_shape_matrices(t, 4, bits_per_sym=1)
    ctxb = jnp.full((mats.ctx_bits,), 0.5, jnp.float32)
    yre, yim, _, nv = txshape.tx_shape_block(jnp.asarray(bits), ctxb, mats)
    assert yim is None
    np.testing.assert_allclose(np.asarray(yre).reshape(-1)[:nv],
                               np.real(np.asarray(y_ref)), atol=2e-6)


def test_fused_streaming_block_invariance():
    rng = np.random.default_rng(2)
    t = taps.rrc_taps(32, 4.0, 0.25)
    mats = txshape.tx_shape_matrices(t, 4, bits_per_sym=2)
    bits = rng.integers(0, 2, 512).astype(np.float32)
    ctx0 = jnp.full((mats.ctx_bits,), 0.5, jnp.float32)

    y1re, _, c1, n1 = txshape.tx_shape_block(bits[:256], ctx0, mats)
    y2re, _, c2, n2 = txshape.tx_shape_block(bits[256:], c1, mats)
    chopped = np.concatenate([np.asarray(y1re).reshape(-1)[:n1],
                              np.asarray(y2re).reshape(-1)[:n2]])
    yre, _, _, nv = txshape.tx_shape_block(bits, ctx0, mats)
    np.testing.assert_allclose(chopped, np.asarray(yre).reshape(-1)[:nv],
                               atol=1e-6)


@pytest.mark.parametrize("dph,ph0,n", [
    (1.0, 0.5, 4 * 128 * 3),
    (0.0, 1.2, 512),       # ragged final row
    (2.7, 0.0, 4000),
])
def test_mix_planar_matches_mixer_block_fix(dph, ph0, n):
    rng = np.random.default_rng(3)
    y = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64)
    ramp, _ = mixer.mixer_ramp(n, dph)
    y_ref, pf_ref = mixer.mixer_block_fix(
        jnp.asarray(y), mixer.phase_fix_init(ph0), ramp,
        mixer.advance_fix(n, dph))

    Pw = 128
    R = -(-n // Pw)
    pad = R * Pw - n
    yre = jnp.asarray(np.pad(y.real, (0, pad)).reshape(R, Pw))
    yim = jnp.asarray(np.pad(y.imag, (0, pad)).reshape(R, Pw))
    tab = txshape.mixer_tables(n, dph, Pw)
    ore, oim, pf = txshape.mix_planar(yre, yim, mixer.phase_fix_init(ph0),
                                      tab)
    got = (np.asarray(ore).reshape(-1)[:n]
           + 1j * np.asarray(oim).reshape(-1)[:n])
    np.testing.assert_allclose(got, np.asarray(y_ref), atol=2e-6)
    # fixed-point carried phase advances identically (exact integers)
    assert int(np.asarray(pf[0])) == int(np.asarray(pf_ref[0]))
    assert int(np.asarray(pf[1])) == int(np.asarray(pf_ref[1]))


def test_quantize_pack_unpack_roundtrip():
    rng = np.random.default_rng(4)
    yre = jnp.asarray(rng.standard_normal((4, 128)).astype(np.float32) * 5)
    yim = jnp.asarray(rng.standard_normal((4, 128)).astype(np.float32) * 5)
    packed = txshape.quantize_pack_iq(yre, yim, 8192.0, 500)
    pairs = txshape.unpack_iq(packed)
    re = np.clip(np.trunc(np.asarray(yre) * 8192), -32768,
                 32767).astype(np.int16).reshape(-1)[:500]
    im = np.clip(np.trunc(np.asarray(yim) * 8192), -32768,
                 32767).astype(np.int16).reshape(-1)[:500]
    np.testing.assert_array_equal(pairs[:, 0], re)
    np.testing.assert_array_equal(pairs[:, 1], im)
    # saturation + sign survive the pack (negative re, negative im)
    assert (pairs[:, 0] < 0).any() and (pairs[:, 1] < 0).any()


def test_random_bits_packed_distribution_and_shape():
    key = crandom.source_init(9)
    bits, key2 = crandom.random_bits_packed_block(key, 1 << 14)
    b = np.asarray(bits)
    assert b.shape == (1 << 14,) and set(np.unique(b)) <= {0.0, 1.0}
    assert abs(b.mean() - 0.5) < 0.02
    with pytest.raises(ValueError):
        crandom.random_bits_packed_block(key, 33)


def test_bpsk_fast_block_matches_oracle():
    cfg = bpsk_tx.BpskTxConfig(syms_per_block=512)
    blk = jax.jit(bpsk_tx.make_block_fn_fast(cfg))
    st = bpsk_tx.init_state_fast(cfg, seed=7)
    p1, st = blk(st)
    p2, st = blk(st)
    got = np.concatenate([txshape.unpack_iq(p1), txshape.unpack_iq(p2)])

    key = crandom.source_init(7)
    b1, key = crandom.random_bits_packed_block(key, 512)
    b2, key = crandom.random_bits_packed_block(key, 512)
    bits = np.concatenate([np.asarray(b1), np.asarray(b2)]).astype(
        np.float64)
    expected = tx_oracle(bits, qpsk=False)
    d = np.abs(got.astype(np.int32) - expected.astype(np.int32))
    assert d.max() <= 1
    assert (d > 0).mean() < 0.01


def test_qpsk_fast_block_matches_oracle():
    cfg = qpsk_tx.QpskTxConfig(bits_per_block=1024, dphase=0.0)
    blk = jax.jit(qpsk_tx.make_block_fn_fast(cfg))
    st = qpsk_tx.init_state_fast(cfg, seed=11)
    p, _ = blk(st)
    got = txshape.unpack_iq(p)

    key = crandom.source_init(11)
    bits, _ = crandom.random_bits_packed_block(key, 1024)
    expected = tx_oracle(np.asarray(bits).astype(np.float64), qpsk=True)
    d = np.abs(got.astype(np.int32) - expected.astype(np.int32))
    assert d.max() <= 1


def test_qpsk_fast_mixer_matches_staged_chain():
    cfg = qpsk_tx.QpskTxConfig(bits_per_block=2048, dphase=0.777,
                               phase0=0.3)
    blk = jax.jit(qpsk_tx.make_block_fn_fast(cfg))
    st = qpsk_tx.init_state_fast(cfg, seed=5)
    outs = []
    for _ in range(3):
        p, st = blk(st)
        outs.append(txshape.unpack_iq(p))
    got = np.concatenate(outs)

    key = crandom.source_init(5)
    t = taps.rrc_taps(32, 4.0, 0.25).astype(np.complex64)
    H = pulse.polyphase_taps(t, 4)
    ctx = pulse.pulse_init_ctx(32, 4)
    pf = mixer.phase_fix_init(0.3)
    ramp, _ = mixer.mixer_ramp(cfg.samples_per_block, 0.777)
    adv = mixer.advance_fix(cfg.samples_per_block, 0.777)
    ref = []
    for _ in range(3):
        bits, key = crandom.random_bits_packed_block(key, 2048)
        sym = modulation.qpsk_bits_mod_example(bits)
        y, ctx = pulse.pulse_shape_block(sym, H, ctx)
        y, pf = mixer.mixer_block_fix(y, pf, ramp, adv)
        y = np.asarray(y)
        re = np.clip(np.trunc(y.real * 8192), -32768, 32767).astype(
            np.int16)
        im = np.clip(np.trunc(y.imag * 8192), -32768, 32767).astype(
            np.int16)
        ref.append(np.stack([re, im], -1))
    ref = np.concatenate(ref)
    d = np.abs(got.astype(np.int32) - ref.astype(np.int32))
    assert d.max() <= 1
    assert (d > 0).mean() < 0.01


def test_run_to_file_fast_bytes_are_i16_pairs(tmp_path):
    p = tmp_path / "fast.bin"
    cfg = bpsk_tx.BpskTxConfig(syms_per_block=128)
    n = bpsk_tx.run_to_file(p, 2, cfg, seed=0, fast=True)
    assert n == 2 * 128 * 4
    raw = np.fromfile(p, dtype="<i2").reshape(-1, 2)
    assert raw.shape == (n, 2)
    # same bytes as unpacking the device blocks directly
    blk = bpsk_tx.make_block_fn_fast(cfg)
    st = bpsk_tx.init_state_fast(cfg, seed=0)
    p1, st = blk(st)
    p2, st = blk(st)
    pairs = np.concatenate([txshape.unpack_iq(p1), txshape.unpack_iq(p2)])
    np.testing.assert_array_equal(raw, pairs)


def test_tx_shape_matrices_validation():
    t = taps.rrc_taps(32, 4.0, 0.25)
    with pytest.raises(ValueError):
        txshape.tx_shape_matrices(t, 4, bits_per_sym=3)
    with pytest.raises(ValueError):
        txshape.tx_shape_matrices(t, 3, bits_per_sym=2,
                                  samples_per_row=128)  # 128 % 3 != 0
    with pytest.raises(ValueError):
        txshape.tx_shape_matrices(t.astype(np.complex128) + 1j, 4,
                                  bits_per_sym=2)
    mats = txshape.tx_shape_matrices(t, 4, bits_per_sym=2)
    with pytest.raises(ValueError):
        txshape.tx_shape_block(jnp.zeros(33), jnp.zeros(mats.ctx_bits),
                               mats)
