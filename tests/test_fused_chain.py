"""Fused Pallas FM chain: parity with the XLA polyphase chain and
streaming-state correctness (interpret mode on the CPU mesh; the
compiled path is exercised by bench.py / the verify recipe on real
TPU hardware)."""

import numpy as np
import jax
import jax.numpy as jnp

from comms_tpu.kernels import fm_chain_pallas as K
from comms_tpu.models import fm_receiver


def _oracle(iq, block):
    cfg = fm_receiver.FmReceiverConfig(block=block)
    assert cfg.polyphase
    blk = fm_receiver.make_block_fn(cfg)
    audio, _ = blk(fm_receiver.init_state(cfg), jnp.asarray(iq))
    return np.asarray(audio)


def test_quantize_taps_exact_byte_split():
    # The 3-byte s8 split must reconstruct round(h*S) EXACTLY, and the
    # quantization error per tap must stay under 0.5/S.
    taps = np.asarray(fm_receiver.FM_LPF_TAPS, np.float64)
    ba, bb, bc, S = K.quantize_taps(taps)
    for m in (ba, bb, bc):
        assert m.dtype == np.int8 and m.shape == (768, 128)
    B = (ba.astype(np.int64) * 65536 + bb.astype(np.int64) * 256
         + bc.astype(np.int64))
    Bref = K._band(np.round(taps * S), 5).astype(np.int64)
    assert np.array_equal(B, Bref)
    # reconstructed taps within the rounding bound of the f64 band
    err = np.abs(B / S - K._band(taps, 5))
    assert err.max() <= 0.5 / S + 1e-12


def test_fused_chain_parity_interpret():
    N = K.IN_PER_STEP * 2
    rng = np.random.default_rng(0)
    iq = rng.integers(0, 256, size=(N, 2), dtype=np.uint8)
    audio = K.fm_chain_fused(
        jnp.asarray(iq[:, 0].copy()), jnp.asarray(iq[:, 1].copy()),
        K.zero_ctx(), fm_receiver.FM_LPF_TAPS, fm_receiver.FM_LPF_TAPS,
        interpret=True)
    ref = _oracle(iq, N)
    assert np.max(np.abs(np.asarray(audio) - ref)) < 1e-3


def test_fused_chain_streaming_blocks():
    # Two fused blocks with wrapper-recomputed context must equal the
    # one-shot run over the concatenated stream.
    N = K.IN_PER_STEP
    rng = np.random.default_rng(1)
    iq = rng.integers(0, 256, size=(2 * N, 2), dtype=np.uint8)
    cfg = fm_receiver.FmReceiverConfig(block=N)
    blk = fm_receiver.make_fused_block_fn(cfg, interpret=True)
    st = fm_receiver.fused_init_state()
    outs = []
    for b in range(2):
        re = jnp.asarray(iq[b * N:(b + 1) * N, 0].copy())
        im = jnp.asarray(iq[b * N:(b + 1) * N, 1].copy())
        a, st = blk(st, re, im)
        outs.append(np.asarray(a))
    audio = np.concatenate(outs)
    ref = _oracle(iq, 2 * N)
    assert audio.shape == ref.shape
    assert np.max(np.abs(audio - ref)) < 1e-3


def test_fused_chain_rejects_bad_block():
    import pytest

    cfg = fm_receiver.FmReceiverConfig(block=262144)  # not % 102400
    with pytest.raises(ValueError, match="102400"):
        fm_receiver.make_fused_block_fn(cfg)


def test_run_file_fused_matches_xla(tmp_path, monkeypatch):
    # run_file's fused path (host deinterleave + Pallas chain + XLA
    # ragged tail from converted context) must match the XLA path.
    B = fm_receiver.FUSED_BLOCK_QUANTUM
    L = 2 * B + 3777
    rng = np.random.default_rng(4)
    ph = np.cumsum(0.3 + 0.02 * rng.normal(size=L))
    iqf = np.exp(1j * ph)
    iq = np.stack([
        np.clip(np.round(iqf.real * 100 + 127.5), 0, 255),
        np.clip(np.round(iqf.imag * 100 + 127.5), 0, 255),
    ], axis=-1).astype(np.uint8)
    p = tmp_path / "cap.iq"
    iq.tofile(p)

    cfg = fm_receiver.FmReceiverConfig(block=B)
    ref = fm_receiver.run_file(p, cfg, fused=False)

    real_make = fm_receiver.make_fused_block_fn
    monkeypatch.setattr(
        fm_receiver, "make_fused_block_fn",
        lambda c, interpret=False: real_make(c, interpret=True))
    got = fm_receiver.run_file(p, fm_receiver.FmReceiverConfig(block=B),
                               fused=True)
    assert got.shape == ref.shape
    assert np.max(np.abs(got - ref)) < 1e-3
