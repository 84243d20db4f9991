"""Polyphase channelizer vs the direct mix->FIR->decimate oracle, plus
streaming invariance and tone-routing sanity."""

import numpy as np
import jax.numpy as jnp

from comms_tpu.ops import channelizer as chan


def test_channelizer_matches_direct_oracle():
    rng = np.random.default_rng(0)
    K, M = 8, 4
    h = chan.design_prototype(K, M)
    Hb = chan.branch_taps(h, K)
    x = (rng.normal(size=256) + 1j * rng.normal(size=256)).astype(
        np.complex128)

    ctx = chan.channelizer_init_ctx(len(h), dtype=jnp.complex128)
    y, _ = chan.channelize_block(jnp.asarray(x), Hb, ctx)
    expected = chan.channelize_oracle(x, h, K)
    assert np.allclose(np.asarray(y), expected, atol=1e-9)


def test_channelizer_streaming_invariance():
    rng = np.random.default_rng(1)
    K, M = 16, 8
    h = chan.design_prototype(K, M)
    Hb = chan.branch_taps(h, K)
    x = (rng.normal(size=1024) + 1j * rng.normal(size=1024)).astype(
        np.complex128)

    ctx = chan.channelizer_init_ctx(len(h), dtype=jnp.complex128)
    y_once, _ = chan.channelize_block(jnp.asarray(x), Hb, ctx)

    ctx = chan.channelizer_init_ctx(len(h), dtype=jnp.complex128)
    parts = []
    for i in range(4):
        y, ctx = chan.channelize_block(jnp.asarray(x[i*256:(i+1)*256]),
                                       Hb, ctx)
        parts.append(np.asarray(y))
    assert np.allclose(np.concatenate(parts, axis=0), np.asarray(y_once),
                       atol=1e-12)


def test_tone_lands_in_its_channel():
    # A tone at channel c's center frequency (2*pi*c/K) should appear
    # (almost) only in channel c after settling.
    K, M = 8, 8
    h = chan.design_prototype(K, M)
    Hb = chan.branch_taps(h, K)
    n = np.arange(4096)
    c = 3
    x = np.exp(2j * np.pi * c * n / K).astype(np.complex128)

    ctx = chan.channelizer_init_ctx(len(h), dtype=jnp.complex128)
    y, _ = chan.channelize_block(jnp.asarray(x), Hb, ctx)
    power = np.mean(np.abs(np.asarray(y)[M:]) ** 2, axis=0)  # skip warmup
    assert np.argmax(power) == c
    others = np.delete(power, c)
    assert power[c] > 100 * others.max()


def test_prototype_dc_gain():
    h = chan.design_prototype(64, 8)
    assert np.isclose(h.sum(), 1.0)
    assert len(h) == 512


def test_channelizer_large_k_fallback_matches_oracle():
    # K > 256 takes the per-branch MAC + batched-FFT fallback (the
    # banded GEMM would burn ~K x redundant MACs there).
    rng = np.random.default_rng(4)
    K, M = 512, 2
    h = chan.design_prototype(K, M)
    Hb = chan.branch_taps(h, K)
    x = (rng.normal(size=2 * K * M) + 1j * rng.normal(size=2 * K * M)
         ).astype(np.complex128)
    ctx = chan.channelizer_init_ctx(len(h), dtype=jnp.complex128)
    y, _ = chan.channelize_block(jnp.asarray(x), Hb, ctx)
    expected = chan.channelize_oracle(x, h, K)
    assert np.allclose(np.asarray(y), expected, atol=1e-9)
