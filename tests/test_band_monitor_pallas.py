"""Fused band-monitor kernel: parity with the model's XLA stage chain
(interpret mode; compiled path via bench / verify on hardware)."""

import numpy as np
import jax.numpy as jnp
import pytest

from comms_tpu.kernels import band_monitor_pallas as BM
from comms_tpu.models import fm_band_monitor as model


def _run_ref(cfg, blocks):
    """XLA reference: the model's planar core (fast_demod, no pallas),
    streamed — the exact math the kernel fuses."""
    blk = model.make_planar_block_fn(cfg, use_pallas=False,
                                     fast_demod=True)
    st = model.init_state(cfg)
    outs = []
    for re, im in blocks:
        audio, st = blk(st, jnp.asarray(re), jnp.asarray(im))
        outs.append(np.asarray(audio))
    return np.concatenate(outs, axis=1)          # [K, total_audio]


def _run_kernel(cfg, blocks):
    ctx_r = jnp.zeros((BM.CTX_SAMPLES,), jnp.float32)
    ctx_i = jnp.zeros((BM.CTX_SAMPLES,), jnp.float32)
    yh_r, yh_i = BM.zero_spec_halo(cfg.num_channels,
                                   cfg.audio_taps.shape[0])
    outs = []
    for re, im in blocks:
        audio, ctx_r, ctx_i, yh_r, yh_i = BM.band_monitor_pallas_planar(
            jnp.asarray(re), jnp.asarray(im), cfg.prototype,
            cfg.audio_taps, cfg.audio_dec, ctx_r, ctx_i, yh_r, yh_i,
            num_channels=cfg.num_channels, interpret=True)
        outs.append(np.asarray(audio).T)         # [K, audio]
    return np.concatenate(outs, axis=1)


@pytest.mark.parametrize("k,m,dec", [(64, 8, 4), (16, 8, 4)])
def test_fused_band_monitor_parity_streaming(k, m, dec):
    rng = np.random.default_rng(11 + k)
    cfg = model.BandMonitorConfig(
        num_channels=k, taps_per_branch=m,
        block=BM.step_samples(), audio_dec=dec)
    blocks = [
        (rng.normal(size=cfg.block).astype(np.float32),
         rng.normal(size=cfg.block).astype(np.float32))
        for _ in range(3)
    ]
    ref = _run_ref(cfg, blocks)
    got = _run_kernel(cfg, blocks)
    assert got.shape == ref.shape
    scale = np.abs(ref).max()
    err = np.max(np.abs(got - ref))
    assert err < 2e-4 * scale, (err, scale)


def test_fused_band_monitor_validation():
    cfg = model.BandMonitorConfig(block=BM.step_samples())
    re = jnp.zeros((BM.step_samples(),), jnp.float32)
    ctx = jnp.zeros((BM.CTX_SAMPLES,), jnp.float32)
    yh_r, yh_i = BM.zero_spec_halo(cfg.num_channels,
                                   cfg.audio_taps.shape[0])
    with pytest.raises(ValueError, match="audio_dec"):
        BM.band_monitor_pallas_planar(
            re, re, cfg.prototype, cfg.audio_taps, 3, ctx, ctx,
            yh_r, yh_i, num_channels=cfg.num_channels, interpret=True)
    with pytest.raises(ValueError, match="spec halo"):
        BM.band_monitor_pallas_planar(
            re, re, cfg.prototype, cfg.audio_taps, 4, ctx, ctx,
            yh_r[:-1], yh_i[:-1], num_channels=cfg.num_channels,
            interpret=True)


def test_fused_model_path_matches_staged():
    # make_fused_block_fn vs the staged planar path, streamed.
    rng = np.random.default_rng(7)
    cfg = model.BandMonitorConfig(block=BM.step_samples())
    blk_ref = model.make_planar_block_fn(cfg, use_pallas=False,
                                         fast_demod=True)
    blk_f = model.make_fused_block_fn(cfg, interpret=True)
    st_r = model.init_state(cfg)
    st_f = model.init_state_fused(cfg)
    for b in range(2):
        re = rng.normal(size=cfg.block).astype(np.float32)
        im = rng.normal(size=cfg.block).astype(np.float32)
        y_r, st_r = blk_ref(st_r, jnp.asarray(re), jnp.asarray(im))
        y_f, st_f = blk_f(st_f, jnp.asarray(re), jnp.asarray(im))
        scale = float(np.abs(np.asarray(y_r)).max())
        err = np.max(np.abs(np.asarray(y_f) - np.asarray(y_r)))
        assert err < 2e-4 * scale, (b, err, scale)


def test_fused_tail_jit_cache_keys_on_config_value():
    # Regression (round-3 advisor): the fused-tail jit used to cache a
    # closure on the config OBJECT, so mutating the config silently
    # reused stale captured constants.  The cache now keys on the
    # config's field values and snapshots them.
    rng = np.random.default_rng(3)
    cfg = model.BandMonitorConfig(block=BM.step_samples())
    L = model.fused_tail_samples(cfg)
    re = rng.normal(size=L).astype(np.float32)
    im = rng.normal(size=L).astype(np.float32)
    first = model.fused_state_from_raw_tail(cfg, jnp.asarray(re),
                                            jnp.asarray(im))

    # Mutate the prototype in place (same shapes, new values).
    new_proto = cfg.prototype * 0.5
    cfg.prototype = new_proto
    cfg.Hb = np.asarray(cfg.Hb) * 0.5
    mutated = model.fused_state_from_raw_tail(cfg, jnp.asarray(re),
                                              jnp.asarray(im))
    # A fresh config constructed with the mutated values must agree.
    fresh = model.BandMonitorConfig(block=BM.step_samples())
    fresh.prototype = new_proto
    fresh.Hb = np.asarray(fresh.Hb) * 0.5
    want = model.fused_state_from_raw_tail(fresh, jnp.asarray(re),
                                           jnp.asarray(im))
    for got, exp, old in zip(mutated, want, first):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(exp))
    # ...and the spectrum halo must differ from the stale-cache answer.
    assert not np.allclose(np.asarray(mutated[2]), np.asarray(first[2]))


def test_band_monitor_recovers_per_channel_tones():
    """Multi-channel SEMANTIC check: a wideband capture carrying
    three FM stations (distinct audio tones on distinct channel
    centers) demodulates so each station's tone appears in ITS
    channel's audio and nowhere dominant elsewhere."""
    K = 16
    n = 1 << 18
    cfg = model.BandMonitorConfig(num_channels=K, block=n, audio_dec=4)
    t = np.arange(n)
    stations = {3: 0.020, 7: 0.033, 12: 0.047}  # ch -> audio freq
    x = np.zeros(n, np.complex128)
    for ch, fa in stations.items():
        tone = np.sin(2 * np.pi * fa / K * t)     # audio at wideband rate
        phase = 2 * np.pi * (0.25 / K) * np.cumsum(tone)
        x += np.exp(1j * (2 * np.pi * ch * t / K + phase))
    x = (x / np.abs(x).max()).astype(np.complex64)

    blk = model.make_planar_block_fn(cfg, use_pallas=False,
                                     fast_demod=True)
    audio, _ = blk(model.init_state(cfg),
                   jnp.asarray(x.real), jnp.asarray(x.imag))
    audio = np.asarray(audio, np.float64)[:, 64:]   # skip transient

    for ch, fa in stations.items():
        a = audio[ch] - audio[ch].mean()
        X = np.abs(np.fft.rfft(a * np.hanning(len(a))))
        # audio rate = wideband / (K * audio_dec); tone at fa/K of
        # the wideband rate -> fa * audio_dec cycles/sample at audio
        f = np.fft.rfftfreq(len(a), 1.0)
        target = fa * cfg.audio_dec
        peak = X[np.abs(f - target).argmin()]
        ratio_t = peak / np.median(X)
        assert ratio_t > 10, (ch, ratio_t)
        # a quiet channel demods to broadband noise: the tone must
        # not stand out there the way it does in its own channel
        q = audio[(ch + 2) % K] - audio[(ch + 2) % K].mean()
        Xq = np.abs(np.fft.rfft(q * np.hanning(len(q))))
        ratio_q = Xq[np.abs(f - target).argmin()] / np.median(Xq)
        assert ratio_q < ratio_t / 3, (ch, ratio_q, ratio_t)
