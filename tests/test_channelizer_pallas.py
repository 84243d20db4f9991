"""Fused Pallas channelizer: parity with ops.channelizer
(interpret mode; compiled path via bench / verify on hardware)."""

import numpy as np
import jax.numpy as jnp

from comms_tpu.kernels import channelizer_pallas as CP
from comms_tpu.ops import channelizer as chan


def test_channelizer_pallas_parity():
    rng = np.random.default_rng(0)
    N = CP.step_samples() * 2
    x = (rng.normal(size=N) + 1j * rng.normal(size=N)).astype(np.complex64)
    h = chan.design_prototype(64, 8)
    Hb = chan.branch_taps(h.astype(np.float32), 64)

    y_ref, _ = chan.channelize_block(
        jnp.asarray(x), Hb, chan.channelizer_init_ctx(len(h)))
    y, _ = CP.channelize_pallas(jnp.asarray(x), h,
                                jnp.zeros(CP.CTX_SAMPLES, jnp.complex64),
                                interpret=True)
    ref = np.asarray(y_ref)
    got = np.asarray(y)
    assert got.shape == ref.shape
    scale = np.abs(ref).max()
    assert np.max(np.abs(got - ref)) < 1e-5 * scale


def test_channelizer_pallas_streaming():
    rng = np.random.default_rng(1)
    N = CP.step_samples()
    x = (rng.normal(size=2 * N) + 1j * rng.normal(size=2 * N)
         ).astype(np.complex64)
    h = chan.design_prototype(64, 8)
    ctx = jnp.zeros(CP.CTX_SAMPLES, jnp.complex64)
    y1, ctx = CP.channelize_pallas(jnp.asarray(x[:N]), h, ctx,
                                   interpret=True)
    y2, _ = CP.channelize_pallas(jnp.asarray(x[N:]), h, ctx,
                                 interpret=True)
    got = np.concatenate([np.asarray(y1), np.asarray(y2)])

    Hb = chan.branch_taps(h.astype(np.float32), 64)
    y_ref, _ = chan.channelize_block(
        jnp.asarray(x), Hb, chan.channelizer_init_ctx(len(h)))
    ref = np.asarray(y_ref)
    scale = np.abs(ref).max()
    assert np.max(np.abs(got - ref)) < 1e-5 * scale


def test_channelizer_model_pallas_path():
    # The model's use_pallas path must match the XLA path exactly,
    # including mid-stream state interchangeability.
    from comms_tpu.models import channelizer as model

    rng = np.random.default_rng(3)
    cfg = model.ChannelizerConfig(block=CP.step_samples())
    blk_x = model.make_block_fn(cfg)
    blk_p = model.make_block_fn(cfg, use_pallas=True, interpret=True)

    s_x, s_p = model.init_state(cfg), model.init_state(cfg)
    for b in range(2):
        pairs = rng.normal(size=(cfg.block, 2)).astype(np.float32)
        y_x, s_x = blk_x(s_x, jnp.asarray(pairs))
        y_p, s_p = blk_p(s_p, jnp.asarray(pairs))
        scale = float(np.abs(np.asarray(y_x)).max())
        assert np.max(np.abs(np.asarray(y_p) - np.asarray(y_x))) \
            < 1e-5 * scale, b
        assert np.allclose(np.asarray(s_p), np.asarray(s_x), atol=1e-6)


def test_channelizer_pallas_k16():
    # Generalized channel counts: any K dividing 128.
    rng = np.random.default_rng(5)
    N = CP.step_samples()
    x = (rng.normal(size=N) + 1j * rng.normal(size=N)).astype(np.complex64)
    h = chan.design_prototype(16, 8)
    Hb = chan.branch_taps(h.astype(np.float32), 16)

    y_ref, _ = chan.channelize_block(
        jnp.asarray(x), Hb, chan.channelizer_init_ctx(len(h)))
    y, _ = CP.channelize_pallas(jnp.asarray(x), h,
                                jnp.zeros(CP.CTX_SAMPLES, jnp.complex64),
                                num_channels=16, interpret=True)
    ref = np.asarray(y_ref)
    got = np.asarray(y)
    assert got.shape == ref.shape == (N // 16, 16)
    scale = np.abs(ref).max()
    assert np.max(np.abs(got - ref)) < 1e-5 * scale


def test_band_monitor_pallas_path():
    from comms_tpu.models import fm_band_monitor as model

    rng = np.random.default_rng(6)
    cfg = model.BandMonitorConfig(block=CP.step_samples())
    blk_x = model.make_block_fn(cfg)
    blk_p = model.make_block_fn(cfg, use_pallas=True, interpret=True)
    s_x, s_p = model.init_state(cfg), model.init_state(cfg)
    for b in range(2):
        pairs = rng.normal(size=(cfg.block, 2)).astype(np.float32)
        y_x, s_x = blk_x(s_x, jnp.asarray(pairs))
        y_p, s_p = blk_p(s_p, jnp.asarray(pairs))
        scale = float(np.abs(np.asarray(y_x)).max())
        # split-mode bf16 x3 DFT dots: ~1e-5 relative (PERF.md)
        assert np.max(np.abs(np.asarray(y_p) - np.asarray(y_x))) \
            < 5e-5 * scale, b


def test_pallas_path_rejects_oversized_prototype_at_build():
    # K=64, M=17 -> prototype length 1088 > CTX_SAMPLES+1: must raise a
    # clear ValueError at make_block_fn time, not a negative-dimension
    # error at first call (advisor finding, round 2).
    import pytest

    from comms_tpu.models import channelizer as model
    from comms_tpu.models import fm_band_monitor as monitor

    cfg = model.ChannelizerConfig(taps_per_branch=17,
                                  block=CP.step_samples())
    with pytest.raises(ValueError, match="context"):
        model.make_block_fn(cfg, use_pallas=True, interpret=True)

    mcfg = monitor.BandMonitorConfig(num_channels=64, taps_per_branch=17,
                                     block=CP.step_samples())
    with pytest.raises(ValueError, match="context"):
        monitor.make_block_fn(mcfg, use_pallas=True, interpret=True)


def test_band_monitor_pallas_audio_fir_path():
    # config where the decimating-FIR Pallas path engages for the
    # audio stage (pairwise channel packing): parity vs the XLA path
    from comms_tpu.models import fm_band_monitor as fbm

    cfg = fbm.BandMonitorConfig(num_channels=2, taps_per_branch=8,
                                block=2 * 16384, audio_dec=4)
    assert fbm._audio_tile_rows(cfg) == 32
    blk_p = fbm.make_block_fn(cfg, use_pallas=True, interpret=True)
    blk_x = fbm.make_block_fn(cfg, use_pallas=False)

    rng = np.random.default_rng(21)
    pairs = rng.normal(size=(cfg.block, 2)).astype(np.float32)
    sp, sx = fbm.init_state(cfg), fbm.init_state(cfg)
    for _ in range(2):                   # streaming: ctx carried
        ap, sp = blk_p(sp, jnp.asarray(pairs))
        ax, sx = blk_x(sx, jnp.asarray(pairs))
        scale = np.abs(np.asarray(ax)).max()
        assert np.abs(np.asarray(ap) - np.asarray(ax)).max() < 2e-5 * max(scale, 1.0)


def test_band_monitor_pallas_audio_fir_ragged_taps():
    # review finding: taps % dec != 0 means the carried ctx is
    # M*D-1 = audio_C.size-1 samples, NOT taps-1 — the kernel path
    # must honor the polyphase convention (this config crashed at
    # trace before the fix)
    from comms_tpu.models import fm_band_monitor as fbm

    cfg = fbm.BandMonitorConfig(num_channels=2, block=2 * 16384,
                                audio_dec=4,
                                audio_taps=np.hanning(30))
    assert fbm._audio_tile_rows(cfg) == 32
    blk_p = fbm.make_block_fn(cfg, use_pallas=True, interpret=True)
    blk_x = fbm.make_block_fn(cfg, use_pallas=False)
    rng = np.random.default_rng(23)
    pairs = rng.normal(size=(cfg.block, 2)).astype(np.float32)
    sp, sx = fbm.init_state(cfg), fbm.init_state(cfg)
    for _ in range(2):
        ap, sp = blk_p(sp, jnp.asarray(pairs))
        ax, sx = blk_x(sx, jnp.asarray(pairs))
        scale = max(np.abs(np.asarray(ax)).max(), 1.0)
        assert np.abs(np.asarray(ap) - np.asarray(ax)).max() < 2e-5 * scale
