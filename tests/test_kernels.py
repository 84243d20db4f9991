"""Pallas kernels vs their XLA reference ops (interpreter mode on the
CPU mesh; the same calls run compiled on TPU via bench/verify).

The FIR kernel's default mode is bf16 split-operand (x3) GEMMs:
~1e-5 RELATIVE error vs the f32-HIGHEST XLA path, so assertions are
relative-scale bounds, not absolute."""

import numpy as np
import jax.numpy as jnp

from comms_tpu.kernels import fir_block_pallas
from comms_tpu.kernels import fir_pallas as FP
from comms_tpu.ops import fir


def _relmax(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return np.max(np.abs(a - b)) / np.max(np.abs(b))


def test_fir_pallas_matches_fir_block():
    rng = np.random.default_rng(0)
    T = 63
    t = (rng.normal(size=T) + 1j * rng.normal(size=T)).astype(np.complex64)
    x = (rng.normal(size=40000) + 1j * rng.normal(size=40000)).astype(
        np.complex64)
    ctx = (rng.normal(size=T - 1) + 1j * rng.normal(size=T - 1)).astype(
        np.complex64)

    y_ref, ctx_ref = fir.fir_block(jnp.asarray(x), t, jnp.asarray(ctx))
    y, new_ctx = fir_block_pallas(jnp.asarray(x), t, jnp.asarray(ctx),
                                  tile_rows=16, interpret=True)
    assert _relmax(y, y_ref) < 5e-5
    assert np.array_equal(np.asarray(new_ctx), np.asarray(ctx_ref))


def test_fir_pallas_ragged_length():
    # N not a multiple of the tile: padded internally, trimmed back.
    rng = np.random.default_rng(1)
    T = 33
    t = rng.normal(size=T).astype(np.complex64)
    x = (rng.normal(size=5000)).astype(np.complex64)

    y_ref, _ = fir.fir_block(jnp.asarray(x), t, fir.init_ctx(T))
    y, _ = fir_block_pallas(jnp.asarray(x), t, fir.init_ctx(T),
                            tile_rows=8, interpret=True)
    assert y.shape == (5000,)
    assert _relmax(y, y_ref) < 5e-5


def test_fir_pallas_rejects_long_taps():
    # the validation itself must fire (interpret mode, so the error
    # cannot come from an unrelated backend limitation), at the
    # 1025-tap limit.
    import pytest
    with pytest.raises(ValueError, match="1025"):
        fir_block_pallas(jnp.zeros(2048, jnp.complex64),
                         np.zeros(1026, np.complex64),
                         jnp.zeros(1025, jnp.complex64),
                         interpret=True)


def test_fir_pallas_long_filter_257_taps():
    # multi-piece aligned band: 257 taps -> off=256, 3 K=128 pieces.
    rng = np.random.default_rng(30)
    taps = (rng.normal(size=257) + 1j * rng.normal(size=257)
            ).astype(np.complex64)
    x = (rng.normal(size=4096) + 1j * rng.normal(size=4096)
         ).astype(np.complex64)
    ctx = (rng.normal(size=256) + 1j * rng.normal(size=256)
           ).astype(np.complex64)
    y, _ = FP.fir_block_pallas(jnp.asarray(x), taps, jnp.asarray(ctx),
                               interpret=True)
    y_ref, _ = fir.fir_block(jnp.asarray(x), fir.banded_tap_matrix(taps),
                             jnp.asarray(ctx))
    assert _relmax(y, y_ref) < 1e-4


def test_fir_planar_streaming_matches_one_shot():
    """The planar kernel's carried [8,128] context planes: chopping the
    stream into blocks must reproduce the one-shot output exactly (same
    mode), and both must match the XLA oracle to bf16-split error."""
    rng = np.random.default_rng(7)
    T = 63
    taps = (rng.normal(size=T) + 1j * rng.normal(size=T)
            ).astype(np.complex64)
    N = 16 * 128 * 4
    xr = rng.normal(size=N).astype(np.float32)
    xi = rng.normal(size=N).astype(np.float32)

    cr, ci = FP.planar_ctx_zero()
    yr1, yi1, _, _ = FP.fir_planar_pallas(
        jnp.asarray(xr), jnp.asarray(xi), taps, cr, ci,
        tile_rows=16, interpret=True)

    # two blocks with carried ctx
    h = N // 2
    cr, ci = FP.planar_ctx_zero()
    ya_r, ya_i, cr, ci = FP.fir_planar_pallas(
        jnp.asarray(xr[:h]), jnp.asarray(xi[:h]), taps, cr, ci,
        tile_rows=16, interpret=True)
    yb_r, yb_i, _, _ = FP.fir_planar_pallas(
        jnp.asarray(xr[h:]), jnp.asarray(xi[h:]), taps, cr, ci,
        tile_rows=16, interpret=True)
    got_r = np.concatenate([np.asarray(ya_r), np.asarray(yb_r)])
    got_i = np.concatenate([np.asarray(ya_i), np.asarray(yb_i)])
    assert np.array_equal(got_r, np.asarray(yr1))
    assert np.array_equal(got_i, np.asarray(yi1))

    z = (xr + 1j * xi).astype(np.complex64)
    y_ref, _ = fir.fir_block(jnp.asarray(z), taps, fir.init_ctx(T))
    got = got_r + 1j * got_i
    assert _relmax(got, y_ref) < 5e-5


def test_fir_planar_real_taps_fast_path():
    """Real taps take the 2-matmul path; parity vs the XLA oracle."""
    rng = np.random.default_rng(8)
    taps = rng.normal(size=63).astype(np.float32)
    N = 8 * 128 * 2
    xr = rng.normal(size=N).astype(np.float32)
    xi = rng.normal(size=N).astype(np.float32)
    cr, ci = FP.planar_ctx_zero()
    yr, yi, _, _ = FP.fir_planar_pallas(
        jnp.asarray(xr), jnp.asarray(xi), taps, cr, ci,
        tile_rows=8, interpret=True)
    z = (xr + 1j * xi).astype(np.complex64)
    y_ref, _ = fir.fir_block(jnp.asarray(z), taps.astype(np.complex64),
                             fir.init_ctx(63))
    got = np.asarray(yr) + 1j * np.asarray(yi)
    assert _relmax(got, y_ref) < 5e-5


def test_fir_planar_rejects_bad_n():
    import pytest
    with pytest.raises(ValueError, match="multiple"):
        cr, ci = FP.planar_ctx_zero()
        FP.fir_planar_pallas(jnp.zeros(1000, jnp.float32),
                             jnp.zeros(1000, jnp.float32),
                             np.ones(5, np.float32), cr, ci,
                             tile_rows=16, interpret=True)


def test_fir_planar_single_tap_gain():
    """Regression: T=1 (pure gain) must not return zeros — the kernel's
    halo-row count must match the band's minimum 128-lane offset."""
    rng = np.random.default_rng(12)
    N = 8 * 128
    xr = rng.normal(size=N).astype(np.float32)
    xi = rng.normal(size=N).astype(np.float32)
    cr, ci = FP.planar_ctx_zero()
    yr, yi, _, _ = FP.fir_planar_pallas(
        jnp.asarray(xr), jnp.asarray(xi), np.array([2.0], np.float32),
        cr, ci, tile_rows=8, interpret=True)
    assert np.allclose(np.asarray(yr), 2.0 * xr, atol=1e-2)
    assert np.allclose(np.asarray(yi), 2.0 * xi, atol=1e-2)


def test_panel_reductions_groundwork():
    """Mosaic groundwork for the boundary block (ROADMAP_r6 item 3):
    the masked-diagonal panel reductions match the XLA estimate
    chain's values (lag_sums_r2 / the v=-1 frequency diagonal / the
    mod-sps folds) in interpret mode."""
    import numpy as np
    import jax.numpy as jnp

    from comms_tpu.kernels import panel_reduce_pallas as PR
    from comms_tpu.models import qpsk_rx

    cfg = qpsk_rx.QpskRxConfig()
    hw = cfg.panel_hw
    rng = np.random.default_rng(3)
    N = 1 << 14
    re = jnp.asarray(rng.standard_normal(N).astype(np.float32))
    im = jnp.asarray(rng.standard_normal(N).astype(np.float32))
    panels = cfg.timing.corr_panels(re, im, halfwidth=hw)
    P1, P2, P3, P4, meta = panels

    # pack into the fused kernel's [256, 256] accumulator layout
    width = 128 + 2 * hw
    p13 = np.zeros((256, 256), np.float32)
    p24 = np.zeros((256, 256), np.float32)
    p13[:128, :width] = np.asarray(P1)
    p13[128:, :width] = np.asarray(P3)
    p24[:128, :width] = -np.asarray(P2)
    p24[128:, :width] = -np.asarray(P4)

    out = np.asarray(PR.panel_reductions(p13, p24, hw, interpret=True))

    gr_ref, gi_ref = cfg.timing.lag_sums_r2(panels)
    gr_ref = np.asarray(gr_ref)
    gi_ref = np.asarray(gi_ref)
    scale = np.max(np.abs(gr_ref)) or 1.0
    assert np.max(np.abs(out[0, :2 * hw + 1] - gr_ref)) < 1e-4 * scale
    assert np.max(np.abs(out[1, :2 * hw + 1] - gi_ref)) < 1e-4 * scale

    # f_est: the v = -1 diagonal's angle
    f_ref = float(np.arctan2(gi_ref[hw - 1], gr_ref[hw - 1]))
    assert abs(out[2, 0] - f_ref) < 1e-5

    # mod-sps folds vs a direct numpy oracle on Er
    ph = 2.0 * np.pi * (np.arange(128) % cfg.sps) / cfg.sps
    c2 = np.cos(ph)[:, None]
    s2 = np.sin(ph)[:, None]
    Er = ((c2 * np.asarray(P1) + s2 * np.asarray(P3))
          - (c2 * np.asarray(P4) - s2 * np.asarray(P2)))
    for a in range(cfg.sps):
        for v in (0, 7, 2 * hw):
            ref = sum(Er[j, j + v] for j in range(128)
                      if j % cfg.sps == a and j + v < width)
            assert abs(out[8 + a, v] - ref) < 1e-4 * scale, (a, v)
