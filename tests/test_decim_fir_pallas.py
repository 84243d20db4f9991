"""Decimating-FIR Pallas kernel vs the XLA polyphase oracle
(``ops.fir.fir_decimate_poly``), interpreter mode on the CPU mesh.
The kernel's default mode is bf16 split-operand GEMMs (~1e-5 relative
error), so assertions are relative-scale bounds."""

import numpy as np
import jax.numpy as jnp
import pytest

from comms_tpu.kernels import decim_fir_pallas as DF
from comms_tpu.ops import fir


def _oracle(x, taps, dec):
    C = fir.decimating_branch_taps(np.asarray(taps), dec)
    ctx = jnp.zeros(C.size - 1, jnp.complex64)
    y, _ = fir.fir_decimate_poly(jnp.asarray(x), C, ctx)
    return np.asarray(y)


def _run(x, taps, dec, tile_rows=16, mode="split"):
    cr, ci = DF.decim_ctx_zero(dec)
    yr, yi, _, _ = DF.fir_decimate_planar_pallas(
        jnp.asarray(x.real.astype(np.float32)),
        jnp.asarray(x.imag.astype(np.float32)),
        taps, dec, cr, ci, tile_rows=tile_rows, mode=mode,
        interpret=True)
    return np.asarray(yr) + 1j * np.asarray(yi)


@pytest.mark.parametrize("dec,taps_len", [(5, 63), (4, 12), (2, 33),
                                          (3, 1), (5, 640)])
def test_matches_polyphase_oracle(dec, taps_len):
    rng = np.random.default_rng(dec * 100 + taps_len)
    N = 16 * dec * 128 * 2
    x = (rng.normal(size=N) + 1j * rng.normal(size=N)).astype(np.complex64)
    taps = rng.normal(size=taps_len).astype(np.float32)
    got = _run(x, taps, dec)
    ref = _oracle(x, taps, dec)
    assert got.shape == ref.shape == (N // dec,)
    assert np.max(np.abs(got - ref)) < 5e-5 * np.max(np.abs(ref))


def test_complex_taps_karatsuba_path():
    rng = np.random.default_rng(7)
    dec = 5
    N = 16 * dec * 128 * 2
    x = (rng.normal(size=N) + 1j * rng.normal(size=N)).astype(np.complex64)
    taps = (rng.normal(size=63) + 1j * rng.normal(size=63)
            ).astype(np.complex64)
    got = _run(x, taps, dec)
    ref = _oracle(x, taps, dec)
    assert np.max(np.abs(got - ref)) < 5e-5 * np.max(np.abs(ref))


def test_streaming_ctx_exact():
    """Chopping the stream reproduces the one-shot output EXACTLY (the
    carried wide-row context is bit-identical input state)."""
    rng = np.random.default_rng(3)
    dec, T = 5, 63
    N = 16 * dec * 128 * 2
    xr = rng.normal(size=N).astype(np.float32)
    xi = rng.normal(size=N).astype(np.float32)
    taps = rng.normal(size=T).astype(np.float32)

    cr, ci = DF.decim_ctx_zero(dec)
    y1r, y1i, _, _ = DF.fir_decimate_planar_pallas(
        jnp.asarray(xr), jnp.asarray(xi), taps, dec, cr, ci,
        tile_rows=16, interpret=True)

    h = N // 2
    cr, ci = DF.decim_ctx_zero(dec)
    ar, ai, cr, ci = DF.fir_decimate_planar_pallas(
        jnp.asarray(xr[:h]), jnp.asarray(xi[:h]), taps, dec, cr, ci,
        tile_rows=16, interpret=True)
    br, bi = DF.fir_decimate_planar_pallas(
        jnp.asarray(xr[h:]), jnp.asarray(xi[h:]), taps, dec, cr, ci,
        tile_rows=16, interpret=True)[:2]
    assert np.array_equal(
        np.concatenate([np.asarray(ar), np.asarray(br)]), np.asarray(y1r))
    assert np.array_equal(
        np.concatenate([np.asarray(ai), np.asarray(bi)]), np.asarray(y1i))


def test_validation_errors():
    cr, ci = DF.decim_ctx_zero(5)
    with pytest.raises(ValueError, match="taps"):
        DF.fir_decimate_planar_pallas(
            jnp.zeros(5 * 128 * 16, jnp.float32),
            jnp.zeros(5 * 128 * 16, jnp.float32),
            np.ones(5 * 128 + 2, np.float32), 5, cr, ci,
            tile_rows=16, interpret=True)
    with pytest.raises(ValueError, match="multiple"):
        DF.fir_decimate_planar_pallas(
            jnp.zeros(1000, jnp.float32), jnp.zeros(1000, jnp.float32),
            np.ones(5, np.float32), 5, cr, ci, tile_rows=16,
            interpret=True)


def test_max_taps_boundary_works():
    """Regression: the advertised max_taps must actually trace and
    match the oracle (dec*128 for dec>1 — the former dec*128+1 bound
    produced an opaque empty-contraction error at trace time)."""
    for dec in (1, 2, 5):
        T = DF.max_taps(dec)
        rng = np.random.default_rng(T)
        N = 16 * dec * 128
        x = (rng.normal(size=N) + 1j * rng.normal(size=N)
             ).astype(np.complex64)
        taps = rng.normal(size=T).astype(np.float32)
        got = _run(x, taps, dec)
        ref = _oracle(x, taps, dec)
        assert np.max(np.abs(got - ref)) < 1e-4 * np.max(np.abs(ref)), dec
        with pytest.raises(ValueError, match="taps"):
            _run(x, np.ones(T + 1, np.float32), dec)
