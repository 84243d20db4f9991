"""General Pallas polyphase decimating FIR: parity with
ops.fir.fir_decimate_poly (interpret mode; compiled path via bench /
verify recipe on hardware)."""

import numpy as np
import jax.numpy as jnp

from comms_tpu.kernels import poly_fir_pallas as P
from comms_tpu.ops import fir


def _oracle(x, taps, dec, ctx_full):
    Hb = fir.decimating_branch_taps(taps, dec)
    ctx = jnp.asarray(ctx_full[-(Hb.size - 1):])
    y, _ = fir.fir_decimate_poly(jnp.asarray(x), Hb, ctx)
    return np.asarray(y)


def test_poly_fir_pallas_real_taps_dec5():
    rng = np.random.default_rng(0)
    D = 5
    N = P.step_samples(D) * 2
    x = (rng.normal(size=N) + 1j * rng.normal(size=N)).astype(np.complex64)
    taps = rng.normal(size=63).astype(np.float64)
    ctx = np.zeros(P.CTX_ROWS * D * 128, np.complex64)
    y, _ = P.poly_fir_pallas(jnp.asarray(x), taps, jnp.asarray(ctx), D,
                             interpret=True)
    ref = _oracle(x, taps, D, ctx)
    scale = np.abs(ref).max()
    assert np.max(np.abs(np.asarray(y) - ref)) < 1e-5 * scale


def test_poly_fir_pallas_complex_taps_dec4():
    rng = np.random.default_rng(1)
    D = 4
    N = P.step_samples(D)
    x = (rng.normal(size=N) + 1j * rng.normal(size=N)).astype(np.complex64)
    taps = (rng.normal(size=48) + 1j * rng.normal(size=48))
    ctx = np.zeros(P.CTX_ROWS * D * 128, np.complex64)
    y, _ = P.poly_fir_pallas(jnp.asarray(x), taps, jnp.asarray(ctx), D,
                             interpret=True)
    ref = _oracle(x, taps.astype(np.complex64), D, ctx)
    scale = np.abs(ref).max()
    assert np.max(np.abs(np.asarray(y) - ref)) < 1e-5 * scale


def test_poly_fir_pallas_streaming():
    rng = np.random.default_rng(2)
    D = 5
    N = P.step_samples(D)
    x = (rng.normal(size=2 * N) + 1j * rng.normal(size=2 * N)
         ).astype(np.complex64)
    taps = rng.normal(size=63).astype(np.float64)
    ctx = jnp.zeros(P.CTX_ROWS * D * 128, jnp.complex64)
    y1, ctx = P.poly_fir_pallas(jnp.asarray(x[:N]), taps, ctx, D,
                                interpret=True)
    y2, _ = P.poly_fir_pallas(jnp.asarray(x[N:]), taps, ctx, D,
                              interpret=True)
    y = np.concatenate([np.asarray(y1), np.asarray(y2)])
    ref = _oracle(x, taps, D,
                  np.zeros(P.CTX_ROWS * D * 128, np.complex64))
    scale = np.abs(ref).max()
    assert np.max(np.abs(y - ref)) < 1e-5 * scale


def test_poly_fir_pallas_long_filter_256_taps():
    # Round-2 verdict: a 256-tap channel-select FIR (routine in SDR)
    # must have a kernel path.  q = 2 context pieces.
    rng = np.random.default_rng(20)
    taps = rng.normal(size=256)
    N = P.step_samples(5) * 2
    x = (rng.normal(size=N) + 1j * rng.normal(size=N)).astype(np.complex64)
    ctx = jnp.zeros(P.CTX_ROWS * 5 * 128, jnp.complex64)
    y, _ = P.poly_fir_pallas(jnp.asarray(x), taps, ctx, 5, interpret=True)

    C = fir.decimating_branch_taps(taps.astype(np.float32), 5)
    y_ref, _ = fir.fir_decimate_poly(
        jnp.asarray(x), C, jnp.zeros(C.size - 1, jnp.complex64))
    ref = np.asarray(y_ref)
    scale = np.abs(ref).max()
    assert np.max(np.abs(np.asarray(y) - ref)) < 1e-5 * scale


def test_poly_fir_pallas_long_filter_streaming_641_taps():
    # the maximum supported length at dec=5 (window exactly one
    # previous slab row), streamed over two blocks.
    rng = np.random.default_rng(21)
    taps = rng.normal(size=641)
    N = P.step_samples(5)
    x = (rng.normal(size=2 * N) + 1j * rng.normal(size=2 * N)
         ).astype(np.complex64)
    ctx = jnp.zeros(P.CTX_ROWS * 5 * 128, jnp.complex64)
    y1, ctx = P.poly_fir_pallas(jnp.asarray(x[:N]), taps, ctx, 5,
                                 interpret=True)
    y2, _ = P.poly_fir_pallas(jnp.asarray(x[N:]), taps, ctx, 5,
                               interpret=True)
    got = np.concatenate([np.asarray(y1), np.asarray(y2)])

    C = fir.decimating_branch_taps(taps.astype(np.float32), 5)
    y_ref, _ = fir.fir_decimate_poly(
        jnp.asarray(x), C, jnp.zeros(C.size - 1, jnp.complex64))
    ref = np.asarray(y_ref)
    scale = np.abs(ref).max()
    assert np.max(np.abs(got - ref)) < 1e-5 * scale


def test_poly_fir_pallas_rejects_too_long():
    import pytest

    with pytest.raises(ValueError, match="dec\\*128"):
        P.poly_fir_pallas(
            jnp.zeros(P.step_samples(2), jnp.complex64),
            np.ones(258), jnp.zeros(P.CTX_ROWS * 2 * 128, jnp.complex64),
            2, interpret=True)
