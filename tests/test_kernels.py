"""Pallas kernels vs their XLA reference ops (interpreter mode on the
CPU mesh; the same calls run compiled on TPU via bench/verify)."""

import numpy as np
import jax.numpy as jnp

from comms_tpu.kernels import fir_block_pallas
from comms_tpu.ops import fir


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
    assert np.allclose(np.asarray(y), np.asarray(y_ref), atol=2e-4)
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
    assert np.allclose(np.asarray(y), np.asarray(y_ref), atol=2e-4)


def test_fir_pallas_rejects_long_taps():
    # the validation itself must fire (interpret mode, so the error
    # cannot come from an unrelated backend limitation), at the NEW
    # 1025-tap limit.
    import pytest
    with pytest.raises(ValueError, match="1025"):
        fir_block_pallas(jnp.zeros(2048, jnp.complex64),
                         np.zeros(1026, np.complex64),
                         jnp.zeros(1025, jnp.complex64),
                         interpret=True)


def test_fir_pallas_long_filter_257_taps():
    # multi-piece window: 257 taps -> 3 banded-GEMM pieces.
    from comms_tpu.kernels import fir_pallas as FP

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
    ref = np.asarray(y_ref)
    scale = np.abs(ref).max()
    assert np.max(np.abs(np.asarray(y) - ref)) < 1e-5 * scale
