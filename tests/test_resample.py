"""Decimation / upsampling vs the reference doc examples
(resample_node.rs:44-52, :111-118) and edge cases (:138-175)."""

import numpy as np
import jax.numpy as jnp

from comms_tpu.ops import resample


def test_decimate_doc_example():
    data = jnp.array([1, 2, 3, 4, 5, 6, 7, 8])
    got = np.asarray(resample.decimate_block(data, 3))
    assert np.array_equal(got, [1, 4, 7])


def test_decimate_rate_0_1_passthrough():
    data = jnp.array([1, 2, 3])
    assert np.array_equal(np.asarray(resample.decimate_block(data, 0)),
                          [1, 2, 3])
    assert np.array_equal(np.asarray(resample.decimate_block(data, 1)),
                          [1, 2, 3])


def test_upsample_doc_example():
    data = jnp.array([1, 2, 3])
    got = np.asarray(resample.upsample_block(data, 3))
    assert np.array_equal(got, [1, 0, 0, 2, 0, 0, 3, 0, 0])


def test_upsample_rate_0_1_passthrough():
    data = jnp.array([5, 6])
    assert np.array_equal(np.asarray(resample.upsample_block(data, 0)), [5, 6])
    assert np.array_equal(np.asarray(resample.upsample_block(data, 1)), [5, 6])


def test_decimate_stream_carries_phase():
    x = np.arange(24)
    offset = resample.decimate_stream_init()
    got = []
    for i in range(4):
        y, offset = resample.decimate_stream(jnp.asarray(x[i*6:(i+1)*6]),
                                             offset, 3)
        got.append(np.asarray(y))
    assert np.array_equal(np.concatenate(got), x[::3])


def test_block_reset_vs_stream_differ_midblock():
    # Per-block reset restarts the stride at every block boundary.
    x = np.arange(8)
    a = np.asarray(resample.decimate_block(jnp.asarray(x[:4]), 3))
    b = np.asarray(resample.decimate_block(jnp.asarray(x[4:]), 3))
    assert np.array_equal(np.concatenate([a, b]), [0, 3, 4, 7])


def _rational_oracle(x, h, P, Q):
    """zero-stuff by P -> causal FIR(h) -> keep every Q (float64)."""
    ups = np.zeros(len(x) * P, dtype=np.complex128)
    ups[::P] = x
    y = np.convolve(ups, h)[: len(ups)]
    return y[::Q]


def test_rational_resample_matches_oracle():
    from comms_tpu.ops import taps as taps_mod
    rng = np.random.default_rng(0)
    for P, Q in [(3, 2), (2, 3), (5, 4), (4, 5), (7, 3)]:
        h = np.asarray(taps_mod.rrc_taps(8 * P, float(P), 0.3)).real
        n = 40 * Q
        x = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(
            np.complex128)
        mats, offs, P2 = resample.rational_taps(h, P, Q)
        assert P2 == P
        ctx = resample.rational_resample_init(mats, dtype=jnp.complex128)
        y, _ = resample.rational_resample_block(jnp.asarray(x), mats,
                                                offs, P, ctx)
        expected = _rational_oracle(x, h, P, Q)
        assert y.shape[0] == n * P // Q
        assert np.allclose(np.asarray(y), expected[: y.shape[0]],
                           atol=1e-9), (P, Q)


def test_rational_resample_streaming():
    from comms_tpu.ops import taps as taps_mod
    rng = np.random.default_rng(1)
    P, Q = 3, 2
    h = np.asarray(taps_mod.rc_taps(24, float(P), 0.4)).real
    n = 60 * Q
    x = (rng.normal(size=n)).astype(np.complex128)
    mats, offs, _ = resample.rational_taps(h, P, Q)

    ctx = resample.rational_resample_init(mats, dtype=jnp.complex128)
    y_once, _ = resample.rational_resample_block(jnp.asarray(x), mats,
                                                 offs, P, ctx)
    ctx = resample.rational_resample_init(mats, dtype=jnp.complex128)
    parts = []
    for i in range(6):
        blk = x[i * 20: (i + 1) * 20]  # 20 % Q == 0
        y, ctx = resample.rational_resample_block(jnp.asarray(blk), mats,
                                                  offs, P, ctx)
        parts.append(np.asarray(y))
    assert np.allclose(np.concatenate(parts), np.asarray(y_once),
                       atol=1e-12)


def test_rational_resample_gcd_normalized():
    h = np.ones(12, dtype=np.float64)
    mats, offs, P = resample.rational_taps(h, 6, 4)  # -> 3/2
    assert P == 3
    assert mats[0].shape[1] == 2
