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
