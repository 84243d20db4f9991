"""FFT op: reference tolerance (fft_node.rs:242-244, per-bin < 1e-5)
against a direct DFT oracle; unnormalized rustfft ifft convention."""

import numpy as np
import jax.numpy as jnp

from comms_tpu.ops import fft


def dft_oracle(x):
    n = len(x)
    k = np.arange(n)
    W = np.exp(-2j * np.pi * np.outer(k, k) / n)
    return W @ x


def test_fft_10pt_vs_dft():
    rng = np.random.default_rng(0)
    x = (rng.normal(size=10) + 1j * rng.normal(size=10)).astype(np.complex64)
    got = np.asarray(fft.fft_block(jnp.asarray(x), 10))
    assert np.max(np.abs(got - dft_oracle(x.astype(np.complex128)))) < 1e-5


def test_fft_batched_blocks():
    rng = np.random.default_rng(1)
    x = (rng.normal(size=64) + 1j * rng.normal(size=64)).astype(np.complex128)
    got = np.asarray(fft.fft_block(jnp.asarray(x), 16))
    expected = np.fft.fft(x.reshape(4, 16), axis=-1).reshape(-1)
    assert np.allclose(got, expected, atol=1e-9)


def test_ifft_rustfft_unnormalized():
    rng = np.random.default_rng(2)
    x = (rng.normal(size=16) + 1j * rng.normal(size=16)).astype(np.complex128)
    got = np.asarray(fft.ifft_block(jnp.asarray(x), 16))
    # rustfft inverse has no 1/N: ifft(fft(x)) == N * x.
    expected = np.fft.ifft(x) * 16
    assert np.allclose(got, expected, atol=1e-9)

    got_norm = np.asarray(fft.ifft_block(jnp.asarray(x), 16, normalize=True))
    assert np.allclose(got_norm, np.fft.ifft(x), atol=1e-9)


def test_fft_reblock_sample_semantics():
    x = jnp.arange(37, dtype=jnp.complex128)
    frames, tail = fft.fft_reblock(x, 8)
    assert frames.shape == (4, 8)
    assert np.array_equal(np.asarray(tail), np.arange(32, 37))


def test_fft_four_step_matches_numpy():
    from comms_tpu.ops import fft as cfft

    rng = np.random.default_rng(40)
    for N, radix in [(1024, None), (1024, (32, 32)), (256, None),
                     (96, None)]:
        x = (rng.normal(size=(5, N)) + 1j * rng.normal(size=(5, N))
             ).astype(np.complex64)
        got = np.asarray(cfft.fft_four_step(jnp.asarray(x), radix=radix))
        ref = np.fft.fft(x, axis=-1)
        scale = np.max(np.abs(ref))
        assert np.max(np.abs(got - ref)) / scale < 1e-5, (N, radix)


def test_fft_four_step_bad_radix():
    import pytest

    from comms_tpu.ops import fft as cfft

    with pytest.raises(ValueError, match="factor"):
        cfft.fft_four_step(jnp.zeros((2, 64), jnp.complex64), radix=(16, 8))


def test_fft_four_step_large_n_guard():
    from comms_tpu.ops import fft as cfft

    # default radix falls back to jnp.fft rather than materializing a
    # huge dense DFT matrix (code-review finding, round 3)
    x = (np.random.default_rng(1).normal(size=(1, 1 << 20))
         ).astype(np.complex64)
    got = np.asarray(cfft.fft_four_step(jnp.asarray(x)))
    ref = np.fft.fft(x, axis=-1)
    assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 1e-4

    import pytest

    with pytest.raises(ValueError, match="dense"):
        cfft.fft_four_step(jnp.zeros((1, 1 << 20), jnp.complex64),
                           radix=(64, 1 << 14))
