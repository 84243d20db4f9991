"""Tiled four-step large-N FFT / Welch PSD kernels (interpret mode on
CPU; the same calls run compiled on TPU via bench/verify).

Parity bound: each stage is a split-bf16 batched FFT at ~1e-6
relative, so the cascaded transform is held to the reference node
tolerance of 1e-5 (fft_node.rs:242-244) at relative scale.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from comms_tpu.kernels import fft_big_pallas as FB


def _relmax(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return np.max(np.abs(a - b)) / np.max(np.abs(b))


def test_factorize():
    assert FB.factorize(1 << 20) == (1024, 1024)
    assert FB.factorize(1 << 18) == (512, 512)
    n1, n2 = FB.factorize(1 << 19)
    assert n1 * n2 == 1 << 19 and {n1, n2} == {512, 1024}
    assert FB.supported_big(1 << 16)
    assert FB.supported_big(1 << 22)
    assert not FB.supported_big(1 << 23)    # 2048*4096: no pair
    assert not FB.supported_big(3 * (1 << 16))


def test_fft_big_matches_numpy():
    rng = np.random.default_rng(0)
    n1, n2 = 256, 512
    N = n1 * n2
    x = (rng.normal(size=(2, N)) + 1j * rng.normal(size=(2, N))
         ).astype(np.complex64)
    yr, yi = FB.fft_big_pallas_planar(
        x.real.copy(), x.imag.copy(), n1, n2, interpret=True)
    got = np.asarray(yr) + 1j * np.asarray(yi)
    ref = np.fft.fft(x, axis=1)
    assert _relmax(got, ref) < 1e-5


def test_psd_big_matches_numpy_welch_numerator():
    rng = np.random.default_rng(1)
    n1, n2 = 256, 256
    N = n1 * n2
    B = 3
    x = (rng.normal(size=(B, N)) + 1j * rng.normal(size=(B, N))
         ).astype(np.complex64)
    w = np.hanning(N).astype(np.float32)
    means = np.stack([x.real.mean(1), x.imag.mean(1)], -1
                     ).astype(np.float32)
    acc = FB.psd_big_pallas_planar(
        x.real.copy(), x.imag.copy(), n1, n2, window=w, means=means,
        interpret=True)
    xm = x - x.mean(axis=1, keepdims=True)
    ref = (np.abs(np.fft.fft(xm * w[None, :], axis=1)) ** 2).sum(0)
    assert np.max(np.abs(np.asarray(acc) - ref)) / ref.max() < 1e-5


def test_psd_big_no_window_no_demean():
    rng = np.random.default_rng(2)
    n1, n2 = 256, 256
    N = n1 * n2
    x = (rng.normal(size=(1, N)) + 1j * rng.normal(size=(1, N))
         ).astype(np.complex64)
    acc = FB.psd_big_pallas_planar(
        x.real.copy(), x.imag.copy(), n1, n2, interpret=True)
    ref = (np.abs(np.fft.fft(x, axis=1)) ** 2).sum(0)
    assert np.max(np.abs(np.asarray(acc) - ref)) / ref.max() < 1e-5


def test_validation_errors():
    z = np.zeros((1, 256 * 256), np.float32)
    with pytest.raises(ValueError, match="matches none"):
        FB.psd_big_pallas_planar(z, z, 256, 512, interpret=True)
    with pytest.raises(ValueError, match="supported"):
        FB.fft_big_pallas_planar(
            np.zeros((1, 128 * 512), np.float32),
            np.zeros((1, 128 * 512), np.float32), 128, 512,
            interpret=True)
    with pytest.raises(ValueError, match="planar"):
        FB.fft_big_pallas_planar(z.reshape(-1), z.reshape(-1), 256, 256,
                                 interpret=True)


def test_wideband_psd_pallas_path_matches_welch_oracle():
    # the consumer: make_sharded_psd's 1-shard fast path == the Welch
    # oracle (same window, demean, density normalization)
    from comms_tpu.ops import spectrum
    from comms_tpu.parallel import sharding as sh
    from comms_tpu.parallel import wideband

    rng = np.random.default_rng(3)
    F, B = 1 << 16, 2                       # 256 x 256 factorization
    x = (rng.normal(size=B * F) + 1j * rng.normal(size=B * F)
         ).astype(np.complex64)
    mesh = sh.time_mesh(1)
    psd_fn = wideband.make_sharded_psd(F, mesh, use_pallas=True,
                                       interpret=True)
    pairs = np.stack([x.real, x.imag], -1).reshape(B, F, 2)
    got = np.asarray(psd_fn(jnp.asarray(pairs)))

    _, ref = spectrum.welch_psd(jnp.asarray(x), nperseg=F, noverlap=0)
    ref = np.asarray(ref)
    assert got.shape == ref.shape
    # 2e-5: |.|^2 doubles the cascaded transform's ~1e-5 relative
    # error (the raw-spectrum tests above hold the 1e-5 line)
    assert np.max(np.abs(got - ref)) / np.max(ref) < 2e-5


def test_welch_psd_big_route_matches_xla():
    # the general API: welch_psd with a big nperseg routed through the
    # kernel equals its own XLA path (50% overlap -> two reshape
    # calls through _segment_parts)
    from comms_tpu.ops import spectrum

    rng = np.random.default_rng(4)
    F = 1 << 16
    x = (rng.normal(size=2 * F) + 1j * rng.normal(size=2 * F)
         ).astype(np.complex64)
    _, ref = spectrum.welch_psd(jnp.asarray(x), nperseg=F,
                                use_pallas=False)
    _, got = spectrum.welch_psd(jnp.asarray(x), nperseg=F,
                                use_pallas=True, interpret=True)
    ref, got = np.asarray(ref), np.asarray(got)
    assert np.max(np.abs(got - ref)) / np.max(ref) < 2e-5


def test_fft_large_matches_jnp():
    from comms_tpu.ops import fft as fft_ops

    rng = np.random.default_rng(5)
    n = 1 << 16
    x = (rng.normal(size=(2, n)) + 1j * rng.normal(size=(2, n))
         ).astype(np.complex64)
    got = np.asarray(fft_ops.fft_large(jnp.asarray(x), use_pallas=True,
                                       interpret=True))
    ref = np.fft.fft(x, axis=1)
    assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 1e-5


def test_sharded_psd_segments_matches_welch_oracle():
    # segment-parallel composition: segments sharded over the 8-device
    # mesh, each shard runs the tiled four-step kernel in interpret
    # mode, one psum combines — equals the Welch oracle
    from comms_tpu.ops import spectrum
    from comms_tpu.parallel import sharding as sh
    from comms_tpu.parallel import wideband

    rng = np.random.default_rng(6)
    F, B = 1 << 16, 8
    x = (rng.normal(size=B * F) + 1j * rng.normal(size=B * F)
         ).astype(np.complex64)
    mesh = sh.time_mesh(8)
    psd_fn = wideband.make_sharded_psd_segments(
        F, mesh, use_pallas=True, interpret=True)
    pairs = np.stack([x.real, x.imag], -1).reshape(B, F, 2)
    got = np.asarray(psd_fn(jnp.asarray(pairs)))

    _, ref = spectrum.welch_psd(jnp.asarray(x), nperseg=F, noverlap=0)
    ref = np.asarray(ref)
    assert got.shape == ref.shape
    assert np.max(np.abs(got - ref)) / np.max(ref) < 2e-5


def test_sharded_psd_segments_xla_path():
    from comms_tpu.ops import spectrum
    from comms_tpu.parallel import sharding as sh
    from comms_tpu.parallel import wideband

    rng = np.random.default_rng(8)
    F, B = 1 << 12, 8
    x = (rng.normal(size=B * F) + 1j * rng.normal(size=B * F)
         ).astype(np.complex64)
    mesh = sh.time_mesh(4)
    psd_fn = wideband.make_sharded_psd_segments(F, mesh,
                                                use_pallas=False)
    pairs = np.stack([x.real, x.imag], -1).reshape(B, F, 2)
    got = np.asarray(psd_fn(jnp.asarray(pairs)))
    _, ref = spectrum.welch_psd(jnp.asarray(x), nperseg=F, noverlap=0)
    assert np.max(np.abs(got - np.asarray(ref))) / np.max(ref) < 1e-5


def test_planar_psd_matches_pairs_psd():
    from comms_tpu.parallel import sharding as sh
    from comms_tpu.parallel import wideband

    rng = np.random.default_rng(9)
    F, B = 1 << 16, 2
    re = rng.normal(size=(B, F)).astype(np.float32)
    im = rng.normal(size=(B, F)).astype(np.float32)
    mesh = sh.time_mesh(1)
    p_pairs = wideband.make_sharded_psd(F, mesh, use_pallas=True,
                                        interpret=True)
    p_planar = wideband.make_sharded_psd_planar(F, mesh, use_pallas=True,
                                                interpret=True)
    a = np.asarray(p_pairs(jnp.asarray(np.stack([re, im], -1))))
    b = np.asarray(p_planar(jnp.asarray(re), jnp.asarray(im)))
    assert np.array_equal(a, b)

    # planar XLA fallback matches too
    p_planar_x = wideband.make_sharded_psd_planar(F, mesh,
                                                  use_pallas=False)
    c = np.asarray(p_planar_x(jnp.asarray(re), jnp.asarray(im)))
    assert np.max(np.abs(c - a)) / np.max(np.abs(a)) < 2e-5


def test_sparse_demean_matches_means_path_zero_mean():
    # the opt-in sparse-demean (no means pre-pass): identical quality
    # on zero-mean-ish streams
    from comms_tpu.ops import spectrum

    rng = np.random.default_rng(10)
    n1, n2 = 256, 256
    N = n1 * n2
    x = (rng.normal(size=(2, N)) + 1j * rng.normal(size=(2, N))
         ).astype(np.complex64)
    w = spectrum.hann(N).astype(np.float32)   # periodic: 3-sparse FFT
    ks, _ = FB.sparse_window_bins(w, n1, n2)
    assert list(ks) == [0, 1, N - 1]
    acc = FB.psd_big_pallas_planar(
        x.real.copy(), x.imag.copy(), n1, n2, window=w,
        sparse_demean=True, interpret=True)
    xm = x - x.mean(axis=1, keepdims=True)
    ref = (np.abs(np.fft.fft(xm * w[None, :], axis=1)) ** 2).sum(0)
    assert np.abs(np.asarray(acc) - ref).max() / ref.max() < 2e-5


def test_sparse_demean_large_dc_documented_bound():
    # a 5-sigma DC offset inflates the un-demeaned intermediates; the
    # docstring's measured bound (~1.4e-4 rel-to-max) must hold
    from comms_tpu.ops import spectrum

    rng = np.random.default_rng(11)
    n1, n2 = 256, 256
    N = n1 * n2
    x = (rng.normal(size=(2, N)) + 5.0
         + 1j * (rng.normal(size=(2, N)) - 3.0)).astype(np.complex64)
    w = spectrum.hann(N).astype(np.float32)
    acc = FB.psd_big_pallas_planar(
        x.real.copy(), x.imag.copy(), n1, n2, window=w,
        sparse_demean=True, interpret=True)
    xm = x - x.mean(axis=1, keepdims=True)
    ref = (np.abs(np.fft.fft(xm * w[None, :], axis=1)) ** 2).sum(0)
    assert np.abs(np.asarray(acc) - ref).max() / ref.max() < 5e-4

    # non-edge-sparse window -> clear error
    with pytest.raises(ValueError, match="edge-sparse"):
        FB.psd_big_pallas_planar(
            x.real.copy(), x.imag.copy(), n1, n2,
            window=rng.normal(size=N).astype(np.float32),
            sparse_demean=True, interpret=True)


def test_explicit_use_pallas_bad_n_raises_valueerror():
    # review finding: explicit use_pallas=True with a non-factorizable
    # N must raise ValueError, not TypeError from unpacking None
    from comms_tpu.ops import fft as fft_ops
    from comms_tpu.parallel import sharding as sh
    from comms_tpu.parallel import wideband

    bad = 3 * (1 << 16)
    mesh = sh.time_mesh(1)
    with pytest.raises(ValueError, match="two-factor"):
        wideband.make_sharded_psd(bad, mesh, use_pallas=True)(
            jnp.zeros((1, bad, 2), jnp.float32))
    with pytest.raises(ValueError, match="two-factor"):
        wideband.make_sharded_psd_planar(bad, mesh, use_pallas=True)(
            jnp.zeros((1, bad), jnp.float32),
            jnp.zeros((1, bad), jnp.float32))
    with pytest.raises(ValueError, match="two-factor"):
        fft_ops.fft_large(jnp.zeros((1, bad), jnp.complex64),
                          use_pallas=True)


def test_spectrogram_not_widened_to_big_sizes():
    # review finding: widening the welch auto-predicate must not leak
    # into spectrogram, whose pallas branch is the small kernel only
    from comms_tpu.ops import spectrum

    assert not spectrum._auto_use_pallas(1 << 16)          # default
    # (the big route is welch_psd's, behind big=True + TPU platform)


def test_welch_numerator_3d_ingest_matches_2d():
    # Pre-factorized [segments, n1, n2] ingest (the serving shape,
    # skipping the XLA relayout) must equal the flat [segments, N]
    # entry bit-for-bit.
    from comms_tpu.ops import spectrum
    rng = np.random.default_rng(9)
    n1, n2 = 256, 256
    re = rng.normal(size=(2, n1 * n2)).astype(np.float32)
    im = rng.normal(size=(2, n1 * n2)).astype(np.float32)
    w = spectrum.hann(n1 * n2).astype(np.float32)
    a2 = np.asarray(FB.welch_numerator(jnp.asarray(re), jnp.asarray(im),
                                       w, interpret=True))
    a3 = np.asarray(FB.welch_numerator(
        jnp.asarray(re.reshape(2, n1, n2)),
        jnp.asarray(im.reshape(2, n1, n2)), w, interpret=True))
    # mean-reduction order differs between the flat and (1, 2)-axis
    # forms -> f32-rounding-level differences only
    scale = float(np.max(np.abs(a2)))
    np.testing.assert_allclose(a3, a2, atol=2e-5 * scale)


def test_blocked_ingest_matches_planar():
    """Pre-blocked x [B, n2//ct, n1, ct] (the contiguous-slab serving
    contract, ROADMAP_r5 item 2) is bit-identical to the 3-D
    pre-factorized ingest for both the PSD and FFT entries, and
    welch_numerator routes the 4-D shape."""
    rng = np.random.default_rng(7)
    n1, n2 = 256, 256
    ct = 128
    B = 2
    x = (rng.normal(size=(B, n1, n2)) + 1j * rng.normal(size=(B, n1, n2))
         ).astype(np.complex64)
    # x4[b, c, i, l] = x3[b, i, c*ct + l]
    x4 = np.transpose(x.reshape(B, n1, n2 // ct, ct), (0, 2, 1, 3))
    w = np.hanning(n1 * n2).astype(np.float32)
    means = np.stack([x.real.mean((1, 2)), x.imag.mean((1, 2))], -1
                     ).astype(np.float32)

    want = FB.psd_big_pallas_planar(
        x.real.copy(), x.imag.copy(), n1, n2, window=w, means=means,
        interpret=True)
    got = FB.psd_big_pallas_planar(
        x4.real.copy(), x4.imag.copy(), n1, n2, window=w, means=means,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    wr, wi = FB.fft_big_pallas_planar(
        x.real.copy(), x.imag.copy(), n1, n2, interpret=True)
    gr, gi = FB.fft_big_pallas_planar(
        x4.real.copy(), x4.imag.copy(), n1, n2, interpret=True)
    np.testing.assert_array_equal(np.asarray(gr), np.asarray(wr))
    np.testing.assert_array_equal(np.asarray(gi), np.asarray(wi))

    # welch_numerator computes the per-segment means itself, and the
    # 4-D reduction order differs from the 3-D one in the last ulp —
    # tight allclose instead of bit-equality.
    wn = FB.welch_numerator(x.real.copy(), x.imag.copy(), w,
                            interpret=True)
    gn = FB.welch_numerator(x4.real.copy(), x4.imag.copy(), w,
                            interpret=True)
    wn, gn = np.asarray(wn), np.asarray(gn)
    assert np.max(np.abs(gn - wn)) < 1e-5 * wn.max()
