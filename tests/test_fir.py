"""FIR parity tests against a per-sample oracle implementing the
reference's semantics (fir.rs:43-102) and its golden test vector
(fir_node.rs:259-315)."""

import numpy as np
import jax
import jax.numpy as jnp

from comms_tpu.ops import fir


def oracle_batch_fir(x, taps, state):
    """Reference semantics: state rotate_right(1); state[0]=x; dot."""
    state = list(state)
    out = []
    for s in x:
        state = [state[-1]] + state[:-1]
        state[0] = s
        out.append(sum(t * v for t, v in zip(taps, state)))
    return np.array(out), np.array(state)


def test_fir_golden_reference_vector():
    # fir_node.rs:259-315 — integer taps/input, exact expected outputs.
    taps = np.array([9, 8 + 7j, 6 + 5j, 4 + 3j, 2 + 1j], dtype=np.complex128)
    x = np.array(
        [1 + 2j, 3 + 4j, 5 + 6j, 7 + 8j, 9, 0, 0, 0, 0], dtype=np.complex128
    )
    expected = np.array(
        [9 + 18j, 21 + 59j, 37 + 124j, 57 + 205j, 81 + 204j,
         78 + 196j, 62 + 115j, 42 + 50j, 18 + 9j]
    )
    ctx = fir.init_ctx(len(taps), dtype=jnp.complex128)
    y, _ = fir.fir_block(jnp.asarray(x), taps, ctx)
    assert np.allclose(np.asarray(y), expected, atol=1e-9)


def test_fir_doc_example_initial_state():
    # fir.rs doc example: taps [.2,.6,.6,.2], state [1,.5,.25,.125].
    taps = np.array([0.2, 0.6, 0.6, 0.2], dtype=np.complex128)
    ref_state = np.array([1.0, 0.5, 0.25, 0.125], dtype=np.complex128)
    x = np.cos(np.arange(20)).astype(np.complex128)

    expected, _ = oracle_batch_fir(x, taps, ref_state)

    ctx = fir.ctx_from_reference_state(ref_state, dtype=jnp.complex128)
    y, _ = fir.fir_block(jnp.asarray(x), taps, ctx)
    assert np.allclose(np.asarray(y), expected, atol=1e-12)


def test_fir_block_size_invariance():
    """Output must be independent of block chopping (the property that
    makes time-block sharding correct)."""
    rng = np.random.default_rng(0)
    T = 33
    taps = (rng.normal(size=T) + 1j * rng.normal(size=T)).astype(np.complex128)
    x = (rng.normal(size=384) + 1j * rng.normal(size=384)).astype(np.complex128)

    ctx = fir.init_ctx(T, dtype=jnp.complex128)
    y_once, _ = fir.fir_block(jnp.asarray(x), taps, ctx)

    for bs in (48, 128, 131):
        ctx = fir.init_ctx(T, dtype=jnp.complex128)
        outs = []
        for i in range(0, len(x), bs):
            y, ctx = fir.fir_block(jnp.asarray(x[i : i + bs]), taps, ctx)
            outs.append(np.asarray(y))
        y_stream = np.concatenate(outs)
        assert np.allclose(y_stream, np.asarray(y_once), atol=1e-10), bs


def test_fir_real_dtype():
    rng = np.random.default_rng(1)
    taps = rng.normal(size=63)
    x = rng.normal(size=500)
    expected, _ = oracle_batch_fir(x, taps, np.zeros(63))
    y = fir.fir_apply(jnp.asarray(x), taps)
    assert np.allclose(np.asarray(y), expected, atol=1e-10)


def test_fir_single_tap():
    x = jnp.arange(10.0)
    y = fir.fir_apply(x, np.array([2.0]))
    assert np.allclose(np.asarray(y), 2.0 * np.arange(10.0))


def test_fir_jit_and_grad_compatible():
    taps = np.hanning(16)
    f = jax.jit(lambda x, c: fir.fir_block(x, taps, c))
    x = jnp.ones(256, dtype=jnp.float64)
    c = fir.init_ctx(16, dtype=jnp.float64)
    y, c2 = f(x, c)
    assert y.shape == (256,)
    assert c2.shape == (15,)


def test_fir_decimate_matches_separate_ops():
    rng = np.random.default_rng(2)
    taps = rng.normal(size=17)
    x = rng.normal(size=300)
    ctx = fir.init_ctx(17, dtype=jnp.float64)
    y_full, _ = fir.fir_block(jnp.asarray(x), taps, ctx)
    y_dec, _ = fir.fir_decimate_block(
        jnp.asarray(x), taps, fir.init_ctx(17, dtype=jnp.float64), rate=5
    )
    assert np.allclose(np.asarray(y_dec), np.asarray(y_full)[::5])


def test_banded_matrix_structure():
    taps = np.arange(1.0, 5.0)  # T=4
    B = fir.banded_tap_matrix(taps, phases=4)
    # B[i, p] = taps[T-1+p-i]
    assert B.shape == (7, 4)
    for i in range(7):
        for p in range(4):
            k = 3 + p - i
            expect = taps[k] if 0 <= k < 4 else 0.0
            assert B[i, p] == expect


def test_fir_decimate_poly_matches_filter_then_stride():
    rng = np.random.default_rng(5)
    T, D = 63, 5
    t = (rng.normal(size=T) + 1j * rng.normal(size=T)).astype(np.complex128)
    x = (rng.normal(size=400) + 1j * rng.normal(size=400)).astype(np.complex128)

    y_full, _ = fir.fir_block(jnp.asarray(x), t, fir.init_ctx(T, jnp.complex128))
    expected = np.asarray(y_full)[::D]

    Hb = fir.decimating_branch_taps(t, D)
    ctx = jnp.zeros(Hb.size - 1, dtype=jnp.complex128)
    y, _ = fir.fir_decimate_poly(jnp.asarray(x), Hb, ctx)
    assert np.allclose(np.asarray(y), expected, atol=1e-9)


def test_fir_decimate_poly_streaming():
    rng = np.random.default_rng(6)
    T, D = 33, 4
    t = rng.normal(size=T).astype(np.float64)
    x = rng.normal(size=640).astype(np.float64)

    Hb = fir.decimating_branch_taps(t, D)
    y_once, _ = fir.fir_decimate_poly(
        jnp.asarray(x), Hb, jnp.zeros(Hb.size - 1, jnp.float64))

    ctx = jnp.zeros(Hb.size - 1, dtype=jnp.float64)
    parts = []
    for i in range(4):
        y, ctx = fir.fir_decimate_poly(jnp.asarray(x[i*160:(i+1)*160]), Hb, ctx)
        parts.append(np.asarray(y))
    assert np.allclose(np.concatenate(parts), np.asarray(y_once), atol=1e-12)


def test_fir_edge_tap_counts():
    # T=1 (pure gain), T=2, and blocks shorter than the tap count.
    for T in (1, 2, 5):
        rng = np.random.default_rng(T)
        t = (rng.normal(size=T) + 1j * rng.normal(size=T)).astype(
            np.complex128)
        x = (rng.normal(size=3) + 1j * rng.normal(size=3)).astype(
            np.complex128)
        expected, _ = oracle_batch_fir(x, t, [0j] * T)
        y, ctx = fir.fir_block(jnp.asarray(x), t,
                               fir.init_ctx(T, jnp.complex128))
        assert np.allclose(np.asarray(y), expected, atol=1e-12), T
        if T > 1:
            assert ctx.shape == (T - 1,)


def test_fir_block_shorter_than_taps_streams():
    rng = np.random.default_rng(9)
    T = 17
    t = rng.normal(size=T).astype(np.complex128)
    x = (rng.normal(size=40)).astype(np.complex128)
    y_once, _ = fir.fir_block(jnp.asarray(x), t,
                              fir.init_ctx(T, jnp.complex128))
    ctx = fir.init_ctx(T, jnp.complex128)
    parts = []
    for a in range(0, 40, 5):  # 5-sample blocks << 17 taps
        y, ctx = fir.fir_block(jnp.asarray(x[a:a+5]), t, ctx)
        parts.append(np.asarray(y))
    assert np.allclose(np.concatenate(parts), np.asarray(y_once),
                       atol=1e-12)


def test_fir_decimate_traced_matches_oracle():
    # y[m] = sum_t flat[t] * x[m*D - t], x zero-extended both ends.
    rng = np.random.default_rng(11)
    D, MD, N, Z = 4, 12, 160, 4
    flat = rng.normal(size=MD).astype(np.float32)
    x = (rng.normal(size=N) + 1j * rng.normal(size=N)).astype(np.complex64)
    xe = np.concatenate([x, np.zeros(Z, np.complex64)])
    frames = (N + Z) // D
    expected = np.zeros(frames, np.complex64)
    for m in range(frames):
        for t in range(MD):
            k = m * D - t
            if 0 <= k < N + Z:
                expected[m] += flat[t] * xe[k]
    y = fir.fir_decimate_traced(jnp.asarray(x), jnp.asarray(flat), D,
                                tail_zeros=Z)
    assert y.shape == (frames,)
    assert np.allclose(np.asarray(y), expected, atol=1e-5)


def test_fir_decimate_traced_under_jit_traced_taps():
    # The taps are a traced value derived from the input — the use
    # case qpsk_rx needs (taps depend on traced timing estimates).
    rng = np.random.default_rng(12)
    D, N = 5, 200
    x = rng.normal(size=N).astype(np.float32)

    @jax.jit
    def f(x):
        flat = jnp.asarray([x[0], 1.0, x[1], 0.5, 0.0],
                           jnp.float32)  # MD=5=D
        return fir.fir_decimate_traced(x, flat, D)

    y = np.asarray(f(jnp.asarray(x)))
    flat = np.array([x[0], 1.0, x[1], 0.5, 0.0], np.float32)
    expected = np.zeros(N // D, np.float32)
    for m in range(N // D):
        for t in range(5):
            k = m * D - t
            if 0 <= k < N:
                expected[m] += flat[t] * x[k]
    assert np.allclose(y, expected, atol=1e-5)


def test_traced_complex_decimator_carried_ctx():
    # ctx planes replace the zero head: outputs equal the zero-head
    # run over [ctx ++ x] at the matching offset.
    import jax
    rng = np.random.default_rng(8)
    D, MD = 4, 44
    xr = jnp.asarray(rng.normal(size=256).astype(np.float32))
    xi = jnp.asarray(rng.normal(size=256).astype(np.float32))
    cr = jnp.asarray(rng.normal(size=MD - 1).astype(np.float32))
    ci = jnp.asarray(rng.normal(size=MD - 1).astype(np.float32))
    fr = jnp.asarray(rng.normal(size=MD).astype(np.float32))
    fi = jnp.asarray(rng.normal(size=MD).astype(np.float32))

    got_r, got_i = jax.jit(lambda *a: fir.fir_decimate_traced_planar_complex(
        *a[:2], fr, fi, D, ctx=(a[2], a[3])))(xr, xi, cr, ci)
    big_r = jnp.concatenate([jnp.zeros((1,), jnp.float32), cr, xr])
    big_i = jnp.concatenate([jnp.zeros((1,), jnp.float32), ci, xi])
    ref_r, ref_i = jax.jit(lambda *a: fir.fir_decimate_traced_planar_complex(
        *a, fr, fi, D))(big_r, big_i)
    off = MD // D
    np.testing.assert_allclose(np.asarray(got_r),
                               np.asarray(ref_r)[off:off + 64], rtol=2e-5)
    np.testing.assert_allclose(np.asarray(got_i),
                               np.asarray(ref_i)[off:off + 64], rtol=2e-5)
