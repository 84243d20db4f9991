"""Compiled-path kernel tests — run only on a real TPU backend.

The CI suite runs on the virtual CPU mesh where Pallas kernels execute
in interpret mode (covered by test_fused_chain / test_poly_fir_pallas /
test_channelizer_pallas); these tests exercise the ACTUAL Mosaic
compilation and execution when a TPU is attached (the verify recipe's
drive step).  They are skipped on CPU.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

tpu = jax.devices()[0].platform == "tpu"
pytestmark = pytest.mark.skipif(
    not tpu, reason="requires a real TPU backend (CI runs interpret mode)")


def test_fused_fm_chain_compiled():
    from comms_tpu.kernels import fm_chain_pallas as K
    from comms_tpu.models import fm_receiver

    N = K.IN_PER_STEP * 2
    rng = np.random.default_rng(0)
    iq = rng.integers(0, 256, size=(N, 2), dtype=np.uint8)
    audio = K.fm_chain_fused(
        jnp.asarray(iq[:, 0].copy()), jnp.asarray(iq[:, 1].copy()),
        K.zero_ctx(), fm_receiver.FM_LPF_TAPS, fm_receiver.FM_LPF_TAPS)
    cfg = fm_receiver.FmReceiverConfig(block=N)
    ref, _ = fm_receiver.make_block_fn(cfg)(
        fm_receiver.init_state(cfg), jnp.asarray(iq))
    assert float(jnp.max(jnp.abs(audio - ref))) < 1e-3


def test_poly_fir_compiled():
    from comms_tpu.kernels import poly_fir_pallas as P
    from comms_tpu.ops import fir

    D = 5
    N = P.step_samples(D)
    rng = np.random.default_rng(1)
    xr = rng.normal(size=N).astype(np.float32)
    xi = rng.normal(size=N).astype(np.float32)
    taps = rng.normal(size=63).astype(np.float64)
    Hb = fir.decimating_branch_taps(taps, D)

    @jax.jit
    def both(xr, xi):
        x = jax.lax.complex(xr, xi)
        y, _ = P.poly_fir_pallas(
            x, taps, jnp.zeros(P.CTX_ROWS * D * 128, jnp.complex64), D)
        ref, _ = fir.fir_decimate_poly(
            x, Hb, jnp.zeros(Hb.size - 1, jnp.complex64))
        return jnp.max(jnp.abs(y - ref)), jnp.max(jnp.abs(ref))

    err, scale = both(jnp.asarray(xr), jnp.asarray(xi))
    assert float(err) < 1e-4 * float(scale)


def test_channelizer_compiled():
    from comms_tpu.kernels import channelizer_pallas as CP
    from comms_tpu.ops import channelizer as chan

    N = CP.step_samples()
    rng = np.random.default_rng(2)
    xr = rng.normal(size=N).astype(np.float32)
    xi = rng.normal(size=N).astype(np.float32)
    h = chan.design_prototype(64, 8)
    Hb = chan.branch_taps(h.astype(np.float32), 64)

    @jax.jit
    def both(xr, xi):
        x = jax.lax.complex(xr, xi)
        y, _ = CP.channelize_pallas(
            x, h, jnp.zeros(CP.CTX_SAMPLES, jnp.complex64))
        ref, _ = chan.channelize_block(
            x, Hb, chan.channelizer_init_ctx(len(h)))
        return jnp.max(jnp.abs(y - ref)), jnp.max(jnp.abs(ref))

    err, scale = both(jnp.asarray(xr), jnp.asarray(xi))
    assert float(err) < 1e-4 * float(scale)


def test_psd_big_compiled():
    # The round-4 stage-A manual DMA rings, compiled on hardware,
    # against the f64 Welch numerator oracle (both 2-D and the
    # pre-factorized 3-D serving ingest).
    from comms_tpu.kernels import fft_big_pallas as FB
    from comms_tpu.ops import spectrum

    n1 = n2 = 256
    F = n1 * n2
    rng = np.random.default_rng(5)
    re = rng.normal(size=(2, F)).astype(np.float32)
    im = rng.normal(size=(2, F)).astype(np.float32)
    w = spectrum.hann(F).astype(np.float32)
    acc2 = np.asarray(FB.welch_numerator(jnp.asarray(re),
                                         jnp.asarray(im), w))
    acc3 = np.asarray(FB.welch_numerator(
        jnp.asarray(re.reshape(2, n1, n2)),
        jnp.asarray(im.reshape(2, n1, n2)), w))
    ref = np.zeros(F)
    for s in range(2):
        x = (re[s] + 1j * im[s]).astype(np.complex128)
        x = (x - x.mean()) * w
        ref += np.abs(np.fft.fft(x)) ** 2
    scale = ref.max()
    assert np.max(np.abs(acc2 - ref)) < 2e-5 * scale
    assert np.max(np.abs(acc3 - ref)) < 2e-5 * scale


def test_band_monitor_compiled():
    # Round-4 derived-comp audio views, compiled, vs the staged model.
    from comms_tpu.kernels import band_monitor_pallas as BM
    from comms_tpu.models import fm_band_monitor as model

    rng = np.random.default_rng(6)
    cfg = model.BandMonitorConfig(block=BM.step_samples())
    blk_ref = model.make_planar_block_fn(cfg, use_pallas=False,
                                         fast_demod=True)
    blk_f = model.make_fused_block_fn(cfg)
    st_r = model.init_state(cfg)
    st_f = model.init_state_fused(cfg)
    for _ in range(2):
        re = rng.normal(size=cfg.block).astype(np.float32)
        im = rng.normal(size=cfg.block).astype(np.float32)
        y_r, st_r = blk_ref(st_r, jnp.asarray(re), jnp.asarray(im))
        y_f, st_f = blk_f(st_f, jnp.asarray(re), jnp.asarray(im))
        scale = float(np.abs(np.asarray(y_r)).max())
        err = float(np.max(np.abs(np.asarray(y_f) - np.asarray(y_r))))
        assert err < 2e-4 * scale, (err, scale)


def test_qpsk_rx_fused_compiled():
    # The fused receiver core end-to-end on hardware: zero BER on an
    # impaired loopback (DEFAULT-precision symbol GEMM included).
    from comms_tpu.models import qpsk_rx, qpsk_tx
    from comms_tpu.ops import random as crandom

    nbits = 4096
    tcfg = qpsk_tx.QpskTxConfig(bits_per_block=nbits, dphase=0.0)
    blk = qpsk_tx.make_block_fn(tcfg)
    iq, _ = blk(qpsk_tx.init_state(tcfg, 1))
    z = np.asarray(iq).astype(np.float32) / tcfg.scale
    x = (z[:, 0] + 1j * z[:, 1]).astype(np.complex128)
    key = crandom.source_init(1)
    bits, _ = crandom.random_bits_block(key, nbits)
    n = np.arange(len(x))
    xc = (x * np.exp(1j * (0.01 * n + 0.6))).astype(np.complex64)
    rx = qpsk_rx.make_rx_fn_planar(qpsk_rx.QpskRxConfig())
    sym, _diag = rx(jnp.asarray(xc.real), jnp.asarray(xc.imag))
    best = qpsk_rx.resolve_ambiguity(np.asarray(sym),
                                     np.asarray(bits), search=1500)
    assert best[1] == 0, best


def test_stream_runner_soak_compiled():
    # 40-block streaming serve of the fused FM chain through the
    # depth-N StreamRunner on hardware: state stays finite across the
    # whole stream and every per-block summary drains in order.
    from comms_tpu.kernels import fm_chain_pallas as K
    from comms_tpu.models import fm_receiver
    from comms_tpu.runtime import StreamRunner

    B = K.IN_PER_STEP * 8
    cfg = fm_receiver.FmReceiverConfig(block=B)
    fblk = fm_receiver.make_fused_block_fn(cfg)

    @jax.jit
    def gen(key):
        k1, k2 = jax.random.split(key)

        def f(k):
            return jax.random.randint(
                k, (B,), 0, 256, dtype=jnp.int32).astype(jnp.uint8)
        return f(k1), f(k2)

    @jax.jit
    def step(st, x):
        re8, im8 = x
        y, st = fblk(st, re8, im8)
        return jnp.stack([y[0], y[-1], jnp.sum(y[::257])]), st

    blocks = [gen(jax.random.PRNGKey(i)) for i in range(4)] * 10
    outs = []
    runner = StreamRunner(step, fm_receiver.fused_init_state(), blocks,
                          sink=lambda a: outs.append(a.copy()),
                          samples_of=lambda x: B, depth=4)
    runner.run()
    assert runner.blocks_done == 40
    assert len(outs) == 40
    assert all(np.isfinite(o).all() for o in outs)
    # identical inputs at stride 4 after the first cycle must give
    # identical summaries ONLY if state converged; instead just check
    # the stream produced non-degenerate, varying output.
    assert np.std([o[2] for o in outs]) > 0


def test_qpsk_sym_kernel_compiled():
    # The fused Pallas symbol kernel on hardware: on-chip parity with
    # the XLA path (head region, where phase rounding is negligible)
    # and zero BER through the streaming receiver at kernel-eligible
    # block sizes (2 grid steps per block, carried context across 3
    # blocks).
    from comms_tpu.kernels import qpsk_sym_pallas as QS
    from comms_tpu.models import qpsk_rx, qpsk_rx_stream, qpsk_tx
    from comms_tpu.ops import random as crandom

    B = 2 * QS.IN_PER_STEP
    nbits = (3 * B) // 2                 # 3 blocks of samples
    tcfg = qpsk_tx.QpskTxConfig(bits_per_block=nbits, dphase=0.0)
    blk = qpsk_tx.make_block_fn(tcfg)
    iq, _ = blk(qpsk_tx.init_state(tcfg, 2))
    z = np.asarray(iq).astype(np.float32) / tcfg.scale
    x = (z[:, 0] + 1j * z[:, 1]).astype(np.complex128)
    key = crandom.source_init(2)
    bits, _ = crandom.random_bits_block(key, nbits)
    bits = np.asarray(bits)
    n = np.arange(len(x))
    xc = (x * np.exp(1j * (0.006 * n + 0.8))).astype(np.complex64)

    cfg_k = qpsk_rx.QpskRxConfig()                      # auto kernel
    cfg_x = qpsk_rx.QpskRxConfig(use_pallas_sym=False)
    seg = xc[:B]
    re0, im0 = jnp.asarray(seg.real), jnp.asarray(seg.imag)
    w = jnp.float32(0.006)
    lag = jnp.asarray([-0.05, 0.7, 0.4, -0.06], jnp.float32)
    sk = jax.jit(lambda a, b: qpsk_rx._fused_symbol_gemm(
        cfg_k, a, b, w, lag, jnp.int32(0), phase0=0.2))(re0, im0)
    sx = jax.jit(lambda a, b: qpsk_rx._fused_symbol_gemm(
        cfg_x, a, b, w, lag, jnp.int32(0), phase0=0.2))(re0, im0)
    head_k = np.asarray(sk[0][:4096])
    head_x = np.asarray(sx[0][:4096])
    scale = float(np.abs(head_x).max())
    assert np.abs(head_k - head_x).max() < 5e-3 * scale

    step = qpsk_rx_stream.make_stream_fast_fn(cfg_k)
    st = qpsk_rx_stream.init_state_fast(cfg_k)
    M = B // cfg_k.sps
    outs = []
    for b in range(3):
        s = xc[b * B:(b + 1) * B]
        sym, st = step(st, jnp.asarray(s.real), jnp.asarray(s.imag))
        outs.append(np.asarray(sym))
    sym_all = np.concatenate(outs[1:], axis=1)   # drop warm-up block
    margin = 32
    cand = sym_all[:, margin:margin + 4096]
    ref = bits[2 * (M + margin - 8):]
    best = qpsk_rx.resolve_ambiguity(cand, ref, search=1500, max_lag=16)
    (rot, lagr), errs, m = best
    assert m >= 2048 and errs == 0, best


def test_fft_extended_sizes_compiled():
    """Round-5 extension (VERDICT r4 item 5): the VMEM-resident FFT
    kernel compiled at the wideband sizes 4096/8192/16384, per-bin
    parity inside the reference node tolerance (fft_node.rs:242-244,
    < 1e-5 relative)."""
    from comms_tpu.kernels import fft_pallas as FP

    rng = np.random.default_rng(7)
    for n in (4096, 8192, 16384):
        rows = FP.rows_per_step(n)
        re = rng.normal(size=(rows, n)).astype(np.float32)
        im = rng.normal(size=(rows, n)).astype(np.float32)
        yr, yi = FP.fft_pallas_planar(jnp.asarray(re), jnp.asarray(im),
                                      n=n)
        got = np.asarray(yr) + 1j * np.asarray(yi)
        ref = np.fft.fft((re + 1j * im).astype(np.complex128), axis=1)
        rel = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
        assert rel < 1e-5, (n, rel)


def test_batched_serving_unroll_compiled():
    """BatchedStreamRunner mode='unroll' over the fused Pallas FM
    chain, compiled: bit-identical to sequential per-stream runs."""
    from comms_tpu.models import fm_receiver
    from comms_tpu.runtime.stream import BatchedStreamRunner

    B, nblk = 3, 2
    N = fm_receiver.FUSED_BLOCK_QUANTUM
    cfg = fm_receiver.FmReceiverConfig(block=N)
    fblk = fm_receiver.make_fused_block_fn(cfg)

    def step(st, x):
        return fblk(st, x[0], x[1])

    rng = np.random.default_rng(8)
    xs = rng.integers(0, 256, size=(B, nblk, 2, N), dtype=np.uint8)
    want = []
    for b in range(B):
        st = fm_receiver.fused_init_state()
        out = []
        for k in range(nblk):
            y, st = fblk(st, jnp.asarray(xs[b, k, 0]),
                         jnp.asarray(xs[b, k, 1]))
            out.append(np.asarray(y))
        want.append(out)
    sinks = [[] for _ in range(B)]
    r = BatchedStreamRunner(
        step, [fm_receiver.fused_init_state() for _ in range(B)],
        sources=[[(xs[b, k, 0], xs[b, k, 1]) for k in range(nblk)]
                 for b in range(B)],
        sinks=[sinks[b].append for b in range(B)], mode="unroll")
    r.run()
    for b in range(B):
        for k in range(nblk):
            np.testing.assert_array_equal(sinks[b][k], want[b][k])


def test_qpsk_scalars_kernel_compiled():
    """The in-kernel tap/band build (round 5): compiled parity vs the
    XLA-built-taps kernel across the shift2 range, plus the panels
    output against the XLA corr_panels oracle."""
    from comms_tpu.kernels import qpsk_sym_pallas as QS
    from comms_tpu.models import qpsk_rx

    cfg = qpsk_rx.QpskRxConfig()
    rng = np.random.default_rng(11)
    N = QS.IN_PER_STEP
    re = jnp.asarray(rng.normal(size=N).astype(np.float32))
    im = jnp.asarray(rng.normal(size=N).astype(np.float32))
    w = jnp.float32(0.013)
    lag = jnp.asarray(np.array([-0.05, 0.8, 0.3, -0.04], np.float32))
    for s2v in (-4, 0, 4):
        s2 = jnp.int32(s2v)
        fr, fi = qpsk_rx.modulated_taps(cfg, w, lag, s2)
        C = int(fr.shape[0]) - 1
        ctx = (jnp.asarray(rng.normal(size=C).astype(np.float32)),
               jnp.asarray(rng.normal(size=C).astype(np.float32)))
        a1, b1 = QS.qpsk_symbol_gemm(re, im, fr, fi, w * 4,
                                     phase0=jnp.float32(1.1), ctx=ctx)
        a2, b2 = QS.qpsk_symbol_gemm_scalars(
            re, im, cfg.mf_taps, w, lag, s2, phase0=jnp.float32(1.1),
            ctx=ctx)
        err = max(float(jnp.max(jnp.abs(a1 - a2))),
                  float(jnp.max(jnp.abs(b1 - b2))))
        scale = float(jnp.max(jnp.abs(a1)))
        # Mosaic's in-kernel cos/sin approximation puts ~3e-3
        # RELATIVE on the modulated taps vs the XLA-built ones
        # (measured; precision-independent, so not bf16 rounding) —
        # inside the documented DEFAULT-GEMM budget; decision-level
        # equivalence + zero BER on real waveforms is verified by
        # the stream tests and the on-chip BER drives.
        assert err < 2e-2 * scale, (s2v, err, scale)

    # panels vs the XLA oracle
    _, _, Pk = QS.qpsk_symbol_gemm_scalars(
        re, im, cfg.mf_taps, w, lag, jnp.int32(0),
        panels_hw=cfg.panel_hw)
    Pr = cfg.timing.corr_panels(re, im, halfwidth=cfg.panel_hw)
    for i in range(4):
        a, b = np.asarray(Pr[i]), np.asarray(Pk[i])
        scale = np.max(np.abs(a)) or 1.0
        assert np.max(np.abs(a - b)) < 1e-5 * scale, i
