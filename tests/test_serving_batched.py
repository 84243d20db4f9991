"""Batched multi-stream serving (BatchedStreamRunner): B independent
streams carried by ONE dispatch per round, per-stream state pytrees
kept strictly independent.

The reference analogue is running N independent flowgraphs as N thread
sets (/root/reference/src/node/mod.rs:275-284); here one program
launch amortizes across the batch (docs/PERF.md lesson 23: launch cost
is operand-size-independent).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from comms_tpu.models import fm_receiver, qpsk_rx, qpsk_rx_stream, qpsk_tx
from comms_tpu.models.qpsk_rx import decide_bits
from comms_tpu.runtime.stream import BatchedStreamRunner, StreamRunner


def _fm_inputs(B, block, nblocks, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, (B, nblocks, block, 2)).astype(np.uint8)


def _run_separately(blk, states, xs):
    """Oracle: B independent StreamRunner streams."""
    outs, finals = [], []
    for b in range(xs.shape[0]):
        got = []
        r = StreamRunner(blk, states[b], list(xs[b]), sink=got.append)
        r.run()
        outs.append(got)
        finals.append(r.state)
    return outs, finals


@pytest.mark.parametrize("mode", ["unroll", "map"])
def test_batched_fm_bitexact_vs_separate_runs(mode):
    """modes 'unroll'/'map': each stream's subgraph is the SAME trace
    as the unbatched step — outputs and carried states are
    bit-identical to B separate runs."""
    B, nblk = 3, 3
    cfg = fm_receiver.FmReceiverConfig(block=25 * 64)
    blk = fm_receiver.make_block_fn(cfg)
    xs = _fm_inputs(B, cfg.block, nblk, seed=3)

    want, want_states = _run_separately(
        blk, [fm_receiver.init_state(cfg) for _ in range(B)], xs)

    sinks_out = [[] for _ in range(B)]
    runner = BatchedStreamRunner(
        blk, [fm_receiver.init_state(cfg) for _ in range(B)],
        sources=[list(xs[b]) for b in range(B)],
        sinks=[sinks_out[b].append for b in range(B)],
        depth=2, mode=mode)
    runner.run()

    for b in range(B):
        assert len(sinks_out[b]) == nblk
        for k in range(nblk):
            np.testing.assert_array_equal(
                sinks_out[b][k], np.asarray(want[b][k]),
                err_msg=f"stream {b} block {k}")
    for b, st in enumerate(runner.stream_states()):
        for got_leaf, want_leaf in zip(jax.tree_util.tree_leaves(st),
                                       jax.tree_util.tree_leaves(
                                           want_states[b])):
            np.testing.assert_array_equal(np.asarray(got_leaf),
                                          np.asarray(want_leaf),
                                          err_msg=f"state of stream {b}")


def test_batched_fm_vmap_close_and_streams_independent():
    """mode='vmap': ULP-level GEMM batching differences only; and a
    change to one stream's input must not perturb any other stream's
    output by a single bit."""
    B, nblk = 3, 2
    cfg = fm_receiver.FmReceiverConfig(block=25 * 64)
    blk = fm_receiver.make_block_fn(cfg)
    xs = _fm_inputs(B, cfg.block, nblk, seed=5)

    want, _ = _run_separately(
        blk, [fm_receiver.init_state(cfg) for _ in range(B)], xs)

    def run_batched(xs_in):
        sinks_out = [[] for _ in range(B)]
        r = BatchedStreamRunner(
            blk, [fm_receiver.init_state(cfg) for _ in range(B)],
            sources=[list(xs_in[b]) for b in range(B)],
            sinks=[sinks_out[b].append for b in range(B)], mode="vmap")
        r.run()
        return sinks_out

    got = run_batched(xs)
    for b in range(B):
        for k in range(nblk):
            np.testing.assert_allclose(
                got[b][k], np.asarray(want[b][k]), atol=1e-5, rtol=1e-5,
                err_msg=f"stream {b} block {k}")

    # independence: perturb stream 2's input; streams 0 and 1 must be
    # bit-identical between the two batched runs.
    xs2 = xs.copy()
    xs2[2] = xs2[2][:, ::-1]
    got2 = run_batched(xs2)
    for b in (0, 1):
        for k in range(nblk):
            np.testing.assert_array_equal(
                got2[b][k], got[b][k],
                err_msg=f"stream {b} leaked from stream 2 (block {k})")


def _qpsk_stream(seed, cfo, phi, nbits=16384):
    """A continuous qpsk_tx waveform with its ground-truth bits."""
    from comms_tpu.ops import random as crandom

    tcfg = qpsk_tx.QpskTxConfig(bits_per_block=nbits, dphase=0.0)
    iq, _ = qpsk_tx.make_block_fn(tcfg)(qpsk_tx.init_state(tcfg, seed))
    z = np.asarray(iq).astype(np.float32) / tcfg.scale
    x = (z[:, 0] + 1j * z[:, 1]).astype(np.complex128)
    bits, _ = crandom.random_bits_block(crandom.source_init(seed), nbits)
    n = np.arange(len(x))
    xc = (x * np.exp(1j * (cfo * n + phi))).astype(np.complex64)
    return xc, np.asarray(bits)


def test_batched_qpsk_fast_matches_separate_and_decodes():
    """The estimate-pipelined QPSK fast step lifted over 2 streams with
    DIFFERENT carrier offsets: per-stream outputs match B separate
    runs (the phase estimators amplify ULP noise, so decisions must
    agree exactly and values to float tolerance), and both streams
    decode with zero bit errors after warm-up."""
    Bs = 2
    streams = [_qpsk_stream(3, 0.006, 0.8), _qpsk_stream(7, -0.004, 2.1)]
    cfg = qpsk_rx.QpskRxConfig()
    step = qpsk_rx_stream.make_stream_fast_fn(cfg)

    def wrapped(state, x):
        return step(state, x[0], x[1])

    nblk = 4
    N = len(streams[0][0]) // nblk
    M = N // cfg.sps

    # oracle: separate runs
    want = []
    for xc, _bits in streams:
        st = qpsk_rx_stream.init_state_fast(cfg)
        out = []
        for b in range(nblk):
            seg = xc[b * N:(b + 1) * N]
            y, st = step(st, jnp.asarray(seg.real.astype(np.float32)),
                         jnp.asarray(seg.imag.astype(np.float32)))
            out.append(np.asarray(y))
        want.append(out)

    srcs = []
    for xc, _bits in streams:
        srcs.append([(seg.real.astype(np.float32),
                      seg.imag.astype(np.float32))
                     for seg in (xc[b * N:(b + 1) * N]
                                 for b in range(nblk))])
    sinks_out = [[] for _ in range(Bs)]
    runner = BatchedStreamRunner(
        wrapped, [qpsk_rx_stream.init_state_fast(cfg) for _ in range(Bs)],
        sources=srcs, sinks=[sinks_out[b].append for b in range(Bs)],
        depth=2, mode="unroll")
    runner.run()

    for s in range(Bs):
        assert len(sinks_out[s]) == nblk
        for b in range(1, nblk):   # block 0 is warm-up
            g, w = sinks_out[s][b], want[s][b]
            np.testing.assert_allclose(g, w, atol=1e-4, rtol=1e-4,
                                       err_msg=f"stream {s} block {b}")
            gd = decide_bits(g[0] + 1j * g[1])
            wd = decide_bits(w[0] + 1j * w[1])
            np.testing.assert_array_equal(gd, wd)

    # end-to-end: each stream decodes its own bits with zero errors
    for s, (_xc, bits) in enumerate(streams):
        sym_all = np.concatenate(sinks_out[s][1:], axis=1)
        margin = 32
        cand = sym_all[:, margin:]
        ref = bits[2 * (M + margin - 8):]
        (rot, lag), errs, m = qpsk_rx.resolve_ambiguity(
            cand, ref, search=1500, max_lag=16)
        assert m >= 2048 and errs == 0, (s, rot, lag, errs, m)


def test_batched_source_prestacked_and_default_sample_count():
    """batched_source path: pre-stacked [B, ...] blocks skip host
    stacking; the default samples_of counts B * block samples."""
    B, nblk = 4, 3
    cfg = fm_receiver.FmReceiverConfig(block=25 * 16)
    blk = fm_receiver.make_block_fn(cfg)
    xs = _fm_inputs(B, cfg.block, nblk, seed=9)
    batched = [jnp.asarray(xs[:, k]) for k in range(nblk)]

    runner = BatchedStreamRunner(
        blk, [fm_receiver.init_state(cfg) for _ in range(B)],
        batched_source=batched, mode="unroll")
    meter = runner.run()
    assert runner.blocks_done == nblk
    assert meter.samples == B * nblk * cfg.block
