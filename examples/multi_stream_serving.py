#!/usr/bin/env python
"""Batched multi-stream FM serving: B radio clients per dispatch.

The reference serves N independent flowgraphs as N thread sets
(/root/reference/src/node/mod.rs:275-284).  The TPU-native analogue
is ONE program launch carrying all B streams per round
(runtime.BatchedStreamRunner, mode='unroll' — bit-identical to B
separate runs, measured 12-30x the launch-bound single-stream rate
on v5e at realistic per-client block sizes; docs/PERF.md round-5
serving section).

Usage: python examples/multi_stream_serving.py cap1.u8 [cap2.u8 ...]
       (each capture is raw interleaved u8 IQ; each gets its own
        independent receiver state and its own WAV output)
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))  # run examples without install

import sys

import numpy as np

import jax

from comms_tpu.io import audio as caudio
from comms_tpu.models import fm_receiver
from comms_tpu.runtime import BatchedStreamRunner


def _blocks(path, block):
    """Per-stream source: planar u8 blocks from an interleaved file
    (short files wrap so every stream yields the same block count)."""
    raw = np.fromfile(path, dtype=np.uint8)
    raw = raw[: 2 * (raw.size // 2)].reshape(-1, 2)
    if raw.shape[0] < block:
        raise SystemExit(f"{path}: shorter than one block ({block})")
    nblk = raw.shape[0] // block
    for b in range(nblk):
        seg = raw[b * block:(b + 1) * block]
        yield (np.ascontiguousarray(seg[:, 0]),
               np.ascontiguousarray(seg[:, 1]))


def main():
    paths = sys.argv[1:]
    if not paths:
        print(__doc__)
        sys.exit(1)
    on_tpu = jax.devices()[0].platform == "tpu"
    block = (16 * fm_receiver.FUSED_BLOCK_QUANTUM if on_tpu
             else 25 * 4096)
    cfg = fm_receiver.FmReceiverConfig(block=block)
    if on_tpu:                       # fused Pallas chain
        fblk = fm_receiver.make_fused_block_fn(cfg)

        def step(st, x):
            return fblk(st, x[0], x[1])
        states = [fm_receiver.fused_init_state() for _ in paths]
    else:                            # XLA chain (same semantics)
        blk = fm_receiver.make_block_fn(cfg)

        def step(st, x):
            import jax.numpy as jnp

            return blk(st, jnp.stack(x, axis=-1))
        states = [fm_receiver.init_state(cfg) for _ in paths]

    sinks = []
    for p in paths:
        out = p + ".wav"
        sink = caudio.WavSink(out, channels=1, sample_rate=45600)
        sinks.append(sink)
    try:
        runner = BatchedStreamRunner(
            step, states,
            sources=[_blocks(p, block) for p in paths],
            sinks=[(lambda a, s=s: s.write(
                np.asarray(a) / (np.max(np.abs(a)) or 1.0)))
                   for s in sinks],
            depth=4, mode="unroll")
        meter = runner.run()
        print(meter)
        for p in paths:
            print(f"{p} -> {p}.wav")
    finally:
        for s in sinks:
            s.close()


if __name__ == "__main__":
    main()
