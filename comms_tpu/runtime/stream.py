"""Streaming executor: host IO overlapped with device compute.

The runtime piece that replaces the reference's free-running source /
sink node threads (``src/node/mod.rs:275-284`` spawning IO nodes): a
serving loop that drives any block function over a block source,
double-buffered so the host never sits idle —

    dispatch block k          (async: h2d + compute queue up)
    fetch result of block k-1 (device->host for the PREVIOUS block,
                               overlapping block k's compute)
    sink result k-1

Sources are plain iterables of numpy blocks (e.g. the native C++
reader, ``io.raw_iq.iter_iq_blocks``, a live radio's recv loop);
sinks are callables (``io.audio.WavSink.write``, the native writer,
a network sender).  State stays on device for the whole stream.
"""

from __future__ import annotations

from typing import Any, Callable, Iterable, Optional

import numpy as np

import jax

from comms_tpu.runtime.metrics import ThroughputMeter

__all__ = ["StreamRunner"]


class StreamRunner:
    """Drive ``block_fn(state, x) -> (y, state)`` over a block source.

    Args:
      block_fn: jitted block step.
      state: initial state pytree (device-resident after first step).
      source: iterable of numpy input blocks.
      sink: optional callable receiving each output block (numpy).
      meter: optional ThroughputMeter; ``samples_of(x)`` counts the
        samples per input block (defaults to ``len``).
    """

    def __init__(self, block_fn: Callable, state: Any,
                 source: Iterable[np.ndarray],
                 sink: Optional[Callable[[np.ndarray], None]] = None,
                 meter: Optional[ThroughputMeter] = None,
                 samples_of: Callable[[Any], int] = len):
        self.block_fn = block_fn
        self.state = state
        self.source = source
        self.sink = sink
        self.meter = meter if meter is not None else ThroughputMeter()
        self.samples_of = samples_of
        self.blocks_done = 0

    def run(self, max_blocks: Optional[int] = None) -> ThroughputMeter:
        """Stream until the source ends (or ``max_blocks``).  Returns
        the throughput meter."""
        pending = None  # device result of the previous block
        for i, x in enumerate(self.source):
            if max_blocks is not None and i >= max_blocks:
                break
            with self.meter.block(self.samples_of(x)):
                # dispatch this block (async)...
                y, self.state = self.block_fn(self.state, jax.device_put(x))
                # ...then drain the PREVIOUS result while it runs.
                if pending is not None and self.sink is not None:
                    self.sink(np.asarray(pending))
                pending = y
                self.blocks_done += 1
        if pending is not None:
            if self.sink is not None:
                self.sink(np.asarray(pending))
            else:
                jax.block_until_ready(pending)
        return self.meter
