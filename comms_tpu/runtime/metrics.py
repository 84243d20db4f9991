"""Observability: throughput counters, roofline estimates, profiling.

The reference has no tracing/metrics at all (SURVEY.md section 5 —
only test printlns).  Here every pipeline can be wrapped in a
:class:`ThroughputMeter`, ops can be annotated with
:func:`named_scope` (shows up in ``jax.profiler`` traces), and
:func:`roofline` turns op shapes into bytes/FLOP bounds so a bench
can report percent-of-speed-of-light.
"""

from __future__ import annotations

import contextlib
import dataclasses
import json
import time

import jax

__all__ = ["ThroughputMeter", "device_sync", "named_scope", "roofline",
           "sync_overhead", "trace"]

# v5e per-chip peaks (public spec): 197 bf16 TFLOP/s, 819 GB/s HBM.
V5E_HBM_GBPS = 819.0
V5E_BF16_TFLOPS = 197.0
V5E_F32_TFLOPS = 49.0


@dataclasses.dataclass
class ThroughputMeter:
    """Samples/s counter for a block-streaming loop.

    >>> m = ThroughputMeter()
    >>> with m.block(num_samples=262144): y, s = step(s, x)
    >>> m.report()
    """

    samples: int = 0
    seconds: float = 0.0
    blocks: int = 0

    @contextlib.contextmanager
    def block(self, num_samples: int):
        t0 = time.perf_counter()
        yield
        self.seconds += time.perf_counter() - t0
        self.samples += int(num_samples)
        self.blocks += 1

    @property
    def msps(self) -> float:
        return self.samples / self.seconds / 1e6 if self.seconds else 0.0

    def report(self) -> dict:
        return {
            "samples": self.samples,
            "blocks": self.blocks,
            "seconds": round(self.seconds, 4),
            "Msamples_per_s": round(self.msps, 2),
        }

    def __str__(self):
        return json.dumps(self.report())


def device_sync(tree) -> float:
    """True device-completion barrier; returns a checksum float.

    ``jax.block_until_ready`` can return at enqueue-ack time on async
    plugin runtimes (observed on the tunneled TPU runtime used here: an
    8-matmul 4096^3 chain "completed" in 118 us — an implied 9 PFLOP/s —
    but takes a real 62 ms once completion is forced).  Fetching a VALUE
    derived from the outputs is the only reliable barrier, so timing
    loops must call this, not ``block_until_ready``.  Complex leaves are
    reduced to their real part on device first (complex arrays cannot
    cross the host<->device boundary on this runtime).
    """
    import jax.numpy as jnp

    total = 0.0
    for leaf in jax.tree_util.tree_leaves(tree):
        if not hasattr(leaf, "ravel"):
            total += float(leaf)
            continue
        x = leaf
        if jnp.iscomplexobj(x):
            x = jnp.real(x)
        total += float(jnp.sum(x.ravel()[:1].astype(jnp.float32)))
    return total


def sync_overhead(reps: int = 5) -> float:
    """Measured seconds of a null dispatch + value readback — the fixed
    cost :func:`device_sync` adds to any timed region.  Subtract this
    from timed dispatches, and size the work so it dominates (~30 ms on
    the tunnel runtime)."""
    import jax.numpy as jnp

    one = jax.jit(lambda a: a + 1.0)
    x = jnp.float32(0.0)
    float(one(x))                      # compile + drain pending queue
    best = float("inf")
    for _ in range(max(1, reps)):
        t0 = time.perf_counter()
        float(one(x))
        best = min(best, time.perf_counter() - t0)
    return best


def named_scope(name: str):
    """Profiler annotation for an op region (jax.named_scope)."""
    return jax.named_scope(name)


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace around a region; view with TensorBoard or
    xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def roofline(bytes_moved: int, flops: int, seconds: float,
             hbm_gbps: float = V5E_HBM_GBPS,
             peak_tflops: float = V5E_F32_TFLOPS) -> dict:
    """Percent-of-speed-of-light for a measured kernel execution.

    ``bytes_moved``: HBM traffic (read + write); ``flops``: useful
    floating ops.  The bound is max(bytes/BW, flops/peak).
    """
    t_mem = bytes_moved / (hbm_gbps * 1e9)
    t_cmp = flops / (peak_tflops * 1e12)
    t_sol = max(t_mem, t_cmp)
    return {
        "sol_seconds": t_sol,
        "bound": "memory" if t_mem >= t_cmp else "compute",
        "pct_of_sol": round(100.0 * t_sol / seconds, 1) if seconds else 0.0,
        "achieved_gbps": round(bytes_moved / seconds / 1e9, 1)
        if seconds else 0.0,
        "achieved_tflops": round(flops / seconds / 1e12, 3)
        if seconds else 0.0,
    }
