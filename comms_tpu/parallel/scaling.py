"""Weak-scaling harness: samples/s efficiency at 1..N shards.

BASELINE requires "samples/s scaling efficiency measured at 1 chip,
1 host, and N>=2 hosts (>=85%)".  This harness runs the sharded
wideband chain at a fixed per-shard block size over growing meshes and
reports throughput + efficiency vs the 1-shard baseline.  On real
hardware it measures ICI-halo overhead directly; on the virtual CPU
mesh it validates the mechanics (the driver's dryrun path).
"""

from __future__ import annotations

import time
from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from comms_tpu.parallel import sharding as sh
from comms_tpu.parallel import wideband

__all__ = ["weak_scaling"]


def weak_scaling(taps, per_shard: int = 1 << 20,
                 shard_counts: Optional[Sequence[int]] = None,
                 iters: int = 10, reps: int = 3) -> list[dict]:
    """Run the wideband FM chain at each shard count; per-shard work is
    constant (weak scaling).  Returns one record per mesh size with
    Gsps and efficiency vs the smallest mesh."""
    n_avail = len(jax.devices())
    if shard_counts is None:
        shard_counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_avail]
    results = []
    base_per_shard_gsps = None
    for n in shard_counts:
        mesh = sh.time_mesh(n)
        block = per_shard * n
        cfg = wideband.WidebandConfig(taps, block=block, dec1=5, dec2=5)
        step = wideband.make_sharded_step(cfg, mesh)
        state = wideband.init_state(cfg)
        rng = np.random.default_rng(0)
        pairs = jnp.asarray(rng.normal(size=(block, 2)).astype(np.float32))

        (audio, freq), state = step(state, pairs)
        jax.block_until_ready(audio)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            s = state
            for _ in range(iters):
                (audio, freq), s = step(s, pairs)
            jax.block_until_ready(audio)
            best = min(best, (time.perf_counter() - t0) / iters)
        gsps = block / best / 1e9
        per_shard_gsps = gsps / n
        if base_per_shard_gsps is None:
            base_per_shard_gsps = per_shard_gsps
        results.append({
            "shards": n,
            "block": block,
            "gsps": round(gsps, 4),
            "per_shard_gsps": round(per_shard_gsps, 4),
            "efficiency": round(per_shard_gsps / base_per_shard_gsps, 3),
        })
    return results


if __name__ == "__main__":
    import json
    import os

    if "JAX_PLATFORMS" not in os.environ:
        os.environ["JAX_PLATFORMS"] = "cpu"
    from comms_tpu.models.fm_receiver import FM_LPF_TAPS

    for rec in weak_scaling(FM_LPF_TAPS, per_shard=1 << 17, iters=3,
                            reps=2):
        print(json.dumps(rec))
