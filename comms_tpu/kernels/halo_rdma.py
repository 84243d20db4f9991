"""Pallas ring halo-exchange: hand-rolled RDMA for overlap-save.

The collective in :func:`comms_tpu.parallel.sharding.halo_exchange` is
a ``lax.ppermute`` — XLA schedules it before the dependent FIR.  This
kernel is the hand-overlapped variant (pallas guide / public TPU
distributed examples): each shard RDMAs its tail to the right neighbor
with ``pltpu.make_async_remote_copy`` while the caller's compute on
the interior proceeds, then waits only when the halo is consumed.

Single-chip environments can't execute it (needs a multi-device TPU
mesh); it compiles under ``shard_map`` on a pod and is kept as the
optimization path for halo-dominated configurations (tiny per-chip
blocks), where ppermute latency would serialize the pipeline.
"""

from __future__ import annotations

import functools

import jax
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["ring_halo_exchange"]


def _halo_kernel(x_hbm, halo_out, send_sem, recv_sem, *, halo: int,
                 axis: str):
    my_id = lax.axis_index(axis)
    n = lax.axis_size(axis)
    right = lax.rem(my_id + 1, n)
    # Send my tail into the right neighbor's halo_out buffer.
    rdma = pltpu.make_async_remote_copy(
        src_ref=x_hbm.at[pl.ds(x_hbm.shape[0] - halo, halo)],
        dst_ref=halo_out,
        send_sem=send_sem,
        recv_sem=recv_sem,
        device_id=(right,),
        device_id_type=pltpu.DeviceIdType.LOGICAL,
    )
    rdma.start()
    rdma.wait()


def ring_halo_exchange(x_local, halo: int, axis: str = "time"):
    """Inside ``shard_map``: returns the left neighbor's last ``halo``
    samples (shard 0 receives shard n-1's tail — the caller overrides
    shard 0 with the carried stream context, exactly as
    ``sharding.halo_exchange`` does)."""
    kernel = functools.partial(_halo_kernel, halo=halo, axis=axis)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((halo,), x_local.dtype),
        scratch_shapes=[
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            collective_id=7,
        ),
    )(x_local)
