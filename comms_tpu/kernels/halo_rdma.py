"""Pallas ring halo-exchange: hand-rolled RDMA for overlap-save.

The collective in :func:`comms_tpu.parallel.sharding.halo_exchange` is
a ``lax.ppermute`` — XLA schedules it before the dependent FIR.  This
kernel is the hand-overlapped variant (pallas guide / public TPU
distributed examples): each shard RDMAs its tail to the right neighbor
with ``pltpu.make_async_remote_copy``.  It implements the ppermute
replacement for the reference's channel hop between pipeline stages
(``/root/reference/src/node/mod.rs:199-211`` — the generated ``call()``
recv/send pair), for halo-dominated configurations (tiny per-chip
blocks) where ppermute latency would serialize the pipeline.

Reachability: ``parallel.sharding.halo_exchange_rdma`` is the drop-in
complex-capable wrapper, and ``parallel.wideband.make_sharded_step(...,
rdma_halo=True)`` routes the whole sharded FM chain through it.

Testing without a pod: the kernel runs FUNCTIONALLY on a virtual CPU
mesh under the TPU interpret mode (``interpret=pltpu.InterpretParams()``
simulates the remote DMAs), which is how ``tests/test_sharding.py``
exercises it end-to-end against the ppermute implementation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["ring_halo_exchange"]


def _halo_kernel(x_hbm, halo_out, send_sem, recv_sem, *, halo: int,
                 axis: str):
    my_id = lax.axis_index(axis)
    n = lax.axis_size(axis)
    # match axis_index's dtype explicitly (x64 mode promotes the
    # Python-int axis size to int64, and lax.rem refuses mixed dtypes)
    nn = jnp.asarray(n, my_id.dtype)
    right = lax.rem(my_id + 1, nn)
    left = lax.rem(my_id + nn - 1, nn)
    # Barrier with the neighbor BEFORE the remote write (the
    # canonical Pallas distributed pattern): my destination (right)
    # must have entered this kernel — and therefore own a live
    # halo_out buffer for this step — before my RDMA lands in it.
    # Each device signals its LEFT neighbor "my buffer is ready" and
    # waits for the matching signal from its own right neighbor.
    barrier = pltpu.get_barrier_semaphore()
    pltpu.semaphore_signal(barrier, inc=1, device_id=left,
                           device_id_type=pltpu.DeviceIdType.LOGICAL)
    pltpu.semaphore_wait(barrier, 1)
    # Send my tail into the right neighbor's halo_out buffer.
    # device_id is a SCALAR logical index (the tuple form is only for
    # DeviceIdType.MESH — passing a tuple with LOGICAL is an error).
    rdma = pltpu.make_async_remote_copy(
        src_ref=x_hbm.at[pl.ds(x_hbm.shape[0] - halo, halo)],
        dst_ref=halo_out,
        send_sem=send_sem,
        recv_sem=recv_sem,
        device_id=right,
        device_id_type=pltpu.DeviceIdType.LOGICAL,
    )
    rdma.start()
    rdma.wait()


def ring_halo_exchange(x_local, halo: int, axis: str = "time",
                       collective_id: int = 7, interpret=False):
    """Inside ``shard_map``: returns the left neighbor's last ``halo``
    samples (shard 0 receives shard n-1's tail — the caller overrides
    shard 0 with the carried stream context, exactly as
    ``sharding.halo_exchange`` does).

    ``collective_id`` must differ between concurrent RDMA calls in one
    program (it names the barrier).  ``interpret``: pass
    ``pltpu.InterpretParams()`` to run on a virtual CPU mesh (the TPU
    interpret mode simulates remote DMAs), or ``True`` inside an
    already-forced interpret context.
    """
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
            collective_id=collective_id,
        ),
        interpret=interpret,
    )(x_local)
