"""Pallas TPU kernel: streaming complex FIR as overlap-save banded GEMM.

Functionally identical to :func:`comms_tpu.ops.fir.fir_block` (the
reference's batch_fir, fir.rs:87-102) — the kernel exists to pin the
memory schedule: each grid step DMAs ONE [tile + halo] slab of the
input from HBM into VMEM, builds the overlapping window matrix with
two in-VMEM shifted reshapes (no gather, no HBM re-reads of the halo),
and runs the four real MXU matmuls of the complex banded product
against taps resident in VMEM.  HBM traffic is exactly
8B read + 8B write per sample (+ taps once), the FIR's speed-of-light.

Complex data is carried as separate re/im f32 planes: Mosaic has no
complex vregs, and planar f32 keeps both the DMA and the MXU feeds
dense (same reason the host boundary speaks pairs,
runtime/boundary.py).

Grid is 1-D over output row-tiles; Mosaic pipelines the per-step DMA
against the previous step's matmuls automatically (the slab is
double-buffered by the runtime when the grid is sequential).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from comms_tpu.ops import fir as _fir

__all__ = ["fir_block_pallas"]

_LANES = 128
_HALO_ROWS = 8  # 8*128 = 1024 halo samples >= taps - 1; sublane-aligned


def _kernel(xr_hbm, xi_hbm, br, bi, yr, yi, slab_r, slab_i, sem, *,
            tile_rows: int, num_taps: int):
    i = pl.program_id(0)
    width = num_taps + _LANES - 1

    # DMA [tile_rows + 8, 128] rows: row offset/extent both multiples
    # of the f32 (8, 128) tile, as Mosaic requires for memref slices.
    cp_r = pltpu.make_async_copy(
        xr_hbm.at[pl.ds(i * tile_rows, tile_rows + _HALO_ROWS), :],
        slab_r, sem.at[0])
    cp_i = pltpu.make_async_copy(
        xi_hbm.at[pl.ds(i * tile_rows, tile_rows + _HALO_ROWS), :],
        slab_i, sem.at[1])
    cp_r.start()
    cp_i.start()
    cp_r.wait()
    cp_i.wait()

    # W[r, :] = flat_slab[r*128 : r*128 + width]; width <= 256 so row
    # r and row r+1 cover it.  The banded product splits along the
    # window axis (Mosaic cannot concat slices with different sublane
    # offsets, so run two matmuls per term instead):
    #   Y = W0 @ B[:128] + W1 @ B[128:width]
    wr0 = slab_r[:tile_rows, :]
    wi0 = slab_i[:tile_rows, :]
    wr1 = slab_r[1: tile_rows + 1, : width - _LANES]
    wi1 = slab_i[1: tile_rows + 1, : width - _LANES]

    b0r, b1r = br[:_LANES, :], br[_LANES:, :]
    b0i, b1i = bi[:_LANES, :], bi[_LANES:, :]
    # HIGHEST: 3-pass f32 on the MXU — parity with ops.fir's default
    # (bf16 operand rounding costs ~2e-3 rel error otherwise).
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
    yr[:] = (dot(wr0, b0r) - dot(wi0, b0i)
             + dot(wr1, b1r) - dot(wi1, b1i))
    yi[:] = (dot(wr0, b0i) + dot(wi0, b0r)
             + dot(wr1, b1i) + dot(wi1, b1r))


def fir_block_pallas(x, taps, ctx, tile_rows: int = 128,
                     interpret: bool = False):
    """Drop-in for ``fir_block``: complex x[N], taps[T<=129], carried
    ctx[T-1].  Returns ``(y[N], new_ctx)``.  N is padded internally to
    a tile multiple."""
    x = jnp.asarray(x)
    taps = np.asarray(taps)
    T = taps.shape[0]
    if T > _LANES + 1:
        raise ValueError(f"kernel supports taps <= {_LANES + 1}, got {T}")
    if tile_rows % 8:
        raise ValueError("tile_rows must be a multiple of 8")
    N = x.shape[0]
    tile = tile_rows * _LANES
    n_tiles = -(-N // tile)
    width = T + _LANES - 1

    B = _fir.banded_tap_matrix(taps.astype(np.complex64), _LANES)
    br = jnp.asarray(B.real.astype(np.float32))
    bi = jnp.asarray(B.imag.astype(np.float32))

    xext = jnp.concatenate([ctx.astype(x.dtype), x])
    new_ctx = xext[-(T - 1):] if T > 1 else ctx
    # Kernel input: y[n] = sum_k xext[n + k] B[k]; row r reads
    # xext[r*128 ... r*128 + width).  Pad to whole tiles + halo rows
    # and hand the kernel a [rows, 128] view.
    pad_to = (n_tiles * tile_rows + _HALO_ROWS) * _LANES
    xr = jnp.real(xext)
    xi = jnp.imag(xext)
    pad = pad_to - xr.shape[0]
    xr = jnp.pad(xr, (0, pad)).reshape(-1, _LANES)
    xi = jnp.pad(xi, (0, pad)).reshape(-1, _LANES)

    grid = (n_tiles,)
    out_shape = [
        jax.ShapeDtypeStruct((n_tiles * tile_rows, _LANES), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles * tile_rows, _LANES), jnp.float32),
    ]
    kernel = functools.partial(_kernel, tile_rows=tile_rows, num_taps=T)
    yr, yi = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((width, _LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((width, _LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_rows, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_rows, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((tile_rows + _HALO_ROWS, _LANES), jnp.float32),
            pltpu.VMEM((tile_rows + _HALO_ROWS, _LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * 2 * n_tiles * tile_rows * _LANES * width,
            bytes_accessed=(2 * pad_to + 2 * n_tiles * tile) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xr, xi, br, bi)

    y = jax.lax.complex(yr.reshape(-1)[:N], yi.reshape(-1)[:N])
    return y, new_ctx
