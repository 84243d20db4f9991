"""Pallas TPU kernel: streaming complex FIR as overlap-save banded GEMM.

Functionally identical to :func:`comms_tpu.ops.fir.fir_block` (the
reference's batch_fir, fir.rs:87-102) — the kernel exists to pin the
memory schedule: each grid step DMAs ONE [tile + halo] slab of the
input from HBM into VMEM, builds the overlapping window matrix from
ceil((T+127)/128) in-VMEM row-shifted slices (no gather, no HBM
re-reads of the halo), and runs the real MXU matmuls of the complex
banded product against taps resident in VMEM.  Supports T <= 1025
(the 8-row DMA halo).  HBM traffic is exactly
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

    # W[r, :] = flat_slab[r*128 : r*128 + width].  The banded product
    # splits along the window axis into ceil(width/128) row-shifted
    # pieces (Mosaic cannot concat slices with different sublane
    # offsets, so it is one matmul pair per piece):
    #   Y = sum_j W_j @ B[j*128 : j*128 + |piece|]
    # HIGHEST: 3-pass f32 on the MXU — parity with ops.fir's default
    # (bf16 operand rounding costs ~2e-3 rel error otherwise).
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
    npieces = -(-width // _LANES)
    acc_r = acc_i = None
    for j in range(npieces):
        lo = j * _LANES
        w = min(width, lo + _LANES) - lo
        wr = slab_r[j: tile_rows + j, :w]
        wi = slab_i[j: tile_rows + j, :w]
        bjr = br[lo:lo + w, :]
        bji = bi[lo:lo + w, :]
        tr = dot(wr, bjr) - dot(wi, bji)
        ti = dot(wr, bji) + dot(wi, bjr)
        acc_r = tr if acc_r is None else acc_r + tr
        acc_i = ti if acc_i is None else acc_i + ti
    yr[:] = acc_r
    yi[:] = acc_i


def fir_block_pallas(x, taps, ctx, tile_rows: int = 128,
                     interpret: bool = False):
    """Drop-in for ``fir_block``: complex x[N], taps[T<=1025], carried
    ctx[T-1].  Returns ``(y[N], new_ctx)``.  N is padded internally to
    a tile multiple."""
    x = jnp.asarray(x)
    taps = np.asarray(taps)
    T = taps.shape[0]
    if T > _HALO_ROWS * _LANES + 1:
        raise ValueError(
            f"kernel supports taps <= {_HALO_ROWS * _LANES + 1} "
            f"(the {_HALO_ROWS}-row DMA halo), got {T}")
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
