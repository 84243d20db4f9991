"""Pallas TPU kernel: streaming FIR at the HBM io floor.

Functional parity with :func:`comms_tpu.ops.fir.fir_block` (the
reference's batch_fir, fir.rs:87-102).  The kernel exists to pin the
memory schedule — HBM traffic is exactly 8 B read + 8 B write per
complex sample (+ taps once):

* **Planar interface** (`fir_planar_pallas`): f32 re/im planes in and
  out, consumed in place as [rows, 128] views.  No complex
  materialization, no context concat, no pad pass — the measured cost
  of those wrapper passes (v1 of this kernel did concat+pad+complex
  round trips) capped the whole pipeline at ~16 Gsps on v5e; the
  planar form measures 37 Gsps (71% of the io-floor roofline) on the
  same 63-tap workload.
* **Halo inside the kernel**: each grid step DMAs [tile + 8] rows; the
  8-row (1024-sample) history prefix of tile 0 comes from a tiny
  [8, 128] carried-context operand, later tiles re-read their
  predecessor's tail rows straight from HBM.  DMA is double-buffered
  by hand (slab i+1 prefetches during compute on slab i).
* **Aligned band**: windows advance in whole sublanes.  The banded tap
  matrix is built at offset ``off = 128*ceil((T-1)/128)`` so every
  GEMM piece has K = 128 exactly (no partial-K MXU pass, no unaligned
  lane slices).  T <= 1025.
* **bf16 split-operand GEMMs** (default): each f32 operand splits into
  hi/lo bfloat16 halves and each logical matmul runs as 3 bf16 MXU
  passes (hi*hi + hi*lo + lo*hi) — the bf16_x3 algorithm, ~1e-5
  relative error, 2x the MXU rate of Mosaic's 6-pass f32 HIGHEST.
  Complex taps use the 3-multiplication Karatsuba form (p1 = Wr@Br,
  p2 = Wi@Bi, p3 = (Wr+Wi)@(Br+Bi)); real taps skip p3 and the imag
  band entirely (6 passes -> 4... -> 2 logical matmuls).
  ``mode="bf16"`` (single-pass, ~4e-3) is for bf16-tolerant chains.

Measured on v5e (16.8M-sample blocks, state chained): 37.1 Gsps split
/ 45.2 bf16, vs 6.7 Gsps for the XLA banded GEMM and 6.4 for the v1
kernel of this file.  See docs/PERF.md.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "fir_planar_pallas",
    "fir_block_pallas",
    "planar_ctx_zero",
    "planar_ctx_from_tail",
    "MAX_TAPS",
]

_LANES = 128
_HALO_ROWS = 8            # 1024-sample history prefix: taps <= 1025
MAX_TAPS = _HALO_ROWS * _LANES + 1
_BF = jnp.bfloat16
_F32 = jnp.float32


def planar_ctx_zero(dtype=jnp.float32):
    """Zero carried context planes (stream start)."""
    z = jnp.zeros((_HALO_ROWS, _LANES), dtype)
    return z, z


def planar_ctx_from_tail(xr, xi):
    """Context planes for the NEXT block: the last 1024 samples of this
    block's input planes (block length must be >= 1024)."""
    return (xr[-_HALO_ROWS * _LANES:].reshape(_HALO_ROWS, _LANES),
            xi[-_HALO_ROWS * _LANES:].reshape(_HALO_ROWS, _LANES))


from comms_tpu.kernels._bf16 import (  # noqa: E402  (shared x3 split)
    device_split as _split,
    dot3 as _dot3,
    host_split as _hsplit_shared,
)


def _kernel(xr_hbm, xi_hbm, cr, ci, *band_and_out, tile_rows: int,
            num_taps: int, mode: str, real_taps: bool):
    if real_taps:
        (brh, brl, yr, yi, slab_r, slab_i, sem) = band_and_out
    else:
        (brh, brl, bih, bil, bsh, bsl, yr, yi,
         slab_r, slab_i, sem) = band_and_out
    i = pl.program_id(0)
    n = pl.num_programs(0)
    # halo rows the band spans — MUST match _aligned_band's offset
    # (off = 128 even for T = 1; deriving ceil((T-1)/128) = 0 there
    # silently read the band's zero rows and returned zeros)
    hrows = max(-(-(num_taps - 1) // _LANES), 1)
    npieces = hrows + 1                        # each piece K = 128
    slot = lax.rem(i, jnp.int32(2))  # literal stays i32 under x64 tests
    H = _HALO_ROWS

    def issue(j, s, op):
        """start/wait the two plane DMAs for tile j into slab s.
        Tile 0's x rows land after the context rows; later tiles DMA
        [j*tr - H, j*tr + tr) in one piece."""
        def first():
            getattr(pltpu.make_async_copy(
                xr_hbm.at[pl.ds(0, tile_rows), :],
                slab_r.at[s, pl.ds(H, tile_rows), :], sem.at[s, 0]), op)()
            getattr(pltpu.make_async_copy(
                xi_hbm.at[pl.ds(0, tile_rows), :],
                slab_i.at[s, pl.ds(H, tile_rows), :], sem.at[s, 1]), op)()

        def later():
            getattr(pltpu.make_async_copy(
                xr_hbm.at[pl.ds(j * tile_rows - H, tile_rows + H), :],
                slab_r.at[s], sem.at[s, 0]), op)()
            getattr(pltpu.make_async_copy(
                xi_hbm.at[pl.ds(j * tile_rows - H, tile_rows + H), :],
                slab_i.at[s], sem.at[s, 1]), op)()

        if n == 1:
            # single-tile grid: the `later` branch would trace a DMA
            # larger than the whole operand — only `first` can apply.
            first()
        else:
            lax.cond(j == 0, first, later)

    @pl.when(i == 0)
    def _():
        slab_r[0, :H, :] = cr[:, :]
        slab_i[0, :H, :] = ci[:, :]
        issue(i, 0, "start")

    issue(i, slot, "wait")

    @pl.when(i + 1 < n)
    def _():
        issue(i + 1, 1 - slot, "start")

    sr = slab_r[slot]
    si = slab_i[slot]
    d = functools.partial(jnp.dot, preferred_element_type=_F32)
    if mode == "bf16":
        srh = sr.astype(_BF)
        sih = si.astype(_BF)
        if not real_taps:
            ssh = (sr + si).astype(_BF)
    else:
        srh, srl = _split(sr)
        sih, sil = _split(si)
        if not real_taps:
            ssh, ssl = _split(sr + si)
    acc_r = acc_i = None
    base = H - hrows                 # first window row within the slab
    for j in range(npieces):
        lo = j * _LANES
        r0 = base + j
        rows = slice(r0, tile_rows + r0)
        cols = slice(lo, lo + _LANES)
        if real_taps:
            if mode == "bf16":
                p1 = d(srh[rows, :], brh[cols, :])
                p2 = d(sih[rows, :], brh[cols, :])
            else:
                p1 = _dot3(srh[rows, :], srl[rows, :],
                           brh[cols, :], brl[cols, :])
                p2 = _dot3(sih[rows, :], sil[rows, :],
                           brh[cols, :], brl[cols, :])
            tr_, ti_ = p1, p2
        else:
            if mode == "bf16":
                p1 = d(srh[rows, :], brh[cols, :])
                p2 = d(sih[rows, :], bih[cols, :])
                p3 = d(ssh[rows, :], bsh[cols, :])
            else:
                p1 = _dot3(srh[rows, :], srl[rows, :],
                           brh[cols, :], brl[cols, :])
                p2 = _dot3(sih[rows, :], sil[rows, :],
                           bih[cols, :], bil[cols, :])
                p3 = _dot3(ssh[rows, :], ssl[rows, :],
                           bsh[cols, :], bsl[cols, :])
            tr_ = p1 - p2
            ti_ = p3 - p1 - p2
        acc_r = tr_ if acc_r is None else acc_r + tr_
        acc_i = ti_ if acc_i is None else acc_i + ti_
    yr[:] = acc_r
    yi[:] = acc_i


def _aligned_band(taps):
    """B[i, p] = taps[p + off - i] at the sublane-aligned offset
    off = 128*ceil((T-1)/128); window row r of a slab with H halo rows
    reads slab samples [(H - off/128 + r)*128, +off+128)."""
    tp = np.asarray(taps).astype(np.complex128)
    T = tp.shape[0]
    off = _LANES * (-(-(T - 1) // _LANES)) if T > 1 else _LANES
    width = off + _LANES
    ii = np.arange(width)[:, None]
    pp = np.arange(_LANES)[None, :]
    tt = pp + off - ii
    return np.where((tt >= 0) & (tt < T), tp[np.clip(tt, 0, T - 1)], 0.0)


_hsplit = _hsplit_shared


def fir_planar_pallas(xr, xi, taps, ctx_r, ctx_i, tile_rows: int = 1024,
                      mode: str = "split", interpret: bool = False):
    """Streaming FIR on f32 re/im planes.

    ``xr/xi``: [N] planes, N a multiple of ``tile_rows * 128``.
    ``ctx_r/ctx_i``: [8, 128] planes holding the 1024 input samples
    BEFORE this block (zeros + carried tail; only the last T-1
    matter) — :func:`planar_ctx_zero` at stream start.
    Returns ``(yr, yi, next_ctx_r, next_ctx_i)``.
    """
    taps = np.asarray(taps)
    T = taps.shape[0]
    if T > MAX_TAPS:
        raise ValueError(f"kernel supports taps <= {MAX_TAPS}, got {T}")
    if mode not in ("split", "bf16"):
        raise ValueError(f"mode must be 'split' or 'bf16', got {mode!r}")
    if tile_rows % 8 or tile_rows < 8:
        raise ValueError("tile_rows must be a positive multiple of 8")
    N = int(xr.shape[0])
    tile = tile_rows * _LANES
    if N % tile:
        raise ValueError(f"N={N} must be a multiple of "
                         f"tile_rows*128={tile} (pad upstream or pick a "
                         f"smaller tile_rows)")
    n_tiles = N // tile

    B = _aligned_band(taps)
    real_taps = not np.iscomplexobj(taps) or not np.any(B.imag)
    brh, brl = _hsplit(B.real)
    if real_taps:
        band = (brh, brl)
    else:
        bih, bil = _hsplit(B.imag)
        bsh, bsl = _hsplit(B.real + B.imag)
        band = (brh, brl, bih, bil, bsh, bsl)

    xr2 = xr.reshape(-1, _LANES)
    xi2 = xi.reshape(-1, _LANES)
    width = B.shape[0]

    kernel = functools.partial(
        _kernel, tile_rows=tile_rows, num_taps=T, mode=mode,
        real_taps=real_taps)
    vs = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)
    yr, yi = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  vs((_HALO_ROWS, _LANES)), vs((_HALO_ROWS, _LANES))]
                 + [vs((width, _LANES)) for _ in band],
        out_specs=[pl.BlockSpec((tile_rows, _LANES), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((n_tiles * tile_rows, _LANES),
                                        jnp.float32)] * 2,
        scratch_shapes=[
            pltpu.VMEM((2, tile_rows + _HALO_ROWS, _LANES), jnp.float32),
            pltpu.VMEM((2, tile_rows + _HALO_ROWS, _LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=(2 if real_taps else 3) * 3 * 2 * N * width,
            bytes_accessed=16 * N,
            transcendentals=0),
        interpret=interpret,
    )(xr2, xi2, ctx_r, ctx_i, *band)
    new_cr = xr2[-_HALO_ROWS:]
    new_ci = xi2[-_HALO_ROWS:]
    return yr.reshape(-1), yi.reshape(-1), new_cr, new_ci


def _auto_tile_rows(N: int) -> int:
    """Largest tile_rows in [8, 1024] keeping pad waste < one tile."""
    rows = -(-N // _LANES)
    tr = 8
    while tr < 1024 and tr * 2 <= rows:
        tr *= 2
    return tr


def fir_block_pallas(x, taps, ctx, tile_rows: int | None = None,
                     mode: str = "split", interpret: bool = False):
    """Drop-in for ``ops.fir.fir_block``: complex x[N], taps[T<=1025],
    carried complex ctx[T-1].  Returns ``(y[N], new_ctx)``.

    Compatibility wrapper over :func:`fir_planar_pallas` — it pays
    complex<->plane conversion and pad passes at the jit level; hot
    paths should hold planes end-to-end and call the planar kernel.
    """
    x = jnp.asarray(x)
    taps = np.asarray(taps)
    T = taps.shape[0]
    if T > MAX_TAPS:
        raise ValueError(f"kernel supports taps <= {MAX_TAPS} "
                         f"(the {_HALO_ROWS}-row DMA halo), got {T}")
    N = int(x.shape[0])
    tr = _auto_tile_rows(N) if tile_rows is None else tile_rows
    tile = tr * _LANES
    n_tiles = -(-N // tile)
    Np = n_tiles * tile

    xr = jnp.pad(jnp.real(x), (0, Np - N))
    xi = jnp.pad(jnp.imag(x), (0, Np - N))
    cpad = jnp.zeros((_HALO_ROWS * _LANES,), x.dtype)
    if T > 1:
        cpad = cpad.at[-(T - 1):].set(ctx.astype(x.dtype))
    cr = jnp.real(cpad).reshape(_HALO_ROWS, _LANES)
    ci = jnp.imag(cpad).reshape(_HALO_ROWS, _LANES)

    yr, yi, _, _ = fir_planar_pallas(xr, xi, taps, cr, ci, tile_rows=tr,
                                     mode=mode, interpret=interpret)
    y = lax.complex(yr[:N], yi[:N])
    if T > 1:
        xext = jnp.concatenate([ctx.astype(x.dtype), x])
        new_ctx = xext[-(T - 1):]
    else:
        new_ctx = ctx
    return y, new_ctx
