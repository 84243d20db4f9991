"""Pallas TPU kernel: polyphase decimating FIR at the HBM io floor.

Drop-in accelerator for :func:`comms_tpu.ops.fir.fir_decimate_poly`
(the reference's BatchFirNode + DecimateNode hot pair,
fir_node.rs:215-220 + resample_node.rs:53-65): ``y[f] = sum_t taps[t]
x[f*D - t]`` with carried MD-1 context.

Same design as the dense planar FIR kernel (fir_pallas.py), adapted to
decimation with the wide-row layout (PERF.md lesson 8 — "no
sublane-strided slices"):

* input planes are viewed as wide rows of ``W = D*128`` samples, so a
  window that advances D samples per output frame advances ONE wide
  row per 128-frame output row — every GEMM operand is a static
  row/lane slice of the slab, never a strided one;
* the band is built at the sublane-aligned offset ``off =
  128*ceil((MD-1)/128)``, so the window is exactly ``off/128 + D``
  K=128 pieces: the first ``off/128`` from wide-row r's tail lanes,
  the rest from wide-row r+1 (taps T <= D*128 + 1);
* eight wide rows of halo per tile (Mosaic DMA row offsets must be
  8-divisible; only the last halo row is ever read), DMA'd from the
  predecessor's rows in HBM — tile 0 seeds from a [W]-sample
  carried-context operand — double-buffered by hand;
* bf16 hi/lo split-operand GEMMs (3 MXU passes per logical matmul,
  ~1e-5 relative); real taps run 2 logical matmuls, complex taps the
  3-mult Karatsuba form.

HBM traffic: 8 B in + 8/D B out per input sample.  Measured on v5e
(D=5, 63 real taps, 21M-sample blocks, state chained): 78.3 Gsps —
92% of the 9.6 B/sample io floor, 3.5x the XLA strided banded GEMM
and 3.0x the prior kernel formulation (poly_fir_pallas, per-dec-phase
slab pieces at HIGHEST precision).  tile_rows=128 is the measured
sweet spot (60.5 at 64, 78.3 at 128; 256 collapses to 7.5 on VMEM
pressure).
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
    "fir_decimate_planar_pallas",
    "decim_ctx_zero",
    "max_taps",
]

_LANES = 128
_BF = jnp.bfloat16
_F32 = jnp.float32


def max_taps(dec: int) -> int:
    """Largest supported tap count for decimation ``dec``: the carried
    context is one wide row of ``W = dec*128`` samples and the taps
    round up to a multiple of dec, so MD - 1 = dec*ceil(T/dec) - 1
    must fit in W — i.e. T <= W, plus one for dec = 1 (MD = T there).
    """
    return _LANES + 1 if dec == 1 else dec * _LANES


def decim_ctx_zero(dec: int, dtype=jnp.float32):
    """Zero carried context planes (stream start): one wide row of the
    ``dec*128`` input samples BEFORE the block (only the last MD-1
    matter)."""
    z = jnp.zeros((1, dec * _LANES), dtype)
    return z, z


from comms_tpu.kernels._bf16 import (  # noqa: E402  (shared x3 split)
    device_split as _split,
    dot3 as _dot3,
    host_split as _hsplit,
)


def _band(taps, dec: int):
    """Aligned decimating band: B[i, p] = flat[p*D + off - i] (flat =
    taps zero-padded to MD), off = 128*ceil((MD-1)/128).  Window row r
    reads wide-row slab samples [r*W + (W - off), +off+W):
    y[f] = sum_t taps[t] x[f*D - t]."""
    tp = np.asarray(taps).astype(np.complex128)
    T = tp.shape[0]
    D = int(dec)
    MD = D * (-(-T // D))
    flat = np.zeros(MD, np.complex128)
    flat[:T] = tp
    off = _LANES * max(-(-(MD - 1) // _LANES), 1)
    W = D * _LANES
    width = off + W
    i = np.arange(width)[:, None]
    p = np.arange(_LANES)[None, :]
    t = p * D + off - i
    B = np.where((t >= 0) & (t < MD), flat[np.clip(t, 0, MD - 1)], 0.0)
    return B, off


def _kernel(xr_hbm, xi_hbm, cr, ci, *band_and_out, tile_rows: int,
            off: int, dec: int, mode: str, real_taps: bool):
    if real_taps:
        (brh, brl, yr, yi, slab_r, slab_i, sem) = band_and_out
    else:
        (brh, brl, bih, bil, bsh, bsl, yr, yi,
         slab_r, slab_i, sem) = band_and_out
    i = pl.program_id(0)
    n = pl.num_programs(0)
    W = dec * _LANES
    H = 8                     # halo wide-rows (DMA 8-row alignment)
    hpieces = off // _LANES
    npieces = hpieces + dec
    slot = lax.rem(i, jnp.int32(2))

    def issue(j, s, op):
        def first():
            getattr(pltpu.make_async_copy(
                xr_hbm.at[pl.ds(0, tile_rows), :],
                slab_r.at[s, pl.ds(H, tile_rows), :], sem.at[s, 0]), op)()
            getattr(pltpu.make_async_copy(
                xi_hbm.at[pl.ds(0, tile_rows), :],
                slab_i.at[s, pl.ds(H, tile_rows), :], sem.at[s, 1]), op)()

        def later():
            # hint: tile_rows % 8 == 0 and H == 8, so the offset is
            # 8-divisible (Mosaic must prove slice-tile alignment when
            # a small operand lands in VMEM instead of HBM)
            r0 = pl.multiple_of(j * tile_rows - H, 8)
            getattr(pltpu.make_async_copy(
                xr_hbm.at[pl.ds(r0, tile_rows + H), :],
                slab_r.at[s], sem.at[s, 0]), op)()
            getattr(pltpu.make_async_copy(
                xi_hbm.at[pl.ds(r0, tile_rows + H), :],
                slab_i.at[s], sem.at[s, 1]), op)()

        if n == 1:
            first()
        else:
            lax.cond(j == 0, first, later)

    @pl.when(i == 0)
    def _():
        slab_r[0, H - 1:H, :] = cr[:, :]
        slab_i[0, H - 1:H, :] = ci[:, :]
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
    for j in range(npieces):
        lo = j * _LANES
        if j < hpieces:
            rsl = slice(H - 1, H - 1 + tile_rows)
            csl = slice(W - off + lo, W - off + lo + _LANES)
        else:
            rsl = slice(H, H + tile_rows)
            csl = slice(lo - off, lo - off + _LANES)
        bc = slice(lo, lo + _LANES)
        if real_taps:
            if mode == "bf16":
                p1 = d(srh[rsl, csl], brh[bc, :])
                p2 = d(sih[rsl, csl], brh[bc, :])
            else:
                p1 = _dot3(srh[rsl, csl], srl[rsl, csl],
                           brh[bc, :], brl[bc, :])
                p2 = _dot3(sih[rsl, csl], sil[rsl, csl],
                           brh[bc, :], brl[bc, :])
            tr_, ti_ = p1, p2
        else:
            if mode == "bf16":
                p1 = d(srh[rsl, csl], brh[bc, :])
                p2 = d(sih[rsl, csl], bih[bc, :])
                p3 = d(ssh[rsl, csl], bsh[bc, :])
            else:
                p1 = _dot3(srh[rsl, csl], srl[rsl, csl],
                           brh[bc, :], brl[bc, :])
                p2 = _dot3(sih[rsl, csl], sil[rsl, csl],
                           bih[bc, :], bil[bc, :])
                p3 = _dot3(ssh[rsl, csl], ssl[rsl, csl],
                           bsh[bc, :], bsl[bc, :])
            tr_ = p1 - p2
            ti_ = p3 - p1 - p2
        acc_r = tr_ if acc_r is None else acc_r + tr_
        acc_i = ti_ if acc_i is None else acc_i + ti_
    yr[:] = acc_r
    yi[:] = acc_i


def fir_decimate_planar_pallas(xr, xi, taps, dec: int, ctx_r, ctx_i,
                               tile_rows: int = 128, mode: str = "split",
                               interpret: bool = False):
    """Decimating FIR on f32 re/im planes.

    ``xr/xi``: [N] planes, ``N`` a multiple of ``tile_rows * dec *
    128``.  ``ctx_r/ctx_i``: [1, dec*128] planes with the input
    samples BEFORE this block (:func:`decim_ctx_zero` at stream
    start).  Returns ``(yr, yi, next_ctx_r, next_ctx_i)`` with
    ``yr/yi`` [N // dec] frame planes.
    """
    taps = np.asarray(taps)
    D = int(dec)
    T = taps.shape[0]
    if D < 1:
        raise ValueError("dec must be >= 1")
    if T > max_taps(D):
        raise ValueError(f"kernel supports taps <= {max_taps(D)} at "
                         f"dec={D}, got {T}")
    if mode not in ("split", "bf16"):
        raise ValueError(f"mode must be 'split' or 'bf16', got {mode!r}")
    if tile_rows < 8 or tile_rows % 8:
        raise ValueError("tile_rows must be a multiple of 8 (DMA halo "
                         "alignment)")
    W = D * _LANES
    N = int(xr.shape[0])
    tile = tile_rows * W
    if N % tile:
        raise ValueError(f"N={N} must be a multiple of tile_rows*dec*128"
                         f"={tile} (pad upstream or pick a smaller "
                         f"tile_rows)")
    n_tiles = N // tile

    B, off = _band(taps, D)
    real_taps = not np.iscomplexobj(taps) or not np.any(B.imag)
    brh, brl = _hsplit(B.real)
    if real_taps:
        band = (brh, brl)
    else:
        bih, bil = _hsplit(B.imag)
        bsh, bsl = _hsplit(B.real + B.imag)
        band = (brh, brl, bih, bil, bsh, bsl)

    xr2 = xr.reshape(-1, W)
    xi2 = xi.reshape(-1, W)
    width = B.shape[0]

    kernel = functools.partial(_kernel, tile_rows=tile_rows, off=off,
                               dec=D, mode=mode, real_taps=real_taps)
    vs = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)
    yr, yi = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  vs((1, W)), vs((1, W))]
                 + [vs((width, _LANES)) for _ in band],
        out_specs=[pl.BlockSpec((tile_rows, _LANES), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((n_tiles * tile_rows, _LANES),
                                        jnp.float32)] * 2,
        scratch_shapes=[
            pltpu.VMEM((2, tile_rows + 8, W), jnp.float32),
            pltpu.VMEM((2, tile_rows + 8, W), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=(2 if real_taps else 3) * 3 * 2 * (N // D) * width,
            bytes_accessed=8 * N + 8 * N // D,
            transcendentals=0),
        interpret=interpret,
    )(xr2, xi2, ctx_r, ctx_i, *band)
    new_cr = xr2[-1:]
    new_ci = xi2[-1:]
    return yr.reshape(-1), yi.reshape(-1), new_cr, new_ci
