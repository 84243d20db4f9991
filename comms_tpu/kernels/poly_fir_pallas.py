"""Pallas TPU kernel: general polyphase decimating FIR (overlap-save).

Drop-in accelerator for :func:`comms_tpu.ops.fir.fir_decimate_poly`
(the FM chain's hot pair and the channelizer's core pattern; reference
``fir_node.rs`` + ``resample_node.rs`` fused): computes only the kept
outputs ``y[m] = sum_t taps[t] * x[m*D - t]`` with the input read from
HBM exactly once.

Same Mosaic-proven layout as ``fm_chain_pallas`` stage 1: the planar
f32 input is viewed ``[rows, D*128]``, so each banded-GEMM row of 128
decimated outputs advances exactly ONE sublane — the two window pieces
are stride-1 row slices (the only slicing Mosaic supports), and the
halo zone (8 rows, f32 DMA alignment) carries across sequential grid
steps in VMEM.  Data is arbitrary f32, so the matmuls run at HIGHEST
precision (3-pass f32) for parity with ``ops.fir``'s default.

Supports real or complex taps over complex input (2 or 4 real GEMMs).
Long filters use q = ceil((T-1)/128) context pieces from the previous
slab row (multi-slab band accumulation — one extra 128-wide GEMM per
piece).  Constraints: ``2 <= dec <= 8``, ``taps <= dec*128 + 1``
(e.g. 641 at dec=5), block multiple of ``step_samples(dec)``.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["poly_fir_pallas", "poly_fir_pallas_planar", "step_samples",
           "CTX_ROWS"]

_LANES = 128
_HALO = 8          # f32 DMA row-alignment quantum
_ROWS = 64         # input rows per grid step
CTX_ROWS = _HALO


def step_samples(dec: int) -> int:
    """Input samples consumed per grid step."""
    return _ROWS * dec * _LANES


def _band(taps: np.ndarray, dec: int, q: int = 1) -> np.ndarray:
    """B[w, j] = taps[q*128 + dec*j - w], w in [0, q*128 + dec*128).

    ``q`` = number of 128-lane context pieces reaching back into the
    previous slab row (q = ceil((T-1)/128)); q = 1 is the short-filter
    case."""
    T = taps.shape[0]
    W = q * _LANES + dec * _LANES
    w = np.arange(W)[:, None]
    j = np.arange(_LANES)[None, :]
    t = q * _LANES + dec * j - w
    valid = (t >= 0) & (t < T)
    return np.where(valid, taps[np.clip(t, 0, T - 1)], 0.0).astype(
        np.float32)


def _kernel(xr_hbm, xi_hbm, cr_hbm, ci_hbm, brr, bri,
            yr_out, yi_out, slab_r, slab_i, sem, *,
            dec: int, complex_taps: bool, q: int):
    g = pl.program_id(0)
    roww = dec * _LANES
    hp = jax.lax.Precision.HIGHEST

    @pl.when(g > 0)
    def _():
        slab_r[0:_HALO, :] = slab_r[_ROWS:_ROWS + _HALO, :]
        slab_i[0:_HALO, :] = slab_i[_ROWS:_ROWS + _HALO, :]

    cp_r = pltpu.make_async_copy(
        xr_hbm.at[pl.ds(g * _ROWS, _ROWS), :],
        slab_r.at[pl.ds(_HALO, _ROWS), :], sem.at[0])
    cp_i = pltpu.make_async_copy(
        xi_hbm.at[pl.ds(g * _ROWS, _ROWS), :],
        slab_i.at[pl.ds(_HALO, _ROWS), :], sem.at[1])
    cp_r.start()
    cp_i.start()

    @pl.when(g == 0)
    def _():
        c0 = pltpu.make_async_copy(cr_hbm.at[pl.ds(0, _HALO), :],
                                   slab_r.at[pl.ds(0, _HALO), :], sem.at[2])
        c1 = pltpu.make_async_copy(ci_hbm.at[pl.ds(0, _HALO), :],
                                   slab_i.at[pl.ds(0, _HALO), :], sem.at[3])
        c0.start()
        c1.start()
        c0.wait()
        c1.wait()

    cp_r.wait()
    cp_i.wait()

    def gemm(slab, band):
        # q context pieces from the PREVIOUS row's tail lanes (the
        # window reaches q*128 <= roww samples back), then the full
        # current row.  Stride-1 slices only — the Mosaic constraint.
        acc = jnp.dot(slab[_HALO:_HALO + _ROWS, :], band[q * _LANES:],
                      preferred_element_type=jnp.float32, precision=hp)
        for i in range(q):
            wi = slab[_HALO - 1:_HALO - 1 + _ROWS,
                      roww - (q - i) * _LANES:roww - (q - i - 1) * _LANES]
            acc = acc + jnp.dot(wi, band[i * _LANES:(i + 1) * _LANES],
                                preferred_element_type=jnp.float32,
                                precision=hp)
        return acc

    if complex_taps:
        yr_out[:] = gemm(slab_r[:], brr) - gemm(slab_i[:], bri)
        yi_out[:] = gemm(slab_r[:], bri) + gemm(slab_i[:], brr)
    else:
        yr_out[:] = gemm(slab_r[:], brr)
        yi_out[:] = gemm(slab_i[:], brr)


def poly_fir_pallas_planar(re, im, taps, ctx_re, ctx_im, dec: int,
                           interpret: bool = False):
    """Planar-plane variant of :func:`poly_fir_pallas` — the kernel's
    NATIVE layout (zero relayout on either side).

    Args:
      re, im: [N] float32 planes, N % step_samples(dec) == 0.
      taps: 1-D taps (real or complex, T <= dec*128 + 1), host numpy.
      ctx_re, ctx_im: [dec*128*CTX_ROWS] float32 carried input-tail
        planes (zeros at stream start).  Only the trailing T-1
        samples influence the output — the full quantum keeps DMAs
        tile-aligned.
      dec: decimation factor in [2, 8].

    Returns ``(yr[N//dec], yi[N//dec], new_ctx_re, new_ctx_im)``.
    """
    re = jnp.asarray(re)
    im = jnp.asarray(im)
    taps = np.asarray(taps)
    T = taps.shape[0]
    D = int(dec)
    if not 2 <= D <= 8:
        raise ValueError(f"dec must be in [2, 8], got {D}")
    roww = D * _LANES
    if T > roww + 1:
        raise ValueError(
            f"taps {T} > dec*128 + 1 = {roww + 1} unsupported (the "
            "window would reach beyond one previous slab row)")
    q = max(1, -(-(T - 1) // _LANES))   # 128-lane context pieces
    N = re.shape[0]
    step = step_samples(D)
    if N % step:
        raise ValueError(f"N {N} must be a multiple of {step}")
    steps = N // step

    complex_taps = np.iscomplexobj(taps)
    brr = _band(taps.real.astype(np.float64), D, q)
    bri = (_band(taps.imag.astype(np.float64), D, q) if complex_taps
           else np.zeros_like(brr))

    ctx_re = jnp.asarray(ctx_re)
    ctx_im = jnp.asarray(ctx_im)
    if ctx_re.shape[0] != CTX_ROWS * roww:
        raise ValueError(
            f"ctx must be {CTX_ROWS * roww} samples, got {ctx_re.shape[0]}")
    new_ctx_re = jnp.concatenate([ctx_re, re])[-CTX_ROWS * roww:]
    new_ctx_im = jnp.concatenate([ctx_im, im])[-CTX_ROWS * roww:]

    out_rows = steps * _ROWS
    kernel = functools.partial(_kernel, dec=D,
                               complex_taps=complex_taps, q=q)
    yr, yi = pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((q * _LANES + roww, _LANES), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q * _LANES + roww, _LANES), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_ROWS, _LANES), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, _LANES), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((out_rows, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((out_rows, _LANES), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((_ROWS + _HALO, roww), jnp.float32),
            pltpu.VMEM((_ROWS + _HALO, roww), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=(4 if complex_taps else 2) * 2 * out_rows * _LANES
            * (q * _LANES + roww) * 3,
            bytes_accessed=8 * N + 8 * N // D,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        re.reshape(-1, roww), im.reshape(-1, roww),
        ctx_re.reshape(CTX_ROWS, roww),
        ctx_im.reshape(CTX_ROWS, roww),
        jnp.asarray(brr), jnp.asarray(bri),
    )
    return yr.reshape(-1), yi.reshape(-1), new_ctx_re, new_ctx_im


def poly_fir_pallas(x, taps, ctx, dec: int, interpret: bool = False):
    """Polyphase decimating FIR on complex input.

    Args:
      x: [N] complex64 (device), N % step_samples(dec) == 0.
      taps: 1-D taps (real or complex, T <= dec*128 + 1), host numpy.
      ctx: [dec*128*CTX_ROWS] complex64 carried input tail (the
        samples immediately before this block; zeros at stream start).
      dec: decimation factor in [2, 8].

    Returns ``(y[N//dec] complex64, new_ctx)``.  Plane-native callers
    should use :func:`poly_fir_pallas_planar` (the kernel's layout).
    """
    x = jnp.asarray(x)
    ctx = jnp.asarray(ctx)
    yr, yi, ncr, nci = poly_fir_pallas_planar(
        jnp.real(x), jnp.imag(x), taps,
        jnp.real(ctx), jnp.imag(ctx), dec, interpret=interpret)
    return jax.lax.complex(yr, yi), jax.lax.complex(ncr, nci)
