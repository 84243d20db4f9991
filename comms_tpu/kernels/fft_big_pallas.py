"""Pallas TPU kernels: large-N FFT / Welch PSD via a tiled four-step.

Why: the VMEM-resident FFT kernel (:mod:`fft_pallas`) tops out at
N = 2048 — one row tile must hold whole transforms.  Larger spectra
(the wideband monitor's 2^20-bin PSD, `parallel/wideband.py`) fall
back to `jnp.fft`, which stages every pass through HBM: the recorded
row ran at 2.3 Gsps, ~25x below the chip's io floor.

This module decomposes N = N1 * N2 (both in fft_pallas's supported
set, so 2^16..2^22) into two batched-1024-class Pallas stages that
reuse fft_pallas's VPU-radix + MXU-DFT machinery:

  view      x[n] -> A[n1, n2],  n = n1*N2 + n2   (row-major reshape)
  stage A   D[n2, k1]  = sum_n1 A[n1, n2] W_N1(n1 k1)   per n2-tile:
            DMA a [N1, ct] column slab, transpose in VMEM, row-FFT
            (fft_pallas._stage12 + Karatsuba MXU matmul), then the
            four-step twiddle W_N(n2 k1) — built in-register from two
            host tables via the angle-addition identity, never
            streamed — and a K1-TILE-BLOCKED write (ktiles contiguous
            64 KB tiles into D'[seg, k1//ct, n2, ct]).
  stage B   X[k1 + N1 k2] = sum_n2 D'[n2, k1] W_N2(n2 k2)  per
            k1-tile: DMA the tile's [N2, ct] slab — fully CONTIGUOUS
            in the blocked layout — transpose, row-FFT.  The PSD
            variant squares and accumulates into a VMEM-resident
            [N1, N2] bin grid across segments (output revisiting with
            the segment axis innermost), so segment spectra never
            exist in HBM.

HBM traffic per sample: 8 (A in) + 4 (window) + 8 (A out) + 8 (B in)
= 28 B vs jnp.fft's measured ~140 B.  Stage A's input column slabs
are strided for 3-D [b, n1, n2] ingest and fully contiguous for the
PRE-BLOCKED 4-D [b, n2//ct, n1, ct] serving shape (both accepted).
MEASURED (round-4 follow-up, closing ROADMAP_r5 item 2): converting
every strided slab to contiguous — blocked D' AND blocked ingest —
moves the 2^20 x 32 row by ~+1% (15.0 -> 15.2 Gsps): the manual
rings and BlockSpec pipelines already hid the DMAs behind compute,
so the 67%-of-io-floor residual is IN-KERNEL COMPUTE (transpose +
FFT passes + twiddle), not the DMA pattern.  The blocked layout is
kept as the serving contract: it is never slower, and on parts with
a different DMA/compute ratio the pattern margin is real.

Functional parity target: the reference's SampleFFT + Welch use
(``/root/reference/src/fft/mod.rs:73-96``) at the node tolerance of
per-bin error < 1e-5 (``src/fft/fft_node.rs:242-244``); consumer
semantics match ``ops/spectrum.welch_psd`` (demean, window, |.|^2,
segment mean) as used by ``parallel/wideband.make_sharded_psd``.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from comms_tpu.kernels import fft_pallas as _FP

__all__ = ["psd_big_pallas_planar", "fft_big_pallas_planar",
           "factorize", "supported_big"]

_LANES = 128
_CT = 128          # column-tile width (n2 lanes per stage-A step)


def factorize(n: int):
    """Pick (N1, N2) with N1*N2 == n, both in THIS kernel's stage
    range 256..2048, as square as possible.  Returns None if no pair
    exists.  (Pinned explicitly rather than via fft_pallas.supported:
    round 5 widened that set to 16384, but the tiled stages here are
    designed and validated for 256..2048-point factors only — n in
    2^12..2^14 is fft_pallas's own single-pass domain now.)"""
    best = None
    for n1 in (2048, 1024, 512, 256):
        if n % n1:
            continue
        n2 = n // n1
        if n2 not in (256, 512, 1024, 2048):
            continue
        if best is None or abs(n1 - n2) < abs(best[0] - best[1]):
            best = (n1, n2)
    return best


def supported_big(n: int) -> bool:
    return factorize(int(n)) is not None


def _angle_tables(n: int, n1: int, ct: int, c_steps: int):
    """Host planar tables for the four-step twiddle W_N(n2*k1),
    n2 = c*ct + r: V[r, k1] = W_N(r*k1), U[c, k1] = W_N(c*ct*k1) —
    exact integer-mod angles in f64, combined in-kernel by one complex
    multiply (angle addition) so the [N2, N1] twiddle matrix is never
    materialized or streamed."""
    k1 = np.arange(n1)[None, :].astype(np.int64)
    r = np.arange(ct)[:, None].astype(np.int64)
    c = np.arange(c_steps)[:, None].astype(np.int64)
    v = np.exp((-2j * np.pi / n) * np.mod(r * k1, n))
    u = np.exp((-2j * np.pi / n) * np.mod(c * ct * k1, n))
    return (v.real.astype(np.float32), v.imag.astype(np.float32),
            u.real.astype(np.float32), u.imag.astype(np.float32))


def _const2(n: int, r1: int, precision: str):
    """fft_pallas._const_arrays with grid-arity-agnostic index maps
    (stage A runs a 1-D grid, stage B a 2-D one)."""
    arrays, _, nmats = _FP._const_arrays(n, r1, precision)
    zero = lambda *g: (0, 0)
    specs = ([pl.BlockSpec((r1, _LANES), zero,
                           memory_space=pltpu.VMEM)] * 2
             + [pl.BlockSpec((_LANES, _LANES), zero,
                             memory_space=pltpu.VMEM)] * nmats)
    return arrays, specs, nmats


def _stageA_kernel(*refs, r1: int, ct: int, nc: int, csteps: int,
                   ktiles: int, windowed: bool, demean: bool,
                   emit_sums: bool, blocked_in: bool = False):
    """One (segment, n2-tile) step on a FLATTENED 1-D grid
    (g = segment*csteps + tile): transpose, demean+window, N1-FFT,
    four-step twiddle, blocked write.  ``emit_sums`` writes the
    tile's raw (pre-window) plane sums — the sparse-demean path's
    mean numerator, so no separate XLA reduction pass reads x.

    BOTH the input column slabs AND the D' output tiles move through
    MANUAL double-buffered DMA rings: with BlockSpec-pipelined
    outputs the step serialized on the output auto-DMA — measured
    2.13 ms at 2^20 x 32 against 1.41 ms for this form (bit-exact),
    the round-4 PSD stage-A finding (docs/PERF.md).

    D' is written K1-TILE-BLOCKED, [seg, k1//ct, n2, ct]: the step's
    [ct, N1] result leaves as ``ktiles`` contiguous 64 KB tiles (one
    per k1-tile, destination stride n2*ct*4) instead of one [ct, N1]
    row block, so stage B's per-(k1-tile, segment) read is ONE fully
    contiguous [n2, ct] slab instead of a 512-byte-row strided one.
    Measured NEUTRAL on v5e (module docstring) — kept because it is
    never slower and removes the pattern-rate dependence."""
    xr_hbm, xi_hbm, wr, wi = refs[:4]
    consts = refs[4:4 + nc]
    i = 4 + nc
    vr, vi, ur, ui = refs[i:i + 4]
    i += 4
    if windowed:
        wt = refs[i]
        i += 1
    if demean:
        means = refs[i]
        i += 1
    dr_hbm, di_hbm = refs[i:i + 2]
    i += 2
    if emit_sums:
        sums_out = refs[i]
        i += 1
    slab_r, slab_i, out_r, out_i, sem_in, sem_out = refs[i:i + 6]

    g = pl.program_id(0)
    nsteps = pl.num_programs(0)
    slot = jax.lax.rem(g, jnp.int32(2))

    def issue_in(j, s, op):
        seg = jax.lax.div(j, jnp.int32(csteps))
        col = jax.lax.rem(j, jnp.int32(csteps))
        if blocked_in:
            # pre-blocked x [seg, csteps, n1, ct]: contiguous slab
            src_r = xr_hbm.at[seg, col]
            src_i = xi_hbm.at[seg, col]
        else:
            src_r = xr_hbm.at[seg, :, pl.ds(col * ct, ct)]
            src_i = xi_hbm.at[seg, :, pl.ds(col * ct, ct)]
        getattr(pltpu.make_async_copy(
            src_r, slab_r.at[s], sem_in.at[s, 0]), op)()
        getattr(pltpu.make_async_copy(
            src_i, slab_i.at[s], sem_in.at[s, 1]), op)()

    def issue_out(j, s, op):
        seg = jax.lax.div(j, jnp.int32(csteps))
        col = jax.lax.rem(j, jnp.int32(csteps))
        for t in range(ktiles):          # static: one 64 KB tile each
            getattr(pltpu.make_async_copy(
                out_r.at[s, :, pl.ds(t * ct, ct)],
                dr_hbm.at[seg, t, pl.ds(col * ct, ct), :],
                sem_out.at[s, 0, t]), op)()
            getattr(pltpu.make_async_copy(
                out_i.at[s, :, pl.ds(t * ct, ct)],
                di_hbm.at[seg, t, pl.ds(col * ct, ct), :],
                sem_out.at[s, 1, t]), op)()

    @pl.when(g == 0)
    def _():
        issue_in(jnp.int32(0), 0, "start")

    issue_in(g, slot, "wait")

    @pl.when(g + 1 < nsteps)
    def _():
        issue_in(g + 1, 1 - slot, "start")

    # the out buffer this step writes carries step g-2's copy
    @pl.when(g >= 2)
    def _():
        issue_out(g - 2, slot, "wait")

    xr = slab_r[slot].T                  # [N1, ct] -> [ct, N1]
    xi = slab_i[slot].T
    if emit_sums:
        lanes = jax.lax.broadcasted_iota(jnp.int32, (8, _LANES), 1)
        sums_out[0, 0] = jnp.where(
            lanes == 0, jnp.sum(xr),
            jnp.where(lanes == 1, jnp.sum(xi), jnp.float32(0)))
    if demean:
        s = jax.lax.div(g, jnp.int32(csteps))
        xr = xr - means[s, 0]            # SMEM scalars
        xi = xi - means[s, 1]
    if windowed:
        w = wt[:]
        xr = xr * w
        xi = xi * w
    yp_r, yp_i = _FP._stage12(xr, xi, wr, wi, r1, ct)
    zs_r, zs_i = _FP._cmatmul(yp_r, yp_i, consts)
    n1 = r1 * _LANES
    # natural-order unshuffle: d[r, r1*k2 + k1] = zs[ct*k1 + r, k2]
    d_r = zs_r.T.reshape(n1, ct).T
    d_i = zs_i.T.reshape(n1, ct).T
    # four-step twiddle W_N(n2*k1) = U[c] * V[r]  (angle addition)
    u_r, u_i = ur[0, 0:1, :], ui[0, 0:1, :]       # [1, N1]
    tw_r = u_r * vr[:] - u_i * vi[:]     # [ct, N1]
    tw_i = u_r * vi[:] + u_i * vr[:]
    out_r[slot] = d_r * tw_r - d_i * tw_i
    out_i[slot] = d_r * tw_i + d_i * tw_r
    issue_out(g, slot, "start")

    # final drains: the last step's copy plus the other slot's
    @pl.when(g == nsteps - 1)
    def _():
        issue_out(g, slot, "wait")

    @pl.when((g == nsteps - 1) & (g >= 1))
    def _():
        issue_out(g - 1, 1 - slot, "wait")


def _stageB_psd_kernel(*refs, r1: int, ct: int, nc: int, last: int,
                       sparse: bool):
    """One (k1-tile, segment) step: transpose, N2-FFT, |.|^2,
    accumulate into the resident [ct, N2] bin-grid tile.

    ``sparse``: demean by FFT linearity — |FFT(w(x-m))|^2 =
    |FFT(wx) - m*W|^2 with W = FFT(w) nonzero on a few bins near DC /
    Nyquist only (periodic Hann: 3).  The m*W term arrives as host
    mask planes (nonzero only at W's bins, slotted per affected tile)
    times the per-segment mean from SMEM — an FMA pass on two of the
    k1-tiles instead of a whole-input XLA demean pre-pass."""
    dr_ref, di_ref, wr, wi = refs[:4]
    consts = refs[4:4 + nc]
    i = 4 + nc
    if sparse:
        mwr, mwi, means = refs[i:i + 3]
        i += 3
    acc_out = refs[i]
    c2 = pl.program_id(0)
    s = pl.program_id(1)
    xr = dr_ref[0, 0].T                  # [N2, ct] -> [ct, N2]
    xi = di_ref[0, 0].T
    yp_r, yp_i = _FP._stage12(xr, xi, wr, wi, r1, ct)
    zs_r, zs_i = _FP._cmatmul(yp_r, yp_i, consts)
    n2 = r1 * _LANES
    x_r = zs_r.T.reshape(n2, ct).T       # [ct, N2] natural k2 order
    x_i = zs_i.T.reshape(n2, ct).T
    if sparse:
        # middle tiles fetch slot 0 but multiply by 0 (their bins are
        # all zero in W); tiles 0 / last apply their slot's m*W
        ind = jnp.where((c2 == 0) | (c2 == last),
                        jnp.float32(1), jnp.float32(0))
        mr = means[s, 0]
        mi = means[s, 1]
        a = (mr * mwr[0] - mi * mwi[0]) * ind     # Re(m*W) at W's bins
        b = (mr * mwi[0] + mi * mwr[0]) * ind     # Im(m*W)
        x_r = x_r - a
        x_i = x_i - b
    part = x_r * x_r + x_i * x_i

    @pl.when(s == 0)
    def _():
        acc_out[:] = jnp.zeros_like(acc_out)

    acc_out[:] += part


def _stageB_fft_kernel(*refs, r1: int, ct: int, nc: int):
    dr_ref, di_ref, wr, wi = refs[:4]
    consts = refs[4:4 + nc]
    yr_out, yi_out = refs[4 + nc:6 + nc]
    xr = dr_ref[0, 0].T
    xi = di_ref[0, 0].T
    yp_r, yp_i = _FP._stage12(xr, xi, wr, wi, r1, ct)
    zs_r, zs_i = _FP._cmatmul(yp_r, yp_i, consts)
    n2 = r1 * _LANES
    yr_out[0] = zs_r.T.reshape(n2, ct).T
    yi_out[0] = zs_i.T.reshape(n2, ct).T


def _prep(re, im, n1: int, n2: int):
    re = jnp.asarray(re)
    im = jnp.asarray(im)
    if im.shape != re.shape or re.ndim not in (2, 3, 4):
        raise ValueError("expected [segments, N], [segments, n1, n2] "
                         "or [segments, n2//ct, n1, ct] planar f32 "
                         f"pair, got {re.shape} / {im.shape}")
    blocked = re.ndim == 4
    ok = ((n1 * n2,), (n1, n2), (n2 // _CT, n1, _CT))
    if re.shape[1:] not in ok:
        raise ValueError(f"segment shape {re.shape[1:]} matches none "
                         f"of N = {n1 * n2}, (n1, n2) = ({n1}, {n2}), "
                         f"blocked ({n2 // _CT}, {n1}, {_CT})")
    if not (_FP.supported(n1) and _FP.supported(n2)):
        raise ValueError(f"n1={n1}, n2={n2} must both be in "
                         "fft_pallas's supported set (256..2048)")
    if n2 % _CT:
        raise ValueError(f"n2={n2} must divide by the column tile {_CT}")
    b = re.shape[0]
    if blocked:
        # PRE-BLOCKED serving ingest [b, n2//ct, n1, ct] (x4[b, c, i,
        # l] = x3[b, i, c*ct + l]): stage A's column-slab DMAs become
        # fully contiguous reads — the producer-side half of the
        # blocked contract (ROADMAP_r5 item 2).
        return re.astype(jnp.float32), im.astype(jnp.float32), b, True
    # Prefer PRE-FACTORIZED [b, n1, n2] ingest: reshaping a [b, N]
    # array to [b, n1, n2] is an XLA RELAYOUT (different physical
    # tilings), measured ~0.7 ms hidden per 2^20 x 32 block.
    return (re.reshape(b, n1, n2).astype(jnp.float32),
            im.reshape(b, n1, n2).astype(jnp.float32), b, False)


def _stageA(re3, im3, b, n1, n2, window, means, precision, interpret,
            emit_sums: bool = False, blocked_in: bool = False):
    r1 = n1 // _LANES
    csteps = n2 // _CT
    ktiles = n1 // _CT
    windowed = window is not None
    demean = means is not None
    arrays, cspecs, nc = _const2(n1, r1, precision)
    vr, vi, ur, ui = _angle_tables(n1 * n2, n1, _CT, csteps)
    kernel = functools.partial(_stageA_kernel, r1=r1, ct=_CT, nc=nc,
                               csteps=csteps, ktiles=ktiles,
                               windowed=windowed, demean=demean,
                               emit_sums=emit_sums,
                               blocked_in=blocked_in)
    # 1-D grid g = segment*csteps + tile; the x planes and the D'
    # outputs stay in ANY memory and move through the kernel's manual
    # DMA rings (see the kernel docstring for the measured win).
    in_specs = (
        [pl.BlockSpec(memory_space=pl.ANY)] * 2
        + cspecs
        + [pl.BlockSpec((_CT, n1), lambda g: (0, 0),
                        memory_space=pltpu.VMEM)] * 2     # V
        # U rows, 8-sublane broadcast to satisfy the (8, 128) block
        # tiling floor (the kernel reads sublane 0 only)
        + [pl.BlockSpec((1, 8, n1), lambda g: (g % csteps, 0, 0),
                        memory_space=pltpu.VMEM)] * 2
    )
    ub = lambda a: jnp.broadcast_to(
        jnp.asarray(a)[:, None, :], (csteps, 8, n1))
    operands = [re3, im3] + arrays + [jnp.asarray(vr), jnp.asarray(vi),
                                      ub(ur), ub(ui)]
    if windowed:
        wt = np.ascontiguousarray(
            np.asarray(window, np.float32).reshape(n1, n2).T)
        in_specs.append(pl.BlockSpec((_CT, n1),
                                     lambda g: (g % csteps, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(jnp.asarray(wt))
    if demean:
        # whole [B, 2] array in SMEM; the kernel indexes by segment id
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.append(jnp.asarray(means, jnp.float32))
    out_specs = [pl.BlockSpec(memory_space=pl.ANY)] * 2
    # D' k1-tile-blocked: [seg, k1-tile, n2, ct] (see _stageA_kernel)
    out_shape = [jax.ShapeDtypeStruct((b, ktiles, n2, _CT),
                                      jnp.float32)] * 2
    if emit_sums:
        out_specs.append(pl.BlockSpec(
            (1, 1, 8, _LANES),
            lambda g: (g // csteps, g % csteps, 0, 0),
            memory_space=pltpu.VMEM))
        out_shape.append(
            jax.ShapeDtypeStruct((b, csteps, 8, _LANES), jnp.float32))
    return pl.pallas_call(
        kernel,
        grid=(b * csteps,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, n1, _CT), jnp.float32),
            pltpu.VMEM((2, n1, _CT), jnp.float32),
            pltpu.VMEM((2, _CT, n1), jnp.float32),
            pltpu.VMEM((2, _CT, n1), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2, 2, ktiles)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=b * n1 * n2 * (8 * _LANES + 8 * r1 + 16),
            bytes_accessed=(16 + (4 if windowed else 0)) * b * n1 * n2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)


def sparse_window_bins(window, n1: int, n2: int, rel_tol: float = 1e-7):
    """FFT the window on the host and return its significant bins as
    ``(ks, Wvals)`` if they all fall in the FIRST or LAST k1-tile (the
    near-DC/near-Nyquist support of every smooth periodic window:
    periodic Hann = 3 bins, Hamming = 3, Blackman = 5), else None."""
    n = n1 * n2
    Wf = np.fft.fft(np.asarray(window, np.float64))
    mag = np.abs(Wf)
    ks = np.nonzero(mag > rel_tol * mag.max())[0]
    if len(ks) > 16:
        return None
    last = n1 // _CT - 1
    for k in ks:
        tile = (int(k) % n1) // _CT
        if tile not in (0, last):
            return None
    return ks, Wf[ks]


def _sparse_masks(ks, Wvals, n1: int, n2: int):
    """Host mask planes [2, ct, n2]: slot 0 = first k1-tile's m*W
    coefficients, slot 1 = last tile's, zero elsewhere."""
    last = n1 // _CT - 1
    mr = np.zeros((2, _CT, n2), np.float32)
    mi = np.zeros((2, _CT, n2), np.float32)
    for k, wv in zip(ks, Wvals):
        k1, k2 = int(k) % n1, int(k) // n1
        slot = 0 if k1 // _CT == 0 else 1
        if k1 // _CT not in (0, last):
            raise ValueError("sparse window bin outside edge tiles")
        mr[slot, k1 % _CT, k2] = wv.real
        mi[slot, k1 % _CT, k2] = wv.imag
    return mr, mi


def psd_big_pallas_planar(re, im, n1: int, n2: int, window=None,
                          means=None, sparse_demean: bool = False,
                          precision: str = "split_bf16",
                          interpret: bool = False):
    """Sum over segments of |FFT_N((x - mean) * w)|^2, N = n1*n2.

    Args:
      re, im: float32 planes, one N-point segment per row
        (N = n1 * n2, both factors in fft_pallas's 256..2048 set), in
        any of three layouts: [segments, N], pre-factorized
        [segments, n1, n2] (avoids the boundary relayout), or
        pre-blocked [segments, n2//128, n1, 128] (the blocked serving
        contract — fully contiguous stage-A slab reads).
      window: optional host [N] f32 window (applied per segment).
      means: optional [segments, 2] f32 per-segment (re, im) means,
        subtracted before windowing — Welch's demean convention; the
        caller computes them (one XLA reduction) because stage A's
        first tile cannot see the whole segment.
      sparse_demean: demean WITHOUT the means input or its whole-input
        XLA reduction pass (~30% of the runtime at 2^20x32): by FFT
        linearity |FFT(w(x-m))|^2 = |FFT(wx) - m*W|^2, and W = FFT(w)
        of a smooth periodic window is nonzero on a few edge bins
        (periodic Hann: 3) — stage A emits per-tile raw sums (the mean
        numerator, no extra pass), stage B subtracts m*W via host mask
        planes on the two edge k1-tiles.  Requires ``window`` with
        edge-sparse spectrum (:func:`sparse_window_bins`).

        Exact in exact arithmetic, but NOT the default: the transform
        runs on the un-demeaned signal, so a large DC offset inflates
        the stage intermediates and their bf16-split rounding smears
        ~2e-6 * |m|*N energy across ALL bins (measured: a 5-sigma
        offset costs 1.4e-4 relative-to-max vs the means path's 8e-6;
        zero-mean streams measure identically).  Opt in for
        DC-blocked streams; ``means=`` is the robust default.
    Returns ``acc[N]`` float32, natural bin order: the un-normalized
    Welch numerator (divide by segments * sum(w^2) for the density).
    """
    n1, n2 = int(n1), int(n2)
    if sparse_demean and means is not None:
        raise ValueError("pass either means or sparse_demean, not both")
    sb = None
    if sparse_demean:
        if window is None:
            raise ValueError("sparse_demean requires a window")
        sb = sparse_window_bins(window, n1, n2)
        if sb is None:
            raise ValueError(
                "window spectrum is not edge-sparse; pass means= "
                "instead (see sparse_window_bins)")
    re3, im3, b, blocked_in = _prep(re, im, n1, n2)
    outs = _stageA(re3, im3, b, n1, n2, window, means, precision,
                   interpret, emit_sums=sparse_demean,
                   blocked_in=blocked_in)
    if sparse_demean:
        dr, di, sums = outs
        inv_n = jnp.float32(1.0 / (n1 * n2))
        means_dev = jnp.sum(sums[:, :, 0, 0:2], axis=1) * inv_n
    else:
        dr, di = outs
    r1b = n2 // _LANES
    last = n1 // _CT - 1
    arrays, cspecs, nc = _const2(n2, r1b, precision)
    kernel = functools.partial(_stageB_psd_kernel, r1=r1b, ct=_CT,
                               nc=nc, last=last,
                               sparse=sparse_demean)
    # blocked D': block (s, c) is a fully CONTIGUOUS [n2, ct] slab
    in_spec = pl.BlockSpec((1, 1, n2, _CT), lambda c, s: (s, c, 0, 0),
                           memory_space=pltpu.VMEM)
    in_specs = [in_spec, in_spec] + cspecs
    operands = [dr, di] + arrays
    if sparse_demean:
        mr, mi = _sparse_masks(*sb, n1, n2)
        # mask slot by tile: first tile -> 0, last -> 1 (middle tiles
        # fetch slot 0 and zero it in-kernel)
        slot_spec = pl.BlockSpec(
            (1, _CT, n2),
            lambda c, s: (jnp.where(c == last, 1, 0), 0, 0),
            memory_space=pltpu.VMEM)
        in_specs += [slot_spec, slot_spec,
                     pl.BlockSpec(memory_space=pltpu.SMEM)]
        operands += [jnp.asarray(mr), jnp.asarray(mi), means_dev]
    acc = pl.pallas_call(
        kernel,
        grid=(n1 // _CT, b),             # segment axis innermost:
        in_specs=in_specs,
        out_specs=pl.BlockSpec((_CT, n2), lambda c, s: (c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n1, n2), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=b * n1 * n2 * (8 * _LANES + 8 * r1b + 8),
            bytes_accessed=8 * b * n1 * n2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)
    # acc[k1, k2] -> natural bin k = k1 + n1*k2.
    return acc.T.reshape(n1 * n2)


def welch_numerator(re, im, window, interpret: bool = False):
    """The one shared Welch-numerator entry over this kernel: factor
    N, compute per-segment means (one fused XLA reduction over the
    planes), and return the accumulated |FFT(w(x-mean))|^2.

    Raises ValueError for N without a two-factor decomposition —
    callers gate with :func:`supported_big` or catch.  Every consumer
    (wideband's three PSD makers, ops.spectrum.welch_psd) goes
    through here so the demean/normalization convention has exactly
    one definition.
    """
    re = jnp.asarray(re)
    im = jnp.asarray(im)
    if re.ndim == 4:
        # pre-blocked [segments, n2//ct, n1, ct] ingest (the blocked
        # serving contract — contiguous stage-A slab reads).
        fac = (int(re.shape[2]), int(re.shape[1]) * int(re.shape[3]))
        axes = (1, 2, 3)
    elif re.ndim == 3:
        # pre-factorized [segments, n1, n2] ingest — the serving
        # shape; avoids the ~0.7 ms [b, N] -> [b, n1, n2] relayout.
        # _prep is the single validation point for the factor pair.
        fac = (int(re.shape[1]), int(re.shape[2]))
        axes = (1, 2)
    else:
        fac = factorize(int(re.shape[-1]))
        if fac is None:
            raise ValueError(
                f"N={re.shape[-1]} has no two-factor decomposition "
                "into 256..2048-point stages (see supported_big)")
        axes = (1,)
    means = jnp.stack([jnp.mean(re, axis=axes),
                       jnp.mean(im, axis=axes)], -1)
    return psd_big_pallas_planar(re, im, fac[0], fac[1], window=window,
                                 means=means, interpret=interpret)


def fft_big_pallas_planar(re, im, n1: int, n2: int,
                          precision: str = "split_bf16",
                          interpret: bool = False):
    """Batched N-point FFT (N = n1*n2) of planar f32 rows.

    Returns ``(yr, yi)`` [segments, N] float32, natural bin order.
    Same machinery as :func:`psd_big_pallas_planar` without the
    squared-accumulate (stage B writes spectra instead).
    """
    n1, n2 = int(n1), int(n2)
    re3, im3, b, blocked_in = _prep(re, im, n1, n2)
    dr, di = _stageA(re3, im3, b, n1, n2, None, None, precision,
                     interpret, blocked_in=blocked_in)
    r1b = n2 // _LANES
    arrays, cspecs, nc = _const2(n2, r1b, precision)
    kernel = functools.partial(_stageB_fft_kernel, r1=r1b, ct=_CT,
                               nc=nc)
    # blocked D' (see _stageA_kernel): contiguous [n2, ct] per block
    in_spec = pl.BlockSpec((1, 1, n2, _CT), lambda s, c: (s, c, 0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, _CT, n2), lambda s, c: (s, c, 0),
                            memory_space=pltpu.VMEM)
    yr, yi = pl.pallas_call(
        kernel,
        grid=(b, n1 // _CT),
        in_specs=[in_spec, in_spec] + cspecs,
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((b, n1, n2), jnp.float32)] * 2,
        cost_estimate=pl.CostEstimate(
            flops=b * n1 * n2 * (8 * _LANES + 8 * r1b),
            bytes_accessed=24 * b * n1 * n2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(dr, di, *arrays)
    # y[k1, k2] -> natural k = k1 + n1*k2 per segment.
    n = n1 * n2
    return (jnp.swapaxes(yr, 1, 2).reshape(b, n),
            jnp.swapaxes(yi, 1, 2).reshape(b, n))
