"""Fused Pallas TPU kernel: channelize + FM-demod + audio FIR, ONE pass.

The band monitor (models/fm_band_monitor.py — K parallel FM receivers
on a polyphase channelizer; the composition BASELINE's channelizer
config exists for, no single reference file) composed three
individually kernel-backed stages and still held at ~2.5 Gsps for any
K: XLA materializes the full spectrum between channelize, demod and
the audio FIR (docs/PERF.md, measured lesson 16 — past a point only
stage FUSION moves a model row).  This kernel runs the whole chain in
one Mosaic pass, so the ONLY HBM traffic is the input read and the
(K*dec):1-decimated audio write (~8.1 B per complex input sample):

  input planes ─ polyphase branch MACs + block-diag DFT matmul
    (shared with channelizer_pallas via _ingest/_chan_compute)
  ─► packed spectrum tiles [128, 128] — kept in VMEM, never written
  ─► lag-1 product per channel (one-frame-retreat lane roll) +
     degree-15 polynomial atan2 (fm_chain_pallas._atan2, 8.8e-8 rad)
  ─► decimating audio FIR as ONE left matmul against KPR
     frame-advanced views of the phase-diff slab (see _audio_mats)
  ─► packed audio [128/dec, 128] per grid step.

Streaming state: the input tail (CTX_SAMPLES, as the channelizer) plus
the trailing ``halo_rows`` packed spectrum rows — the demod lag and
the audio FIR's look-back are recomputed from carried *spectrum*, so
block boundaries are exact (same contract as the fused FM chain's
raw-tail recompute, models/fm_receiver.py).

Audio-FIR-as-matmul: with KPR = 128/K frames packed per row, output
audio sample t = r_out*KPR + jj (packed row r_out, lane slot jj)
needs phase-diff frames t*dec - m.  COMPOSITE views whose lane slot
jj is advanced by jj*(dec-1) + q frames make the contraction row for
tap m independent of jj (r*KPR + q = ro*KPR*dec - m), so ONE
[R_out, KPR*Rext] left matmul lands correct in every lane slot at
once — no slot stacking, no output select (docs/PERF.md measured
lesson 17; the earlier slot-stacked form cost KPR x the MACs).

Parity oracle: models.fm_band_monitor._planar_core with
fast_demod=True (tests/test_band_monitor_pallas.py, interpret mode;
compiled on hardware via bench/verify).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from comms_tpu.ops import fir as _fir
from comms_tpu.kernels._bf16 import (
    device_split as _bsplit,
    dot3 as _dot3,
    host_split as _hsplit,
)
from comms_tpu.kernels.channelizer_pallas import (
    CTX_SAMPLES,
    _HALO,
    _LANES,
    _ROWS,
    _chan_compute,
    _dft_mats,
    _ingest,
    step_samples,
)
from comms_tpu.kernels.fm_chain_pallas import _atan2

__all__ = ["band_monitor_pallas_planar", "halo_rows", "zero_spec_halo",
           "CTX_SAMPLES", "step_samples"]


def halo_rows(num_channels: int, audio_taps_len: int) -> int:
    """Carried packed-spectrum rows: the audio FIR reaches back
    taps-1 frames, the demod lag one more, and every look-back must
    stay row-nonnegative in ALL KPR lane slots (worst slot adds
    KPR-1 frames), so the halo covers ceil((taps-1+KPR)/KPR) rows,
    rounded up to the 8-row f32 alignment quantum."""
    kpr = _LANES // int(num_channels)
    need = -(-(int(audio_taps_len) - 1 + kpr) // kpr)
    return max(8, -(-need // 8) * 8)


def zero_spec_halo(num_channels: int, audio_taps_len: int):
    """Stream-start spectrum-halo planes (pair of [halo_rows, 128])."""
    h = halo_rows(num_channels, audio_taps_len)
    z = jnp.zeros((h, _LANES), jnp.float32)
    return z, z


def _audio_mats(taps: np.ndarray, k: int, dec: int):
    """Host-side [R_out, KPR*Rext] left-matmul coefficients for the
    decimating audio FIR ``a[t] = sum_m h[m] d[t*dec - m]``
    (fir.fir_decimate_poly's convention) over KPR COMPOSITE views of
    the [Rext, 128] phase-diff slab.

    Composite view q advances lane slot jj by ``jj*(dec-1) + q``
    frames, i.e. ``comp_q[r, c + K*jj] = d[frame r*KPR + jj*dec + q]``
    — the slot-dependent stretch makes the row index needed for output
    slot jj INDEPENDENT of jj (r*KPR + q = ro*KPR*dec - m), so one
    [R_out, 128] matmul output is correct in EVERY lane slot at once.
    The earlier slot-stacked form computed KPR*R_out rows and selected
    each group's own slot: KPR x the MACs for the same answer (8x at
    K=16).  f64; caller splits to bf16 hi/lo."""
    kpr = _LANES // k
    T = int(taps.shape[0])
    hrows = halo_rows(k, T)
    rext = hrows + _ROWS
    hframes = hrows * kpr
    frames = _ROWS * kpr
    r_audio = frames // dec
    r_out = r_audio // kpr
    A = np.zeros((r_out, kpr * rext), np.float64)
    for ro in range(r_out):
        for m in range(T):
            q = (hframes - m) % kpr
            r = (ro * kpr * dec - m + hframes - q) // kpr
            assert 0 <= r < rext, (ro, m, q, r)
            A[ro, q * rext + r] += float(taps[m])
    return A, hrows, r_out


def _kernel(xr_hbm, xi_hbm, cr_hbm, ci_hbm, c2, yh_r, yh_i,
            *rest, M: int, k: int, mode: str, hrows: int, r_out: int,
            dec: int, _skip: str = ""):
    nmats = 6 if mode == "split" else 2
    mats = rest[:nmats]
    ah, al = rest[nmats:nmats + 2]
    (audio_out, yh_r_out, yh_i_out,
     slab_r, slab_i, Yr, Yi, sem) = rest[nmats + 2:]
    g = pl.program_id(0)
    kpr = _LANES // k
    rext = hrows + _ROWS

    slot = _ingest(xr_hbm, xi_hbm, cr_hbm, ci_hbm, slab_r, slab_i, sem)
    yr_t, yi_t = _chan_compute(slab_r[slot], slab_i[slot], c2, mats,
                               M=M, k=k, mode=mode)

    # ---- spectrum slab: rows [0, hrows) carry the previous step's
    # tail (the carried-state operand at g == 0), then this step's
    # fresh packed spectrum.
    @pl.when(g == 0)
    def _():
        Yr[0:hrows, :] = yh_r[:]
        Yi[0:hrows, :] = yh_i[:]

    Yr[hrows:rext, :] = yr_t
    Yi[hrows:rext, :] = yi_t

    yr_s = Yr[:]
    yi_s = Yi[:]

    # ---- FM demod over the WHOLE slab (halo rows recompute their
    # phase diffs — ~hrows/128 redundant VPU work, which is what makes
    # the carried state a plain spectrum tail).  One-frame retreat =
    # K-lane retreat with a previous-row borrow on the wrapped slot.
    lanes = jax.lax.broadcasted_iota(jnp.int32, (rext, _LANES), 1)
    rr = pltpu.roll(yr_s, k, 1)          # [r, l] = y[r, (l-k) % 128]
    ri = pltpu.roll(yi_s, k, 1)
    wrap = lanes < k
    pr = jnp.where(wrap, pltpu.roll(rr, 1, 0), rr)
    pi = jnp.where(wrap, pltpu.roll(ri, 1, 0), ri)
    dotp = yr_s * pr + yi_s * pi
    cross = yi_s * pr - yr_s * pi
    if _skip == "atan2":
        d = cross - dotp
    elif _skip == "demod":
        d = yr_s
    else:
        d = _atan2(cross, dotp)          # [rext, 128] phase diffs
    # Slab frame 0 has no predecessor (wraps to the slab's last row);
    # the audio matrices never read it (hframes >= taps), but keep the
    # slab NaN-free by construction anyway.
    d = jnp.where((jax.lax.broadcasted_iota(
        jnp.int32, (rext, _LANES), 0) == 0) & wrap, jnp.float32(0), d)

    # ---- decimating audio FIR (one composite-view matmul).
    if _skip == "audio":
        audio_out[:] = d[:r_out, :]
        yh_r_out[:] = Yr[_ROWS:rext, :]
        yh_i_out[:] = Yi[_ROWS:rext, :]
        Yr[0:hrows, :] = Yr[_ROWS:rext, :]
        Yi[0:hrows, :] = Yi[_ROWS:rext, :]
        return
    # Composite views (see _audio_mats): comp_q advances lane slot jj
    # by jj*(dec-1) + q frames, built from memoized uniform advances.
    # The composite structure makes ONE [r_out, kpr*rext] x
    # [kpr*rext, 128] matmul correct in every lane slot — no slot
    # stacking, no output select.  This stage is the kernel's
    # VPU-pass budget (measured 42% of the K=16 runtime), so the
    # builders share aggressively:
    #   * lane rolls memoized by la and row rolls by (la, shift) —
    #     advances with equal la mod 128 differ only in row shift;
    #   * comp_{q+dec} IS comp_q advanced one lane slot:
    #     comp_q[r, slot jj] holds frame r*kpr + jj*dec + q, so
    #     slot jj+1 holds frame (r*kpr + jj*dec + q) + dec — one
    #     k-lane retreat roll with a +dec-row borrow on the wrapped
    #     slot replaces kpr-1 slot selects.
    lane_rolled: dict = {}
    row_rolled: dict = {}
    bases: dict = {}

    def x1_of(la):
        if la not in lane_rolled:
            lane_rolled[la] = (d if la == 0
                               else pltpu.roll(d, _LANES - la, 1))
        return lane_rolled[la]

    def x1row(la, s):
        if (la, s) not in row_rolled:
            x1 = x1_of(la)
            row_rolled[(la, s)] = (x1 if s == 0
                                   else pltpu.roll(x1, rext - s, 0))
        return row_rolled[(la, s)]

    def base(a):
        if a not in bases:
            la = (k * a) % _LANES
            sa = (k * a) // _LANES
            if la == 0:
                bases[a] = x1row(0, sa)
            else:
                bases[a] = jnp.where(lanes < _LANES - la,
                                     x1row(la, sa), x1row(la, sa + 1))
        return bases[a]

    comps = []
    for q in range(kpr):
        if q >= dec and kpr > dec:
            prev = comps[q - dec]
            # one-slot retreat: lanes move down k; the top slot
            # (kpr-1) borrows slot 0 of the row dec further on.
            moved = pltpu.roll(prev, _LANES - k, 1)
            borrow = pltpu.roll(moved, rext - dec, 0)
            comp = jnp.where(lanes < _LANES - k, moved, borrow)
        else:
            comp = base(q)                       # slot 0
            for jj in range(1, kpr):
                sel = (lanes >= jj * k) & (lanes < (jj + 1) * k)
                comp = jnp.where(sel, base(jj * (dec - 1) + q), comp)
        comps.append(comp)
    v = comps[0] if kpr == 1 else jnp.concatenate(comps, axis=0)
    if _skip == "dot":   # probe: views built, split+matmul skipped
        audio_out[:] = v[:r_out, :]
    else:
        vh, vl = _bsplit(v)
        audio_out[:] = _dot3(ah[:], al[:], vh, vl)   # [r_out, 128]

    # ---- next-step halo: this step's trailing rows (no overlap with
    # [0, hrows) since _ROWS > hrows); also emitted as the carried
    # state (every step writes, the last write is the block tail).
    yh_r_out[:] = Yr[_ROWS:rext, :]
    yh_i_out[:] = Yi[_ROWS:rext, :]
    Yr[0:hrows, :] = Yr[_ROWS:rext, :]
    Yi[0:hrows, :] = Yi[_ROWS:rext, :]


def band_monitor_pallas_planar(re, im, prototype, audio_taps,
                               audio_dec: int, ctx_re, ctx_im,
                               spec_halo_re, spec_halo_im,
                               num_channels: int,
                               mode: str = "split",
                               interpret: bool = False,
                               _skip: str = ""):
    """Fused band monitor step on planes.

    Args:
      re, im: [N] float32 wideband input planes,
        N % step_samples() == 0.
      prototype: length K*M real channelizer lowpass (M <= 16), host.
      audio_taps: [T] real audio FIR taps (host),
        T <= 31 * (128 // K) + 1.
      audio_dec: per-channel audio decimation; must divide 128 and be
        <= 16.
      ctx_re, ctx_im: [CTX_SAMPLES] carried input-tail planes.
      spec_halo_re/_im: [halo_rows(K, T), 128] carried packed-spectrum
        tail planes (:func:`zero_spec_halo` at stream start).
      num_channels: K, dividing 128.

    Returns ``(audio[N // K // audio_dec, K], new_ctx_re, new_ctx_im,
    new_spec_halo_re, new_spec_halo_im)`` — audio frames-major; the
    model transposes to its [K, frames] contract.
    """
    re = jnp.asarray(re)
    im = jnp.asarray(im)
    k = int(num_channels)
    dec = int(audio_dec)
    if k < 2 or _LANES % k:
        raise ValueError(f"num_channels {k} must divide 128")
    h = np.asarray(prototype, np.float64)
    if h.shape[0] % k:
        raise ValueError(f"prototype length must be a multiple of {k}")
    M = h.shape[0] // k
    if M > 16:
        raise ValueError(f"taps_per_branch {M} > 16 unsupported")
    if k * M > _HALO * _LANES + 1:
        raise ValueError(
            f"prototype length {k * M} exceeds the {_HALO * _LANES}-"
            "sample halo zone")
    at = np.asarray(audio_taps, np.float64)
    kpr = _LANES // k
    if dec < 2 or _LANES % dec or dec > 16:
        raise ValueError(
            f"audio_dec {dec} must divide 128 and be in [2, 16]")
    if at.shape[0] > 31 * kpr + 1:
        raise ValueError(
            f"audio taps {at.shape[0]} > {31 * kpr + 1} unsupported "
            f"(spectrum halo caps at 32 rows)")
    if mode not in ("split", "highest"):
        raise ValueError(f"mode must be 'split'/'highest', got {mode!r}")
    N = re.shape[0]
    if N % step_samples():
        raise ValueError(f"N {N} must be a multiple of {step_samples()}")
    steps = N // step_samples()

    C = _fir.decimating_branch_taps(h, k).astype(np.float32)
    c2 = np.concatenate([C] * kpr, axis=1)                 # [M, 128]
    fr, fi = _dft_mats(k)
    if mode == "split":
        fmats = (list(_hsplit(np.asarray(fr, np.float64)))
                 + list(_hsplit(np.asarray(fi, np.float64)))
                 + list(_hsplit(np.asarray(fr, np.float64)
                                + np.asarray(fi, np.float64))))
    else:
        fmats = [jnp.asarray(fr), jnp.asarray(fi)]
    A, hrows, r_out = _audio_mats(at, k, dec)
    ah, al = _hsplit(A)

    ctx_re = jnp.asarray(ctx_re)
    ctx_im = jnp.asarray(ctx_im)
    if ctx_re.shape[0] != CTX_SAMPLES:
        raise ValueError(f"ctx must be {CTX_SAMPLES} samples")
    spec_halo_re = jnp.asarray(spec_halo_re)
    spec_halo_im = jnp.asarray(spec_halo_im)
    if spec_halo_re.shape != (hrows, _LANES):
        raise ValueError(
            f"spec halo must be [{hrows}, {_LANES}] for K={k}, "
            f"taps={at.shape[0]} — got {spec_halo_re.shape}")
    new_ctx_re = re[-CTX_SAMPLES:]
    new_ctx_im = im[-CTX_SAMPLES:]

    rext = hrows + _ROWS
    kernel = functools.partial(_kernel, M=M, k=k, mode=mode,
                               hrows=hrows, r_out=r_out, dec=dec,
                               _skip=_skip)
    nmats = len(fmats)
    audio, nh_r, nh_i = pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((16, _LANES), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hrows, _LANES), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hrows, _LANES), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec((_LANES, _LANES), lambda g: (0, 0),
                          memory_space=pltpu.VMEM)
             for _ in range(nmats)]
        + [pl.BlockSpec((r_out, kpr * rext), lambda g: (0, 0),
                        memory_space=pltpu.VMEM)
           for _ in range(2)],
        out_specs=[
            pl.BlockSpec((r_out, _LANES), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hrows, _LANES), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hrows, _LANES), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((steps * r_out, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((hrows, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((hrows, _LANES), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, _ROWS + _HALO, _LANES), jnp.float32),
            pltpu.VMEM((2, _ROWS + _HALO, _LANES), jnp.float32),
            pltpu.VMEM((rext, _LANES), jnp.float32),
            pltpu.VMEM((rext, _LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((3, 2)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=steps * _ROWS * _LANES
            * (4 * M + 4 * _LANES * 3 + 40)
            + steps * r_out * kpr * rext * _LANES * 6,
            bytes_accessed=8 * N + 4 * (N // k // dec) * k,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        re.reshape(-1, _LANES), im.reshape(-1, _LANES),
        ctx_re.reshape(_HALO, _LANES),
        ctx_im.reshape(_HALO, _LANES),
        jnp.asarray(np.pad(c2, ((0, 16 - M), (0, 0)))),
        spec_halo_re, spec_halo_im,
        *fmats,
        jnp.asarray(ah), jnp.asarray(al),
    )
    return audio.reshape(-1, k), new_ctx_re, new_ctx_im, nh_r, nh_i
