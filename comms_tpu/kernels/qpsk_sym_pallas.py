"""Fused Pallas TPU kernel: the QPSK receiver's symbol path.

One pass over the raw f32 IQ planes computes the complex-tap
decimating GEMM (matched filter x Lagrange interpolator x carrier
modulation, folded into one traced tap vector by
``models/qpsk_rx._fused_symbol_gemm``) AND the symbol-rate carrier
de-rotation, with streaming context handled natively:

    y[s] = e^{-j(phase0 + ws*(s+1))} *
           sum_t (fr + j*fi)[t] * (xr + j*xi)[4*(s+1) - t]

i.e. exactly ``fir_decimate_traced_planar_complex`` (causal backward
window, MD-1-sample carried head context) followed by
``mixer.derotate_traced_planar`` and the callers' ``[1:]``
artifact-frame drop — but the planes are read from HBM ONCE and the
full-rate intermediates never exist.  The XLA formulation reads each
plane twice per band piece per tap vector (the [R, 512] window
operands cannot be shared across the four real GEMMs), measured
3.1 ms at 33.5M samples on v5e; this kernel's floor is one read +
the symbol write, ~0.7 ms.

Layout (mirrors ``fm_chain_pallas``, decimation 4 instead of 5):

* planes viewed as [N/512, 512] rows — the decimate-by-4 window
  advances exactly one row per 128 outputs, so the two window pieces
  per output row are stride-1 row slices (prev row's last 128 lanes +
  the full current row), which Mosaic lowers without relayouts;
* the interpolator is 4 samples NON-CAUSAL relative to the symbol
  grid (window tip = 4s + 4): output lane 127 needs lane 0 of the
  NEXT row, handled by a [R, 1] column term (only tap t=0 can land
  there), with a one-row DMA lookahead per grid step (zeroed on the
  last step — the XLA path's ``tail_zeros``);
* band matrices are TRACED (the taps fold data-dependent estimates),
  built by one tiny XLA gather per dispatch and passed as [.,128]
  VMEM operands;
* the de-rotation phase phase0 + ws*(s+1) is decomposed per
  step/row/lane (each partial product stays < ~2.5e3 rad) so its f32
  error stays ~1e-4 rad at 33.5M samples — tighter than the XLA
  path's single freq*128*arange(rows) product;
* input DMAs are double-buffered (two [272, 512] slabs per plane);
  the backward halo row is carried slab-to-slab in VMEM, so no input
  row is read from HBM twice (except the 8-row lookahead overlap,
  8/256 of the traffic).  DMA offsets/extents stay at f32-tile
  multiples (8 rows) — Mosaic rejects misaligned memref slices — so
  the halo zones are 8 rows each and the odd offsets (7, 9) live
  only in compute-side slices.

Reference parity: this is the TPU-native form of the reference's
matched filter + interpolator + NCO chain
(``/root/reference/src/filter/fir.rs``,
``src/demodulation/timing_estimator.rs``, ``src/demodulation/nco.rs``)
fused at symbol rate.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["qpsk_symbol_gemm", "qpsk_symbol_gemm_scalars",
           "qpsk_panels", "kernel_ok", "IN_PER_STEP", "SPS"]

_LANES = 128
_ROWW = 512                    # 4 * 128: one-row window advance
_R = 512                       # output rows per grid step
IN_PER_STEP = _R * _ROWW       # 131072 input samples / step
SPS = 4
_MD_MAX = 132                  # piece-A back-reach bound (see _bands)
_HB = 8                        # backward-halo rows (f32 tile height;
_HF = 8                        # only row _HB-1 / row _HB+_R are used)
_SKIP = None                   # dev probe: "derot" | "dot" skip stages


def kernel_ok(n: int, md: int, sps: int) -> bool:
    """Static applicability: decimation 4 (the lane math), block a
    multiple of IN_PER_STEP, taps within the band's back-reach."""
    return sps == SPS and n % IN_PER_STEP == 0 and 1 <= md <= _MD_MAX


def _bands(flat):
    """Traced band pieces for tip-at-4j+4 windows on [., 512] rows:

      piece A (prev row, lanes 384:512): BA[w, j] = flat[132 + 4j - w]
      piece B (current row, all lanes):  BB[w, j] = flat[4j + 4 - w]

    (out-of-range -> 0 via the appended-sentinel gather, as
    ``fir._traced_band_setup``).  Tap t = 0 at j = 127 falls on the
    NEXT row's lane 0 — excluded here, applied as the column term."""
    flat = jnp.asarray(flat, jnp.float32)
    md = int(flat.shape[0])
    if md > _MD_MAX:
        raise ValueError(f"flat taps {md} exceed band back-reach "
                         f"{_MD_MAX}")
    flat_e = jnp.concatenate([flat, jnp.zeros((1,), flat.dtype)])
    j = np.arange(_LANES)[None, :]
    wa = np.arange(_LANES)[:, None]
    ta = 132 + 4 * j - wa
    ia = np.where((ta >= 0) & (ta < md), ta, md)
    wb = np.arange(_ROWW)[:, None]
    tb = 4 * j + 4 - wb
    ib = np.where((tb >= 0) & (tb < md), tb, md)
    return flat_e[jnp.asarray(ia)], flat_e[jnp.asarray(ib)]


def _mf_shift_rows(mf_taps: np.ndarray) -> np.ndarray:
    """Host [16, 128] rows MS[s, m] = mf[m - s] (s in [0, 12); the
    rest zero) — the 12 static shifts the in-kernel tap build selects
    among (t0 + j with t0 = shift2 + 4 in [0, 8], j in [0, 4))."""
    mf = np.asarray(mf_taps, np.float64)
    T = mf.shape[0]
    MS = np.zeros((16, _LANES), np.float32)
    for s in range(12):
        MS[s, s:s + T] = mf.astype(np.float32)
    return MS


def _build_bands_inkernel(msrows, scal_f, scal_i, md: int):
    """Tap + band construction from SMEM scalars, Mosaic-safe ops
    only (scalar selects, [1, 128] row FMAs, transcendentals,
    iota-masked accumulation): returns (ba_r, bb_r, ba_i, bb_i,
    fr0, fi0) — the same values ``_bands(modulated_taps(...))``
    produces in XLA, computed once at grid step 0 (round 5: the
    ~12-fusion XLA tap chain costs ~0.35 ms/block of per-fusion
    scheduling on this runtime, docs/PERF.md)."""
    w = scal_f[0]
    t0i = scal_i[0] + jnp.int32(SPS)
    # flat = conv(lagrange-at-t0, mf), as 12 static-shift rows with
    # runtime 0/1 coefficients a_s = sum_j lag_j * [t0 + j == s]
    flat = jnp.zeros((1, _LANES), jnp.float32)
    for s in range(12):
        a_s = jnp.float32(0.0)
        for j in range(4):
            a_s = a_s + scal_f[1 + j] * jnp.where(
                t0i == jnp.int32(s - j), jnp.float32(1.0),
                jnp.float32(0.0))
        flat = flat + a_s * msrows[s:s + 1, :]
    lanes1 = lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
    tvec = lanes1.astype(jnp.float32)
    fr_row = flat * jnp.cos(w * tvec)
    fi_row = flat * jnp.sin(w * tvec)

    def lane_val(row, m):
        # [1, 128] lane-replicated: Mosaic rejects [1, 1] -> [R, 128]
        # broadcasts ("both sublanes and lanes"); staging through a
        # lanes-only broadcast keeps every later broadcast
        # sublane-only.
        v = jnp.sum(jnp.where(lanes1 == m, row, 0.0), keepdims=True)
        return jnp.broadcast_to(v, (1, _LANES))

    ja = lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 1)
    wa = lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 0)
    ta = 132 + 4 * ja - wa
    jb = lax.broadcasted_iota(jnp.int32, (_ROWW, _LANES), 1)
    wb = lax.broadcasted_iota(jnp.int32, (_ROWW, _LANES), 0)
    tb = 4 * jb + 4 - wb
    ba_r = jnp.zeros((_LANES, _LANES), jnp.float32)
    ba_i = jnp.zeros((_LANES, _LANES), jnp.float32)
    bb_r = jnp.zeros((_ROWW, _LANES), jnp.float32)
    bb_i = jnp.zeros((_ROWW, _LANES), jnp.float32)
    for m in range(md):
        fr_m = lane_val(fr_row, m)
        fi_m = lane_val(fi_row, m)
        ba_r = ba_r + jnp.where(ta == m, fr_m, 0.0)
        ba_i = ba_i + jnp.where(ta == m, fi_m, 0.0)
        bb_r = bb_r + jnp.where(tb == m, fr_m, 0.0)
        bb_i = bb_i + jnp.where(tb == m, fi_m, 0.0)
    return (ba_r, bb_r, ba_i, bb_i,
            lane_val(fr_row, 0), lane_val(fi_row, 0))


def _make_kernel(steps: int, precision, panels_hw: int = 0,
                 block_n: int = 0, sym_on: bool = True,
                 inkernel_taps: bool = False, md_flat: int = 0):
    """``panels_hw > 0`` additionally accumulates the raw correlation
    panels of ``demodulation.TimingEstimator.corr_panels`` (same
    zero-pad semantics) into two extra [256, 256] outputs — the fused
    stream-step form (VERDICT r4 item 2): symbol GEMM and panels in
    ONE pass over the planes, so the receiver's two full-rate stages
    share a single kernel and each input row is read from HBM once.
    ``sym_on=False`` (panels only) drops the symbol GEMM/outputs —
    the one-shot receiver's panel stage.  ``inkernel_taps`` replaces
    the band/base/consts operands with (mf shift rows, SMEM scalars)
    and builds the bands in VMEM scratch at step 0."""
    do_panels = panels_hw > 0
    if do_panels and not (0 < panels_hw <= 64):
        raise ValueError(f"panels_hw must be in (0, 64], got {panels_hw}")
    if not (sym_on or do_panels):
        raise ValueError("nothing to compute")

    def _kernel(*refs):
        sr_out = si_out = p13_out = p24_out = None
        if inkernel_taps:
            nout = (2 if sym_on else 0) + (2 if do_panels else 0)
            (xr_hbm, xi_hbm, ctx_re, ctx_im, msrows, scal_f,
             scal_i) = refs[:7]
            outs = refs[7:7 + nout]
            if sym_on:
                sr_out, si_out = outs[0], outs[1]
                if do_panels:
                    p13_out, p24_out = outs[2], outs[3]
            else:
                p13_out, p24_out = outs[0], outs[1]
            (slab_re, slab_im, bar_s, bbr_s, bai_s, bbi_s, fcol_s,
             sem) = refs[7 + nout:]
        elif do_panels and sym_on:
            (xr_hbm, xi_hbm, ctx_re, ctx_im, ba_r, bb_r, ba_i, bb_i,
             base, consts, sr_out, si_out, p13_out, p24_out,
             slab_re, slab_im, sem) = refs
        elif do_panels:
            (xr_hbm, xi_hbm, ctx_re, ctx_im, ba_r, bb_r, ba_i, bb_i,
             base, consts, p13_out, p24_out,
             slab_re, slab_im, sem) = refs
        else:
            (xr_hbm, xi_hbm, ctx_re, ctx_im, ba_r, bb_r, ba_i, bb_i,
             base, consts, sr_out, si_out, slab_re, slab_im, sem) = refs
        g = pl.program_id(0)
        n = pl.num_programs(0)
        slot = lax.rem(g, jnp.int32(2))

        if inkernel_taps and sym_on:
            @pl.when(g == 0)
            def _():
                b = _build_bands_inkernel(msrows, scal_f, scal_i,
                                          md_flat)
                bar_s[:] = b[0]
                bbr_s[:] = b[1]
                bai_s[:] = b[2]
                bbi_s[:] = b[3]
                fcol_s[0:1, :] = b[4]
                fcol_s[1:2, :] = b[5]

        def issue(step, s, op):
            getattr(pltpu.make_async_copy(
                xr_hbm.at[pl.ds(step * _R, _R), :],
                slab_re.at[s, pl.ds(_HB, _R), :], sem.at[s, 0]), op)()
            getattr(pltpu.make_async_copy(
                xi_hbm.at[pl.ds(step * _R, _R), :],
                slab_im.at[s, pl.ds(_HB, _R), :], sem.at[s, 1]), op)()

        def issue_look(step, s, op):
            # the forward halo (lane 127's t=0 tap needs the next
            # row's lane 0) — an aligned 8-row tile, of which only
            # the first row is read
            getattr(pltpu.make_async_copy(
                xr_hbm.at[pl.ds((step + 1) * _R, _HF), :],
                slab_re.at[s, pl.ds(_HB + _R, _HF), :],
                sem.at[s, 2]), op)()
            getattr(pltpu.make_async_copy(
                xi_hbm.at[pl.ds((step + 1) * _R, _HF), :],
                slab_im.at[s, pl.ds(_HB + _R, _HF), :],
                sem.at[s, 3]), op)()

        @pl.when(g == 0)
        def _():
            issue(0, 0, "start")
            # stream context row: [zeros ++ ctx(MD-1)] from the wrapper
            slab_re[0, _HB - 1, :] = ctx_re[0, :]
            slab_im[0, _HB - 1, :] = ctx_im[0, :]

            @pl.when(n > 1)
            def _():
                issue_look(0, 0, "start")

        issue(g, slot, "wait")

        @pl.when(g < n - 1)
        def _():
            issue_look(g, slot, "wait")

        @pl.when(g == n - 1)
        def _():
            # last step: the lookahead row is past the block's end —
            # the XLA path's tail_zeros (only its lane 0 is read).
            slab_re[slot, _HB + _R, :] = jnp.zeros((_ROWW,), jnp.float32)
            slab_im[slot, _HB + _R, :] = jnp.zeros((_ROWW,), jnp.float32)

        @pl.when(g + 1 < n)
        def _():
            # backward-halo carry BEFORE the next DMA lands (the DMA
            # writes rows >= _HB only, so no conflict with row _HB-1)
            slab_re[1 - slot, _HB - 1, :] = slab_re[slot, _HB - 1 + _R, :]
            slab_im[1 - slot, _HB - 1, :] = slab_im[slot, _HB - 1 + _R, :]
            issue(g + 1, 1 - slot, "start")

            @pl.when(g + 2 < n)
            def _():
                issue_look(g + 1, 1 - slot, "start")

        if do_panels:
            hw = panels_hw
            RV = 4 * _R                 # 128-lane V rows per step
            nb = (_R + 2) * 4           # 128-lane rows of the B view

            def prep(slab):
                # B: slab as 128-lane rows from one 512-row BEFORE the
                # step (the backward halo row), flat-shifted left by
                # hw: RB[rr, j] = flat[128*(rr-4) + j - hw].  Both
                # window pieces are then plain row slices of RB
                # (their offsets -hw and -hw+128 share one lane
                # remainder — the channelizer's hoisted-roll trick).
                B = slab[slot, _HB - 1:_HB + _R + 1, :].reshape(
                    nb, _LANES)
                A = pltpu.roll(B, hw, 1)
                Ar = pltpu.roll(A, 1, 0)
                lanes2 = lax.broadcasted_iota(jnp.int32, (nb, _LANES), 1)
                return jnp.where(lanes2 >= hw, A, Ar)

            RBr = prep(slab_re)
            RBi = prep(slab_im)
            rows_v = lax.broadcasted_iota(jnp.int32, (RV, _LANES), 0)
            lanes_v = lax.broadcasted_iota(jnp.int32, (RV, _LANES), 1)
            sidx = (g * jnp.int32(IN_PER_STEP)
                    + _LANES * rows_v + lanes_v)
            # V rows zero-padded past K = N - hw; W left-pad (idx < 0)
            # zeroed — exactly corr_panels' pad semantics (the slab's
            # backward row holds the SYMBOL context, which the
            # standalone panels must not see).
            vmask = (sidx < jnp.int32(block_n - hw)).astype(jnp.float32)
            wmask0 = (sidx - jnp.int32(hw) >= 0).astype(jnp.float32)
            Vr = slab_re[slot, _HB:_HB + _R, :].reshape(RV, _LANES)
            Vi = slab_im[slot, _HB:_HB + _R, :].reshape(RV, _LANES)
            V2 = jnp.concatenate([Vr * vmask, Vi * vmask], axis=1)
            V2t = V2.T                  # [256, RV]
            parts13, parts24 = [], []
            for p in (0, 1):
                Wr = RBr[4 + p:4 + p + RV, :]
                Wi = RBi[4 + p:4 + p + RV, :]
                if p == 0:
                    Wr = Wr * wmask0
                    Wi = Wi * wmask0
                parts13.append(jnp.dot(
                    V2t, Wr, preferred_element_type=jnp.float32,
                    precision=precision))
                parts24.append(jnp.dot(
                    V2t, Wi, preferred_element_type=jnp.float32,
                    precision=precision))
            part13 = jnp.concatenate(parts13, axis=1)   # [256, 256]
            part24 = jnp.concatenate(parts24, axis=1)

            @pl.when(g == 0)
            def _():
                p13_out[:] = jnp.zeros_like(p13_out)
                p24_out[:] = jnp.zeros_like(p24_out)

            p13_out[:] += part13
            p24_out[:] += part24

        if not sym_on:
            return

        def dots(sa, sb, ba, bb):
            return (jnp.dot(sa, ba, preferred_element_type=jnp.float32,
                            precision=precision)
                    + jnp.dot(sb, bb, preferred_element_type=jnp.float32,
                              precision=precision))

        h0 = _HB - 1
        sa_r = slab_re[slot, h0:h0 + _R, 384:512]
        sb_r = slab_re[slot, _HB:_HB + _R, :]
        sa_i = slab_im[slot, h0:h0 + _R, 384:512]
        sb_i = slab_im[slot, _HB:_HB + _R, :]
        if inkernel_taps:
            bar_v, bbr_v = bar_s[...], bbr_s[...]
            bai_v, bbi_v = bai_s[...], bbi_s[...]
        else:
            bar_v, bbr_v = ba_r[...], bb_r[...]
            bai_v, bbi_v = ba_i[...], bb_i[...]
        if _SKIP == "dot":
            prr = sb_r[:, 0:_LANES]
            pri = sb_r[:, 128:256]
            pir = sb_i[:, 0:_LANES]
            pii = sb_i[:, 128:256]
        else:
            prr = dots(sa_r, sb_r, bar_v, bbr_v)   # xr * fr
            pri = dots(sa_r, sb_r, bai_v, bbi_v)   # xr * fi
            pir = dots(sa_i, sb_i, bar_v, bbr_v)   # xi * fr
            pii = dots(sa_i, sb_i, bai_v, bbi_v)   # xi * fi

        if inkernel_taps:
            two_pi = jnp.float32(2.0 * np.pi)
            fr0 = fcol_s[0:1, :]
            fi0 = fcol_s[1:2, :]
            wsm = jnp.mod(scal_f[0] * jnp.float32(SPS), two_pi)
            w128 = jnp.mod(wsm * jnp.float32(_LANES), two_pi)
            base_g = jnp.mod(
                scal_f[5] + wsm
                + (w128 * jnp.float32(_R)) * g.astype(jnp.float32),
                two_pi)
        else:
            fr0 = consts[0]
            fi0 = consts[1]
            w128 = consts[2]
            wsm = consts[3]
            base_g = base[g]

        lanes = lax.broadcasted_iota(jnp.int32, (_R, _LANES), 1)
        last = lanes == _LANES - 1
        col_r = jnp.broadcast_to(
            slab_re[slot, _HB + 1:_HB + 1 + _R, 0:1], (_R, _LANES))
        col_i = jnp.broadcast_to(
            slab_im[slot, _HB + 1:_HB + 1 + _R, 0:1], (_R, _LANES))
        prr = prr + jnp.where(last, fr0 * col_r, 0.0)
        pri = pri + jnp.where(last, fi0 * col_r, 0.0)
        pir = pir + jnp.where(last, fr0 * col_i, 0.0)
        pii = pii + jnp.where(last, fi0 * col_i, 0.0)

        yr = prr - pii
        yi = pri + pir

        # symbol-rate de-rotation by phase0 + ws*(s+1): per-step base
        # (wrapper, mod 2pi) + per-row + per-lane partial products,
        # each < ~2.5e3 rad so the f32 angle error stays ~1e-4 rad.
        if _SKIP == "derot":
            sr_out[:] = yr
            si_out[:] = yi
            return
        rows = lax.broadcasted_iota(jnp.int32, (_R, _LANES), 0)
        ang = (base_g + w128 * rows.astype(jnp.float32)
               + wsm * lanes.astype(jnp.float32))
        c = jnp.cos(ang)
        s = jnp.sin(ang)
        sr_out[:] = yr * c + yi * s
        si_out[:] = yi * c - yr * s

    return _kernel


def qpsk_symbol_gemm_scalars(re, im, mf_taps, w, lag, shift2,
                             phase0=0.0, ctx=None, precision=None,
                             interpret: bool = False,
                             panels_hw: int = 0):
    """In-kernel-taps variant of :func:`qpsk_symbol_gemm`: instead of
    traced tap planes, takes the RAW estimate scalars ``(w, lag[4],
    shift2)`` plus the static matched-filter taps, and builds the
    modulated tap bands INSIDE the kernel at grid step 0 (VMEM
    scratch, SMEM scalars).  This deletes the ~12-fusion XLA tap
    chain (modulated_taps + _bands gathers), whose per-fusion
    scheduling cost is ~0.35 ms/block on the tunneled runtime
    (docs/PERF.md round-5 QPSK section).  Semantics identical to
    ``qpsk_symbol_gemm(re, im, *modulated_taps(...), w*sps, ...)``;
    numerically, Mosaic's in-kernel cos/sin approximation puts
    ~3e-3 RELATIVE on the modulated taps vs XLA's transcendentals
    (measured on v5e, precision-flag-independent) — inside the
    DEFAULT-GEMM budget this kernel already carries; symbol
    decisions match the XLA-taps path exactly and the stream
    decodes zero-BER on hardware.
    """
    re = jnp.asarray(re, jnp.float32)
    im = jnp.asarray(im, jnp.float32)
    n = int(re.shape[0])
    mf = np.asarray(mf_taps, np.float64)
    T = int(mf.shape[0])
    if T > 116:
        raise ValueError(f"mf taps {T} exceed the shift-row width")
    md_flat = 3 * SPS + T - 1
    md = -(-md_flat // SPS) * SPS          # ctx length is md - 1
    if not kernel_ok(n, md, SPS):
        raise ValueError(f"block {n} / taps {md} outside kernel bounds")
    steps = n // IN_PER_STEP

    if ctx is None:
        row_re = jnp.zeros((1, _ROWW), jnp.float32)
        row_im = jnp.zeros((1, _ROWW), jnp.float32)
    else:
        cr = jnp.asarray(ctx[0], jnp.float32)
        ci = jnp.asarray(ctx[1], jnp.float32)
        if int(cr.shape[0]) != md - 1:
            raise ValueError(f"ctx must be MD-1 = {md - 1} samples, "
                             f"got {cr.shape[0]}")
        z = jnp.zeros((_ROWW - (md - 1),), jnp.float32)
        row_re = jnp.concatenate([z, cr])[None, :]
        row_im = jnp.concatenate([z, ci])[None, :]

    lag = jnp.asarray(lag, jnp.float32)
    scal_f = jnp.stack([jnp.asarray(w, jnp.float32),
                        lag[0], lag[1], lag[2], lag[3],
                        jnp.asarray(phase0, jnp.float32),
                        jnp.float32(0.0), jnp.float32(0.0)])
    scal_i = jnp.asarray(shift2, jnp.int32).reshape(1)

    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    sym_spec = pl.BlockSpec((_R, _LANES), lambda g: (g, 0),
                            memory_space=pltpu.VMEM)
    out_specs = [sym_spec, sym_spec]
    out_shape = [
        jax.ShapeDtypeStruct((steps * _R, _LANES), jnp.float32),
        jax.ShapeDtypeStruct((steps * _R, _LANES), jnp.float32),
    ]
    if panels_hw:
        pan_spec = pl.BlockSpec((2 * _LANES, 2 * _LANES),
                                lambda g: (0, 0),
                                memory_space=pltpu.VMEM)
        out_specs += [pan_spec, pan_spec]
        out_shape += [jax.ShapeDtypeStruct((2 * _LANES, 2 * _LANES),
                                           jnp.float32)] * 2
    outs = pl.pallas_call(
        _make_kernel(steps, precision, panels_hw=int(panels_hw),
                     block_n=n, sym_on=True, inkernel_taps=True,
                     md_flat=md_flat),
        grid=(steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # re rows (HBM)
            pl.BlockSpec(memory_space=pl.ANY),      # im rows (HBM)
            vspec, vspec,                           # ctx rows [1, 512]
            vspec,                                  # mf shift rows
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scal_f [8]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scal_i [1]
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, _HB + _R + _HF, _ROWW), jnp.float32),
            pltpu.VMEM((2, _HB + _R + _HF, _ROWW), jnp.float32),
            pltpu.VMEM((_LANES, _LANES), jnp.float32),   # BA re
            pltpu.VMEM((_ROWW, _LANES), jnp.float32),    # BB re
            pltpu.VMEM((_LANES, _LANES), jnp.float32),   # BA im
            pltpu.VMEM((_ROWW, _LANES), jnp.float32),    # BB im
            pltpu.VMEM((8, _LANES), jnp.float32),        # fr0/fi0
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=(2 * 4 * steps * _R * _LANES * (_LANES + _ROWW)
                   + (16 * n * _LANES if panels_hw else 0)),
            bytes_accessed=2 * 4 * n + 2 * n,
            transcendentals=n // 2,
        ),
        interpret=interpret,
    )(
        re.reshape(-1, _ROWW), im.reshape(-1, _ROWW),
        row_re, row_im,
        jnp.asarray(_mf_shift_rows(mf)), scal_f, scal_i,
    )
    if not panels_hw:
        sr, si = outs
        return sr.reshape(-1), si.reshape(-1)
    sr, si, p13, p24 = outs
    hw = int(panels_hw)
    width = _LANES + 2 * hw
    K = n - hw
    meta = {"nd": hw, "K": K, "Kp": _LANES * (-(-K // _LANES)),
            "R": -(-K // _LANES), "width": width, "fdt": jnp.float32,
            "prec": precision}
    return (sr.reshape(-1), si.reshape(-1),
            (p13[:_LANES, :width], -p24[:_LANES, :width],
             p13[_LANES:, :width], -p24[_LANES:, :width], meta))


def qpsk_panels(re, im, panels_hw: int, precision=None,
                interpret: bool = False):
    """Panels-only entry: the raw correlation panels of
    ``TimingEstimator.corr_panels`` computed by the kernel's
    accumulator pass (one HBM read, no segment/window operands
    materialized — the XLA formulation's shifted-reshape pieces read
    the block again per piece).  Returns the corr_panels tuple."""
    md = 3 * SPS + 32 - 1          # any legal md; taps are unused
    z = jnp.zeros((md,), jnp.float32)
    return qpsk_symbol_gemm(re, im, z, z, jnp.float32(0.0),
                            precision=precision, interpret=interpret,
                            panels_hw=panels_hw, _sym_on=False)


def qpsk_symbol_gemm(re, im, fr, fi, ws, phase0=0.0, ctx=None,
                     precision=None, interpret: bool = False,
                     panels_hw: int = 0, _sym_on: bool = True):
    """Fused symbol path on planar f32 IQ.

    Args:
      re, im: [N] f32 raw planes, N % IN_PER_STEP == 0.
      fr, fi: [MD] traced complex tap planes (modulated
        conv(mf, lagrange) — built by qpsk_rx), MD <= 132.
      ws: traced symbol-rate de-rotation step (w * sps).
      phase0: carried absolute phase at the block start.
      ctx: optional (ctx_re, ctx_im) carried raw tails, MD-1 samples.
      precision: MXU precision for the band dots.
      panels_hw: if > 0 (and <= 64), ALSO accumulate the raw
        correlation panels at this halfwidth in the same pass — the
        fused stream-step form: block k's symbols (carried estimates)
        and block k's panels (estimates for block k+1) from one HBM
        read.  Returns ``(sr, si, panels)`` where ``panels`` is the
        ``TimingEstimator.corr_panels`` tuple (P1, P2, P3, P4, meta).

    Returns ``(sr, si)`` [N/4] f32 symbol planes — identical contract
    to ``qpsk_rx._fused_symbol_gemm`` (the artifact frame already
    dropped)."""
    re = jnp.asarray(re, jnp.float32)
    im = jnp.asarray(im, jnp.float32)
    n = int(re.shape[0])
    md = int(jnp.asarray(fr).shape[0])
    if not kernel_ok(n, md, SPS):
        raise ValueError(f"block {n} / taps {md} outside kernel bounds")
    steps = n // IN_PER_STEP

    ba_r, bb_r = _bands(fr)
    ba_i, bb_i = _bands(fi)

    if ctx is None:
        row_re = jnp.zeros((1, _ROWW), jnp.float32)
        row_im = jnp.zeros((1, _ROWW), jnp.float32)
    else:
        cr = jnp.asarray(ctx[0], jnp.float32)
        ci = jnp.asarray(ctx[1], jnp.float32)
        if int(cr.shape[0]) != md - 1:
            raise ValueError(f"ctx must be MD-1 = {md - 1} samples, "
                             f"got {cr.shape[0]}")
        z = jnp.zeros((_ROWW - (md - 1),), jnp.float32)
        row_re = jnp.concatenate([z, cr])[None, :]
        row_im = jnp.concatenate([z, ci])[None, :]

    ws = jnp.asarray(ws, jnp.float32)
    two_pi = jnp.float32(2.0 * np.pi)
    wsm = jnp.mod(ws, two_pi)
    w128 = jnp.mod(wsm * jnp.float32(_LANES), two_pi)
    base = jnp.mod(jnp.asarray(phase0, jnp.float32) + wsm
                   + (w128 * jnp.float32(_R))
                   * jnp.arange(steps, dtype=jnp.float32), two_pi)
    consts = jnp.stack([jnp.asarray(fr)[0].astype(jnp.float32),
                        jnp.asarray(fi)[0].astype(jnp.float32),
                        w128, wsm])

    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    sym_spec = pl.BlockSpec((_R, _LANES), lambda g: (g, 0),
                            memory_space=pltpu.VMEM)
    out_specs = []
    out_shape = []
    if _sym_on:
        out_specs += [sym_spec, sym_spec]
        out_shape += [
            jax.ShapeDtypeStruct((steps * _R, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((steps * _R, _LANES), jnp.float32),
        ]
    if panels_hw:
        pan_spec = pl.BlockSpec((2 * _LANES, 2 * _LANES),
                                lambda g: (0, 0),
                                memory_space=pltpu.VMEM)
        out_specs += [pan_spec, pan_spec]
        out_shape += [jax.ShapeDtypeStruct((2 * _LANES, 2 * _LANES),
                                           jnp.float32)] * 2
    outs = pl.pallas_call(
        _make_kernel(steps, precision, panels_hw=int(panels_hw),
                     block_n=n, sym_on=_sym_on),
        grid=(steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # re rows (HBM)
            pl.BlockSpec(memory_space=pl.ANY),      # im rows (HBM)
            vspec, vspec,                           # ctx rows [1, 512]
            vspec, vspec, vspec, vspec,             # band pieces
            pl.BlockSpec(memory_space=pltpu.SMEM),  # base [steps]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # consts [4]
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, _HB + _R + _HF, _ROWW), jnp.float32),
            pltpu.VMEM((2, _HB + _R + _HF, _ROWW), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=(2 * 4 * steps * _R * _LANES * (_LANES + _ROWW)
                   + (16 * n * _LANES if panels_hw else 0)),
            bytes_accessed=2 * 4 * n + 2 * n,
            transcendentals=n // 2,
        ),
        interpret=interpret,
    )(
        re.reshape(-1, _ROWW), im.reshape(-1, _ROWW),
        row_re, row_im,
        ba_r, bb_r, ba_i, bb_i,
        base, consts,
    )
    if not panels_hw:
        sr, si = outs
        return sr.reshape(-1), si.reshape(-1)
    if _sym_on:
        sr, si, p13, p24 = outs
    else:
        p13, p24 = outs
    hw = int(panels_hw)
    width = _LANES + 2 * hw
    P1 = p13[:_LANES, :width]
    P3 = p13[_LANES:, :width]
    P2 = -p24[:_LANES, :width]
    P4 = -p24[_LANES:, :width]
    K = n - hw
    meta = {"nd": hw, "K": K, "Kp": _LANES * (-(-K // _LANES)),
            "R": -(-K // _LANES), "width": width, "fdt": jnp.float32,
            "prec": precision}
    panels = (P1, P2, P3, P4, meta)
    if not _sym_on:
        return panels
    return sr.reshape(-1), si.reshape(-1), panels
