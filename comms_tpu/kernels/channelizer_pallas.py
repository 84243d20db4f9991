"""Pallas TPU kernel: fused 64-channel polyphase DFT channelizer.

One pass over the input computes :func:`comms_tpu.ops.channelizer.
channelize_block` — branch MACs AND the channel DFT — with the only
HBM traffic being the input read and the spectrum write (16 B per
complex input sample, the channelizer's memory floor; the XLA path
additionally materializes the branch matrix between the MAC stage and
the batched FFT).

Layout: complex input as planar f32 planes viewed ``[rows, 128]``
with TWO 64-sample frames packed per row, so

* the branch MACs ``V[m, c] = sum_k C[k-1, c] * xe[(m+M-k)*64 + c]``
  are M full-width VPU multiply-adds against frame-shifted views of
  the slab — shifts by odd frame counts use the lane-roll + row-roll
  + lane-select trick (Mosaic cannot re-slice sublanes);
* the per-frame 64-point DFT (with the branch-reversal phase fix
  folded in, see ops/channelizer.py) becomes ONE matmul per
  real-component pair against a block-diagonal [128, 128] matrix
  holding two copies of the 64x64 DFT — the packed layout feeds the
  MXU directly, no unpacking.

The carried context (T-1 = 511 input samples) rides in the 8-row
f32-aligned halo zone across sequential grid steps.  Supports any K
dividing 128 (16/32/64/128 — the BASELINE config is 64);
``taps_per_branch`` M <= 16.

Round-3 rework (measured on v5e, K=64 M=16, 16.8M-sample blocks,
state chained): 10.5 -> 14.6 Gsps via (a) hoisting the per-term
roll+select relayout — the lane remainders repeat with period 128/K,
so K=64 needs only TWO rolled whole-slab views, each reused by 8
terms as plain row slices; (b) bf16 hi/lo split x3 DFT dots (default
``mode="split"``, ~1e-5 relative; ``"highest"`` keeps the 6-pass f32
form); (c) double-buffered input DMA; (d) the next-context tail
SLICE (the concatenate form it replaced silently copied the whole
block: +32 B/sample).  The residual bound is the branch-MAC stage's
M per-lane FMAs, which are inherently VPU work (stride-K taps make a
banded-GEMM form ~70x MAC-wasteful).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from comms_tpu.ops import fir as _fir

__all__ = ["channelize_pallas", "channelize_pallas_planar",
           "step_samples", "CTX_SAMPLES", "K"]

K = 64                         # default (BASELINE config)
_LANES = 128
_HALO = 8                      # f32 row-alignment quantum
_ROWS = 128                    # input rows per grid step
CTX_SAMPLES = _HALO * _LANES   # 1024 (>= T-1 for M <= 16, K <= 128)

# Dev probe for the stage-split bound measurement (docs/PERF.md
# channelizer section): "macs" replaces the branch-MAC stage with a
# pass-through (same io, no MAC work), "dft" returns the MAC
# accumulators without the K-point DFT matmul.  Output is WRONG under
# any skip — bound probes only, never set in production.
_SKIP = None


def step_samples() -> int:
    return _ROWS * _LANES      # 16384 complex samples per step


def _dft_mats(k: int):
    """Block-diagonal [128, 128] re/im parts of the fixed-up K-point
    DFT (128/K blocks): F'[c, ch] = exp(-2j*pi*(c*ch + ch)/K) — the
    e^{-2i pi ch/K} branch-reversal fix folded in."""
    c = np.arange(k)[:, None]
    ch = np.arange(k)[None, :]
    F = np.exp(-2j * np.pi * ((c * ch + ch) % k) / k)
    blk = np.zeros((_LANES, _LANES), np.complex128)
    for b in range(_LANES // k):
        blk[b * k:(b + 1) * k, b * k:(b + 1) * k] = F
    return blk.real.astype(np.float32), blk.imag.astype(np.float32)


from comms_tpu.kernels._bf16 import (  # noqa: E402  (shared x3 split)
    device_split as _bsplit,
    dot3 as _dot3,
    host_split as _hsplit,
)


def _ingest(xr_hbm, xi_hbm, cr_hbm, ci_hbm, slab_r, slab_i, sem):
    """Shared double-buffered input staging (also used by the fused
    band-monitor kernel, band_monitor_pallas.py): prefetch step g+1's
    rows while step g computes; 8-row f32-aligned halo carried between
    slabs.  Returns the ready slot index for this grid step."""
    g = pl.program_id(0)
    n_steps = pl.num_programs(0)
    slot = jax.lax.rem(g, jnp.int32(2))

    # ---- double-buffered slabs: step g's rows were prefetched into
    # slab[slot] during step g-1; the 8-row halo is copied from the
    # other slab's tail (the previous step's data).
    def issue(j, s, op):
        getattr(pltpu.make_async_copy(
            xr_hbm.at[pl.ds(j * _ROWS, _ROWS), :],
            slab_r.at[s, pl.ds(_HALO, _ROWS), :], sem.at[s, 0]), op)()
        getattr(pltpu.make_async_copy(
            xi_hbm.at[pl.ds(j * _ROWS, _ROWS), :],
            slab_i.at[s, pl.ds(_HALO, _ROWS), :], sem.at[s, 1]), op)()

    @pl.when(g == 0)
    def _():
        issue(0, 0, "start")
        c0 = pltpu.make_async_copy(cr_hbm.at[pl.ds(0, _HALO), :],
                                   slab_r.at[0, pl.ds(0, _HALO), :],
                                   sem.at[2, 0])
        c1 = pltpu.make_async_copy(ci_hbm.at[pl.ds(0, _HALO), :],
                                   slab_i.at[0, pl.ds(0, _HALO), :],
                                   sem.at[2, 1])
        c0.start()
        c1.start()
        c0.wait()
        c1.wait()

    issue(g, slot, "wait")

    # Halo copy BEFORE issuing step g+1's prefetch: the prefetch
    # writes slab[1-slot] rows [8, 136) and the halo reads rows
    # [128, 136) of the same slab — starting the DMA first would race
    # the read (caught in review; interpret mode serializes DMAs and
    # cannot see it).
    @pl.when(g > 0)
    def _():
        slab_r[slot, 0:_HALO, :] = slab_r[1 - slot,
                                          _ROWS:_ROWS + _HALO, :]
        slab_i[slot, 0:_HALO, :] = slab_i[1 - slot,
                                          _ROWS:_ROWS + _HALO, :]

    @pl.when(g + 1 < n_steps)
    def _():
        issue(g + 1, 1 - slot, "start")

    return slot


def _chan_compute(sr, si, c2, mats, M: int, k: int, mode: str):
    """Branch MACs + per-frame K-point DFT on a ready input slab
    (rows [_HALO, _HALO+_ROWS) hold this step's samples, rows
    [0, _HALO) the carried context).  Returns the packed spectrum
    planes ``(yr[_ROWS, 128], yi[_ROWS, 128])`` — shared between the
    plain channelizer kernel and the fused band-monitor kernel."""
    # ---- branch MACs.  For packed output row r (frames 2r, 2r+1),
    # lane l = c + 64j, term kk reads global sample
    #   x_first + 64*(2r + j) - 64*kk + c + 1
    # (the +1 is decimating_branch_taps' C[kk-1,c] = h[64kk-1-c]
    # convention).  With the 1024-sample halo zone, that is slab-flat
    #   r*128 + l + (1024 + 1 - 64*kk) — a pure lane advance.
    #
    # The terms' lane remainders repeat with period 128/k, so the
    # roll+row-roll+select relayout is hoisted: ONE rolled whole-slab
    # view per distinct remainder, each term a plain row slice of it.
    # (The per-term _advance form ran ~6 VPU ops/term/sample and was
    # the kernel's measured bottleneck at M=16.)
    rows = _ROWS
    if _SKIP == "macs":            # bound probe: same io, no MAC work
        vr = sr[_HALO:_HALO + rows, :]
        vi = si[_HALO:_HALO + rows, :]
    else:
        groups: dict = {}
        for kk in range(1, M + 1):
            delta = _HALO * _LANES + 1 - k * kk
            q, rem = divmod(delta, _LANES)
            groups.setdefault(rem, []).append((kk, q))
        vr = None
        vi = None
        for rem, terms in groups.items():
            if rem == 0:
                rolled_r, rolled_i = sr, si
            else:
                lanes = jax.lax.broadcasted_iota(
                    jnp.int32, (rows + _HALO, _LANES), 1)
                mask = lanes < _LANES - rem

                def rolled(slab):
                    a = pltpu.roll(slab, _LANES - rem, 1)
                    b = pltpu.roll(a, rows + _HALO - 1, 0)
                    return jnp.where(mask, a, b)

                rolled_r = rolled(sr)
                rolled_i = rolled(si)
            for kk, q in terms:
                ck = c2[kk - 1:kk, :]
                t_r = ck * rolled_r[q:q + rows, :]
                t_i = ck * rolled_i[q:q + rows, :]
                vr = t_r if vr is None else vr + t_r
                vi = t_i if vi is None else vi + t_i
    if _SKIP == "dft":             # bound probe: MACs without the DFT
        return vr, vi

    # ---- per-frame 64-point DFT via the block-diagonal matmul,
    # 3-matmul (Karatsuba) complex product:
    #   P1 = Vr F_r, P2 = Vi F_i, P3 = (Vr+Vi)(F_r+F_i)
    #   Re = P1 - P2, Im = P3 - P1 - P2
    # split mode: bf16 hi/lo x3 passes per dot (2x HIGHEST's 6-pass
    # f32 rate, ~1e-5 relative — same scheme as the FIR/FFT kernels).
    if mode == "split":
        frh, frl, fih, fil, fsh, fsl = mats
        vrh, vrl = _bsplit(vr)
        vih, vil = _bsplit(vi)
        vsh, vsl = _bsplit(vr + vi)
        p1 = _dot3(vrh, vrl, frh[:], frl[:])
        p2 = _dot3(vih, vil, fih[:], fil[:])
        p3 = _dot3(vsh, vsl, fsh[:], fsl[:])
    else:
        fr, fi = mats
        hp = jax.lax.Precision.HIGHEST

        def dot(a, b):
            return jnp.dot(a, b, preferred_element_type=jnp.float32,
                           precision=hp)

        fr_v = fr[:]
        fi_v = fi[:]
        p1 = dot(vr, fr_v)
        p2 = dot(vi, fi_v)
        p3 = dot(vr + vi, fr_v + fi_v)
    return p1 - p2, p3 - p1 - p2


def _kernel(xr_hbm, xi_hbm, cr_hbm, ci_hbm, c2, *mats_and_out,
            M: int, k: int, mode: str):
    nmats = 6 if mode == "split" else 2
    mats = mats_and_out[:nmats]
    yr_out, yi_out, slab_r, slab_i, sem = mats_and_out[nmats:]
    slot = _ingest(xr_hbm, xi_hbm, cr_hbm, ci_hbm, slab_r, slab_i, sem)
    yr, yi = _chan_compute(slab_r[slot], slab_i[slot], c2, mats,
                           M=M, k=k, mode=mode)
    yr_out[:] = yr
    yi_out[:] = yi


def channelize_pallas_planar(re, im, prototype, ctx_re, ctx_im,
                             num_channels: int = K, mode: str = "split",
                             interpret: bool = False):
    """Planar-plane variant of :func:`channelize_pallas` — the kernel's
    NATIVE layout, zero relayout on either side.

    Args:
      re, im: [N] float32 planes, N % step_samples() == 0.
      prototype: length K*M real lowpass (M <= 16), host numpy.
      ctx_re, ctx_im: [CTX_SAMPLES] float32 carried input-tail planes
        (zeros at stream start; only the trailing T-1 samples matter).

    Returns ``(yr[N//K, K], yi[N//K, K], new_ctx_re, new_ctx_im)``.
    """
    re = jnp.asarray(re)
    im = jnp.asarray(im)
    k = int(num_channels)
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
    N = re.shape[0]
    if N % step_samples():
        raise ValueError(f"N {N} must be a multiple of {step_samples()}")
    steps = N // step_samples()

    if mode not in ("split", "highest"):
        raise ValueError(f"mode must be 'split'/'highest', got {mode!r}")
    C = _fir.decimating_branch_taps(h, k).astype(np.float32)  # [M, K]
    c2 = np.concatenate([C] * (_LANES // k), axis=1)          # [M, 128]
    fr, fi = _dft_mats(k)
    if mode == "split":
        fmats = (list(_hsplit(np.asarray(fr, np.float64)))
                 + list(_hsplit(np.asarray(fi, np.float64)))
                 + list(_hsplit(np.asarray(fr, np.float64)
                                + np.asarray(fi, np.float64))))
    else:
        fmats = [jnp.asarray(fr), jnp.asarray(fi)]

    ctx_re = jnp.asarray(ctx_re)
    ctx_im = jnp.asarray(ctx_im)
    if ctx_re.shape[0] != CTX_SAMPLES:
        raise ValueError(f"ctx must be {CTX_SAMPLES} samples")
    # N >= step_samples() > CTX_SAMPLES, so the next context is a tail
    # SLICE of the input planes (the concatenate form this replaces
    # copied the whole block: +32 B/sample of hidden wrapper traffic).
    new_ctx_re = re[-CTX_SAMPLES:]
    new_ctx_im = im[-CTX_SAMPLES:]

    out_rows = steps * _ROWS
    kernel = functools.partial(_kernel, M=M, k=k, mode=mode)
    yr, yi = pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((16, _LANES), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec((_LANES, _LANES), lambda g: (0, 0),
                          memory_space=pltpu.VMEM)
             for _ in fmats],
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
            pltpu.VMEM((2, _ROWS + _HALO, _LANES), jnp.float32),
            pltpu.VMEM((2, _ROWS + _HALO, _LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((3, 2)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=out_rows * _LANES * (4 * M + 4 * _LANES * 3),
            bytes_accessed=16 * N,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        re.reshape(-1, _LANES), im.reshape(-1, _LANES),
        ctx_re.reshape(_HALO, _LANES),
        ctx_im.reshape(_HALO, _LANES),
        jnp.asarray(np.pad(c2, ((0, 16 - M), (0, 0)))),
        *fmats,
    )
    # packed [rows, 128] -> [frames, K] (contiguous reshape)
    return yr.reshape(-1, k), yi.reshape(-1, k), new_ctx_re, new_ctx_im


def channelize_pallas(x, prototype, ctx, num_channels: int = K,
                      interpret: bool = False):
    """Fused polyphase DFT channelizer, K channels (K | 128).

    Args:
      x: [N] complex64, N % step_samples() == 0.
      prototype: length K*M real lowpass (M <= 16), host numpy.
      ctx: [CTX_SAMPLES] complex64 carried input tail (zeros at
        stream start; only the trailing T-1 samples matter).

    Returns ``(y[N//K, K] complex64, new_ctx)`` matching
    ``ops.channelizer.channelize_block``.  (XLA folds the
    real/imag/complex shims when the caller already holds planes;
    plane-native callers should use :func:`channelize_pallas_planar`.)
    """
    x = jnp.asarray(x)
    ctx = jnp.asarray(ctx)
    yr, yi, ncr, nci = channelize_pallas_planar(
        jnp.real(x), jnp.imag(x), prototype,
        jnp.real(ctx), jnp.imag(ctx),
        num_channels=num_channels, interpret=interpret)
    return jax.lax.complex(yr, yi), jax.lax.complex(ncr, nci)
