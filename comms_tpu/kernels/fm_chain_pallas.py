"""Fused Pallas TPU kernel: the whole FM receive chain in one pass.

    planar u8 IQ -> convert -> 63-tap FIR /5 -> quadrature demod
                 -> 63-tap FIR /5 -> f32 audio

Functionally identical to ``models/fm_receiver.make_block_fn``'s
polyphase path (the reference chain, fm_radio.rs:144-168), but HBM
traffic collapses to the floor: the raw u8 planes are read ONCE, all
intermediates (f32 conversion, mid stream, demodulated stream) live in
VMEM, and only the 25x-decimated audio is written back — ~2.2 B per
input sample versus the ~4 B/sample of the fused-by-XLA chain.

Design notes (every choice tracks a measured Mosaic constraint,
docs/PERF.md):

* **Planar input.**  Two u8 planes [N] (re, im), viewed [rows, 640].
  640 lanes make the decimate-by-5 GEMM's window advance exactly ONE
  sublane per 128 outputs, so the two window pieces are stride-1 row
  slices — Mosaic cannot stride or re-concatenate sublanes, but plain
  shifted slices + split matmuls it handles (the fir_pallas trick).
  Interleaved input would double the band width (2x the MXU work);
  ingest produces planar instead (one cheap host-side transform).
* **Aligned DMAs, misaligned compute slices.**  DMA row offsets and
  extents are kept at tile multiples (32 rows for u8, 8 for f32);
  the odd offsets live only in compute-side slices, which Mosaic
  lowers to in-register shifts.  Halo zones (last 32 input rows /
  8 demod rows) are carried across grid steps with aligned
  VMEM-to-VMEM copies, so no input byte is ever re-read from HBM.
* **Raw-value GEMM with split taps.**  The u8 values (0..255) are
  bf16-exact, so the matmuls run at DEFAULT precision (single MXU
  pass).  Taps are split h = h_hi + h_lo with both halves bf16-exact,
  giving ~1e-5 coefficient accuracy at 2 passes instead of
  HIGHEST's 3.  The (x-127.5)/127.5 conversion folds into a scalar
  epilogue: y = (y_raw - 127.5*sum(h)) / 127.5.
* **Demod lag via rolls.**  lag[i] = mid[i-1] on a [R, 128] tile is
  lane-roll + sublane-roll + lane-0 select; the seam element comes
  from an SMEM carry (previous grid step / block context).
* **Stage-2 relayout by stores.**  The demodulated tile is stored
  row-by-row into a persistent [40, 640] VMEM scratch ([1,128] stores
  at lane-tile-aligned offsets), giving stage 2 the same 640-lane
  banded-GEMM shape.

Carried state between BLOCKS is recomputed by the wrapper from the
raw input tail with the existing XLA ops (cheap: ~3.3k samples), so
the kernel needs only tiny context inputs and no state outputs.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fm_chain_fused", "make_tap_mats", "zero_ctx", "IN_PER_STEP"]

_LANES = 128
_ROWW = 640                      # lane width: stride-5 x 128 outputs
_ROWS = 160                      # input rows per step (32-aligned for u8)
_XHALO = 32                      # input halo zone rows (u8 tile height)
_DHALO = 8                       # demod halo zone rows (f32 tile height)
IN_PER_STEP = _ROWS * _ROWW      # 102,400 input samples
_MROWS = _ROWS  # each 640-wide input row yields one 128-wide mid row
_AROWS = IN_PER_STEP // (25 * _LANES)   # audio rows per step = 32


def _band(taps: np.ndarray, dec: int) -> np.ndarray:
    """B[w, j] = taps[128 + dec*j - w] over the [768, 128] window
    (window starts 128 values before the output row's first input)."""
    T = taps.shape[0]
    w = np.arange(_LANES + _ROWW)[:, None]
    j = np.arange(_LANES)[None, :]
    t = _LANES + dec * j - w
    valid = (t >= 0) & (t < T)
    return np.where(valid, taps[np.clip(t, 0, T - 1)], 0.0)


def make_tap_mats(taps: np.ndarray):
    """Host-side split-tap band matrices for one 63-tap /5 stage:
    (B_hi, B_lo) f32 [768, 128], both bf16-exact, summing to the f64
    band to ~1e-5 relative."""
    import ml_dtypes

    B = _band(np.asarray(taps, np.float64), 5)
    bf16 = ml_dtypes.bfloat16
    B_hi = B.astype(np.float32).astype(bf16).astype(np.float32)
    B_lo = (B - B_hi).astype(np.float32).astype(bf16).astype(np.float32)
    return B_hi, B_lo


def _dot(a, b, precision=None):
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=precision)


def _stage_gemm(slab, halo_rows: int, out_rows: int, bh, bl,
                highest: bool = False):
    """Banded decimating GEMM: ``slab`` [halo + out_rows, 640] f32
    with the last halo row ending right before the data.  Returns
    [out_rows, 128].  Two stride-1 window pieces.

    ``highest=False``: split-tap DEFAULT-precision dots — single MXU
    pass each, valid when the data operand is bf16-exact (raw u8
    values).  ``highest=True``: full-precision 3-pass dots on the
    unsplit band (bh) — for stage 2, whose data operand is the
    arbitrary-f32 demod stream (1/25 of the work, so the extra passes
    are cheap)."""
    h0 = halo_rows - 1
    w0 = slab[h0:h0 + out_rows, 512:640]       # [out_rows, 128]
    w1 = slab[h0 + 1:h0 + 1 + out_rows, :]     # [out_rows, 640]
    if highest:
        hp = jax.lax.Precision.HIGHEST
        return (_dot(w0, bh[:128], hp) + _dot(w1, bh[128:], hp))
    return (_dot(w0, bh[:128]) + _dot(w0, bl[:128])
            + _dot(w1, bh[128:]) + _dot(w1, bl[128:]))


def _atan2(y, x):
    """Mosaic has no atan2 primitive; octant-reduced odd polynomial
    (degree 15 on [0,1], fitted to 8.8e-8 rad max error — well inside
    the chain's 1e-3 parity budget)."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    swap = ay > ax
    num = jnp.minimum(ax, ay)
    den = jnp.maximum(ax, ay)
    r = num / (den + jnp.float32(1e-30))
    r2 = r * r
    p = jnp.float32(-4.831168387e-03)
    p = p * r2 + jnp.float32(2.475678069e-02)
    p = p * r2 + jnp.float32(-6.021912799e-02)
    p = p * r2 + jnp.float32(9.967923619e-02)
    p = p * r2 + jnp.float32(-1.404013889e-01)
    p = p * r2 + jnp.float32(1.997368136e-01)
    p = p * r2 + jnp.float32(-3.333230283e-01)
    p = p * r2 + jnp.float32(9.999999582e-01)
    a = p * r
    a = jnp.where(swap, jnp.float32(np.pi / 2) - a, a)
    # IEEE signed-zero faithful (atan2(+-0, -0) = +-pi, like the
    # reference's f32::atan2): the sign of 1/v distinguishes -0.0.
    neg_x = (jnp.float32(1.0) / x) < 0
    neg_y = (jnp.float32(1.0) / y) < 0
    a = jnp.where(neg_x, jnp.float32(np.pi) - a, a)
    return jnp.where(neg_y, -a, a)


def _lag1(x, seam):
    """lag[i] = flat(x)[i-1] for a [R, 128] tile; element [0, 0]
    takes ``seam`` (the previous tile's last sample)."""
    lanes = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    a = pltpu.roll(x, 1, 1)            # [r, l-1 mod 128]
    b = pltpu.roll(a, 1, 0)            # [r-1, l-1 mod 128]
    lag = jnp.where(lanes == 0, b, a)  # [r, 0] <- x[r-1, 127]
    return jnp.where((lanes == 0) & (rows == 0), seam, lag)


def zero_ctx():
    """Stream-start context: raw-domain 127.5 == converted-domain 0,
    so the first block matches the XLA chain's zero context exactly."""
    return {
        "xre": np.full(_XHALO * _ROWW, 127.5, np.float32),
        "xim": np.full(_XHALO * _ROWW, 127.5, np.float32),
        "d": np.zeros(_DHALO * _ROWW, np.float32),
        "prev": np.zeros(2, np.float32),
    }


def _kernel(re_hbm, im_hbm, ctx_re, ctx_im, dctx, prev_mid,
            b1h, b1l, b2h, b2l, consts,
            audio_out,
            stage_re, stage_im, slab_re, slab_im, d640, carry, sem):
    g = pl.program_id(0)

    # ---- carry the input/demod halo zones forward (VMEM copies,
    # tile-aligned), then start this step's aligned DMAs.
    @pl.when(g > 0)
    def _():
        slab_re[0:_XHALO, :] = slab_re[_ROWS:_ROWS + _XHALO, :]
        slab_im[0:_XHALO, :] = slab_im[_ROWS:_ROWS + _XHALO, :]
        d640[0:_DHALO, :] = d640[_AROWS:_AROWS + _DHALO, :]

    cp_r = pltpu.make_async_copy(
        re_hbm.at[pl.ds(g * _ROWS, _ROWS), :],
        stage_re.at[pl.ds(0, _ROWS), :], sem.at[0])
    cp_i = pltpu.make_async_copy(
        im_hbm.at[pl.ds(g * _ROWS, _ROWS), :],
        stage_im.at[pl.ds(0, _ROWS), :], sem.at[1])
    cp_r.start()
    cp_i.start()

    @pl.when(g == 0)
    def _():
        # block context enters in the RAW f32 domain (the wrapper maps
        # converted-domain zeros to 127.5, so stream start is exact).
        c0 = pltpu.make_async_copy(ctx_re.at[pl.ds(0, _XHALO), :],
                                   slab_re.at[pl.ds(0, _XHALO), :],
                                   sem.at[2])
        c1 = pltpu.make_async_copy(ctx_im.at[pl.ds(0, _XHALO), :],
                                   slab_im.at[pl.ds(0, _XHALO), :],
                                   sem.at[3])
        c0.start()
        c1.start()
        c0.wait()
        c1.wait()
        c2 = pltpu.make_async_copy(dctx.at[pl.ds(0, _DHALO), :],
                                   d640.at[pl.ds(0, _DHALO), :], sem.at[2])
        c2.start()
        c2.wait()
        carry[0] = prev_mid[0]
        carry[1] = prev_mid[1]

    cp_r.wait()
    cp_i.wait()
    # Mosaic has no direct u8->f32 cast; hop through int32.
    slab_re[_XHALO:, :] = stage_re[:].astype(jnp.int32).astype(jnp.float32)
    slab_im[_XHALO:, :] = stage_im[:].astype(jnp.int32).astype(jnp.float32)

    dc1 = consts[0]     # 127.5 * sum(taps1)
    inv = consts[1]     # 1 / 127.5

    # ---- stage 1: two real decimating FIRs on raw-domain values.
    mid_re = (_stage_gemm(slab_re[:], _XHALO, _MROWS, b1h, b1l)
              - dc1) * inv
    mid_im = (_stage_gemm(slab_im[:], _XHALO, _MROWS, b1h, b1l)
              - dc1) * inv

    # ---- quadrature demod: d = atan2(im(z), re(z)), z = mid*conj(lag)
    lag_re = _lag1(mid_re, carry[0])
    lag_im = _lag1(mid_im, carry[1])
    zre = mid_re * lag_re + mid_im * lag_im
    zim = mid_im * lag_re - mid_re * lag_im
    d = _atan2(zim, zre)
    carry[0] = mid_re[_MROWS - 1, _LANES - 1]
    carry[1] = mid_im[_MROWS - 1, _LANES - 1]

    # ---- relayout d [160, 128] -> d640 data zone as [32, 640]
    for r2 in range(_AROWS):
        for c in range(5):
            d640[_DHALO + r2, 128 * c:128 * (c + 1)] = d[5 * r2 + c, :]

    # ---- stage 2: audio decimating FIR on the d scratch (full
    # precision: the demod stream is not bf16-exact; 1/25 the work).
    audio_out[:] = _stage_gemm(d640[:], _DHALO, _AROWS, b2h, b2l,
                               highest=True)


def fm_chain_fused(re_u8, im_u8, ctx, taps1, taps2, interpret: bool = False):
    """Run the fused chain over planar u8 planes.

    Args:
      re_u8, im_u8: [N] uint8 planar IQ planes, N % 102400 == 0.
      ctx: dict with 'xre', 'xim' ([32*640] f32 input tails in the RAW
        domain, i.e. u8 value scale — use 127.5 (converted-domain zero)
        at stream start), 'd' ([8*640] f32 demod tail) and 'prev'
        ([2] f32 last mid sample); the streaming wrapper recomputes
        them per block from the raw tail.  See ``zero_ctx``.
      taps1/taps2: the two 63-tap f64 LPFs.

    Returns audio[N/25] f32.
    """
    re_u8 = jnp.asarray(re_u8)
    im_u8 = jnp.asarray(im_u8)
    N = re_u8.shape[0]
    if N % IN_PER_STEP:
        raise ValueError(f"N {N} must be a multiple of {IN_PER_STEP}")
    steps = N // IN_PER_STEP

    b1h, b1l = make_tap_mats(taps1)
    # stage 2 runs unsplit at HIGHEST precision: full f32 band.
    b2h = _band(np.asarray(taps2, np.float64), 5).astype(np.float32)
    b2l = np.zeros_like(b2h)
    consts = jnp.asarray(
        [127.5 * float(np.sum(taps1)), 1.0 / 127.5, 0.0], jnp.float32)

    out = pl.pallas_call(
        _kernel,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # re plane (HBM)
            pl.BlockSpec(memory_space=pl.ANY),      # im plane
            pl.BlockSpec(memory_space=pl.ANY),      # x ctx re rows
            pl.BlockSpec(memory_space=pl.ANY),      # x ctx im rows
            pl.BlockSpec(memory_space=pl.ANY),      # d ctx rows
            pl.BlockSpec(memory_space=pltpu.SMEM),  # prev mid [2]
            pl.BlockSpec((_LANES + _ROWW, _LANES), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_LANES + _ROWW, _LANES), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_LANES + _ROWW, _LANES), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_LANES + _ROWW, _LANES), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # consts [3]
        ],
        out_specs=pl.BlockSpec((_AROWS, _LANES), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((steps * _AROWS, _LANES),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((_ROWS, _ROWW), jnp.uint8),      # DMA staging
            pltpu.VMEM((_ROWS, _ROWW), jnp.uint8),
            pltpu.VMEM((_ROWS + _XHALO, _ROWW), jnp.float32),
            pltpu.VMEM((_ROWS + _XHALO, _ROWW), jnp.float32),
            pltpu.VMEM((_AROWS + _DHALO, _ROWW), jnp.float32),
            pltpu.SMEM((2,), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * 2 * steps * _MROWS * _LANES * (_LANES + _ROWW),
            bytes_accessed=2 * N + 4 * (N // 25),
            transcendentals=N // 5,
        ),
        interpret=interpret,
    )(
        re_u8.reshape(-1, _ROWW), im_u8.reshape(-1, _ROWW),
        jnp.asarray(ctx["xre"]).reshape(_XHALO, _ROWW),
        jnp.asarray(ctx["xim"]).reshape(_XHALO, _ROWW),
        jnp.asarray(ctx["d"]).reshape(_DHALO, _ROWW),
        jnp.asarray(ctx["prev"]).reshape(2),
        jnp.asarray(b1h, jnp.float32), jnp.asarray(b1l, jnp.float32),
        jnp.asarray(b2h, jnp.float32), jnp.asarray(b2l, jnp.float32),
        consts,
    )
    return out.reshape(-1)
