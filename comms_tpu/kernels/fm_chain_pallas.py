"""Fused Pallas TPU kernel: the whole FM receive chain in one pass.

    planar u8 IQ -> convert -> 63-tap FIR /5 -> quadrature demod
                 -> 63-tap FIR /5 -> f32 audio

Functionally identical to ``models/fm_receiver.make_block_fn``'s
polyphase path (the reference chain, fm_radio.rs:144-168), but HBM
traffic collapses to the floor: the raw u8 planes are read ONCE, all
intermediates (offset-binary removal, mid stream, demodulated stream)
live in VMEM, and only the 25x-decimated audio is written back —
~2.2 B per input sample versus the ~4 B/sample of the fused-by-XLA
chain.

Design notes (every choice tracks a measured Mosaic constraint,
docs/PERF.md):

* **Planar input.**  Two u8 planes [N] (re, im), viewed [rows, 640].
  640 lanes make the decimate-by-5 GEMM's window advance exactly ONE
  sublane per 128 outputs, so the two window pieces are stride-1 row
  slices — Mosaic cannot stride or re-concatenate sublanes, but plain
  shifted slices + split matmuls it handles (the fir_pallas trick).
  Interleaved input would double the band width (2x the MXU work);
  ingest produces planar instead (one cheap host-side transform).
* **int8 MXU stage 1.**  The u8 bytes never touch the VPU's slow
  byte-unpack path: the staging buffer is read through an int32
  ref-bitcast (native 32-bit loads of 4 packed rows per word), offset
  binary is removed with one packed ``xor 0x80808080`` (x ^ 0x80 ==
  x - 128 in two's complement), and a value bitcast back to int8
  feeds the banded GEMMs DIRECTLY as s8 MXU operands — v5e runs s8
  matmuls at 2x the bf16 rate, and the accumulate is EXACT in int32.
  Taps are quantized to ~23 bits (scale (2^23-2^16)/max|h|, per-tap
  error <= 0.5/S ~ 6e-8 absolute — ~30x tighter than the former
  split-bf16 path) and split into three signed bytes
  h*S = a*65536 + b*256 + c, so each stage-1 GEMM is three s8
  passes (1.5 bf16-pass equivalents — still 25% less MXU work than
  the split-bf16 pair, with no u8 unpack).  The (x-127.5)/127.5 conversion folds into
  the scalar epilogue.  Measured: the former u8->int32->f32 astype
  ran at ~24 GB/s and dominated the kernel; this formulation removes
  it entirely.
* **Aligned DMAs, misaligned compute slices.**  DMA row offsets and
  extents are kept at tile multiples (32 rows for u8/i8, 8 for f32);
  the odd offsets live only in compute-side slices, which Mosaic
  lowers to in-register shifts.  Halo zones (last 32 input rows /
  8 demod rows) are carried across grid steps with aligned
  VMEM-to-VMEM copies, so no input byte is ever re-read from HBM.
* **Exact stream context.**  Block context enters in the RAW f32
  domain.  Mid-stream tails are integer u8 values (exactly
  representable in i8 after the -128 shift); the stream-start value
  127.5 (converted-domain zero) is not, so the wrapper rounds the
  context to i8 and sends the rounding residual's stage-1 projection
  as a 128-lane correction added to the first mid row of grid step 0
  (the only outputs any context residual can reach: output row r
  reads slab rows r+31 and r+32, and only slab row 31's last 128
  lanes lie in the context region).  The fused stream therefore
  matches the XLA chain's zero-context start exactly.
* **Demod lag via rolls.**  lag[i] = mid[i-1] on a [R, 128] tile is
  lane-roll + sublane-roll + lane-0 select; the seam element comes
  from an SMEM carry (previous grid step / block context).
* **Stage-2 relayout by stores.**  The demodulated tile is stored
  row-by-row into a persistent [40, 640] VMEM scratch ([1,128] stores
  at lane-tile-aligned offsets), giving stage 2 the same 640-lane
  banded-GEMM shape.  Stage 2 keeps f32 HIGHEST-precision dots: its
  data operand (the demod stream) is not integer, and it is 1/25 of
  the work.

Carried state between BLOCKS is recomputed by the wrapper from the
raw input tail with the existing XLA ops (cheap: ~3.3k samples), so
the kernel needs only tiny context inputs and no state outputs.

Serving note: dispatch quanta should be LARGE (millions of samples —
the kernel carries its halo state across grid steps in VMEM, so one
dispatch streams any multiple of ``IN_PER_STEP``).  Feeding it
102,400-sample blocks sliced out of a bigger device array by
``lax.scan`` costs 2.1 us per block in XLA operand-materialization
copies alone (measured; u8 copies run ~100 GB/s) — 38% of the
kernel's runtime at that block size.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fm_chain_fused", "quantize_taps", "zero_ctx", "IN_PER_STEP"]

_LANES = 128
_ROWW = 640                      # lane width: stride-5 x 128 outputs
_ROWS = 160                      # input rows per step (32-aligned for u8)
_XHALO = 32                      # input halo zone rows (u8 tile height)
_DHALO = 8                       # demod halo zone rows (f32 tile height)
IN_PER_STEP = _ROWS * _ROWW      # 102,400 input samples
_MROWS = _ROWS  # each 640-wide input row yields one 128-wide mid row
_AROWS = IN_PER_STEP // (25 * _LANES)   # audio rows per step = 32
_XOR80 = np.int32(np.uint32(0x80808080))   # x ^ 0x80 == x - 128 (s8)


def _band(taps: np.ndarray, dec: int) -> np.ndarray:
    """B[w, j] = taps[128 + dec*j - w] over the [768, 128] window
    (window starts 128 values before the output row's first input)."""
    T = taps.shape[0]
    w = np.arange(_LANES + _ROWW)[:, None]
    j = np.arange(_LANES)[None, :]
    t = _LANES + dec * j - w
    valid = (t >= 0) & (t < T)
    return np.where(valid, taps[np.clip(t, 0, T - 1)], 0.0)


def quantize_taps(taps: np.ndarray):
    """Host-side tap quantization for the s8 MXU stage: q = round(h*S)
    with S = (2^23 - 2^16)/max|h|, split into THREE signed bytes
    q = a*65536 + b*256 + c (each s8, exact) as band matrices
    (B_a, B_b, B_c) s8 [768, 128].  Returns (B_a, B_b, B_c, S).

    Per-tap error <= 0.5/S (~6e-8 absolute for the FM LPF) — ~30x
    tighter than the split-bf16 scheme this replaced (a 2-byte s16
    split was tried first: its ~3e-6/tap error produced occasional
    atan2 branch-cut flips vs the XLA chain on white-noise input;
    3 bytes restores flip-free hardware parity at 3 s8 MXU passes =
    1.5 bf16-pass equivalents, still 25% less MXU work than the
    split-bf16 pair)."""
    t = np.asarray(taps, np.float64)
    S = float(2 ** 23 - 2 ** 16) / max(np.abs(t).max(), 1e-300)
    q = np.round(t * S).astype(np.int64)
    B = _band(q.astype(np.float64), 5).astype(np.int64)
    c = ((B + 128) % 256 - 128).astype(np.int64)
    q1 = (B - c) >> 8
    b = ((q1 + 128) % 256 - 128).astype(np.int64)
    a = (q1 - b) >> 8
    assert np.array_equal(a * 65536 + b * 256 + c, B)
    assert a.min() >= -128 and a.max() <= 127
    return (a.astype(np.int8), b.astype(np.int8), c.astype(np.int8), S)


def _dot(a, b, precision=None):
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=precision)


def _stage1_gemm_s8(slab, ba, bb, bc, ca, cb, cc):
    """Banded decimating GEMM on the s8 slab [192, 640]: two window
    pieces x three byte-split passes.  Each per-byte i32 accumulator
    is <= 128*128*63 < 2^24, so its f32 conversion is EXACT; the
    byte weights (256^k * scale) fold into the f32 epilogue constants
    ``ca, cb, cc``, keeping total rounding ~1e-7 of mid scale.
    Returns [160, 128] f32 = sum_t h[t] * (x[.]-128) / 127.5 + O(1e-6)."""
    h0 = _XHALO - 1
    w0 = slab[h0:h0 + _MROWS, 512:640]         # [160, 128] s8
    w1 = slab[h0 + 1:h0 + 1 + _MROWS, :]       # [160, 640] s8
    i32 = jnp.int32

    def pair(bmat):
        return (jnp.dot(w0, bmat[:128], preferred_element_type=i32)
                + jnp.dot(w1, bmat[128:], preferred_element_type=i32))

    return (pair(ba).astype(jnp.float32) * ca
            + pair(bb).astype(jnp.float32) * cb
            + pair(bc).astype(jnp.float32) * cc)


def _stage2_gemm(slab, bh):
    """Audio decimating GEMM on the f32 demod scratch [40, 640] at
    HIGHEST precision (arbitrary-f32 data; 1/25 of the work)."""
    h0 = _DHALO - 1
    w0 = slab[h0:h0 + _AROWS, 512:640]
    w1 = slab[h0 + 1:h0 + 1 + _AROWS, :]
    hp = jax.lax.Precision.HIGHEST
    return _dot(w0, bh[:128], hp) + _dot(w1, bh[128:], hp)


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
    # reference's f32::atan2): the sign BIT distinguishes -0.0.  The
    # earlier (1/v) < 0 probe cost two extra VPU divisions per sample
    # — the whole chain measured 70.7 -> 75.7 Gsps from this swap
    # (divisions, not the degree-15 polynomial, were atan2's cost:
    # a degree-7 variant bought only +1%).
    neg_x = jax.lax.bitcast_convert_type(x, jnp.int32) < 0
    neg_y = jax.lax.bitcast_convert_type(y, jnp.int32) < 0
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
    so the first block matches the XLA chain's zero context exactly
    (via the wrapper's rounding-residual correction row)."""
    return {
        "xre": np.full(_XHALO * _ROWW, 127.5, np.float32),
        "xim": np.full(_XHALO * _ROWW, 127.5, np.float32),
        "d": np.zeros(_DHALO * _ROWW, np.float32),
        "prev": np.zeros(2, np.float32),
    }


def _kernel(re_hbm, im_hbm, ctx_re, ctx_im, dctx, corr, prev_mid,
            b1a, b1b, b1c, b2h, consts,
            audio_out,
            stage_re, stage_im, slab_re, slab_im, d640, carry, sem):
    g = pl.program_id(0)
    n = pl.num_programs(0)
    slot = jax.lax.rem(g, jnp.int32(2))

    # ---- carry the input/demod halo zones forward (VMEM copies,
    # tile-aligned).
    @pl.when(g > 0)
    def _():
        slab_re[0:_XHALO, :] = slab_re[_ROWS:_ROWS + _XHALO, :]
        slab_im[0:_XHALO, :] = slab_im[_ROWS:_ROWS + _XHALO, :]
        d640[0:_DHALO, :] = d640[_AROWS:_AROWS + _DHALO, :]

    # ---- double-buffered input staging: step g's planes were
    # prefetched during step g-1 (slot g%2); step g+1's DMA is issued
    # as soon as this step's is drained, so it overlaps ALL of this
    # step's compute.  (The serial start-then-wait form this replaced
    # left the DMA engine idle during compute; the u8 ingest is small
    # enough that this measured only ~+1.5% at 26M-sample dispatches,
    # but it removes the per-step DMA latency from the critical path.)
    def issue(j, s, op):
        getattr(pltpu.make_async_copy(
            re_hbm.at[pl.ds(j * _ROWS, _ROWS), :],
            stage_re.at[s], sem.at[s, 0]), op)()
        getattr(pltpu.make_async_copy(
            im_hbm.at[pl.ds(j * _ROWS, _ROWS), :],
            stage_im.at[s], sem.at[s, 1]), op)()

    @pl.when(g == 0)
    def _():
        issue(0, 0, "start")
        # block context enters pre-rounded to s8 (offset binary
        # removed by the wrapper); the rounding residual arrives via
        # ``corr`` (see module docstring).
        c0 = pltpu.make_async_copy(ctx_re.at[pl.ds(0, _XHALO), :],
                                   slab_re.at[pl.ds(0, _XHALO), :],
                                   sem.at[2, 0])
        c1 = pltpu.make_async_copy(ctx_im.at[pl.ds(0, _XHALO), :],
                                   slab_im.at[pl.ds(0, _XHALO), :],
                                   sem.at[2, 1])
        c0.start()
        c1.start()
        c0.wait()
        c1.wait()
        c2 = pltpu.make_async_copy(dctx.at[pl.ds(0, _DHALO), :],
                                   d640.at[pl.ds(0, _DHALO), :],
                                   sem.at[2, 0])
        c2.start()
        c2.wait()
        carry[0] = prev_mid[0]
        carry[1] = prev_mid[1]

    issue(g, slot, "wait")

    @pl.when(g + 1 < n)
    def _():
        issue(g + 1, 1 - slot, "start")

    # Offset-binary removal on packed words (x ^ 0x80 == x - 128),
    # then a value bitcast hands the bytes to the MXU as s8 — no
    # byte-unpack ever runs on the VPU.
    xor = jnp.int32(_XOR80)
    slab_re[_XHALO:, :] = pltpu.bitcast(
        stage_re.bitcast(jnp.int32)[slot] ^ xor, jnp.int8)
    slab_im[_XHALO:, :] = pltpu.bitcast(
        stage_im.bitcast(jnp.int32)[slot] ^ xor, jnp.int8)

    dc1 = consts[0]     # -0.5 * sum(q) / (S * 127.5)
    ca = consts[1]      # 65536 / (S * 127.5)
    cb = consts[2]      # 256 / (S * 127.5)
    cc = consts[3]      # 1 / (S * 127.5)

    # ---- stage 1: two real decimating FIRs as s8 banded GEMMs.
    mid_re = _stage1_gemm_s8(slab_re[:], b1a, b1b, b1c, ca, cb, cc) - dc1
    mid_im = _stage1_gemm_s8(slab_im[:], b1a, b1b, b1c, ca, cb, cc) - dc1

    # context rounding-residual correction: first mid row of step 0.
    rows = jax.lax.broadcasted_iota(jnp.int32, mid_re.shape, 0)
    first = (rows == 0) & (g == 0)
    mid_re = mid_re + jnp.where(
        first, jnp.broadcast_to(corr[0:1, :], mid_re.shape), 0.0)
    mid_im = mid_im + jnp.where(
        first, jnp.broadcast_to(corr[1:2, :], mid_im.shape), 0.0)

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
    # precision: the demod stream is not integer; 1/25 the work).
    audio_out[:] = _stage2_gemm(d640[:], b2h)


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

    b1a, b1b, b1c, S = quantize_taps(taps1)
    # stage 2 runs unsplit at HIGHEST precision: full f32 band.
    b2h = _band(np.asarray(taps2, np.float64), 5).astype(np.float32)
    t1 = np.asarray(taps1, np.float64)
    q_sum = float(np.sum(np.round(t1 * S)))
    sc = 1.0 / (S * 127.5)
    consts = jnp.asarray(
        [-0.5 * q_sum * sc, 65536.0 * sc, 256.0 * sc, sc], jnp.float32)

    # context: round to s8 (offset binary removed); project the
    # rounding residual through stage 1's band for the one output row
    # it can reach (mid row 0 of grid step 0, via slab row 31's last
    # 128 lanes — the only context positions any window reads).
    xre = jnp.asarray(ctx["xre"]).reshape(_XHALO, _ROWW)
    xim = jnp.asarray(ctx["xim"]).reshape(_XHALO, _ROWW)
    xre_q = jnp.round(xre - 128.0)
    xim_q = jnp.round(xim - 128.0)
    B1f = jnp.asarray(
        (_band(np.round(t1 * S), 5)[:128] / (S * 127.5)).astype(np.float32))
    res_re = (xre - 128.0 - xre_q)[_XHALO - 1, 512:640]
    res_im = (xim - 128.0 - xim_q)[_XHALO - 1, 512:640]
    corr = jnp.stack([
        jnp.dot(res_re, B1f, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST),
        jnp.dot(res_im, B1f, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST),
    ])                                            # [2, 128]

    out = pl.pallas_call(
        _kernel,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # re plane (HBM)
            pl.BlockSpec(memory_space=pl.ANY),      # im plane
            pl.BlockSpec(memory_space=pl.ANY),      # x ctx re rows (s8)
            pl.BlockSpec(memory_space=pl.ANY),      # x ctx im rows (s8)
            pl.BlockSpec(memory_space=pl.ANY),      # d ctx rows
            pl.BlockSpec((2, _LANES), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),  # residual corr
            pl.BlockSpec(memory_space=pltpu.SMEM),  # prev mid [2]
            pl.BlockSpec((_LANES + _ROWW, _LANES), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),  # b1 byte a (s8)
            pl.BlockSpec((_LANES + _ROWW, _LANES), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),  # b1 byte b (s8)
            pl.BlockSpec((_LANES + _ROWW, _LANES), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),  # b1 byte c (s8)
            pl.BlockSpec((_LANES + _ROWW, _LANES), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),  # b2 (f32)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # consts [4]
        ],
        out_specs=pl.BlockSpec((_AROWS, _LANES), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((steps * _AROWS, _LANES),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, _ROWS, _ROWW), jnp.uint8),   # staging x2 slots
            pltpu.VMEM((2, _ROWS, _ROWW), jnp.uint8),
            pltpu.VMEM((_ROWS + _XHALO, _ROWW), jnp.int8),
            pltpu.VMEM((_ROWS + _XHALO, _ROWW), jnp.int8),
            pltpu.VMEM((_AROWS + _DHALO, _ROWW), jnp.float32),
            pltpu.SMEM((2,), jnp.float32),
            pltpu.SemaphoreType.DMA((3, 2)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * 2 * steps * _MROWS * _LANES * (_LANES + _ROWW),
            bytes_accessed=2 * N + 4 * (N // 25),
            transcendentals=N // 5,
        ),
        interpret=interpret,
    )(
        re_u8.reshape(-1, _ROWW), im_u8.reshape(-1, _ROWW),
        xre_q.astype(jnp.int8), xim_q.astype(jnp.int8),
        jnp.asarray(ctx["d"]).reshape(_DHALO, _ROWW),
        corr,
        jnp.asarray(ctx["prev"]).reshape(2),
        jnp.asarray(b1a), jnp.asarray(b1b), jnp.asarray(b1c),
        jnp.asarray(b2h, jnp.float32),
        consts,
    )
    return out.reshape(-1)
