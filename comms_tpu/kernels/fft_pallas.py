"""Pallas TPU kernel: VMEM-resident batched FFT (N = R1 * 128).

Why: any XLA-level FFT formulation (``jnp.fft.fft`` or the four-step
matmul form, ops/fft.py) materializes its intermediate stages in HBM —
measured 52-65 B/sample of real traffic vs the 16 B/sample io floor,
capping both at 22-30% of speed-of-light (docs/PERF.md "FFT bound
argument").  This kernel keeps all stages VMEM-resident per row tile,
so HBM traffic IS the floor: one input read + one output write.

Functional parity target: the reference's ``BatchFFT``
(``/root/reference/src/fft/mod.rs:73-96``) at its node tolerance of
per-bin error < 1e-5 (``src/fft/fft_node.rs:242-244``).

Math (four-step / Bailey, N = R1 * 128, R1 in {2,...,128}):
write n = 128*a + b, k = R1*k2 + k1 (a,k1 in [0,R1), b,k2 in [0,128)):

  stage 1   Y[k1][r, b]  = sum_a x[r, 128a+b] * w_R1^(a*k1)   (VPU;
            the R1-th-root constants are folded — 0/±1 terms cost an
            add, only irrational values multiply)
  twiddle   Y'[k1]       = Y[k1] * exp(-2i*pi*b*k1/N)          (VPU)
  stage 2   Z[k1]        = Y'[k1] @ F128,  F128[b,k2] = w_128^(b*k2)
            — stacked k1-major into ONE [R1*T, 128] x [128, 128]
            Karatsuba complex matmul (3 real MXU dots)
  unshuffle out[r, R1*k2 + k1] = Z[k1][r, k2] — an in-kernel
            transpose+reshape+transpose (measured ~140 Gsps-equivalent
            on hardware, i.e. free next to the MXU stage).

The PSD variant fuses window multiply + FFT + |.|^2 + bin-accumulate
and skips the unshuffle entirely (per-bin accumulation is order-
insensitive): output is one [R1, 128] Z-ordered accumulator, so HBM
write traffic is ~zero and the io floor halves to the input read.

Mosaic constraints honored (PERF.md "Measured lessons"): no complex
dtype in-kernel (planar f32 re/im), no sublane-strided slices (lane-
tile views only), all index reversals/twiddles host-precomputed.
"""

from __future__ import annotations

import functools
import math

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from comms_tpu.kernels import _bf16

__all__ = ["fft_pallas", "fft_pallas_planar", "psd_pallas_planar",
           "psd_stream_pallas_planar", "rows_per_step", "supported"]

_LANES = 128


def supported(n: int) -> bool:
    """True when this kernel handles n-point FFTs.

    R1 = n/128 in {2..128}: stage 1 is the radix-2 DIT network over
    R1 lane tiles (r1*log2(r1)/2 unrolled butterflies — the VPU cost
    grows only logarithmically, which is what admits the round-5
    extension to 4096..16384 for the wideband spectrum-monitoring
    sizes, VERDICT r4 item 5); the upper limit is the natural-order
    unshuffle, whose per-size Mosaic-supported form is documented in
    :func:`_nat_rows_per_step` / :func:`_unshuffle` — n = 16384
    (R1 = 128, the r-major chain) is the last size covered."""
    return n in (256, 512, 1024, 2048, 4096, 8192, 16384)


def rows_per_step(n: int) -> int:
    """Row-tile size per grid step (2^17 samples per step).

    Measured on v5e at n=1024: t=128 rows/step streams 49.7 Gsps vs
    44.9 at t=256, and t=512 overflows the 16 MB scoped-VMEM budget
    outright — smaller tiles pipeline the in-place HBM traffic
    better."""
    return (1 << 17) // int(n)


def _snap(v: float) -> float:
    """Snap a root-of-unity component to exact 0/±1/±sqrt(1/2)."""
    for t in (0.0, 1.0, -1.0, math.sqrt(0.5), -math.sqrt(0.5)):
        if abs(v - t) < 1e-12:
            return t
    return v


def _roots(r1: int):
    """(cos, sin) of e^{-2i*pi*m/r1} for m in [0, r1), snapped."""
    out = []
    for m in range(r1):
        th = -2.0 * math.pi * m / r1
        out.append((_snap(math.cos(th)), _snap(math.sin(th))))
    return out


def _cmul_const(xr, xi, c: float, s: float):
    """(xr + i*xi) * (c + i*s) with compile-time constant folding.
    Returns (re, im) where either may be None (exact zero)."""
    def mul(v, k):
        if k == 0.0:
            return None
        if k == 1.0:
            return v
        if k == -1.0:
            return -v
        return v * jnp.float32(k)

    def sub(a, b):
        if a is None:
            return None if b is None else -b
        return a if b is None else a - b

    def add(a, b):
        if a is None:
            return b
        return a if b is None else a + b

    return sub(mul(xr, c), mul(xi, s)), add(mul(xr, s), mul(xi, c))


def _acc(acc, term):
    if term is None:
        return acc
    return term if acc is None else acc + term


def _twiddles(n: int, r1: int):
    """Host [r1, 128] planar twiddles exp(-2i*pi*b*k1/n), exact
    integer-mod angles in f64."""
    k1 = np.arange(r1)[:, None]
    b = np.arange(_LANES)[None, :]
    w = np.exp((-2j * np.pi / n) * np.mod(k1 * b, n))
    return w.real.astype(np.float32), w.imag.astype(np.float32)


def _dft128(split: bool, scale: float = 1.0):
    """Host 128-point DFT matrix planar parts + Karatsuba sum.

    ``split=False``: three f32 matrices (for HIGHEST-precision dots).
    ``split=True``: each matrix as an exact (hi, lo) bf16 pair —
    B = hi + lo to ~2^-16 relative — so the kernel's dots run three
    bf16 MXU passes (hi*hi + hi*lo + lo*hi) instead of HIGHEST's six.
    ``scale`` multiplies the whole transform for free (folded here).
    """
    b = np.arange(_LANES)[:, None]
    k2 = np.arange(_LANES)[None, :]
    f = scale * np.exp((-2j * np.pi / _LANES) * np.mod(b * k2, _LANES))
    mats = [f.real.astype(np.float32), f.imag.astype(np.float32)]
    mats.append(mats[0] + mats[1])
    if not split:
        return mats
    out = []
    for m in mats:
        hi, lo = _bf16.host_split(m)
        out += [np.asarray(hi), np.asarray(lo)]
    return out


def _dft_pow2(tiles, r1: int):
    """r1-point DFT across the tile list via radix-2 DIT butterflies:
    r1*log2(r1)/2 butterflies (const cmul + add + sub) instead of the
    r1^2 term-sum — the stage-1 VPU cost drops ~6x at r1=8, which
    matters because the whole kernel is VPU-bound (docs/PERF.md).
    Constants are snapped so w in {1, -1, +-j, +-sqrt(1/2)(1 -+ j)}
    multiplies fold to adds/negates where exact."""
    if r1 == 1:
        return tiles
    ev = _dft_pow2(tiles[0::2], r1 // 2)
    od = _dft_pow2(tiles[1::2], r1 // 2)
    half = r1 // 2
    out = [None] * r1
    for k in range(half):
        th = -2.0 * math.pi * k / r1
        c, s = _snap(math.cos(th)), _snap(math.sin(th))
        tr, ti = _cmul_const(od[k][0], od[k][1], c, s)
        er, ei = ev[k]
        out[k] = (_acc(er, tr), _acc(ei, ti))
        out[k + half] = (er - tr if tr is not None else er,
                         ei - ti if ti is not None else ei)
    return out


def _stage12(xr, xi, wr, wi, r1: int, t: int):
    """Stages 1+2 of the four-step FFT on a [t, r1*128] planar tile.

    Returns Z-ordered planes ``(zs_r, zs_i)`` of shape [r1*t, 128],
    row = t*k1 + r, lane = k2 — bin k = r1*k2 + k1 of FFT row r.
    """
    tiles = [(xr[:, _LANES * a:_LANES * (a + 1)],
              xi[:, _LANES * a:_LANES * (a + 1)]) for a in range(r1)]
    ys = _dft_pow2(tiles, r1)
    ys_r, ys_i = [], []
    for k1, (yr, yi) in enumerate(ys):
        if k1:                              # k1 = 0 twiddle is 1
            twr = wr[k1:k1 + 1, :]
            twi = wi[k1:k1 + 1, :]
            yr, yi = yr * twr - yi * twi, yr * twi + yi * twr
        ys_r.append(yr)
        ys_i.append(yi)
    yp_r = jnp.concatenate(ys_r, axis=0)    # [r1*t, 128]
    yp_i = jnp.concatenate(ys_i, axis=0)
    return yp_r, yp_i


def _cmatmul(yp_r, yp_i, consts):
    """Karatsuba complex matmul against the 128-DFT (3 real dots).

    ``consts`` is 3 f32 refs (HIGHEST mode, 6 MXU passes per dot) or
    6 bf16 hi/lo refs (split mode, 3 passes per dot — the data operand
    splits in-kernel, the lo*lo term ~2^-32 is dropped).
    """
    if len(consts) == 3:
        hp = jax.lax.Precision.HIGHEST

        def dot(a, bref):
            return jnp.dot(a, bref[:], preferred_element_type=jnp.float32,
                           precision=hp)
    else:
        def dot(a, pair):
            bhi, blo = pair
            ahi, alo = _bf16.device_split(a)
            return _bf16.dot3(ahi, alo, bhi[:], blo[:])

        consts = [(consts[0], consts[1]), (consts[2], consts[3]),
                  (consts[4], consts[5])]
    p1 = dot(yp_r, consts[0])
    p2 = dot(yp_i, consts[1])
    p3 = dot(yp_r + yp_i, consts[2])
    return p1 - p2, p3 - p1 - p2


def _nat_rows_per_step(n: int) -> int:
    """Row tile of the NATURAL-ORDER kernel.  The unshuffle dictates
    it (measured Mosaic support boundaries, round 5):

    * n <= 1024: the direct ``zs.T.reshape(n, t).T`` needs the
      reshape's result minor (t = 2^17/n >= 128) at lane width —
      the original measured-optimal tiling.
    * 2048..8192: that reshape is an unsupported shape cast (so the
      n = 2048 natural path NEVER compiled before round 5 — latent);
      the transpose-chain unshuffle below requires t = 128 exactly.
    * 16384: t = 128 tiles overflow VMEM; the per-bin-column chain
      at t = 8 (w = 128/r1 = 1) compiles and is exact.
    """
    if n <= 1024:
        return rows_per_step(n)
    if n <= 8192:
        return 128
    return 8


def _unshuffle(zs, r1: int, t: int):
    """Natural-order unshuffle, built ONLY from Mosaic-supported
    layout ops (probed on v5e): pure 2-D transposes, row
    splits/merges, minor splits/merges at 128 lanes, and
    swapaxes(0, 1) with an untouched minor.  The naive
    ``zs.T.reshape(n, t).T`` form is an unsupported shape cast for
    every n > 1024.

    For n <= 8192, zs rows are k1-major (t*k1 + r); for n = 16384
    the kernel reorders yp R-MAJOR before the stage-2 matmul (row
    order is free there), which makes the minor split of zs.T land
    exactly on (r, k1) digits — the per-bin-column form this
    replaces (128 slice/reshape chains + identity matmuls) compiled
    but measured 0.92 Gsps on v5e; this chain is the same op class
    as the t=128 sizes.
    """
    n = r1 * _LANES
    if n <= 1024:
        return zs.T.reshape(n, t).T
    if n <= 8192:
        # t = 128: lanes of zs.T are 128*k1 + r, so the minor split
        # is exactly (k1, r); the row-merge of (k2, k1) is the
        # natural bin index r1*k2 + k1, and the final transpose puts
        # r back on rows.  Exact (pure data movement).
        assert t == _LANES
        return zs.T.reshape(_LANES, r1, _LANES).reshape(
            _LANES * r1, _LANES).T
    # n = 16384 (r1 = 128): zs rows are (r, k1) R-MAJOR here; zs.T's
    # minor split is exactly (r, k1), the swap puts r on rows, and
    # the merge makes lanes (k2, k1) = the natural bin 128*k2 + k1.
    assert r1 == _LANES
    return zs.T.reshape(_LANES, t, _LANES).swapaxes(0, 1).reshape(t, n)


def _fft_kernel(*refs, r1: int, t: int, nc: int):
    xr_ref, xi_ref, wr, wi = refs[:4]
    consts = refs[4:4 + nc]
    yr_out, yi_out = refs[4 + nc:6 + nc]
    yp_r, yp_i = _stage12(xr_ref[:], xi_ref[:], wr, wi, r1, t)
    if r1 == _LANES:
        # 16384: reorder the stacked stage-1 rows R-MAJOR before the
        # matmul (the dot is row-wise, so row order is free) — this
        # is what aligns the unshuffle's digit split, see _unshuffle.
        def rmaj(a):
            return a.reshape(r1, t, _LANES).swapaxes(0, 1).reshape(
                r1 * t, _LANES)
        yp_r = rmaj(yp_r)
        yp_i = rmaj(yp_i)
    zs_r, zs_i = _cmatmul(yp_r, yp_i, consts)
    yr_out[:] = _unshuffle(zs_r, r1, t)
    yi_out[:] = _unshuffle(zs_i, r1, t)


def _const_arrays(n: int, r1: int, precision: str, scale: float = 1.0):
    if precision not in ("split_bf16", "highest"):
        raise ValueError(f"precision must be split_bf16/highest, "
                         f"got {precision!r}")
    wr, wi = _twiddles(n, r1)
    mats = _dft128(split=(precision == "split_bf16"), scale=scale)
    arrays = [jnp.asarray(wr), jnp.asarray(wi)]
    arrays += [jnp.asarray(m) for m in mats]
    tw_spec = pl.BlockSpec((r1, _LANES), lambda g: (0, 0),
                           memory_space=pltpu.VMEM)
    m_spec = pl.BlockSpec((_LANES, _LANES), lambda g: (0, 0),
                          memory_space=pltpu.VMEM)
    specs = [tw_spec, tw_spec] + [m_spec] * len(mats)
    return arrays, specs, len(mats)


def fft_pallas_planar(re, im, n: int = 1024,
                      precision: str = "split_bf16",
                      scale: float = 1.0,
                      interpret: bool = False):
    """Batched n-point FFT of planar f32 rows — the kernel's native
    zero-relayout interface.

    Args:
      re, im: [rows, n] float32 planes (one FFT per row).
      n: FFT size, a power of two in [256, 16384].
      precision: "split_bf16" (3 MXU passes per dot, parity ~1e-6) or
        "highest" (6 passes, parity ~2e-7) — both well inside the
        reference node tolerance of 1e-5 (fft_node.rs:242-244).
      scale: multiplies the transform at zero cost (folded into the
        host DFT matrices) — e.g. 1/sqrt(n) for a unitary FFT, or the
        plane-swap inverse ``ifft(z) = swap(fft(swap(z)))/n``.
    Returns ``(yr, yi)`` [rows, n] float32, natural bin order.
    """
    n = int(n)
    if not supported(n):
        raise ValueError(f"fft_pallas supports n in 256..16384 "
                         f"(powers of two), got {n}")
    re = jnp.asarray(re)
    im = jnp.asarray(im)
    if re.ndim != 2 or re.shape[1] != n or im.shape != re.shape:
        raise ValueError(f"expected planar [rows, {n}] f32 pair, got "
                         f"{re.shape} / {im.shape}")
    rows = re.shape[0]
    t = _nat_rows_per_step(n)
    r1 = n // _LANES
    pad = (-rows) % t
    if pad:
        z = jnp.zeros((pad, n), jnp.float32)
        re = jnp.concatenate([re, z])
        im = jnp.concatenate([im, z])
    steps = (rows + pad) // t

    arrays, cspecs, nc = _const_arrays(n, r1, precision, scale=scale)
    kernel = functools.partial(_fft_kernel, r1=r1, t=t, nc=nc)
    row_spec = pl.BlockSpec((t, n), lambda g: (g, 0),
                            memory_space=pltpu.VMEM)
    extra = {}
    if n >= 4096:
        # t = 128 tiles hold yp + zs + Karatsuba partials at [r1*t,
        # 128] f32 each — past Mosaic's default scoped-VMEM window.
        # 32 MB compiles and runs correct at n = 4096 on v5e
        # (measured); 8192 gets the next step up.
        extra["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=(64 if n >= 8192 else 32) * 1024 * 1024)
    yr, yi = pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=[row_spec, row_spec] + cspecs,
        out_specs=[row_spec, row_spec],
        out_shape=[
            jax.ShapeDtypeStruct((steps * t, n), jnp.float32),
            jax.ShapeDtypeStruct((steps * t, n), jnp.float32),
        ],
        # In-place: output tile g depends only on input tile g, so the
        # planes may be transformed in their own buffers.  XLA inserts
        # copies automatically iff the inputs are still live after the
        # call; in streaming loops (carried planes) no copy happens —
        # without this, a fori_loop carry costs an extra 16 B/sample
        # of buffer copies per pass, measured 25 -> 15 Gsps.
        input_output_aliases={0: 0, 1: 1},
        cost_estimate=pl.CostEstimate(
            flops=steps * t * n * (8 * _LANES + 8 * r1),
            bytes_accessed=16 * steps * t * n,
            transcendentals=0,
        ),
        interpret=interpret,
        **extra,
    )(re, im, *arrays)
    if pad:
        yr = yr[:rows]
        yi = yi[:rows]
    return yr, yi


def fft_pallas(x, n: int = 1024, precision: str = "split_bf16",
               interpret: bool = False):
    """Batched n-point FFT of complex rows ``x[rows, n]`` (complex64).

    Natural bin order, parity vs jnp.fft well inside the reference
    node tolerance (fft_node.rs:242-244).  Complex shim over
    :func:`fft_pallas_planar`; plane-native callers skip it.
    """
    x = jnp.asarray(x)
    yr, yi = fft_pallas_planar(
        jnp.real(x).astype(jnp.float32),
        jnp.imag(x).astype(jnp.float32), n=n, precision=precision,
        interpret=interpret)
    return jax.lax.complex(yr, yi)


def _psd_tile(xin_r, xin_i, w1, wr, wi, consts, r1: int, t: int,
              demean: bool):
    """Window (+demean) + FFT + |.|^2 + row-reduce of one [t, n]
    segment tile -> [r1, 128] Z-order partial bins.  Row validity
    weights are folded into the input planes by the caller (weights
    are 0/1, and power is quadratic in x, so w*|FFT(x)|^2 ==
    |FFT(w*x)|^2 for w in {0,1})."""
    n = r1 * _LANES
    xr = xin_r * w1
    xi = xin_i * w1
    if demean:
        # Welch subtracts the segment mean BEFORE windowing; a
        # windowed de-meaned segment is (x - mean(x)) * w =
        # x*w - mean(x)*w, so fold the correction into the windowed
        # planes (keeps one multiply per plane).
        inv_n = jnp.float32(1.0 / n)
        mr = jnp.sum(xin_r, axis=1, keepdims=True) * inv_n
        mi = jnp.sum(xin_i, axis=1, keepdims=True) * inv_n
        xr = xr - mr * w1
        xi = xi - mi * w1
    yp_r, yp_i = _stage12(xr, xi, wr, wi, r1, t)
    zs_r, zs_i = _cmatmul(yp_r, yp_i, consts)
    p = zs_r * zs_r + zs_i * zs_i            # [r1*t, 128], Z-order
    # Reduce rows within each k1 group -> [r1, 128] partial bins.
    return jnp.sum(p.reshape(r1, t, _LANES), axis=1)


def _psd_kernel(*refs, r1: int, t: int, nc: int, demean: bool):
    xr_ref, xi_ref, wr, wi = refs[:4]
    consts = refs[4:4 + nc]
    win, wrow = refs[4 + nc:6 + nc]
    acc_out = refs[6 + nc]
    g = pl.program_id(0)
    w1 = win[0:1, :]
    rw = wrow[:, 0:1]
    part = _psd_tile(xr_ref[:] * rw, xi_ref[:] * rw, w1, wr, wi,
                     consts, r1, t, demean)

    @pl.when(g == 0)
    def _():
        acc_out[:] = jnp.zeros_like(acc_out)

    acc_out[:] += part


def psd_pallas_planar(re, im, window, n: int = 1024,
                      row_weights=None, demean: bool = True,
                      precision: str = "split_bf16",
                      interpret: bool = False):
    """Fused window + FFT + |.|^2 + accumulate over segment rows.

    Args:
      re, im: [rows, n] float32 segment planes (one segment per row).
      window: [n] host/f32 window applied per row.
      row_weights: optional [rows] f32 validity weights (0 excludes a
        row — used by the overlapped-Welch wrapper for padding rows).
      demean: subtract each segment's mean before windowing (Welch
        convention in ops/spectrum.welch_psd).

    Returns ``acc[n]`` float32: sum over rows of |FFT(w*(x-mean))|^2,
    natural bin order (the [r1, 128] Z-order accumulator is
    unshuffled by one tiny XLA transpose on return).
    """
    n = int(n)
    if not supported(n):
        raise ValueError(f"psd_pallas supports n in 256..16384 "
                         f"(powers of two), got {n}")
    re = jnp.asarray(re)
    im = jnp.asarray(im)
    if re.ndim != 2 or re.shape[1] != n or im.shape != re.shape:
        raise ValueError(f"expected planar [rows, {n}] f32 pair, got "
                         f"{re.shape} / {im.shape}")
    rows = re.shape[0]
    t = rows_per_step(n)
    r1 = n // _LANES
    if row_weights is None:
        row_weights = jnp.ones((rows,), jnp.float32)
    else:
        row_weights = jnp.asarray(row_weights, jnp.float32)
        if row_weights.shape != (rows,):
            raise ValueError("row_weights must be [rows]")
    pad = (-rows) % t
    if pad:
        z = jnp.zeros((pad, n), jnp.float32)
        re = jnp.concatenate([re, z])
        im = jnp.concatenate([im, z])
        row_weights = jnp.concatenate(
            [row_weights, jnp.zeros((pad,), jnp.float32)])
    steps = (rows + pad) // t

    if isinstance(window, jax.Array):
        # traced windows are legal (tiny operand; lets callers chain
        # an anti-CSE perturbation through the window, bench.py)
        win = jnp.broadcast_to(
            window.astype(jnp.float32).reshape(1, n), (8, n))
    else:
        win = np.broadcast_to(
            np.asarray(window, np.float32).reshape(1, n), (8, n)).copy()
    arrays, cspecs, nc = _const_arrays(n, r1, precision)
    kernel = functools.partial(_psd_kernel, r1=r1, t=t, nc=nc,
                               demean=bool(demean))
    row_spec = pl.BlockSpec((t, n), lambda g: (g, 0),
                            memory_space=pltpu.VMEM)
    tail = [
        pl.BlockSpec((8, n), lambda g: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((t, 1), lambda g: (g, 0),
                     memory_space=pltpu.VMEM),
    ]
    acc = pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=[row_spec, row_spec] + cspecs + tail,
        out_specs=pl.BlockSpec((r1, _LANES), lambda g: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r1, _LANES), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=steps * t * n * (8 * _LANES + 8 * r1 + 8),
            bytes_accessed=8 * steps * t * n,
            transcendentals=0,
        ),
        interpret=interpret,
    )(re, im, *arrays, jnp.asarray(win), row_weights.reshape(-1, 1))
    # Z-order [r1, 128] -> natural [n]: bin r1*k2 + k1 = acc[k1, k2].
    return acc.T.reshape(n)


def _psd_stream_kernel(xr_hbm, xi_hbm, wr, wi, *rest, r1: int, t: int,
                       nc: int, demean: bool, m: int,
                       _even_only: bool = False):
    consts = rest[:nc]
    win = rest[nc]
    acc_out = rest[nc + 1]
    slab_r, slab_i, odd_scr_r, odd_scr_i, sem = rest[nc + 2:nc + 7]
    g = pl.program_id(0)
    n_steps = pl.num_programs(0)
    n = r1 * _LANES
    half = n // 2
    slot = jax.lax.rem(g, jnp.int32(2))

    def issue(j, s, op):
        def full():
            getattr(pltpu.make_async_copy(
                xr_hbm.at[pl.ds(j * t, t + 8), :],
                slab_r.at[s], sem.at[s, 0]), op)()
            getattr(pltpu.make_async_copy(
                xi_hbm.at[pl.ds(j * t, t + 8), :],
                slab_i.at[s], sem.at[s, 1]), op)()

        def short():
            # final tile: only t rows exist; rows [t, t+8) are zeroed
            # after the wait (their one consumer, the last odd
            # segment, is weight-zeroed anyway).
            getattr(pltpu.make_async_copy(
                xr_hbm.at[pl.ds(j * t, t), :],
                slab_r.at[s, pl.ds(0, t), :], sem.at[s, 0]), op)()
            getattr(pltpu.make_async_copy(
                xi_hbm.at[pl.ds(j * t, t), :],
                slab_i.at[s, pl.ds(0, t), :], sem.at[s, 1]), op)()

        if n_steps == 1:
            short()
        else:
            jax.lax.cond(j == n_steps - 1, short, full)

    @pl.when(g == 0)
    def _():
        issue(0, 0, "start")

    issue(g, slot, "wait")

    @pl.when(g + 1 < n_steps)
    def _():
        issue(g + 1, 1 - slot, "start")

    @pl.when(g == n_steps - 1)
    def _():
        slab_r[slot, pl.ds(t, 8), :] = jnp.zeros((8, n), jnp.float32)
        slab_i[slot, pl.ds(t, 8), :] = jnp.zeros((8, n), jnp.float32)

    w1 = win[0:1, :]
    # even segments 2k: x row k, all valid.
    part = _psd_tile(slab_r[slot, 0:t, :], slab_i[slot, 0:t, :],
                     w1, wr, wi, consts, r1, t, demean)
    # odd segments 2k+1: [row k lanes half:, row k+1 lanes :half],
    # staged through a scratch buffer by two stores (Mosaic cannot
    # concat slices whose sublane offsets differ); global row g*t + r
    # must be < m - 1 (the last x row has no successor) — fold the
    # 0/1 validity into the planes.
    odd_scr_r[:, :half] = slab_r[slot, 0:t, half:]
    odd_scr_r[:, half:] = slab_r[slot, 1:t + 1, :half]
    odd_scr_i[:, :half] = slab_i[slot, 0:t, half:]
    odd_scr_i[:, half:] = slab_i[slot, 1:t + 1, :half]
    if not _even_only:   # bound probe: halve the FFT work, same io
        rows = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0) + g * t
        ow = (rows < m - 1).astype(jnp.float32)
        part = part + _psd_tile(odd_scr_r[:] * ow, odd_scr_i[:] * ow,
                                w1, wr, wi, consts, r1, t, demean)

    @pl.when(g == 0)
    def _():
        acc_out[:] = jnp.zeros_like(acc_out)

    acc_out[:] += part


def psd_stream_pallas_planar(re, im, window, n: int = 1024,
                             demean: bool = True,
                             precision: str = "split_bf16",
                             interpret: bool = False,
                             _even_only: bool = False):
    """Welch PSD accumulator over RAW planar streams at 50% overlap —
    segments are formed IN VMEM (even segments are slab rows, odd
    segments two aligned half-row slices), so each input sample is
    read from HBM exactly once: 8 B/sample of traffic versus the
    40 B/sample of materialize-segments-then-accumulate (x read +
    2x-expanded segment write + read).

    Args:
      re, im: [N] float32 planes, N % (rows_per_step(n) * n) == 0.
      window: [n] host/f32/traced window.
    Returns ``acc[n]`` float32: sum over the 2*(N/n) - 1 standard
    Welch segments (start stride n/2) of |FFT(w*(x-mean))|^2, natural
    bin order.
    """
    n = int(n)
    if not supported(n):
        raise ValueError(f"psd_stream supports n in 256..16384 "
                         f"(powers of two), got {n}")
    re = jnp.asarray(re)
    im = jnp.asarray(im)
    t = rows_per_step(n)
    N = int(re.shape[0])
    if re.ndim != 1 or im.shape != re.shape:
        raise ValueError("expected flat [N] f32 planes")
    if N % (t * n):
        raise ValueError(f"N={N} must be a multiple of "
                         f"rows_per_step*n={t * n} (use psd_pallas_planar "
                         f"with explicit segments otherwise)")
    m = N // n
    steps = m // t
    r1 = n // _LANES

    if isinstance(window, jax.Array):
        win = jnp.broadcast_to(
            window.astype(jnp.float32).reshape(1, n), (8, n))
    else:
        win = np.broadcast_to(
            np.asarray(window, np.float32).reshape(1, n), (8, n)).copy()
    arrays, cspecs, nc = _const_arrays(n, r1, precision)
    kernel = functools.partial(_psd_stream_kernel, r1=r1, t=t, nc=nc,
                               demean=bool(demean), m=m,
                               _even_only=_even_only)
    acc = pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)]
                 + cspecs
                 + [pl.BlockSpec((8, n), lambda g: (0, 0),
                                 memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((r1, _LANES), lambda g: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r1, _LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, t + 8, n), jnp.float32),
            pltpu.VMEM((2, t + 8, n), jnp.float32),
            pltpu.VMEM((t, n), jnp.float32),
            pltpu.VMEM((t, n), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * steps * t * n * (8 * _LANES + 8 * r1 + 8),
            bytes_accessed=8 * N,
            transcendentals=0,
        ),
        interpret=interpret,
    )(re.reshape(m, n), im.reshape(m, n), *arrays, jnp.asarray(win))
    return acc.T.reshape(n)
