"""Distributed FFT: decimation-in-frequency over the mesh, natural order.

The TP row of the parallelism table (SURVEY.md section 2.4): when
fft_size greatly exceeds a comfortable per-chip working set, one FFT
is computed cooperatively by all shards.  Factorization ``N = R * C``
with ``R = r * n`` (n = mesh size, r a LOCAL radix — R is decoupled
from the mesh, unlike the round-2 version where R was pinned to n):
shard s owns the contiguous natural-order chunk ``x[s*r*C : (s+1)*r*C]``
— exactly the framework's time sharding.

Four stages, two ``all_to_all`` exchanges (~N complex values per shard
each — the minimum for a transposed FFT), everything else local:

1. cross-shard R-point DFT per local index j: shard s's rows u' of the
   [R, C] view contribute ``P[p, s*r+u'] = W_R^{p(s*r+u')}`` — one
   local [R, r] x [r, C] matmul forms the partial for every p, a tiled
   ``all_to_all`` routes p-group t to shard t, a local sum over source
   shards finishes the DFT.  The phase exponent is the **integer**
   ``(p*(s*r+u')) mod R`` (exact while R^2 < 2^31).
2. twiddle: ``G[p, j] *= W_N^{p j}`` from the integer ``(p*j) mod N``
   (exact: p*j < N < 2^31), so precision does not degrade with N.
3. local C-point FFT: shard t then holds ``X[p + R*m]`` for its
   p in [t*r, (t+1)*r) and all m.
4. natural-order restore: output index k = p + R*m lands on shard
   ``k // (r*C)``; for every p the m-range belonging to dest shard s
   is the contiguous ``[s*C/n, (s+1)*C/n)`` — a second tiled
   ``all_to_all`` + local transpose yields ``X[s*r*C : (s+1)*r*C]``
   on shard s, the same layout as the input.  Requires ``n | C``.

**Why mesh^2 | N cannot be dropped for natural order:** with two
exchanges the output permutation must route, for every p, an equal
contiguous m-range to each dest shard — n | C.  Then
``N = (r*n) * C = r * n^2 * (C/n)``: ANY natural-order factorization
has n^2 | N; the local radix rebalances R vs C (shrinking the local
FFT length C for huge N) but cannot relax divisibility.  For N with
n | N but n^2 not | N, use ``natural_order=False`` (R-interleaved
spectrum, exact layout documented at the return) — a third exchange
could restore natural order but would move ~N more values for pure
bookkeeping.

Batched transforms: input [..., N] with the last axis sharded; leading
axes are batch.  The reference has no distributed FFT at all (rustfft
is single-thread per node, /root/reference/src/fft/mod.rs:73-96).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["make_dfft", "pick_local_radix", "dfft_reference"]


def pick_local_radix(fft_size: int, n_dev: int,
                     max_local_fft: int | None = None) -> int:
    """Smallest local radix r >= 1 such that N = (r*n) * C with n | C
    (the natural-order condition) and, if given, C <= max_local_fft
    (bounding the per-shard FFT working set for huge N).  Raises if
    none exists."""
    N, n = int(fft_size), int(n_dev)
    r = 1
    while r * n * n <= N:
        C = N // (r * n)
        if N % (r * n) == 0 and C % n == 0 and (
                max_local_fft is None or C <= max_local_fft):
            return r
        r += 1
    raise ValueError(
        f"no factorization N={N} = (r*{n})*C with {n} | C"
        + (f" and C <= {max_local_fft}" if max_local_fft else "")
        + " exists; pass natural_order=False for the interleaved spectrum")


def make_dfft(fft_size: int, mesh: Mesh, axis: str = "time",
              natural_order: bool = True, local_radix: int | None = None):
    """Build a jitted distributed FFT.

    Input: [..., fft_size] complex, last axis sharded over ``axis`` in
    natural order.  Output: the spectrum, same shape and sharding —
    natural order by default.  ``dfft.R`` / ``dfft.C`` / ``dfft.r``
    expose the factorization; ``dfft.local_fn`` is the per-shard
    function for inlining into a larger ``shard_map`` program (e.g.
    the sharded PSD, parallel/wideband.py).
    """
    n_dev = mesh.shape[axis]
    N = int(fft_size)
    if local_radix is not None:
        r = int(local_radix)
    elif natural_order and n_dev > 1:
        r = pick_local_radix(N, n_dev)
    else:
        r = 1
    R = r * n_dev
    if N % R:
        raise ValueError(f"fft_size {N} must divide by R = r*n = {R}")
    C = N // R
    if natural_order and C % n_dev:
        raise ValueError(
            f"natural order needs n | C (n={n_dev}, C={C}); "
            "pass natural_order=False for the interleaved spectrum")
    if N >= (1 << 31):
        raise ValueError("fft_size must be < 2^31 for exact int32 twiddles")
    if R * R >= (1 << 31):
        raise ValueError(f"R = {R} too large for exact int32 stage-1 phases")

    def local(xl):
        # xl: [..., r*C] — this shard's contiguous chunk.
        s_idx = lax.axis_index(axis)
        cdtype = xl.dtype
        if R == 1:
            return jnp.fft.fft(xl)
        lead = xl.shape[:-1]
        nlead = len(lead)

        # -- stage 1: R-point DFT across the [R, C] row view.
        xm = jnp.moveaxis(xl.reshape(lead + (r, C)), -2, 0)  # [u', ..., j]
        p = jnp.arange(R, dtype=jnp.int32)[:, None]
        u = jnp.arange(r, dtype=jnp.int32)[None, :]
        pu = jnp.mod(p * (s_idx.astype(jnp.int32) * r + u), R)
        ph1 = jnp.exp(
            (-2j * jnp.pi / R) * pu.astype(jnp.float32)).astype(cdtype)
        # contrib[p, ..., j] = sum_u' ph1[p, u'] * xm[u', ..., j]
        contrib = jnp.tensordot(ph1, xm, axes=(1, 0))
        if n_dev > 1:
            recv = lax.all_to_all(contrib, axis, split_axis=0,
                                  concat_axis=0, tiled=True)
        else:
            recv = contrib
        # rows [t*r:(t+1)*r) came from source shard t; sum the sources.
        g = jnp.sum(recv.reshape((n_dev, r) + recv.shape[1:]), axis=0)

        # -- stage 2: twiddle with exact integer (p*j) mod N;
        #    global p = s*r + pl on this shard.
        pl_idx = jnp.arange(r, dtype=jnp.int32)[:, None]
        j = jnp.arange(C, dtype=jnp.int32)[None, :]
        pj = jnp.mod((s_idx.astype(jnp.int32) * r + pl_idx) * j, N)
        tw = jnp.exp(
            (-2j * jnp.pi / N) * pj.astype(jnp.float32)).astype(cdtype)
        z = g * tw.reshape((r,) + (1,) * nlead + (C,))

        # -- stage 3: local C-point FFT -> X[p + R*m], p local.
        seq = jnp.fft.fft(z)                     # [pl, ..., m]

        if not natural_order:
            # interleaved layout: local [r, ..., C] flattened as
            # [..., r*C] with X[(s*r+pl) + R*m] at [..., pl*C + m].
            return jnp.moveaxis(seq, 0, -2).reshape(lead + (r * C,))

        # -- stage 4: m-group s belongs to dest shard s.
        seq = seq.reshape((r,) + lead + (n_dev, C // n_dev))
        seq = jnp.moveaxis(seq, -2, 0)           # [dest, pl, ..., m']
        if n_dev > 1:
            recv = lax.all_to_all(seq, axis, split_axis=0,
                                  concat_axis=0, tiled=True)
        else:
            recv = seq                           # [t, pl, ..., m']
        # out flat index = R*m' + t*r + pl -> order [..., m', t, pl].
        out = jnp.moveaxis(recv, (0, 1), (-2, -1))
        return out.reshape(lead + (r * C,))

    jitted = {}

    def dfft(x):
        x = jnp.asarray(x)
        nd = x.ndim
        fn = jitted.get(nd)
        if fn is None:
            spec = P(*((None,) * (nd - 1) + (axis,)))
            fn = jax.jit(shard_map(local, mesh=mesh, in_specs=(spec,),
                                   out_specs=spec))
            jitted[nd] = fn
        return fn(x)

    dfft.R, dfft.C, dfft.r = R, C, r
    dfft.natural_order = natural_order
    dfft.local_fn = local
    return dfft


def dfft_reference(x):
    """numpy oracle."""
    return np.fft.fft(np.asarray(x), axis=-1)
