"""Distributed FFT: decimation-in-frequency over the mesh, natural order.

The TP row of the parallelism table (SURVEY.md section 2.4): when
fft_size greatly exceeds a comfortable per-chip working set, one FFT
is computed cooperatively by all shards.  Factorization N = R * C with
R = mesh size, C = N/R local length; shard s owns the contiguous
natural-order chunk x[s*C : (s+1)*C] — exactly the framework's time
sharding.

Four stages, two ``all_to_all`` exchanges (~N complex values per shard
each — the minimum for a transposed FFT), everything else local:

1. cross-shard R-point DFT per local index j:
   ``G[p, j] = sum_s x[s*C + j] * W_R^{p s}`` — each shard forms its
   term for every p, one tiled ``all_to_all`` routes row p to shard p,
   a local sum finishes the DFT.
2. twiddle: ``G[p, j] *= W_N^{p j}``.  The angle is computed from the
   **integer** product ``(p*j) mod N`` (exact: p*j < N < 2^31 in
   int32), so precision does not degrade with N — the f32 error is the
   one rounding of ``2*pi*r/N``, independent of transform size.
3. local C-point FFT: ``seq[m] = X[R*m + p]`` on shard p.
4. natural-order restore: output index k = R*m + p lives on shard
   k // C; the m-range [s*C/R, (s+1)*C/R) of every shard p belongs to
   shard s, so a second tiled ``all_to_all`` + local transpose yields
   X[s*C : (s+1)*C] on shard s — the same contiguous layout as the
   input, no host reshape.  (Requires R | C, i.e. mesh^2 | N; pass
   ``natural_order=False`` to skip stage 4 and receive the
   shuffled-order spectrum for mesh-size-limited N.)

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

__all__ = ["make_dfft", "dfft_reference"]


def make_dfft(fft_size: int, mesh: Mesh, axis: str = "time",
              natural_order: bool = True):
    """Build a jitted distributed FFT.

    Input: [..., fft_size] complex, last axis sharded over ``axis`` in
    natural order.  Output: the spectrum, same shape and sharding —
    natural order by default.  ``dfft.R`` / ``dfft.C`` expose the
    factorization.
    """
    n_dev = mesh.shape[axis]
    N = int(fft_size)
    R = n_dev
    if N % R:
        raise ValueError(f"fft_size {N} must divide by mesh size {n_dev}")
    C = N // R
    if natural_order and C % R:
        raise ValueError(
            f"natural order needs mesh^2 | N (R={R} must divide C={C}); "
            "pass natural_order=False for the shuffled-order spectrum"
        )
    if N >= (1 << 31):
        raise ValueError("fft_size must be < 2^31 for exact int32 twiddles")

    def local(xl):
        # xl: [..., C] — this shard's contiguous chunk.
        s_idx = lax.axis_index(axis)
        cdtype = xl.dtype
        if R == 1:
            return jnp.fft.fft(xl)

        # -- stage 1: R-point DFT across shards, per local index j.
        p = jnp.arange(R, dtype=jnp.int32)
        ps = jnp.mod(p * s_idx.astype(jnp.int32), R)
        ph1 = jnp.exp(
            (-2j * jnp.pi / R) * ps.astype(jnp.float32)).astype(cdtype)
        # contrib[p, ..., j] = xl[..., j] * W_R^{p s}
        contrib = ph1.reshape((R,) + (1,) * xl.ndim) * xl[None, ...]
        recv = lax.all_to_all(contrib, axis, split_axis=0, concat_axis=0,
                              tiled=True)
        g = jnp.sum(recv, axis=0)                      # G[p=s_idx, ..., j]

        # -- stage 2: twiddle with exact integer (p*j) mod N.
        j = jnp.arange(C, dtype=jnp.int32)
        pj = jnp.mod(s_idx.astype(jnp.int32) * j, N)   # p*j < N < 2^31
        tw = jnp.exp(
            (-2j * jnp.pi / N) * pj.astype(jnp.float32)).astype(cdtype)
        z = g * tw

        # -- stage 3: local C-point FFT -> X[R*m + p] on shard p.
        seq = jnp.fft.fft(z)

        if not natural_order:
            return seq

        # -- stage 4: route m-group s to shard s, interleave locally.
        seq = seq.reshape(seq.shape[:-1] + (R, C // R))  # [..., s, m']
        seq = jnp.moveaxis(seq, -2, 0)                   # [s, ..., m']
        recv = lax.all_to_all(seq, axis, split_axis=0, concat_axis=0,
                              tiled=True)                # [p, ..., m']
        out = jnp.moveaxis(recv, 0, -1)                  # [..., m', p]
        return out.reshape(out.shape[:-2] + (C,))        # t = R*m' + p

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

    dfft.R, dfft.C = R, C
    dfft.natural_order = natural_order
    return dfft


def dfft_reference(x):
    """numpy oracle."""
    return np.fft.fft(np.asarray(x), axis=-1)
