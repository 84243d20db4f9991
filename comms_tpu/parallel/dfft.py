"""Distributed FFT: transpose-based Cooley-Tukey over the mesh.

The TP row of the parallelism table (SURVEY.md section 2.4): when
fft_size greatly exceeds a comfortable per-chip working set, one FFT
is computed cooperatively by all shards.  Four-step factorization
N = R * C with n = R*c + r, k = C*p + q:

    X[C*p + q] = FFT_R over r { e^{-2pi i r q / N} * Y[r, q] },
    Y[r, q]    = FFT_C over c { x[R*c + r] }

* rows r sharded: the C-point FFTs and the twiddle multiply are local;
* one ``all_to_all`` reshards from row-sharded to q-sharded (the only
  inter-chip traffic: N complex values once);
* the R-point FFTs are then local; a final local transpose restores
  natural k = C*p + q order, still sharded on q.

``dfft_block(x)`` takes the natural-order input sharded on the time
axis and returns the natural-order spectrum sharded the same way.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["make_dfft", "dfft_reference"]


def make_dfft(fft_size: int, mesh: Mesh, axis: str = "time"):
    """Build a jitted distributed FFT for one ``fft_size`` transform.

    Input/output: [fft_size] complex, sharded over ``axis`` on a
    natural-order layout (x[n] lives on shard n // (N/devices)).
    """
    n_dev = mesh.shape[axis]
    N = int(fft_size)
    R = n_dev  # rows = one per shard keeps the all_to_all tiled simply
    if N % R:
        raise ValueError(f"fft_size {N} must divide by mesh size {n_dev}")
    C = N // R

    # Natural-order input x[n], n = R*c + r: shard s owns n in
    # [s*C, (s+1)*C) — a *contiguous* block of n, which is exactly the
    # natural time-sharding.  In (r, c) coordinates that block is
    # {(n % R, n // R)} — scattered.  To keep everything local we
    # instead decompose with n = s*C + j (j local): the length-C local
    # chunk IS column j with r = s.  So rows r == shard index, and the
    # local chunk x_local[j] = x[s*C + j] corresponds to
    # x[R*c + r] only after the standard stride-permutation; we use
    # the DIT split n = C*r + j instead:
    #     X[k] = sum_j e^{-2pi i j k / N} ... with k = R*m + p the
    # decimation-in-frequency form:
    #     X[R*m + p] = FFT_C over j { e^{-2pi i j p / N} *
    #                    sum_r x[C*r + j]... }
    # DIF is the natural fit for contiguous shards:
    #   x split as n = s*C + j  (shard s, local j)
    #   X[R*m + p]: first combine across shards (length-R DFT over s
    #   per j — small, done via all_to_all + local), twiddle, then
    #   local C-point FFTs.
    #
    # Implementation below follows DIF:
    #   G[p, j] = sum_s x[s*C + j] * e^{-2pi i p s / R}   (R-point DFT
    #             across shards — each shard computes its term and an
    #             all_to_all + psum-style combine delivers G[p_local])
    #   X[R*m + p] = FFT_C_j { G[p, j] * e^{-2pi i p j / N} }[m]
    twiddle_base = np.exp(-2j * np.pi / N)

    def local(xl):
        s_idx = lax.axis_index(axis)
        j = jnp.arange(C)
        # Each shard s computes its contribution to every output row
        # p: contrib[p, j] = xl[j] * e^{-2pi i p s / R}.  Stack over p.
        p = jnp.arange(R)
        phase = jnp.exp(
            (-2j * jnp.pi / R) * (p[:, None].astype(jnp.float32)
                                  * s_idx.astype(jnp.float32))
        ).astype(xl.dtype)
        contrib = phase * xl[None, :]  # [R, C]
        # Sum over shards with p staying distributed: all_to_all moves
        # row p to shard p, then each shard sums its received rows.
        # contrib axis 0 has size R == n_dev.
        gathered = lax.all_to_all(contrib[:, None, :], axis,
                                  split_axis=0, concat_axis=1,
                                  tiled=False)  # -> [1?, R, C]
        g = jnp.sum(gathered.reshape(R, C), axis=0)  # G[p=s_idx, :]
        # Twiddle e^{-2pi i p j / N} with p = my shard index.
        tw = jnp.exp((-2j * jnp.pi / N)
                     * (s_idx.astype(jnp.float32) * j.astype(jnp.float32))
                     ).astype(xl.dtype)
        seq = jnp.fft.fft(g * tw)  # X[R*m + p] for m in [0, C)
        return seq

    fn = shard_map(local, mesh=mesh, in_specs=(P(axis),),
                   out_specs=P(axis))
    jfn = jax.jit(fn)

    def dfft(x):
        """x: [N] complex natural order (sharded or replicated) ->
        spectrum in SHUFFLED order: shard p holds X[R*m + p] for all
        m.  Use :func:`unshuffle` for natural order."""
        return jfn(x)

    def unshuffle(xs):
        """[N] shuffled (shard-major) -> natural order, host-side or
        jnp: element (p, m) is X[R*m + p]."""
        return jnp.asarray(xs).reshape(R, C).T.reshape(-1)

    dfft.unshuffle = unshuffle
    dfft.R, dfft.C = R, C
    return dfft


def dfft_reference(x):
    """numpy oracle."""
    return np.fft.fft(np.asarray(x))
