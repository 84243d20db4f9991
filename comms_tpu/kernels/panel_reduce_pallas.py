"""Mosaic groundwork for the QPSK boundary block (docs/ROADMAP_r6.md
item 3): the panel-side reductions of ``_estimates_from_panels``
expressed in proven-supported kernel ops.

The round-5 fused receiver computes the correlation panels in-kernel
but still ships them to XLA for the estimate chain (~0.28 ms/block of
per-fusion scheduling on the tunneled runtime).  Moving that chain
in-kernel needs three op families the XLA form writes as gathers and
einsums — both unsupported in Mosaic (probed, docs/PERF.md round-5
layout section).  This module proves the Mosaic-safe replacements as
a standalone kernel with oracle tests, so the full boundary block is
an assembly job rather than a research project:

1. **offset-diagonal sums** ``g[v] = sum_j E[j, j + hw + v]``
   (``lag_sums_r2``'s take_along_axis): ONE iota shear mask per v is
   O(V) passes; instead ONE pass builds the shear index ``c - j``
   and a [V_pad, width] one-hot accumulation runs as a matmul:
   g = sum_j onehot(c - j - hw) — expressed here as the
   mathematically identical column-sum of E against a diagonal
   selection matmul: ``g = colsum((P_shear @ E-rows))`` is NOT
   Mosaic-expressible, so we use the measured-cheap masked form:
   V passes of compare+select+reduce over [128, 256] (~3.4M VPU ops
   per boundary, ~1 us — executed ONCE per block).
2. **mod-sps diagonal fold** ``G[a, v] = sum_{j = a (mod 4)} ...``:
   the same masks AND'ed with a row-phase mask.
3. **carrier phase fold + atan2**: the v = -1 diagonal's
   (re, im) -> ``f_est`` via the fm kernel's octant-reduced
   polynomial atan2 (8.8e-8 rad).

Reference semantics: ``frequency_estimator.rs:27-42`` (the v = -1
diagonal IS the reference's frequency estimate) and the Mengali lag
statistics of ``timing_estimator.rs:13-113``.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from comms_tpu.kernels.fm_chain_pallas import _atan2

__all__ = ["panel_reductions", "HW_MAX"]

_LANES = 128
HW_MAX = 64                      # matches qpsk_sym_pallas panels_hw


def _kernel(e13, e24, out, *, hw: int, sps: int):
    """[256, 256] panel accumulators (the fused kernel's outputs,
    rows rev|imv, cols lag windows) -> [16, 128] reductions:

      row 0/1: g_r[v], g_i[v] for v in [-hw, hw] at lanes hw+v
               (the r2-rotated lagged-correlation sums' raw parts)
      rows 8+a (a < sps): the mod-sps diagonal folds Gr[a, v]
      row 2, lane 0: f_est = atan2 of the v = -1 diagonal
    """
    E13 = e13[:]
    E24 = e24[:]
    # Er/Ei with the r2 rotation folded (lanes % sps == 0 case of
    # lag_sums_r2): c2/s2 depend on j mod sps only — built in-kernel
    # from a row iota (pallas rejects captured host constants).
    rphase = (lax.broadcasted_iota(jnp.int32, (_LANES, 2 * _LANES), 0)
              % sps).astype(jnp.float32) * jnp.float32(2.0 * np.pi / sps)
    c2 = jnp.cos(rphase)
    s2 = jnp.sin(rphase)
    P1 = E13[:_LANES, :]
    P3 = E13[_LANES:, :]
    P2 = -E24[:_LANES, :]
    P4 = -E24[_LANES:, :]
    Er = (c2 * P1 + s2 * P3) - (c2 * P4 - s2 * P2)
    Ei = (c2 * P2 + s2 * P4) + (c2 * P3 - s2 * P1)

    rows = lax.broadcasted_iota(jnp.int32, (_LANES, 2 * _LANES), 0)
    cols = lax.broadcasted_iota(jnp.int32, (_LANES, 2 * _LANES), 1)
    shear = cols - rows              # == hw + v on the v-diagonal
    lanes1 = lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)

    gr = jnp.zeros((1, _LANES), jnp.float32)
    gi = jnp.zeros((1, _LANES), jnp.float32)
    for v in range(2 * hw + 1):
        m = shear == v
        sr = jnp.sum(jnp.where(m, Er, 0.0))
        si = jnp.sum(jnp.where(m, Ei, 0.0))
        sel = (lanes1 == v).astype(jnp.float32)
        gr = gr + sel * sr
        gi = gi + sel * si
    out[0:1, :] = gr
    out[1:2, :] = gi

    # mod-sps folds (the symbol-phase energies' first stage)
    for a in range(sps):
        rmask = (rows % sps) == a
        ga = jnp.zeros((1, _LANES), jnp.float32)
        for v in range(2 * hw + 1):
            m = (shear == v) & rmask
            sa = jnp.sum(jnp.where(m, Er, 0.0))
            ga = ga + (lanes1 == v).astype(jnp.float32) * sa
        out[8 + a:9 + a, :] = ga

    # f_est = atan2 over the v = -1 diagonal (frequency_estimator.rs)
    m1 = shear == (hw - 1)
    fr = jnp.sum(jnp.where(m1, Er, 0.0))
    fi_ = jnp.sum(jnp.where(m1, Ei, 0.0))
    f_est = _atan2(jnp.full((1, _LANES), fi_, jnp.float32),
                   jnp.full((1, _LANES), fr, jnp.float32))
    out[2:3, :] = jnp.where(lanes1 == 0, f_est, 0.0)


def panel_reductions(p13, p24, hw: int, sps: int = 4,
                     interpret: bool = False):
    """Kernel entry: the fused receiver's [256, 256] panel
    accumulators -> [16, 128] boundary reductions (see _kernel).
    Groundwork only — not yet wired into the receiver."""
    if not (0 < hw <= HW_MAX):
        raise ValueError(f"hw must be in (0, {HW_MAX}], got {hw}")
    spec = pl.BlockSpec((2 * _LANES, 2 * _LANES), lambda: (0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, hw=hw, sps=sps),
        in_specs=[spec, spec],
        out_specs=pl.BlockSpec((16, _LANES), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, _LANES), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(p13, jnp.float32), jnp.asarray(p24, jnp.float32))
