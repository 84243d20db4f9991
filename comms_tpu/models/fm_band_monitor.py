"""Wideband FM band monitor: channelize -> demodulate EVERY channel.

Capstone integration of the framework's pieces (no reference
counterpart; the composition the BASELINE's channelizer config
exists for): a wideband capture covering K FM stations is split by
the polyphase channelizer, then every channel is FM-demodulated and
audio-filtered IN PARALLEL — the per-channel chain is the fm_receiver
math vmapped over the channel axis, so K receivers cost one.

    wideband IQ [N, 2] ─ channelizer ─► [frames, K]
      └─ per-channel (vmapped): FM demod ─ audio FIR ÷D ─► [K, audio]

Under time-sharding the channelizer rides the standard halo protocol
and the per-channel chains are local; channel-sharding (EP-style) uses
``parallel.sharding.corner_turn`` between the two stages.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from comms_tpu.ops import channelizer as chan
from comms_tpu.ops import demodulation as demod
from comms_tpu.ops import fir

__all__ = ["BandMonitorConfig", "make_block_fn",
           "make_planar_block_fn", "make_fused_block_fn",
           "init_state", "init_state_fused"]


class BandMonitorConfig:
    def __init__(self, num_channels: int = 16, taps_per_branch: int = 8,
                 block: int = 1 << 18, audio_dec: int = 4,
                 audio_taps=None):
        self.num_channels = int(num_channels)
        self.taps_per_branch = int(taps_per_branch)
        self.block = int(block)
        self.audio_dec = int(audio_dec)
        if self.block % (self.num_channels * self.audio_dec):
            raise ValueError("block must divide by channels * audio_dec")
        h = chan.design_prototype(self.num_channels, self.taps_per_branch)
        self.prototype = h
        self.Hb = chan.branch_taps(h.astype(np.float32), self.num_channels)
        at = (np.asarray(audio_taps) if audio_taps is not None
              else chan.design_prototype(self.audio_dec, 8))
        self.audio_taps = at.astype(np.float32)
        self.audio_C = fir.decimating_branch_taps(
            self.audio_taps, self.audio_dec)

    @property
    def frames_per_block(self) -> int:
        return self.block // self.num_channels

    @property
    def audio_per_channel(self) -> int:
        return self.frames_per_block // self.audio_dec


def init_state(cfg: BandMonitorConfig):
    """(channelizer tail pairs, per-channel FM prev pairs,
    per-channel audio-FIR tails) — boundary-safe."""
    T = cfg.num_channels * cfg.taps_per_branch
    K = cfg.num_channels
    return (
        jnp.zeros((T - 1, 2), dtype=jnp.float32),
        jnp.zeros((K, 2), dtype=jnp.float32),
        jnp.zeros((K, cfg.audio_C.size - 1), dtype=jnp.float32),
    )


def init_state_fused(cfg: BandMonitorConfig):
    """State for :func:`make_fused_block_fn`: (input-tail planes,
    packed-spectrum-tail planes) — the fused kernel recomputes the
    demod lag and audio-FIR look-back from carried spectrum, so this
    is NOT interchangeable with :func:`init_state`'s layout."""
    from comms_tpu.kernels import band_monitor_pallas as _BM

    z = jnp.zeros((_BM.CTX_SAMPLES,), jnp.float32)
    yh_r, yh_i = _BM.zero_spec_halo(cfg.num_channels,
                                    cfg.audio_taps.shape[0])
    return (z, z, yh_r, yh_i)


def make_fused_block_fn(cfg: BandMonitorConfig,
                        interpret: bool = False):
    """Fully-fused serving path: jitted ``(state, re[N], im[N]) ->
    (audio[K, M], state)`` through ONE Pallas pass
    (:func:`comms_tpu.kernels.band_monitor_pallas.
    band_monitor_pallas_planar` — channelize + polynomial-atan2 FM
    demod + decimating audio FIR with no inter-stage HBM traffic; the
    staged paths materialize the full spectrum twice, which held every
    K at ~2.5 Gsps — docs/PERF.md measured lesson 16).  Demod is the
    polynomial atan2 (5e-7 rad, as ``fast_demod=True``).  State from
    :func:`init_state_fused`.  Constraints: K | 128,
    taps_per_branch <= 16, block % 16384 == 0, audio_dec | 128,
    audio taps <= 31 * (128 // K) + 1.
    """
    from comms_tpu.kernels import band_monitor_pallas as _BM

    if cfg.block % _BM.step_samples():
        raise ValueError(
            f"fused band monitor needs block % {_BM.step_samples()}"
            f" == 0, got {cfg.block}")

    def block(state, re, im):
        ctx_r, ctx_i, yh_r, yh_i = state
        audio, ctx_r, ctx_i, yh_r, yh_i = _BM.band_monitor_pallas_planar(
            re, im, cfg.prototype, cfg.audio_taps, cfg.audio_dec,
            ctx_r, ctx_i, yh_r, yh_i,
            num_channels=cfg.num_channels, interpret=interpret)
        return audio.T, (ctx_r, ctx_i, yh_r, yh_i)

    return jax.jit(block)


def fused_tail_samples(cfg: BandMonitorConfig) -> int:
    """Raw samples whose tail fully determines the fused state
    (:func:`fused_state_from_raw_tail`): the spectrum-halo frames'
    input window plus the kernel's input-context length."""
    from comms_tpu.kernels import band_monitor_pallas as _BM

    kpr = 128 // cfg.num_channels
    hframes = _BM.halo_rows(cfg.num_channels,
                            cfg.audio_taps.shape[0]) * kpr
    return hframes * cfg.num_channels + _BM.CTX_SAMPLES


def fused_state_from_raw_tail(cfg: BandMonitorConfig, re_tail, im_tail):
    """Recompute :func:`make_fused_block_fn`'s carried state from the
    last :func:`fused_tail_samples` RAW input plane samples — the
    spectrum tail is re-channelized locally (XLA path, ``hframes``
    frames), so a shard/block boundary needs only the neighbor's raw
    tail (the same trick as fm_receiver.fused_ctx_from_raw_tail).  The
    recomputed frames use identical windows to the ones the kernel
    carried but the XLA HIGHEST-precision DFT instead of the kernel's
    bf16-split one, so a boundary crossed via this recompute matches
    the kernel-carried state to ~1e-5 relative (not bit-exact).

    Runs under an internal jit, cached on the config's VALUE (the
    immutable field tuple, not the object): mutating a config after a
    first call builds a fresh jit instead of silently reusing stale
    captured constants.  The complex intermediates must stay on-device
    — eager complex ops are unimplemented on the axon runtime
    (runtime/boundary.py)."""
    key = (cfg.num_channels, cfg.taps_per_branch, cfg.audio_dec,
           np.asarray(cfg.Hb).tobytes(), cfg.audio_taps.tobytes())
    fn = _FUSED_TAIL_JITS.get(key)
    if fn is None:
        import copy
        import functools

        # Deep-copied snapshot: the jit must close over the VALUES the
        # key describes, not the live (mutable) config object.
        snap = copy.deepcopy(cfg)
        fn = jax.jit(functools.partial(_fused_state_from_raw_tail, snap))
        # FIFO-bounded: a parameter sweep constructing many configs
        # must not accumulate snapshots + compiled programs forever.
        while len(_FUSED_TAIL_JITS) >= _FUSED_TAIL_JITS_MAX:
            _FUSED_TAIL_JITS.pop(next(iter(_FUSED_TAIL_JITS)))
        _FUSED_TAIL_JITS[key] = fn
    return fn(re_tail, im_tail)


_FUSED_TAIL_JITS: dict = {}
_FUSED_TAIL_JITS_MAX = 16


def _fused_state_from_raw_tail(cfg: BandMonitorConfig, re_tail, im_tail):
    from comms_tpu.kernels import band_monitor_pallas as _BM

    K = cfg.num_channels
    kpr = 128 // K
    hrows = _BM.halo_rows(K, cfg.audio_taps.shape[0])
    hframes = hrows * kpr
    T = K * cfg.taps_per_branch
    L = fused_tail_samples(cfg)
    if re_tail.shape[0] != L:
        raise ValueError(f"raw tail must be {L} samples, got "
                         f"{re_tail.shape[0]}")
    x = jax.lax.complex(re_tail, im_tail)
    seg = x[-hframes * K:]
    pre = x[-(hframes * K + T - 1):-hframes * K]
    y, _ = chan.channelize_block(seg, cfg.Hb, pre)     # [hframes, K]
    yh_r = jnp.real(y).reshape(hrows, 128)
    yh_i = jnp.imag(y).reshape(hrows, 128)
    return (re_tail[-_BM.CTX_SAMPLES:], im_tail[-_BM.CTX_SAMPLES:],
            yh_r, yh_i)


def _make_planar_channelize(cfg: BandMonitorConfig, use_pallas,
                            interpret: bool):
    """(re[N], im[N], ctx_re[T-1], ctx_im[T-1]) ->
    (yr[frames, K], yi[frames, K], ctx_re', ctx_im')."""
    if use_pallas:
        from comms_tpu.kernels import channelizer_pallas as _CP

        if 128 % cfg.num_channels:
            raise ValueError("pallas channelizer needs K | 128")
        if cfg.block % _CP.step_samples():
            raise ValueError(
                f"pallas channelizer needs block % {_CP.step_samples()}"
                f" == 0, got {cfg.block}")
        proto = cfg.prototype
        T = cfg.num_channels * cfg.taps_per_branch
        if T - 1 > _CP.CTX_SAMPLES:
            raise ValueError(
                f"pallas channelizer carries at most {_CP.CTX_SAMPLES} "
                f"context samples; prototype length {T} (K="
                f"{cfg.num_channels} x M={cfg.taps_per_branch}) exceeds "
                "it — reduce taps_per_branch or use the XLA path")
        pad = _CP.CTX_SAMPLES - (T - 1)

        def channelize(re, im, cre, cim):
            kre = jnp.concatenate([jnp.zeros((pad,), re.dtype), cre])
            kim = jnp.concatenate([jnp.zeros((pad,), im.dtype), cim])
            yr, yi, _, _ = _CP.channelize_pallas_planar(
                re, im, proto, kre, kim,
                num_channels=cfg.num_channels, interpret=interpret)
            nre = jnp.concatenate([cre, re])[-(T - 1):]
            nim = jnp.concatenate([cim, im])[-(T - 1):]
            return yr, yi, nre, nim
    else:
        Hb = cfg.Hb

        def channelize(re, im, cre, cim):
            return chan.channelize_block_planar(re, im, Hb, cre, cim)
    return channelize


def _audio_tile_rows(cfg: BandMonitorConfig):
    """Largest kernel tile (<= 128 rows, multiple of 8) dividing the
    per-channel frame count, or 0 when the Pallas audio path can't
    take this config (odd K, indivisible frames, too many taps)."""
    from comms_tpu.kernels import decim_fir_pallas as _DF

    if cfg.num_channels % 2:
        return 0
    if cfg.audio_taps.shape[0] > _DF.max_taps(cfg.audio_dec):
        return 0
    frames = cfg.frames_per_block
    tr = 128
    while tr >= 8 and frames % (tr * cfg.audio_dec * 128):
        tr //= 2
    return tr if tr >= 8 else 0


def _planar_core(cfg: BandMonitorConfig, channelize,
                 audio_tile_rows: int = 0, interpret: bool = False,
                 fast_demod: bool = True):
    """The shared block body on planes.  ``audio_tile_rows`` > 0
    routes the per-channel audio FIR through the decimating Pallas
    kernel, channels packed PAIRWISE as re/im planes (real taps
    filter the planes independently, so two channels ride one call
    with zero waste).  ``fast_demod`` selects the polynomial atan2
    (5e-7 rad, ~4x the VPU rate of the exact one)."""
    audio_C = cfg.audio_C
    K = cfg.num_channels
    at2 = demod.fast_atan2 if fast_demod else jnp.arctan2

    if audio_tile_rows:
        from comms_tpu.kernels import decim_fir_pallas as _DF

        W = cfg.audio_dec * 128
        # carried context length: the polyphase convention's M*D - 1
        # (= audio_C.size - 1, NOT taps - 1 — they differ whenever
        # taps % dec != 0), matching init_state and the kernel's
        # "trailing MD-1 samples matter" contract
        Tm1 = cfg.audio_C.size - 1

        def audio_fir(d, actxs):
            rows = []
            for k in range(0, K, 2):
                kr = jnp.zeros((1, W), jnp.float32
                               ).at[0, W - Tm1:].set(actxs[k])
                ki = jnp.zeros((1, W), jnp.float32
                               ).at[0, W - Tm1:].set(actxs[k + 1])
                yr, yi, _, _ = _DF.fir_decimate_planar_pallas(
                    d[k], d[k + 1], cfg.audio_taps, cfg.audio_dec,
                    kr, ki, tile_rows=audio_tile_rows,
                    interpret=interpret)
                rows += [yr, yi]
            return jnp.stack(rows), d[:, -Tm1:]
    else:
        def audio_fir(d, actxs):
            audio, new_actx = jax.vmap(
                lambda dk, ak: fir.fir_decimate_poly(dk, audio_C, ak)
            )(d, actxs)
            return audio, new_actx

    def core(state, re, im):
        ctx_pairs, prev_pairs, actxs = state
        yr, yi, nre, nim = channelize(re, im,
                                      ctx_pairs[:, 0], ctx_pairs[:, 1])
        # Per-channel stage in CHANNEL-MAJOR PLANES: [frames, K] has a
        # K-lane minor dimension, so elementwise demod ran on K/128
        # lanes (measured ~85% of the block at K=16).  Transpose the
        # f32 planes once, demod via offset VIEWS of the same buffers
        # (no shifted-copy materialization), and use the polynomial
        # fast_atan2 (XLA's atan2 alone measured 2.1 Gsps standalone;
        # the polynomial runs 9.3 — ops/demodulation.fast_atan2).
        rt = yr.T                                    # [K, frames]
        it = yi.T
        a, b = rt[:, 1:], rt[:, :-1]
        c, d_ = it[:, 1:], it[:, :-1]
        d_int = at2(c * b - a * d_, a * b + c * d_)
        d0 = at2(
            it[:, 0] * prev_pairs[:, 0] - rt[:, 0] * prev_pairs[:, 1],
            rt[:, 0] * prev_pairs[:, 0] + it[:, 0] * prev_pairs[:, 1])
        d = jnp.concatenate([d0[:, None], d_int], axis=1)
        audio, new_actx = audio_fir(d, actxs)
        new_prev = jnp.stack([rt[:, -1], it[:, -1]], axis=-1)
        new_state = (
            jnp.stack([nre, nim], axis=-1),
            new_prev,
            new_actx,
        )
        return audio, new_state

    return core


def make_block_fn(cfg: BandMonitorConfig, use_pallas=None,
                  interpret: bool = False, fast_demod: bool = True):
    """jitted ``(state, iq_pairs[N, 2]) -> (audio[K, M], state)``.

    ``use_pallas`` routes the channelization stage through the fused
    Pallas channelizer kernel (K | 128, taps_per_branch <= 16,
    block % 16384 == 0) AND, when the per-channel frame count divides
    a kernel tile (:func:`_audio_tile_rows`), the audio FIRs through
    the decimating Pallas kernel with channels packed pairwise as
    re/im planes.  ``None`` (default) auto-selects on TPU when the
    constraints hold, the XLA path otherwise.

    ``fast_demod`` (default True) demodulates with the polynomial
    :func:`comms_tpu.ops.demodulation.fast_atan2` — 5e-7 rad vs the
    exact atan2, ~4x its VPU rate; pass False for the exact op.
    """
    if use_pallas is None:
        from comms_tpu.models.channelizer import _auto_use_pallas

        use_pallas = _auto_use_pallas(cfg)
    core = _planar_core(
        cfg, _make_planar_channelize(cfg, use_pallas, interpret),
        audio_tile_rows=_audio_tile_rows(cfg) if use_pallas else 0,
        interpret=interpret, fast_demod=fast_demod)

    @jax.jit
    def block(state, iq_pairs):
        return core(state, iq_pairs[:, 0], iq_pairs[:, 1])

    return block


def make_planar_block_fn(cfg: BandMonitorConfig, use_pallas=None,
                         interpret: bool = False,
                         fast_demod: bool = True):
    """Plane-native variant: jitted ``(state, re[N], im[N]) ->
    (audio[K, M], state)`` — the serving-ingest layout (io/raw_iq
    unpacks interleaved files to planes), with zero relayout anywhere:
    the planar channelizer kernel consumes/produces planes natively.
    State is interchangeable with :func:`make_block_fn` mid-stream;
    ``use_pallas`` / ``fast_demod`` as there.
    """
    if use_pallas is None:
        from comms_tpu.models.channelizer import _auto_use_pallas

        use_pallas = _auto_use_pallas(cfg)
    core = _planar_core(
        cfg, _make_planar_channelize(cfg, use_pallas, interpret),
        audio_tile_rows=_audio_tile_rows(cfg) if use_pallas else 0,
        interpret=interpret, fast_demod=fast_demod)
    return jax.jit(core)
