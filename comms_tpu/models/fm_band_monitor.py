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
from comms_tpu.ops import fir

__all__ = ["BandMonitorConfig", "make_block_fn", "init_state"]


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
        self.audio_C = fir.decimating_branch_taps(
            at.astype(np.float32), self.audio_dec)

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


def make_block_fn(cfg: BandMonitorConfig, use_pallas=None,
                  interpret: bool = False):
    """jitted ``(state, iq_pairs[N, 2]) -> (audio[K, M], state)``.

    ``use_pallas`` routes the channelization stage through the fused
    Pallas kernel (K | 128, taps_per_branch <= 16,
    block % 16384 == 0); the per-channel demod + audio FIR stay XLA.
    ``None`` (default) auto-selects the kernel on TPU when those
    constraints hold (2.2x the XLA channelization stage with
    completion-synced timing), the XLA path otherwise.
    """
    if use_pallas is None:
        from comms_tpu.models.channelizer import _auto_use_pallas

        use_pallas = _auto_use_pallas(cfg)
    Hb = cfg.Hb
    audio_C = cfg.audio_C
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

        def channelize(x, ctx):
            pad = _CP.CTX_SAMPLES - (T - 1)
            kctx = jnp.concatenate([jnp.zeros((pad,), x.dtype), ctx])
            y, _ = _CP.channelize_pallas(
                x, proto, kctx, num_channels=cfg.num_channels,
                interpret=interpret)
            new_ctx = jnp.concatenate([ctx, x])[-(T - 1):]
            return y, new_ctx
    else:
        def channelize(x, ctx):
            return chan.channelize_block(x, Hb, ctx)

    def per_channel(y_ch, prev_pair, actx):
        # y_ch: [frames] complex for one channel.
        prev = jax.lax.complex(prev_pair[0], prev_pair[1])
        shifted = jnp.concatenate([prev[None], y_ch[:-1]])
        d = jnp.angle(y_ch * jnp.conj(shifted)).astype(jnp.float32)
        audio, actx2 = fir.fir_decimate_poly(d, audio_C, actx)
        new_prev = jnp.stack([jnp.real(y_ch[-1]), jnp.imag(y_ch[-1])])
        return audio, new_prev, actx2

    @jax.jit
    def block(state, iq_pairs):
        ctx_pairs, prev_pairs, actxs = state
        x = jax.lax.complex(iq_pairs[:, 0], iq_pairs[:, 1])
        ctx = jax.lax.complex(ctx_pairs[:, 0], ctx_pairs[:, 1])
        y, ctx2 = channelize(x, ctx)                 # [frames, K]
        audio, new_prev, new_actx = jax.vmap(
            per_channel, in_axes=(1, 0, 0), out_axes=(0, 0, 0)
        )(y, prev_pairs, actxs)
        new_state = (
            jnp.stack([jnp.real(ctx2), jnp.imag(ctx2)], axis=-1),
            new_prev,
            new_actx,
        )
        return audio, new_state

    return block
