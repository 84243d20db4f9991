"""QPSK transmitter with mixer upconversion.

Chain parity with ``/root/reference/examples/single_thread_qpsk.rs:16-52``
(4096 bits -> 2048 QPSK syms -> zero-stuff x4 -> RRC(32, 4, 0.25)
-> scale 8192 -> i16 file) plus the BASELINE config's "mixer
upconvert" stage (a closed-form phase-ramp mixer after pulse shaping;
the reference's qpsk_zmq example mixes similarly before transmit).

One jitted block: bits -> symbols (consecutive-pair map) -> polyphase
RRC GEMM -> mixer (precomputed ramp x carried phasor) -> i16 pairs.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from comms_tpu.ops import mixer, modulation, pulse, random as crandom, taps

__all__ = ["QpskTxConfig", "make_block_fn", "make_pipeline", "init_state",
           "run_to_file"]


class QpskTxConfig:
    def __init__(self, bits_per_block: int = 4096, sps: int = 4,
                 num_taps: int = 32, beta: float = 0.25,
                 scale: float = 8192.0, dphase: float = 0.0,
                 phase0: float = 0.0):
        if bits_per_block % 2:
            raise ValueError("bits_per_block must be even")
        self.bits_per_block = int(bits_per_block)
        self.sps = int(sps)
        self.num_taps = int(num_taps)
        self.beta = float(beta)
        self.scale = float(scale)
        self.dphase = float(dphase)
        self.phase0 = float(phase0)
        t = taps.rrc_taps(num_taps, float(sps), beta).astype(np.complex64)
        self.phase_taps = pulse.polyphase_taps(t, sps)
        n_out = (bits_per_block // 2) * sps
        self.ramp, _ = mixer.mixer_ramp(n_out, dphase)
        self.advance_fix = mixer.advance_fix(n_out, dphase)

    @property
    def samples_per_block(self) -> int:
        return (self.bits_per_block // 2) * self.sps


def init_state(cfg: QpskTxConfig, seed: int = 0):
    key = crandom.source_init(seed)
    ctx_len = max(-(-cfg.num_taps // cfg.sps) - 1, 0)
    ctx_pairs = jnp.zeros((ctx_len, 2), dtype=jnp.float32)
    phase = mixer.phase_fix_init(cfg.phase0)
    return key, ctx_pairs, phase


def make_block_fn(cfg: QpskTxConfig):
    """jitted ``state -> (iq_i16[N, 2], new_state)``."""
    # numpy closures, not device arrays: complex cannot cross the
    # axon host<->device boundary (runtime/boundary.py).
    H = cfg.phase_taps
    ramp = cfg.ramp

    @jax.jit
    def block(state):
        key, ctx_pairs, phase = state
        bits, key = crandom.random_bits_block(key, cfg.bits_per_block)
        sym = modulation.qpsk_bits_mod_example(bits)
        ctx = jax.lax.complex(ctx_pairs[:, 0], ctx_pairs[:, 1])
        y, ctx = pulse.pulse_shape_block(sym, H, ctx)
        y, phase = mixer.mixer_block_fix(y, phase, ramp, cfg.advance_fix)
        new_ctx_pairs = jnp.stack([jnp.real(ctx), jnp.imag(ctx)], axis=-1)
        re = jnp.clip(jnp.trunc(jnp.real(y) * cfg.scale),
                      -32768.0, 32767.0).astype(jnp.int16)
        im = jnp.clip(jnp.trunc(jnp.imag(y) * cfg.scale),
                      -32768.0, 32767.0).astype(jnp.int16)
        return jnp.stack([re, im], axis=-1), (key, new_ctx_pairs, phase)

    return block


def make_pipeline(cfg: Optional[QpskTxConfig] = None, seed: int = 0):
    """The same tx chain on the generic runtime layer (source-headed
    Pipeline: bits -> QPSK -> pulse shape -> mixer -> i16 quantize).
    Bit-exact to :func:`make_block_fn` with the same seed."""
    from comms_tpu.runtime import (
        Lambda, Mixer, Pipeline, PulseShape, QpskMod, RandomBitSource,
    )

    cfg = cfg or QpskTxConfig()
    t = taps.rrc_taps(cfg.num_taps, float(cfg.sps),
                      cfg.beta).astype(np.complex64)

    def quantize(y):
        re = jnp.clip(jnp.trunc(jnp.real(y) * cfg.scale),
                      -32768.0, 32767.0).astype(jnp.int16)
        im = jnp.clip(jnp.trunc(jnp.imag(y) * cfg.scale),
                      -32768.0, 32767.0).astype(jnp.int16)
        return jnp.stack([re, im], axis=-1)

    return Pipeline([
        RandomBitSource(cfg.bits_per_block, seed),
        QpskMod(example_convention=True),
        PulseShape.make(t, cfg.sps),
        Mixer(cfg.dphase, cfg.phase0),
        Lambda(quantize, result_dtype=jnp.int16),
    ])


def run_to_file(path, num_blocks: int, cfg: Optional[QpskTxConfig] = None,
                seed: int = 0) -> int:
    cfg = cfg or QpskTxConfig()
    block = make_block_fn(cfg)
    state = init_state(cfg, seed)
    written = 0
    with open(path, "wb") as f:
        for _ in range(num_blocks):
            iq, state = block(state)
            arr = np.asarray(iq).astype(np.int16)
            f.write(arr.tobytes())
            written += arr.shape[0]
    return written
