"""Automatic pipeline sharding: Pipeline.make_sharded_step must equal
the single-device step exactly, for every op category (overlap-save,
scalar-state FM demod, shard-offset Mixer, stateless maps, polyphase
decimation, symbol-domain pulse shaping)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from comms_tpu.ops import taps
from comms_tpu.parallel import sharding as sh
from comms_tpu.runtime import (
    BpskMod,
    Decimate,
    Fir,
    FirDecimate,
    FmDemod,
    Lambda,
    Mixer,
    Pipeline,
    PrnSource,
    PulseShape,
)


def _run_both(pipe, x, blocks=2):
    """Run `blocks` sequential blocks sharded and unsharded; compare."""
    mesh = sh.time_mesh(8)
    sharded = pipe.make_sharded_step(mesh, block=x.shape[1])

    s_ref = pipe.init_state()
    s_sh = pipe.init_state()
    for b in range(blocks):
        y_ref, s_ref = pipe.step(s_ref, jnp.asarray(x[b]))
        y_sh, s_sh = sharded(s_sh, jnp.asarray(x[b]))
        assert np.allclose(np.asarray(y_sh), np.asarray(y_ref),
                           atol=1e-5), f"block {b}"
    return s_ref, s_sh


def test_sharded_fir_chain():
    rng = np.random.default_rng(0)
    t = (rng.normal(size=33) + 1j * rng.normal(size=33)).astype(np.complex64)
    pipe = Pipeline([
        Lambda(lambda v: v * 2.0),
        Fir.make(t),
    ])
    x = (rng.normal(size=(2, 2048)) + 1j * rng.normal(size=(2, 2048))
         ).astype(np.complex64)
    _run_both(pipe, x)


def test_sharded_fm_chain():
    # The fm_radio chain as a generic pipeline, auto-sharded.
    rng = np.random.default_rng(1)
    from comms_tpu.models.fm_receiver import FM_LPF_TAPS
    pipe = Pipeline([
        FirDecimate.make(FM_LPF_TAPS.astype(np.complex64), 5),
        FmDemod(),
        FirDecimate.make(FM_LPF_TAPS.astype(np.float32), 5),
    ])
    ph = np.cumsum(0.2 + 0.05 * rng.normal(size=(2, 8 * 2000)), axis=1)
    x = np.exp(1j * ph).astype(np.complex64)
    _run_both(pipe, x)


def test_sharded_mixer_phase_offsets():
    rng = np.random.default_rng(2)
    pipe = Pipeline([Mixer(dphase=0.7, phase0=0.3)])
    x = (rng.normal(size=(3, 4096)) + 1j * rng.normal(size=(3, 4096))
         ).astype(np.complex64)
    s_ref, s_sh = _run_both(pipe, x, blocks=3)
    # carried fixed-point phase stays bit-identical
    assert int(s_ref[0][0]) == int(s_sh[0][0])
    assert int(s_ref[0][1]) == int(s_sh[0][1])


def test_sharded_pulse_shaping_symbol_domain():
    rng = np.random.default_rng(3)
    t = taps.rrc_taps(32, 4.0, 0.25).astype(np.complex64)
    pipe = Pipeline([
        BpskMod(),
        PulseShape.make(t, 4),
    ])
    bits = rng.integers(0, 2, size=(2, 1024)).astype(np.int8)
    _run_both(pipe, bits)


def test_sharded_prn_source_bit_exact():
    # Distributed LFSR: per-shard advance matrices make the sharded
    # source bit-identical to the single-device sequence, blocks deep.
    pipe = Pipeline([PrnSource.make(0xC0, 1, 8, 64)])
    mesh = sh.time_mesh(8)
    step = pipe.make_sharded_step(mesh)
    s_ref, s_sh = pipe.init_state(), pipe.init_state()
    for b in range(3):
        y_ref, s_ref = pipe.step(s_ref, None)
        y_sh, s_sh = step(s_sh, None)
        assert np.array_equal(np.asarray(y_sh), np.asarray(y_ref)), b
        assert np.array_equal(np.asarray(s_sh[0]), np.asarray(s_ref[0])), b


def test_sharded_random_sources_bit_exact():
    from comms_tpu.runtime import (NormalSource, RandomBitSource,
                                   UniformSource)
    mesh = sh.time_mesh(8)
    for src in (UniformSource(block=256, start=-1.0, end=1.0, seed=7),
                NormalSource(block=256, mu=0.5, std_dev=2.0, seed=9),
                RandomBitSource(block=256, seed=11)):
        pipe = Pipeline([src])
        step = pipe.make_sharded_step(mesh)
        s_ref, s_sh = pipe.init_state(), pipe.init_state()
        for b in range(2):
            y_ref, s_ref = pipe.step(s_ref, None)
            y_sh, s_sh = step(s_sh, None)
            assert np.array_equal(np.asarray(y_sh), np.asarray(y_ref)), (
                type(src).__name__, b)


def test_sharded_source_headed_tx_chain():
    # Full source-headed tx pipeline sharded end to end.
    t = taps.rrc_taps(32, 4.0, 0.25).astype(np.complex64)
    pipe = Pipeline([
        PrnSource.make(0xC0, 0x5A, 8, 512),
        BpskMod(),
        PulseShape.make(t, 4),
    ])
    mesh = sh.time_mesh(8)
    step = pipe.make_sharded_step(mesh)
    s_ref, s_sh = pipe.init_state(), pipe.init_state()
    for b in range(3):
        y_ref, s_ref = pipe.step(s_ref, None)
        y_sh, s_sh = step(s_sh, None)
        assert np.allclose(np.asarray(y_sh), np.asarray(y_ref),
                           atol=1e-6), b


def test_sharded_validates_halo_vs_shard():
    t = np.ones(129, np.complex64)
    pipe = Pipeline([Fir.make(t)])
    mesh = sh.time_mesh(8)
    with pytest.raises(ValueError):
        pipe.make_sharded_step(mesh, block=8 * 64)  # 64 <= halo 128

def test_sharded_nco_prefix_sum():
    # NCO under time-sharding: cross-shard prefix sum of phase errors
    # must reproduce the single-device cumulative phase exactly.
    from comms_tpu.runtime import Nco
    rng = np.random.default_rng(5)
    pipe = Pipeline([Nco(dphase=0.37, phase0=1.1)])
    mesh = sh.time_mesh(8)
    step = pipe.make_sharded_step(mesh)
    s_ref, s_sh = pipe.init_state(), pipe.init_state()
    for b in range(3):
        perr = (0.01 * rng.normal(size=4096)).astype(np.float32)
        y_ref, s_ref = pipe.step(s_ref, jnp.asarray(perr))
        y_sh, s_sh = step(s_sh, jnp.asarray(perr))
        assert np.allclose(np.asarray(y_sh), np.asarray(y_ref),
                           atol=2e-5), b
        # carried phase stays in lockstep (mod 2pi)
        d = abs(float(s_sh[0]) - float(s_ref[0]))
        assert min(d, abs(d - 2 * np.pi)) < 2e-4, b


def test_sharded_random_pipelines_fuzz():
    # Random valid op chains: sharded step == single-device step.
    rng = np.random.default_rng(42)
    from comms_tpu.runtime import Upsample

    def random_pipe(r):
        ops = []
        # start complex stream; random chain of rate-safe ops
        n_ops = int(r.integers(2, 5))
        for _ in range(n_ops):
            kind = r.choice(["fir", "firdec", "mixer", "lam", "ups"])
            if kind == "fir":
                T = int(r.integers(2, 40))
                t = (r.normal(size=T) + 1j * r.normal(size=T)).astype(
                    np.complex64)
                ops.append(Fir.make(t))
            elif kind == "firdec":
                T = int(r.integers(4, 40))
                t = r.normal(size=T).astype(np.complex64)
                ops.append(FirDecimate.make(t, int(r.choice([2, 4]))))
            elif kind == "mixer":
                ops.append(Mixer(dphase=float(r.uniform(0, 3)),
                                 phase0=float(r.uniform(0, 6))))
            elif kind == "lam":
                ops.append(Lambda(lambda v: v * (0.5 + 0.25j)))
            else:
                ops.append(Upsample(int(r.choice([2, 4]))))
        return Pipeline(ops)

    mesh = sh.time_mesh(8)
    for trial in range(4):
        r = np.random.default_rng(1000 + trial)
        pipe = random_pipe(r)
        block = 8 * 1024  # divisible by any product of 2s/4s used
        try:
            pipe.check_block_size(block // 8)
        except ValueError:
            continue
        # per-shard length must exceed every halo
        local = block // 8
        ok = True
        for op in pipe.ops:
            if 0 < local <= op.halo:
                ok = False
                break
            local = op.out_len(local)
        if not ok:
            continue
        step = pipe.make_sharded_step(mesh, block=block)
        x = (r.normal(size=(block,)) + 1j * r.normal(size=(block,))
             ).astype(np.complex64)
        y_ref, _ = pipe.step(pipe.init_state(), jnp.asarray(x))
        y_sh, _ = step(pipe.init_state(), jnp.asarray(x))
        scale = max(float(np.abs(np.asarray(y_ref)).max()), 1e-9)
        assert np.allclose(np.asarray(y_sh), np.asarray(y_ref),
                           atol=2e-5 * scale), f"trial {trial}: {pipe}"


def test_sharded_graph_dag():
    # Graph DAG sharding: fan-out into a filter branch and a
    # filter+decimate branch; both must equal the single-device graph.
    from comms_tpu.runtime import FirDecimate, Graph
    rng = np.random.default_rng(13)
    t = rng.normal(size=17).astype(np.complex64)

    def build():
        g = Graph()
        g.add_input("iq")
        g.add_node("lpf", Fir.make(t), ["iq"])
        g.add_node("gain", Lambda(lambda v: v * 2.0), ["lpf"])
        g.add_node("dec", FirDecimate.make(t, 2), ["iq"])
        g.set_outputs(["gain", "dec"])
        return g

    g = build()
    step_ref = g.compile()
    mesh = sh.time_mesh(8)
    step_sh = g.make_sharded_step(mesh)

    s_ref = g.init_state()
    s_sh = g.init_state()
    x = (rng.normal(size=(2, 2048)) + 1j * rng.normal(size=(2, 2048))
         ).astype(np.complex64)
    for b in range(2):
        (g1, d1), s_ref = step_ref(s_ref, {"iq": jnp.asarray(x[b])})
        (g2, d2), s_sh = step_sh(s_sh, {"iq": jnp.asarray(x[b])})
        assert np.allclose(np.asarray(g2), np.asarray(g1), atol=1e-5)
        assert np.allclose(np.asarray(d2), np.asarray(d1), atol=1e-5)


def test_sharded_decimate_guard():
    # Non-streaming Decimate under sharding: divisible per-shard
    # lengths work (and equal single-device); indivisible raise
    # instead of silently diverging.
    pipe = Pipeline([Decimate(dec=3)])
    mesh = sh.time_mesh(8)
    step = pipe.make_sharded_step(mesh)
    x = jnp.arange(8 * 9, dtype=jnp.float32)
    y, _ = step(pipe.init_state(), x)
    y_ref, _ = pipe.step(pipe.init_state(), x)
    assert np.array_equal(np.asarray(y), np.asarray(y_ref))

    with pytest.raises(ValueError):
        step2 = pipe.make_sharded_step(mesh)
        step2(pipe.init_state(), jnp.arange(80.0))  # 10/shard, % 3 != 0


def test_sharded_rational_resample():
    from comms_tpu.ops import taps as taps_mod
    from comms_tpu.runtime import RationalResample
    rng = np.random.default_rng(21)
    h = np.asarray(taps_mod.rrc_taps(24, 3.0, 0.3)).real
    pipe = Pipeline([RationalResample.make(h, 3, 2)])
    assert pipe.check_block_size(256) == 384
    x = (rng.normal(size=(2, 8 * 256)) + 1j * rng.normal(size=(2, 8 * 256))
         ).astype(np.complex64)
    _run_both(pipe, x)


def test_sharded_graph_feedback_doubling():
    # Feedback under sharding: an elementwise consumer of a feedback
    # edge must track the single-device graph exactly (the reference's
    # doubling loop, src/node/mod.rs:945-1009, at block granularity).
    from comms_tpu.runtime import Graph

    def build():
        g = Graph()
        g.add_input("x")
        g.add_node("sum", lambda a, b: a + b, ["x", "acc"],
                   feedback_from={"acc": jnp.zeros(64, jnp.float32)},
                   elementwise=True)
        g.add_node("acc", Lambda(lambda v: v), ["sum"])
        g.set_outputs(["acc"])
        return g

    g_ref, g_sh = build(), build()
    step_ref = g_ref.compile()
    mesh = sh.time_mesh(8)
    step_sh = g_sh.make_sharded_step(mesh)
    s_ref, s_sh = g_ref.init_state(), g_sh.init_state()
    x = jnp.ones(64, jnp.float32)
    for b in range(5):
        (y_ref,), s_ref = step_ref(s_ref, {"x": x})
        (y_sh,), s_sh = step_sh(s_sh, {"x": x})
        assert np.array_equal(np.asarray(y_sh), np.asarray(y_ref)), b
    assert float(np.asarray(y_ref)[0]) == 5.0  # 1+1+1+1+1 accumulated


def test_sharded_graph_rejects_undeclared_raw_callable():
    # A reducing feedback consumer must raise at compile time, not
    # silently compute per-shard sums.
    from comms_tpu.runtime import Graph

    g = Graph()
    g.add_input("x")
    g.add_node("power", lambda v: jnp.sum(jnp.abs(v) ** 2) * jnp.ones_like(v),
               ["x"])
    g.set_outputs(["power"])
    mesh = sh.time_mesh(8)
    with pytest.raises(ValueError, match="elementwise"):
        g.make_sharded_step(mesh)
