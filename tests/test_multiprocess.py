"""Real multi-process runtime test: two OS processes join via
jax.distributed (localhost coordinator), build the global pod mesh,
feed per-host blocks, and run a psum-reduced estimator — the
end-to-end multi-host path of parallel/multihost.py.

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


def test_two_process_distributed_psum(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    coord = f"127.0.0.1:{_free_port()}"
    script = _WORKER.format(repo=repo, coord=coord)
    f = tmp_path / "worker.py"
    f.write_text(script)

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen([sys.executable, str(f), str(pid)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env)
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=150)
            outs.append((p.returncode, out))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed workers timed out")
    for rc, out in outs:
        assert rc == 0, out
        assert "WORKER_OK" in out, out


_WB_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

sys.path.insert(0, {repo!r})
from comms_tpu.parallel import multihost, sharding as sh, wideband
from comms_tpu.models.fm_receiver import FM_LPF_TAPS

pid = int(sys.argv[1])
multihost.init(coordinator_address={coord!r}, num_processes=2,
               process_id=pid)
mesh = multihost.pod_mesh()          # 4 shards over 2 processes
n = 4000 * 4
cfg = wideband.WidebandConfig(FM_LPF_TAPS, block=n, dec1=5, dec2=5)
step = wideband.make_sharded_step(cfg, mesh)
state = wideband.init_state(cfg)

# deterministic global signal; each host builds ITS half locally
ph = np.cumsum(0.2 + 0.05 * np.sin(2 * np.pi * np.arange(n) / 400))
z = (np.exp(1j * ph) * 0.9).astype(np.complex64)
pairs = np.stack([z.real, z.imag], -1).astype(np.float32)
local = pairs[pid * (n // 2): (pid + 1) * (n // 2)]
garr = multihost.host_feed(local, mesh)

(audio, freq), state = step(state, garr)
jax.block_until_ready(audio)
# per-host check: the replicated freq estimate matches the local oracle
from comms_tpu.ops import demodulation, fir
y_ref, _ = fir.fir_block(jnp.asarray(z), cfg.B_iq,
                         fir.init_ctx(cfg.num_taps, jnp.complex64))
f_ref = float(demodulation.frequency_offset_estimate(y_ref))
f_got = float(np.asarray(jax.device_get(
    freq.addressable_shards[0].data)))
assert abs(f_got - f_ref) < 1e-4, (f_got, f_ref)
print("WB_WORKER_OK", pid, round(f_got, 5), flush=True)
"""


def test_two_process_wideband_chain(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    coord = f"127.0.0.1:{_free_port()}"
    f = tmp_path / "wb_worker.py"
    f.write_text(_WB_WORKER.format(repo=repo, coord=coord))

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen([sys.executable, str(f), str(pid)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env)
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=150)
            outs.append((p.returncode, out))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("wideband workers timed out")
    for rc, out in outs:
        assert rc == 0, out
        assert "WB_WORKER_OK" in out, out
