"""Multi-process jax.distributed execution (the BASELINE 2-host target's
core mechanism, exercised with 2 local CPU processes).

Round-3 gap: ``initialize_distributed`` had zero coverage — the dryrun was
single-process over 8 virtual devices, so the multi-process code path (the
thing a real 2-host pod slice runs) had never executed anywhere. This test
spawns 2 OS processes, bootstraps the jax.distributed runtime between
them, builds a GLOBAL mesh spanning both processes' CPU devices, and runs
a psum'd collective of the exact shape the distributed BA uses (reduced
camera system contributions all-reduced over the ``obs`` axis)."""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
sys.path.insert(0, %(repo)r)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from plslam_tpu.parallel import mesh as pmesh

pid = int(sys.argv[1])
n_glob = pmesh.initialize_distributed(
    coordinator_address=%(addr)r, num_processes=2, process_id=pid)
assert n_glob == 4, f"expected 4 global devices, got {n_glob}"
assert jax.process_count() == 2, jax.process_count()

mesh = pmesh.make_ba_mesh()  # global 1-D ("obs",) mesh over 4 devices
# per-shard contribution of shape (C, 6, 6) — the reduced-camera-system
# block each landmark shard produces in parallel.ba.distributed_gn_step;
# fill each shard with its GLOBAL shard index + 1
C = 4
local = np.stack([
    np.full((1, C, 6, 6), 2 * pid + i + 1, np.float32)
    for i in range(2)])  # (2 local shards, 1, C, 6, 6)
sharding = NamedSharding(mesh, P("obs"))
garr = jax.make_array_from_process_local_data(
    sharding, local.reshape(2, C, 6, 6), (4, C, 6, 6))

from jax.experimental.shard_map import shard_map

@jax.jit
def reduce_S(x):
    def f(xs):
        return jax.lax.psum(xs, "obs")
    return shard_map(f, mesh=mesh, in_specs=(P("obs"),),
                     out_specs=P("obs"))(x)

out = reduce_S(garr)
# psum over 4 shards of constants 1+2+3+4 = 10, visible identically in
# every process's addressable shards
for sh in out.addressable_shards:
    lo = np.asarray(sh.data)
    assert np.allclose(lo, 10.0), lo.ravel()[:4]
print(f"proc {pid} OK global_devices={n_glob}", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def test_two_process_distributed_psum(tmp_path):
    addr = f"localhost:{_free_port()}"
    script = tmp_path / "worker.py"
    script.write_text(WORKER % {"repo": REPO, "addr": addr})
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen([sys.executable, str(script), str(pid)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         env=env, text=True)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert f"proc {pid} OK" in out, out[-2000:]
