"""Device-mesh helpers.

The reference's parallelism is 5-7 pthreads over shared memory (SURVEY §2,
concurrency row); there is no distributed backend to translate. The TPU
engine's scalable axes instead are:

- ``dp``: data parallel over frames / sequences (multi-sequence batch mode),
- ``obs``: observation/landmark sharding for bundle-adjustment reductions —
  each device Schur-eliminates its landmark block, contributions to the
  reduced camera system are psum'd over this axis.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


_distributed_initialized = False


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> int:
    """Multi-host bootstrap: ``jax.distributed.initialize`` so
    ``jax.devices()`` spans every host of a pod slice and the meshes built
    below ride ICI/DCN collectives across them (BASELINE's 2-host scaling
    target). Arguments default to the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID — on
    Cloud TPU pods jax.distributed autodetects all three). Idempotent;
    returns the global device count. Single-process runs (no coordinator
    configured) are a no-op."""
    global _distributed_initialized
    import os

    if _distributed_initialized:
        return len(jax.devices())
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = num_processes if num_processes is not None else \
        int(os.environ.get("JAX_NUM_PROCESSES", "0") or 0)
    if addr is None and nproc == 0 and process_id is None \
            and "TPU_WORKER_HOSTNAMES" not in os.environ:
        return len(jax.devices())  # single-process: nothing to do
    kwargs = {}
    if addr is not None:
        kwargs["coordinator_address"] = addr
    if nproc:
        kwargs["num_processes"] = nproc
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    _distributed_initialized = True
    return len(jax.devices())


def make_ba_mesh(n_devices: int | None = None) -> Mesh:
    """1-D landmark-sharding mesh over every (possibly multi-host) device:
    the axis the distributed BA psums ride."""
    devs = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.array(devs).reshape(-1), ("obs",))


def make_mesh(n_devices: int | None = None, dp: int | None = None) -> Mesh:
    """Build a (dp, obs) mesh over the first n_devices devices."""
    devs = jax.devices()[: n_devices or len(jax.devices())]
    n = len(devs)
    if dp is None:
        # favor observation sharding; dp gets the rest
        dp = 1
        for cand in (4, 2):
            if n % cand == 0 and n >= cand * 2:
                dp = cand
                break
    obs = n // dp
    arr = np.array(devs).reshape(dp, obs)
    return Mesh(arr, ("dp", "obs"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
