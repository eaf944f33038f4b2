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
