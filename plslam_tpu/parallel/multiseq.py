"""Multi-sequence batch tracking — data parallelism over video streams.

The reference processes one video stream per process; its only
parallelism is 5-7 pthreads sharing that stream's map. A TPU chip at
these problem sizes is latency-bound, not FLOP-bound: the fused per-frame
program leaves most of the MXU idle, and on a networked deployment every
dispatch pays fixed transport overhead. Batching B independent sequences
into ONE vmapped fused step amortizes both — the serving-throughput mode
for robot fleets / dataset sweeps (BASELINE.md's "data parallel over
frames/sequences" axis).

Each sequence keeps its own host state machine, map, and mapper; only the
per-frame device dispatch is shared. Sequences that leave the OK state
(bootstrap, relocalization) step solo until they rejoin the batch —
identical results to running B Trackers, by construction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SlamConfig
from ..models import tracking as T


@functools.partial(jax.jit, static_argnames=("cfg", "stereo"))
def _batched_step(cfg: SlamConfig, gray, depth, args, stereo: bool = False):
    """vmap of the fused track step over the leading sequence axis."""

    def one(g, d, a):
        return T.fused_track_step(cfg, g, d, *a, stereo=stereo)

    return jax.vmap(one)(gray, depth, args)


class MultiTracker:
    """Drive B trackers with one batched device dispatch per frame step."""

    def __init__(self, trackers):
        self.trackers = list(trackers)
        if not self.trackers:
            raise ValueError("need at least one tracker")
        cfgs = {id(t.cfg) for t in self.trackers}
        if len(cfgs) != 1:
            raise ValueError("all trackers must share one SlamConfig")
        self.cfg = self.trackers[0].cfg

    def process(self, frames, timestamps):
        """``frames``: list of (gray, depth) per sequence; ``timestamps``:
        list of floats. Returns the per-sequence results (pose or None)."""
        results = [None] * len(self.trackers)
        batch_idx = []
        grays, depths, args = [], [], []
        for i, (tr, (g, d)) in enumerate(zip(self.trackers, frames)):
            if tr.state != T.OK or tr._lm_args is None:
                # bootstrap / LOST: solo step (different program shape)
                results[i] = tr.process(g, d, timestamps[i])
                continue
            gq, dq = tr._quantize_inputs(g, d)
            grays.append(jnp.asarray(gq))
            depths.append(jnp.asarray(dq))
            args.append(tr.dispatch_args())
            batch_idx.append(i)
        if batch_idx:
            stacked_args = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *args)
            outs = _batched_step(
                self.cfg, jnp.stack(grays), jnp.stack(depths), stacked_args,
                stereo=(self.trackers[batch_idx[0]].sensor == "stereo"),
            )
            for b, i in enumerate(batch_idx):
                tr = self.trackers[i]
                out_b = jax.tree_util.tree_map(lambda a: a[b], outs)
                results[i] = tr.process(
                    frames[i][0], frames[i][1], timestamps[i],
                    precomputed_out=out_b)
        return results

    def flush(self):
        for tr in self.trackers:
            tr.flush()
