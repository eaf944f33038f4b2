"""Distinctive landmark descriptors — min-median-Hamming over observations.

Re-design of ``MapPoint::ComputeDistinctiveDescriptors`` (/root/reference/
src/MapPoint.cc: gather every observing keyframe's descriptor, compute all
pairwise Hamming distances, keep the descriptor with the smallest median
distance to the rest). The reference runs this per landmark with scalar
popcount loops every time an observation is added; here one jitted program
refreshes a whole BATCH of landmarks after the fusion pass:

- the observing keyframes' descriptor tables stay in HBM
  (SlamMap.kf_frames_dev) and are stacked device-side,
- (P, O, O) pairwise distances come from the same unpack+dot popcount the
  matchers use,
- a masked median (sort with +inf padding, gather at ceil(n/2)) and an
  argmin pick the winner, which is scattered straight into the device
  descriptor arena — descriptors never touch the host.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from ..ops import hamming

MAX_OBS = 8  # observations considered per landmark (newest kept)


@jax.jit
def _distinctive_core(stacked_desc, kf_slot, feat_idx, obs_valid):
    """stacked_desc (K, N, 32) u8; kf_slot/feat_idx (P, O) i32;
    obs_valid (P, O) bool. Returns (P, 32) winning descriptor rows."""
    d = stacked_desc[kf_slot, feat_idx]                    # (P, O, 32)
    P, O, _ = d.shape
    flat = d.reshape(P * O, 32)
    bits = hamming.unpack_bits(flat).reshape(P, O, 256)
    g = jnp.einsum("poB,pqB->poq", bits.astype(jnp.float32),
                   bits.astype(jnp.float32))
    n = bits.astype(jnp.int32).sum(-1)                     # (P, O)
    dist = (n[:, :, None] + n[:, None, :] - 2 * g.astype(jnp.int32))
    pair_ok = obs_valid[:, :, None] & obs_valid[:, None, :]
    BIG = jnp.int32(1 << 20)
    dist = jnp.where(pair_ok, dist, BIG)
    # masked median over each row's valid entries: sort (invalid -> BIG at
    # the tail), index the middle of the VALID prefix
    srt = jnp.sort(dist, axis=-1)                          # (P, O, O)
    nv = obs_valid.astype(jnp.int32).sum(-1)               # (P,)
    mid = jnp.clip((nv[:, None] - 1) // 2, 0, O - 1)       # (P, 1)
    med = jnp.take_along_axis(srt, mid[:, :, None].repeat(O, 1), -1)[..., 0]
    med = jnp.where(obs_valid, med, BIG)                   # (P, O)
    best = jnp.argmin(med, axis=-1)                        # (P,)
    return jnp.take_along_axis(d, best[:, None, None].repeat(32, -1),
                               1)[:, 0]


def refresh_distinctive_descriptors(m, pids) -> int:
    """Recompute descriptors for the given landmark ids from their current
    observations; scatter results into the device arena. Returns count."""
    pids = [int(p) for p in pids
            if m.pt_valid[p] and len(m.pt_obs[p]) >= 2]
    if not pids:
        return 0
    pids = pids[:512]
    kfs: list[int] = []
    kf_slot_of: dict[int, int] = {}
    rows = np.zeros((len(pids), MAX_OBS), np.int32)
    feats = np.zeros((len(pids), MAX_OBS), np.int32)
    valid = np.zeros((len(pids), MAX_OBS), bool)
    for i, pid in enumerate(pids):
        obs = sorted(m.pt_obs[pid].items())[-MAX_OBS:]
        for o, (kf, feat) in enumerate(obs):
            if m.kf_frames_dev[kf] is None and m.kf_frames[kf] is None:
                continue
            s = kf_slot_of.get(kf)
            if s is None:
                s = len(kfs)
                kf_slot_of[kf] = s
                kfs.append(kf)
            rows[i, o] = s
            feats[i, o] = feat
            valid[i, o] = True
    if not kfs or len(kfs) > 24:
        return 0  # degenerate or oversized batch: skip this round
    stacked = jnp.stack([m.device_frame(k).kp_desc for k in kfs])
    # pad P to a bucket so the program compiles for a handful of shapes
    P = 8
    while P < len(pids):
        P *= 2
    K = 4
    while K < len(kfs):
        K *= 2
    stacked = jnp.concatenate(
        [stacked, jnp.zeros((K - len(kfs),) + stacked.shape[1:],
                            stacked.dtype)]) if K > len(kfs) else stacked
    # pad rows by REPEATING the last landmark: the duplicate scatter writes
    # the same value, so scatter order doesn't matter
    pr = np.repeat(rows[-1:], P, 0)
    pf = np.repeat(feats[-1:], P, 0)
    pv = np.repeat(valid[-1:], P, 0)
    pr[: len(pids)] = rows
    pf[: len(pids)] = feats
    pv[: len(pids)] = valid
    new_desc = _distinctive_core(stacked, jnp.asarray(pr), jnp.asarray(pf),
                                 jnp.asarray(pv))
    # scatter winners into the arena (device-side; ids upload is tiny)
    ids = np.full(P, pids[-1], np.int32)
    ids[: len(pids)] = pids
    from .map import _scatter_rows

    m._pt_desc_dev = _scatter_rows(m.point_desc_arena(), jnp.asarray(ids),
                                   new_desc)
    return len(pids)
