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


@jax.jit
def _line_distinctive_core(stacked_desc, kf_slot, feat_idx, obs_valid):
    """Line analog of _distinctive_core: stacked_desc (K, NL, 72) u8
    quantized LBD; min-median over flip-invariant squared-L2 distances
    (MapLine::ComputeDistinctiveDescriptors, MapLine.cpp:269 — with the
    LBD metric ops/lbd.py actually matches with)."""
    from ..ops import lbd as lbd_mod

    d = stacked_desc[kf_slot, feat_idx]                    # (P, O, 72)
    dist = jax.vmap(lbd_mod.lbd_distance_matrix)(d, d)     # (P, O, O) i32
    pair_ok = obs_valid[:, :, None] & obs_valid[:, None, :]
    BIG = jnp.int32(1 << 30)
    dist = jnp.where(pair_ok, dist, BIG)
    srt = jnp.sort(dist, axis=-1)
    O = d.shape[1]
    nv = obs_valid.astype(jnp.int32).sum(-1)
    mid = jnp.clip((nv[:, None] - 1) // 2, 0, O - 1)
    med = jnp.take_along_axis(srt, mid[:, :, None].repeat(O, 1), -1)[..., 0]
    med = jnp.where(obs_valid, med, BIG)
    best = jnp.argmin(med, axis=-1)
    return jnp.take_along_axis(
        d, best[:, None, None].repeat(d.shape[-1], -1), 1)[:, 0]


def refresh_line_descriptors(m, lids) -> int:
    """MapLine::ComputeDistinctiveDescriptors + UpdateAverageDir
    (MapLine.cpp:269, 427) over a batch of line ids: pick the observation
    descriptor with minimum median distance to the rest (scattered into the
    device line arena), and refresh the host viewing stats (mean midpoint
    viewing direction + distance band over observing keyframes)."""
    lids = [int(l) for l in lids
            if m.ln_valid[l] and len(m.ln_obs[l]) >= 2]
    if not lids:
        return 0
    lids = lids[:256]
    kfs: list[int] = []
    kf_slot_of: dict[int, int] = {}
    rows = np.zeros((len(lids), MAX_OBS), np.int32)
    feats = np.zeros((len(lids), MAX_OBS), np.int32)
    valid = np.zeros((len(lids), MAX_OBS), bool)
    for i, lid in enumerate(lids):
        obs = sorted(m.ln_obs[lid].items())[-MAX_OBS:]
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
        return 0
    # ONE fixed shape (P=256, K=24): a varying pad bucket compiles a new
    # program per size class mid-run, and each first-hit compile stalls the
    # keyframe event 0.5-2 s through the tunneled backend WHILE the map
    # lock is held (measured: a single 1.9 s 'book' stall halves bench fps)
    stacked = jnp.stack([m.device_frame(k).ln_desc for k in kfs])
    P = 256
    K = 24
    if K > len(kfs):
        stacked = jnp.concatenate(
            [stacked, jnp.zeros((K - len(kfs),) + stacked.shape[1:],
                                stacked.dtype)])
    pr = np.repeat(rows[-1:], P, 0)
    pf = np.repeat(feats[-1:], P, 0)
    pv = np.repeat(valid[-1:], P, 0)
    pr[: len(lids)] = rows
    pf[: len(lids)] = feats
    pv[: len(lids)] = valid
    new_desc = _line_distinctive_core(stacked, jnp.asarray(pr),
                                      jnp.asarray(pf), jnp.asarray(pv))
    ids = np.full(P, lids[-1], np.int32)
    ids[: len(lids)] = lids
    from .map import _scatter_rows

    m._ln_desc_dev = _scatter_rows(m.line_desc_arena(), jnp.asarray(ids),
                                   new_desc)
    update_line_stats(m, lids)
    return len(lids)


def update_line_stats(m, lids):
    """UpdateAverageDir (MapLine.cpp:427): mean viewing direction of the
    line midpoint over observing keyframes + distance band around the mean
    observation distance. Host numpy — tiny bookkeeping arrays."""
    for lid in lids:
        obs = m.ln_obs[lid]
        if not obs or not m.ln_valid[lid]:
            continue
        mid = 0.5 * (m.ln_ep[lid, 0] + m.ln_ep[lid, 1])
        dirs = []
        dists = []
        for kf in obs:
            if not m.kf_valid[kf]:
                continue
            v = mid - m.kf_camera_center(kf)
            d = float(np.linalg.norm(v))
            if d > 1e-6:
                dirs.append(v / d)
                dists.append(d)
        if not dirs:
            continue
        n = np.mean(dirs, axis=0)
        nn = float(np.linalg.norm(n))
        if nn > 1e-6:
            m.ln_normal[lid] = n / nn
        dm = float(np.mean(dists))
        m.ln_max_dist[lid] = 1.6 * dm
        m.ln_min_dist[lid] = dm / 1.6


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
    # ONE fixed shape (P=512, K=24) — see refresh_line_descriptors: pad
    # buckets traded ~1 ms of padded device work for 0.5-2 s mid-run
    # compile stalls under the map lock
    P = 512
    K = 24
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
