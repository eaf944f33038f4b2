"""Map refinement pass — the reference's LocalMapping thread as a
sequential batch pass per new keyframe.

Covers (/root/reference/src/LocalMapping.cc):
- ProcessNewKeyFrame (:186-240): observation attachment happens at KF
  creation in models.tracking; covisibility is recomputed on demand.
- MapPointCulling / MapLineCulling (:246-340): found-ratio and
  observation-count rules over the recent-landmark window.
- SearchInNeighbors fusion (:922-1104): project neighbor landmarks into the
  new KF (and vice versa) with a tight window, merge duplicates keeping the
  better-observed landmark (ORBmatcher::Fuse semantics, ORBmatcher.cc:1107).
  The reference's line fusion is dead code (:1036-1090 commented out); here
  it is implemented live — one of the intended-but-disabled behaviors this
  build realizes.
- LocalBundleAdjustment (:119-121 → Optimizer.cc:644) — joint point+line
  local BA via optim.local_ba (the reference's local BA is points-only;
  lines join here as its dead code intended).

- KeyFrameCulling (:1224-1321): retire keyframes whose close map points are
  >=90% redundant (seen by >=3 other KFs at same/finer scale).

Epipolar triangulation of extra points (:346-916) beyond the depth range is
tracked in ROADMAP (RGB-D creates landmarks from depth, so triangulation is
an accuracy bonus, not a dependency).
"""

from __future__ import annotations

import threading

import functools
import logging

import jax
import jax.numpy as jnp
import numpy as np

_log = logging.getLogger(__name__)

from ..config import SlamConfig
from ..ops import matching
from .map import SlamMap

FUSE_TH_PX = 3.0
FUSE_DESC_TH = 50  # TH_LOW


def _fuse_core(
    cfg: SlamConfig,
    # target KF feature arrays
    kp_xy_un, kp_octave, kp_desc, kp_valid,
    # candidate landmarks
    p3d, desc, mind, maxd, valid,
    R, t,
    radius_px: float = FUSE_TH_PX,
):
    """Project candidate points into the target KF and match tightly
    (ORBmatcher::Fuse, th=3*scale^level, desc<=TH_LOW)."""
    cam = cfg.camera
    scale = cfg.orb.scale_factor
    pc = p3d @ R.T + t
    z = pc[:, 2]
    safe = jnp.where(jnp.abs(z) > 1e-6, z, 1e-6)
    uv = jnp.stack(
        [cam.fx * pc[:, 0] / safe + cam.cx, cam.fy * pc[:, 1] / safe + cam.cy], -1
    )
    in_img = (z > 0.05) & (uv[:, 0] >= 0) & (uv[:, 0] < cam.width) & \
        (uv[:, 1] >= 0) & (uv[:, 1] < cam.height)
    cam_center = -(R.T @ t)
    dist = jnp.linalg.norm(p3d - cam_center, axis=-1)
    dist_ok = (dist >= 0.8 * mind) & (dist <= 1.2 * maxd)
    ratio = jnp.log(jnp.maximum(maxd, 1e-6) / jnp.maximum(dist, 1e-6))
    pred = jnp.clip(jnp.ceil(ratio / jnp.log(scale)).astype(jnp.int32), 0,
                    cfg.orb.n_levels - 1)
    radius = radius_px * scale ** pred.astype(jnp.float32)
    ok = valid & in_img & dist_ok
    gate = (
        matching.window_gate(uv, kp_xy_un, radius)
        & matching.octave_gate(pred, kp_octave, -1, 1)
        & ok[:, None]
        & kp_valid[None, :]
    )
    m = matching.match_descriptors(desc, kp_desc, gate, FUSE_DESC_TH, dedupe=True)
    return m.idx, m.ok


fuse_step = functools.partial(
    jax.jit, static_argnames=("cfg", "radius_px")
)(_fuse_core)


@functools.partial(jax.jit, static_argnames=("cfg", "radius_px"))
def fuse_multi_step(cfg, kp_xy_un, kp_octave, kp_desc, kp_valid,
                    p3d, desc, mind, maxd, valid, R, t,
                    radius_px: float = FUSE_TH_PX):
    """Reverse fusion / two-view seeding: ONE candidate set (the new KF's
    landmarks) projected into a BATCH of neighbor keyframes — vmapped over
    the KF axis so the whole neighborhood costs a single dispatch."""

    def single(kxy, koct, kdesc, kval, Rk, tk):
        return _fuse_core(cfg, kxy, koct, kdesc, kval,
                          p3d, desc, mind, maxd, valid, Rk, tk, radius_px)

    return jax.vmap(single)(kp_xy_un, kp_octave, kp_desc, kp_valid, R, t)


@functools.partial(jax.jit, static_argnames=("cfg",))
def line_fuse_step(cfg, f_ep, f_angle, f_length, f_desc, f_valid,
                   cand_ep3d, cand_desc, cand_valid, R, t):
    """Project candidate map lines into a keyframe and run the STRICT
    line gate cascade (LineMatcher::Fuse, LineMatcher.cpp:1207-1379 —
    the conservative pass only, no relaxed retry)."""
    from ..ops import line_matching

    proj = line_matching.project_lines(cfg.camera, R, t, cand_ep3d,
                                       cand_valid)
    m = line_matching.match_lines(proj, cand_desc, f_ep, f_angle, f_length,
                                  f_desc, f_valid, cfg.lines,
                                  allow_relax=False)
    return m.idx, m.ok


@functools.partial(jax.jit, static_argnames=("cfg",))
def line_fuse_multi_step(cfg, f_ep, f_angle, f_length, f_desc, f_valid,
                         cand_ep3d, cand_desc, cand_valid, R, t):
    """Reverse line fusion: ONE candidate set projected into a BATCH of
    neighbor keyframes (vmapped over the KF axis)."""

    def single(fep, fang, flen, fdesc, fval, Rk, tk):
        return line_fuse_step(cfg, fep, fang, flen, fdesc, fval,
                              cand_ep3d, cand_desc, cand_valid, Rk, tk)

    return jax.vmap(single)(f_ep, f_angle, f_length, f_desc, f_valid, R, t)


class LocalMapper:
    def __init__(self, cfg: SlamConfig, slam_map: SlamMap, enable_ba: bool = True,
                 kfdb=None):
        self.cfg = cfg
        self.map = slam_map
        self.enable_ba = enable_ba
        self.kfdb = kfdb
        self.recent_points: list[tuple[int, int]] = []  # (pid, created_at_kf)
        self.recent_lines: list[tuple[int, int]] = []
        self._fuse_cap = 4096
        # Map::mMutexMapUpdate equivalent: guards host map mutations against
        # the tracker when this mapper runs on a worker thread. Held per
        # STAGE, never across BA iterations — the reference holds its map
        # mutex only around the write-back, and holding it through a
        # multi-hundred-ms BA would stall the tracker's frame retirement.
        self.lock = threading.RLock()
        # polled between BA iterations (mbAbortBA, LocalMapping.cc:1107)
        self.should_abort = None
        from .triangulation import Triangulator

        self.triangulator = Triangulator(cfg, slam_map)

    @staticmethod
    def _bucket(n: int, lo: int, hi: int) -> int:
        """Next power-of-two padding bucket in [lo, hi]. Device programs are
        shape-specialized; padding to worst-case caps makes every mapper
        dispatch pay big-map cost while the map is small (the dominant
        frame-loop interference early in a sequence). A handful of buckets
        means a handful of compiles, all persisted in the XLA cache."""
        b = lo
        while b < min(n, hi):
            b *= 2
        return min(b, hi)

    def on_new_landmarks(self, kf: int, pt_ids, ln_ids):
        for p in pt_ids:
            if p >= 0:
                self.recent_points.append((int(p), kf))
        for l in ln_ids:
            if l >= 0:
                self.recent_lines.append((int(l), kf))

    # ------------------------------------------------------------------ main
    def process_keyframe(self, kf: int):
        # LOCK DISCIPLINE: the tracker's frame retirement takes this same
        # lock every frame, so no stage may hold it across a device round
        # trip (~30-80 ms on the tunneled TPU). Device work runs unlocked;
        # each apply step re-validates against concurrent map changes.
        with self.lock:
            self.map.update_spanning_tree(kf)  # ProcessNewKeyFrame tail
            self.cull_points(kf)
            self.cull_lines(kf)
        # CreateNewMapPoints (epipolar, beyond the depth range) —
        # cheap no-op while the sensor covers the scene
        self.triangulator.create_new_points(kf, mapper=self, lock=self.lock)
        # CreateNewMapLines (LocalMapping.cc:668-916)
        from .triangulation import create_new_lines

        create_new_lines(self.cfg, self.map, kf, mapper=self, lock=self.lock)
        self.fuse(kf)
        if self.enable_ba and self.map.n_kf > 2:
            self.run_local_ba(kf)
        with self.lock:
            self.cull_keyframes(kf)

    # ------------------------------------------------------------- culling
    def cull_points(self, current_kf: int):
        """MapPointCulling (LocalMapping.cc:246-297), RGB-D thresholds."""
        m = self.map
        keep: list[tuple[int, int]] = []
        for pid, born in self.recent_points:
            if not m.pt_valid[pid]:
                continue
            found_ratio = m.pt_found[pid] / max(m.pt_visible[pid], 1)
            age = current_kf - born
            if found_ratio < self.cfg.mapping.culling_min_found_ratio:
                m.erase_point(pid)
            elif age >= 2 and len(m.pt_obs[pid]) <= self.cfg.mapping.culling_min_obs:
                m.erase_point(pid)
            elif age >= 3:
                pass  # graduated
            else:
                keep.append((pid, born))
        self.recent_points = keep

    def cull_lines(self, current_kf: int):
        """MapLineCulling (LocalMapping.cc:299-340)."""
        m = self.map
        keep: list[tuple[int, int]] = []
        for lid, born in self.recent_lines:
            if not m.ln_valid[lid]:
                continue
            found_ratio = m.ln_found[lid] / max(m.ln_visible[lid], 1)
            age = current_kf - born
            if found_ratio < self.cfg.mapping.culling_min_found_ratio:
                m.erase_line(lid)
            elif age >= 2 and len(m.ln_obs[lid]) <= self.cfg.mapping.culling_min_obs:
                m.erase_line(lid)
            elif age >= 3:
                pass
            else:
                keep.append((lid, born))
        self.recent_lines = keep

    def cull_keyframes(self, kf: int):
        """KeyFrameCulling (LocalMapping.cc:1224-1321): retire a covisible
        keyframe when >=90% of its close map points are observed by >=3
        other keyframes at the same or finer scale. The depth gate
        (0 < d <= th_depth) is the reference's RGB-D branch; KF0 and the
        current KF are never culled."""
        m = self.map
        th_obs = 3
        th_depth = self.cfg.tracking.th_depth
        cands = [c for c in m.covisible_keyframes(kf)
                 if c != 0 and c != kf and m.kf_valid[c]
                 and m.kf_frames[c] is not None]
        if not cands:
            return
        # one join over kf_pt_idx (the inverse observation map) replaces
        # the reference's per-point dict walks: a per-point histogram of
        # observation octaves, whose running cumsum answers "how many
        # observers at scale <= L" for every candidate feature at once.
        # (Observers without a host frame snapshot can't contribute an
        # octave and are excluded from both counts.)
        n_lv = self.cfg.orb.n_levels
        cams = [c for c in range(m.n_kf)
                if m.kf_valid[c] and m.kf_frames[c] is not None]
        rows = m.kf_pt_idx[cams]                               # (K, N)
        octs = np.stack([m.kf_frames[c].kp_octave for c in cams])
        obs_mask = (rows >= 0) & m.pt_valid[np.clip(rows, 0, None)]
        hist = np.zeros((m.pt_pos.shape[0], n_lv), np.int32)
        np.add.at(hist, (rows[obs_mask],
                         np.clip(octs[obs_mask].astype(np.int32), 0,
                                 n_lv - 1)), 1)
        cum = np.cumsum(hist, axis=1)        # cum[p, L] = #obs octave <= L
        n_obs = cum[:, -1]
        for ckf in cands:
            if not m.kf_valid[ckf]:
                continue
            host = m.kf_frames[ckf]
            row = m.kf_pt_idx[ckf]
            p = np.clip(row, 0, None)
            d = host.kp_depth
            ok = ((row >= 0) & m.pt_valid[p] & (d > 0) & (d <= th_depth)
                  & (n_obs[p] > th_obs))
            lvl = np.clip(host.kp_octave.astype(np.int32) + 1, 0, n_lv - 1)
            # own observation always satisfies octave <= octave+1: subtract
            others = cum[p, lvl] - 1
            n_pts = int(ok.sum())
            n_red = int((ok & (others >= th_obs)).sum())
            if n_pts > 0 and n_red > self.cfg.mapping.kf_culling_redundancy * n_pts:
                sel = (row >= 0) & m.pt_valid[p]
                m.erase_keyframe(ckf)
                if self.kfdb is not None:
                    self.kfdb.erase(ckf)
                # later candidates must not count the erased KF's obs
                np.subtract.at(
                    hist, (row[sel],
                           np.clip(host.kp_octave[sel].astype(np.int32), 0,
                                   n_lv - 1)), 1)
                cum = np.cumsum(hist, axis=1)
                n_obs = cum[:, -1]

    # --------------------------------------------------------------- fusion
    def fuse(self, kf: int):
        """SearchInNeighbors: merge duplicate landmarks between the new KF
        and its 2-level covisibility neighborhood. Candidate harvesting and
        merge application hold the map lock; the projection kernels and
        their round trips run unlocked so the tracker keeps retiring
        frames."""
        self._fuse_impl(kf)
        if self.cfg.use_lines:
            self._fuse_lines_impl(kf)

    def _neighborhood(self, kf: int) -> list[int]:
        """2-level covisibility neighborhood (SearchInNeighbors harvest,
        LocalMapping.cc:929-950). Caller must hold the map lock."""
        m = self.map
        neighbors = m.covisible_keyframes(
            kf, self.cfg.mapping.triangulation_neighbors)
        ext = list(neighbors)
        seen = set(ext) | {kf}
        for n1 in neighbors[:5]:
            for n2 in m.covisible_keyframes(n1, 5):
                if n2 not in seen:
                    ext.append(n2)
                    seen.add(n2)
        return ext

    def _fuse_lines_impl(self, kf: int):
        """Line half of SearchInNeighbors (LineMatcher::Fuse,
        LineMatcher.cpp:1207-1379; the reference's LocalMapping call site is
        the dead code at LocalMapping.cc:1036-1090 — live here): project
        neighbor map lines into the new KF, gate with the strict cascade,
        merge duplicates keeping the better-observed line; then the reverse
        direction over the neighbor batch."""
        m = self.map
        LCAP = 512
        touched: list[int] = []
        with self.lock:
            ext = self._neighborhood(kf)
            if not ext:
                return
            own = set(int(l) for l in m.kf_ln_idx[kf] if l >= 0)
            cand = np.unique(m.kf_ln_idx[ext])
            cand = cand[cand >= 0]
            cand = np.array(
                [l for l in cand if m.ln_valid[l] and int(l) not in own],
                np.int32)[:LCAP]
            Rk = m.kf_R[kf].copy()
            tk = m.kf_t[kf].copy()
        if len(cand) > 0:
            fdv = m.device_frame(kf)
            C = LCAP
            ep3d = np.zeros((C, 2, 3), np.float32)
            valid = np.zeros(C, bool)
            lid_pad = np.zeros(C, np.int32)
            k = len(cand)
            ep3d[:k] = m.ln_ep[cand]
            valid[:k] = True
            lid_pad[:k] = cand
            desc = m.line_desc_arena()[jnp.asarray(lid_pad)]
            idx, ok = line_fuse_step(
                self.cfg, fdv.ln_ep_un, fdv.ln_angle, fdv.ln_length,
                fdv.ln_desc, fdv.ln_valid,
                jnp.asarray(ep3d), desc, jnp.asarray(valid),
                jnp.asarray(Rk), jnp.asarray(tk),
            )
            idx, ok = jax.device_get((idx, ok))  # sync OUTSIDE the lock
            ok = ok.copy()
            ok[k:] = False
            with self.lock:
                for i in np.nonzero(ok)[0]:
                    lid = int(cand[i])
                    feat = int(idx[i])
                    if not m.ln_valid[lid]:
                        continue
                    bound = int(m.kf_ln_idx[kf, feat])
                    if bound < 0:
                        if kf not in m.ln_obs[lid]:  # IsInKeyFrame guard
                            m.add_line_obs(lid, kf, feat)
                            touched.append(lid)
                    elif bound != lid and m.ln_valid[bound]:
                        winner, loser = (
                            (lid, bound)
                            if len(m.ln_obs[lid]) >= len(m.ln_obs[bound])
                            else (bound, lid)
                        )
                        self.replace_line(loser, winner)
                        touched.append(winner)

        # reverse direction: the new KF's lines into the neighbor batch
        with self.lock:
            own_lids = m.kf_ln_idx[kf]
            own_lids = own_lids[own_lids >= 0]
            own_lids = own_lids[m.ln_valid[own_lids]][:LCAP]
            targets = [o for o in ext if m.kf_valid[o]][:10]
        if len(own_lids) and targets:
            K = len(targets)
            K_FIX = 10
            pad_t = targets + [targets[-1]] * (K_FIX - K)
            dev = [m.device_frame(o) for o in pad_t]
            fep = jnp.stack([f.ln_ep_un for f in dev])
            fang = jnp.stack([f.ln_angle for f in dev])
            flen = jnp.stack([f.ln_length for f in dev])
            fdesc = jnp.stack([f.ln_desc for f in dev])
            fval = jnp.stack(
                [f.ln_valid if i < K else jnp.zeros_like(f.ln_valid)
                 for i, f in enumerate(dev)])
            Rs = np.stack([m.kf_R[o] for o in pad_t])
            ts = np.stack([m.kf_t[o] for o in pad_t])
            C2 = LCAP
            ep2 = np.zeros((C2, 2, 3), np.float32)
            val2 = np.zeros(C2, bool)
            lid2 = np.zeros(C2, np.int32)
            k2 = len(own_lids)
            ep2[:k2] = m.ln_ep[own_lids]
            val2[:k2] = True
            lid2[:k2] = own_lids
            desc2 = m.line_desc_arena()[jnp.asarray(lid2)]
            idx2, ok2 = line_fuse_multi_step(
                self.cfg, fep, fang, flen, fdesc, fval,
                jnp.asarray(ep2), desc2, jnp.asarray(val2),
                jnp.asarray(Rs), jnp.asarray(ts),
            )
            idx2, ok2 = jax.device_get((idx2, ok2))
            ok2 = ok2.copy()
            ok2[:, k2:] = False
            with self.lock:
                for ki, okf in enumerate(targets):
                    if not m.kf_valid[okf]:
                        continue
                    for i in np.nonzero(ok2[ki])[0]:
                        lid = int(own_lids[i])
                        if not m.ln_valid[lid]:
                            continue
                        feat = int(idx2[ki, i])
                        bound = int(m.kf_ln_idx[okf, feat])
                        if bound < 0:
                            if okf not in m.ln_obs[lid]:  # IsInKeyFrame
                                m.add_line_obs(lid, okf, feat)
                                touched.append(lid)
                        elif bound != lid and m.ln_valid[bound]:
                            winner, loser = (
                                (bound, lid)
                                if len(m.ln_obs[bound]) >= len(m.ln_obs[lid])
                                else (lid, bound)
                            )
                            self.replace_line(loser, winner)
                            touched.append(winner)
        if touched:
            from .distinctive import refresh_line_descriptors

            with self.lock:
                refresh_line_descriptors(self.map, sorted(set(touched)))

    def _fuse_impl(self, kf: int):
        m = self.map
        touched: list[int] = []  # landmarks whose observation set changed
        with self.lock:
            ext = self._neighborhood(kf)
            if not ext:
                return
            # candidate points: observed by neighbors but not by the new KF
            own = set(int(p) for p in m.kf_pt_idx[kf] if p >= 0)
            cand = np.unique(m.kf_pt_idx[ext])
            cand = cand[cand >= 0]
            cand = np.array(
                [p for p in cand if m.pt_valid[p] and int(p) not in own],
                np.int32)
        if len(cand) > 0:
            cand = cand[: self._fuse_cap]
            fdv = m.device_frame(kf)  # features stay in HBM — no re-upload
            # ONE fixed shape per fuse program (compile once at the first
            # KF event; variable buckets stalled the loop on mid-run
            # compiles through the tunnel — ~1 ms of padded device work
            # per event buys their absence)
            C = self._fuse_cap
            p3d = np.zeros((C, 3), np.float32)
            mind = np.zeros(C, np.float32)
            maxd = np.zeros(C, np.float32)
            valid = np.zeros(C, bool)
            pid_pad = np.zeros(C, np.int32)
            k = len(cand)
            p3d[:k] = m.pt_pos[cand]
            mind[:k] = m.pt_min_dist[cand]
            maxd[:k] = m.pt_max_dist[cand]
            valid[:k] = True
            pid_pad[:k] = cand
            desc = m.point_desc_arena()[jnp.asarray(pid_pad)]
            idx, ok = fuse_step(
                self.cfg,
                fdv.kp_xy_un, fdv.kp_octave, fdv.kp_desc, fdv.kp_valid,
                jnp.asarray(p3d), desc, jnp.asarray(mind),
                jnp.asarray(maxd), jnp.asarray(valid),
                jnp.asarray(m.kf_R[kf]), jnp.asarray(m.kf_t[kf]),
            )
            idx, ok = jax.device_get((idx, ok))  # sync OUTSIDE the lock
            ok = ok.copy()
            ok[k:] = False
            with self.lock:
                for i in np.nonzero(ok)[0]:
                    pid = int(cand[i])
                    feat = int(idx[i])
                    if not m.pt_valid[pid]:
                        continue  # erased while unlocked
                    bound = int(m.kf_pt_idx[kf, feat])
                    if bound < 0:
                        if kf not in m.pt_obs[pid]:  # IsInKeyFrame guard
                            m.add_point_obs(pid, kf, feat)
                            touched.append(pid)
                    elif bound != pid and m.pt_valid[bound]:
                        # merge: keep the better-observed landmark (Replace)
                        winner, loser = (
                            (pid, bound)
                            if len(m.pt_obs[pid]) >= len(m.pt_obs[bound])
                            else (bound, pid)
                        )
                        self.replace_point(loser, winner)
                        touched.append(winner)

        # ---- reverse direction / two-view confirmation: project the new
        # KF's landmarks into the neighbor keyframes (the second half of
        # SearchInNeighbors, LocalMapping.cc:985-1030 — and the functional
        # stand-in for CreateNewMapPoints' triangulation, :346-916: a
        # depth-seeded landmark that re-finds itself in a neighbor keyframe
        # gains its second observation HERE, which is what lets it survive
        # MapPointCulling's obs<=3-at-age-2 rule; without this pass every
        # depth-seeded point dies young and covisibility starves). A wider
        # 5px window than Fuse's 3px accounts for detector jitter across
        # view change, like the triangulation path's epipolar (not window)
        # gating in the reference.
        with self.lock:
            own_pids = m.kf_pt_idx[kf]
            own_pids = own_pids[own_pids >= 0]
            own_pids = own_pids[m.pt_valid[own_pids]][: 2048]
        if len(own_pids) == 0 or not ext:
            self._refresh_descriptors(touched)
            return
        # pad the target batch to a BUCKETED size: a varying keyframe count
        # would retrace/recompile the vmapped kernel per distinct K
        targets = ext[:10]
        K = len(targets)
        K_FIX = 10
        pad_t = targets + [targets[-1]] * (K_FIX - K)
        dev = [m.device_frame(o) for o in pad_t]  # HBM-resident snapshots
        kxy = jnp.stack([f.kp_xy_un for f in dev])
        koct = jnp.stack([f.kp_octave for f in dev])
        kdesc = jnp.stack([f.kp_desc for f in dev])
        kval = jnp.stack(
            [f.kp_valid if i < K else jnp.zeros_like(f.kp_valid)
             for i, f in enumerate(dev)]
        )
        Rs = np.stack([m.kf_R[o] for o in pad_t])
        ts = np.stack([m.kf_t[o] for o in pad_t])
        C2 = 2048
        p3d2 = np.zeros((C2, 3), np.float32)
        mind2 = np.zeros(C2, np.float32)
        maxd2 = np.zeros(C2, np.float32)
        valid2 = np.zeros(C2, bool)
        pid_pad2 = np.zeros(C2, np.int32)
        k2 = len(own_pids)
        p3d2[:k2] = m.pt_pos[own_pids]
        mind2[:k2] = m.pt_min_dist[own_pids]
        maxd2[:k2] = m.pt_max_dist[own_pids]
        valid2[:k2] = True
        pid_pad2[:k2] = own_pids
        desc2 = m.point_desc_arena()[jnp.asarray(pid_pad2)]
        idx2, ok2 = fuse_multi_step(
            self.cfg,
            kxy, koct, kdesc, kval,
            jnp.asarray(p3d2), desc2, jnp.asarray(mind2),
            jnp.asarray(maxd2), jnp.asarray(valid2),
            jnp.asarray(Rs), jnp.asarray(ts),
            radius_px=5.0,
        )
        idx2, ok2 = jax.device_get((idx2, ok2))  # sync OUTSIDE the lock
        ok2 = ok2.copy()
        ok2[:, k2:] = False
        with self.lock:
            for ki, okf in enumerate(targets):
                if not m.kf_valid[okf]:
                    continue  # culled while unlocked
                for i in np.nonzero(ok2[ki])[0]:
                    pid = int(own_pids[i])
                    if not m.pt_valid[pid]:
                        continue
                    feat = int(idx2[ki, i])
                    bound = int(m.kf_pt_idx[okf, feat])
                    if bound < 0:
                        if okf not in m.pt_obs[pid]:  # IsInKeyFrame guard
                            m.add_point_obs(pid, okf, feat)
                            touched.append(pid)
                    elif bound != pid and m.pt_valid[bound]:
                        # prefer the older landmark on ties (stability)
                        winner, loser = (
                            (bound, pid)
                            if len(m.pt_obs[bound]) >= len(m.pt_obs[pid])
                            else (pid, bound)
                        )
                        self.replace_point(loser, winner)
                        touched.append(winner)
        self._refresh_descriptors(touched)

    def _refresh_descriptors(self, touched):
        """ComputeDistinctiveDescriptors over the landmarks the fusion
        pass touched (MapPoint.cc semantics; see models.distinctive).
        Holds the lock: the prep walks pt_obs dicts the tracker mutates,
        and the device side is enqueue-only (no sync round trip)."""
        if not touched:
            return
        from .distinctive import refresh_distinctive_descriptors

        with self.lock:
            refresh_distinctive_descriptors(self.map, sorted(set(touched)))

    def replace_point(self, loser: int, winner: int):
        """MapPoint::Replace (MapPoint.cc): rebind all observations."""
        m = self.map
        m.pt_found[winner] += m.pt_found[loser]
        m.pt_visible[winner] += m.pt_visible[loser]
        for okf, ofeat in list(m.pt_obs[loser].items()):
            if okf in m.pt_obs[winner]:
                m.kf_pt_idx[okf, ofeat] = -1
            else:
                m.kf_pt_idx[okf, ofeat] = winner
                m.pt_obs[winner][okf] = ofeat
        m.pt_obs[loser].clear()
        m.pt_valid[loser] = False

    # ------------------------------------------------------------- local BA
    def run_local_ba(self, kf: int, window: int | None = None,
                     obs_cap: int | None = None,
                     point_cap: int | None = None,
                     line_cap: int | None = None,
                     lobs_cap: int | None = None,
                     max_kf: int | None = None):
        """Gather the covisibility-local BA problem (under the map lock),
        run the stepped Schur LM with the lock RELEASED — one XLA program
        per iteration so the tracker's frame dispatches interleave, aborting
        when a new keyframe queues up (mbAbortBA) — then write back poses/
        landmarks and erase outlier observations under the lock again
        (LocalBundleAdjustment, Optimizer.cc:644-1063 — with line landmarks
        live, as the reference's dead code intended)."""
        import jax.numpy as jnp

        from ..optim import local_ba

        m = self.map
        self.lock.acquire()
        locked = True
        mc = self.cfg.mapping
        window = window or mc.local_ba_window
        C_max = window + mc.local_ba_fixed_cap
        P = point_cap or mc.local_ba_point_cap
        O = obs_cap or mc.local_ba_obs_cap
        L = line_cap or mc.local_ba_line_cap
        OL = lobs_cap or mc.local_ba_lobs_cap

        n_all = m.n_kf if max_kf is None else min(max_kf, m.n_kf)
        if window >= n_all:
            # global BA: every keyframe participates (``max_kf`` bounds the
            # set to the caller's snapshot so keyframes appended mid-GBA are
            # corrected exactly once, by the caller's anchor propagation)
            local = [k for k in range(n_all) if m.kf_valid[k]]
        else:
            local = [kf] + m.covisible_keyframes(kf, window - 1)
        local = local[:window]
        local_set = set(local)
        # landmarks seen by local KFs
        pids = np.unique(m.kf_pt_idx[local])
        pids = pids[(pids >= 0) & m.pt_valid[np.clip(pids, 0, None)]]
        lids = np.unique(m.kf_ln_idx[local])
        lids = lids[(lids >= 0) & m.ln_valid[np.clip(lids, 0, None)]]
        if len(pids) > P or len(lids) > L:
            _log.warning(
                "local BA caps truncate the problem: %d/%d points, %d/%d "
                "lines (raise local_ba_point_cap/line_cap or pass caps)",
                min(len(pids), P), len(pids), min(len(lids), L), len(lids))
        pids = pids[:P]
        lids = lids[:L]
        # fixed cameras: other observers of those landmarks
        fixed = []
        fixed_seen = set(local_set)
        for pid in pids:
            for okf in m.pt_obs[pid]:
                if okf not in fixed_seen:
                    fixed.append(okf)
                    fixed_seen.add(okf)
            if len(fixed) >= mc.local_ba_fixed_cap:
                break
        cams = local + fixed[: mc.local_ba_fixed_cap]
        cam_index = {c: i for i, c in enumerate(cams)}
        nC = len(cams)
        C = self._bucket(nC, 8, C_max)
        cam_R = np.broadcast_to(np.eye(3, dtype=np.float32), (C, 3, 3)).copy()
        cam_t = np.zeros((C, 3), np.float32)
        cam_fixed = np.zeros(C, bool)
        cam_valid = np.zeros(C, bool)
        for i, c in enumerate(cams):
            cam_R[i] = m.kf_R[c]
            cam_t[i] = m.kf_t[c]
            cam_valid[i] = True
            cam_fixed[i] = (i >= len(local)) or (c == 0)
        if not cam_fixed[:nC].any():
            cam_fixed[0] = True  # gauge

        scale = self.cfg.orb.scale_factor
        # vectorized observation gather: kf_pt_idx IS the inverse
        # observation map, so the whole obs list is one (nC, N) mask +
        # nonzero — the reference's per-point dict walks
        # (Optimizer.cc:700-800) at numpy speed
        lut = np.full(m.pt_pos.shape[0], -1, np.int32)
        lut[pids] = np.arange(len(pids), dtype=np.int32)
        rows = m.kf_pt_idx[cams]                       # (nC, N)
        pidx = lut[np.clip(rows, 0, None)]
        obs_mask = (rows >= 0) & (pidx >= 0)
        ci_arr, feat_arr = np.nonzero(obs_mask)
        if len(ci_arr) > O:
            _log.warning("local BA obs cap truncates: %d/%d point obs",
                         O, len(ci_arr))
            ci_arr, feat_arr = ci_arr[:O], feat_arr[:O]
        xy_s = np.stack([m.kf_frames[c].kp_xy_un for c in cams])
        ur_s = np.stack([m.kf_frames[c].kp_ur for c in cams])
        oct_s = np.stack([m.kf_frames[c].kp_octave for c in cams])
        oc = ci_arr.astype(np.int32)
        op = pidx[ci_arr, feat_arr].astype(np.int32)
        ouv = xy_s[ci_arr, feat_arr]
        our = ur_s[ci_arr, feat_arr]
        ow = (1.0 / scale**2) ** oct_s[ci_arr, feat_arr].astype(np.float32)
        oval = np.ones(len(oc), bool)

        llut = np.full(m.ln_ep.shape[0], -1, np.int32)
        llut[lids] = np.arange(len(lids), dtype=np.int32)
        lrows = m.kf_ln_idx[cams]                      # (nC, NL)
        lidx = llut[np.clip(lrows, 0, None)]
        lmask = (lrows >= 0) & (lidx >= 0)
        lci, lfeat = np.nonzero(lmask)
        if len(lci) > OL:
            _log.warning("local BA line-obs cap truncates: %d/%d line obs",
                         OL, len(lci))
            lci, lfeat = lci[:OL], lfeat[:OL]
        lep_s = np.stack([m.kf_frames[c].ln_ep_un for c in cams])
        lc = lci.astype(np.int32)
        ll = lidx[lci, lfeat].astype(np.int32)
        luv = lep_s[lci, lfeat]
        lw = np.ones(len(lc), np.float32)
        lval = np.ones(len(lc), bool)
        if len(oc) < 20:
            self.lock.release()
            return

        # pad every axis to its power-of-two bucket of the ACTUAL problem
        # size — the worst-case caps above are 10-30x oversized while the
        # map is young, and BA device time interferes with the frame loop
        P = self._bucket(len(pids), 512, P)
        O = self._bucket(len(oc), 2048, O)
        L = self._bucket(len(lids), 64, L)
        OL = self._bucket(len(lc), 256, OL)
        prob = local_ba.make_problem(C, P, O, L, OL)

        def pad(arr, n, shape=(), dtype=np.float32):
            a = np.zeros((n,) + shape, dtype)
            if len(arr):
                a[: len(arr)] = np.asarray(arr, dtype)
            return a

        k = len(pids)
        pt_xyz = np.zeros((P, 3), np.float32)
        pt_xyz[:k] = m.pt_pos[pids]
        pt_valid = np.zeros(P, bool)
        pt_valid[:k] = True
        kl = len(lids)
        ln_ep = np.zeros((L, 2, 3), np.float32)
        ln_ep[:kl] = m.ln_ep[lids]
        ln_valid = np.zeros(L, bool)
        ln_valid[:kl] = True

        prob = prob._replace(
            cam_R=jnp.asarray(cam_R), cam_t=jnp.asarray(cam_t),
            cam_fixed=jnp.asarray(cam_fixed), cam_valid=jnp.asarray(cam_valid),
            pt_xyz=jnp.asarray(pt_xyz), pt_valid=jnp.asarray(pt_valid),
            obs_cam=jnp.asarray(pad(oc, O, dtype=np.int32)),
            obs_pt=jnp.asarray(pad(op, O, dtype=np.int32)),
            obs_uv=jnp.asarray(pad(ouv, O, (2,))),
            obs_ur=jnp.asarray(pad(our, O)),
            obs_w=jnp.asarray(pad(ow, O)),
            obs_valid=jnp.asarray(pad(oval, O, dtype=bool)),
            ln_ep=jnp.asarray(ln_ep), ln_valid=jnp.asarray(ln_valid),
            lobs_cam=jnp.asarray(pad(lc, OL, dtype=np.int32)),
            lobs_ln=jnp.asarray(pad(ll, OL, dtype=np.int32)),
            lobs_uv=jnp.asarray(pad(luv, OL, (2, 2))),
            lobs_w=jnp.asarray(pad(lw, OL)),
            lobs_valid=jnp.asarray(pad(lval, OL, dtype=bool)),
        )
        # iterate without the map lock: the tracker must be able to retire
        # frames while LM runs (the reference's BA also runs outside the map
        # mutex and is interruptible)
        self.lock.release()
        locked = False
        distributed = (
            C > mc.ba_dense_camera_cap and mc.use_distributed_ba
            and jax.device_count() > 1
        )
        try:
            if distributed:
                # whole-map GBA on the device mesh: landmark blocks sharded
                # over every visible chip (one host's, or a jax.distributed
                # multi-host slice), reduced camera system psum'd over ICI
                # (parallel.ba). Points-only like the reference's GBA
                # (Optimizer.cc:60-374); lines ride their reference KFs in
                # the write-back below.
                from ..parallel import ba as pba
                from ..parallel import mesh as pmesh

                nR, nt, nxyz, inl = pba.distributed_bundle_adjust(
                    self.cfg.camera, prob, pmesh.make_ba_mesh(),
                    iters=mc.distributed_ba_iters, cg_iters=mc.ba_cg_iters,
                    should_abort=self.should_abort,
                )
                nep = np.array(prob.ln_ep)  # writable copy: transported below
                linl = np.asarray(prob.lobs_valid)
            elif C > mc.ba_dense_camera_cap:
                # whole-map scale: matrix-free PCG Schur (optim.ba_cg) —
                # the dense (C,C,6,6)+(P,C,6,3) tensors don't fit here
                from ..optim import ba_cg

                res = ba_cg.bundle_adjust_cg_stepped(
                    self.cfg.camera, prob, iters1=mc.local_ba_iters1,
                    iters2=mc.local_ba_iters2,
                    should_abort=self.should_abort,
                    cg_iters=mc.ba_cg_iters,
                )
            else:
                res = local_ba.bundle_adjust_stepped(
                    self.cfg.camera, prob, iters1=mc.local_ba_iters1,
                    iters2=mc.local_ba_iters2,
                    should_abort=self.should_abort,
                )
            if not distributed:
                (nR, nt, nxyz, nep, inl, linl) = jax.device_get(
                    (res.cam_R, res.cam_t, res.pt_xyz, res.ln_ep,
                     res.obs_inlier, res.lobs_inlier)
                )
        finally:
            self.lock.acquire()
            locked = True
        if distributed and kl:
            # transport line endpoints rigidly with their reference KF's
            # pose update (the loop-closer's landmark transport pattern)
            rk = m.ln_first_kf[lids]
            ci = np.array([cam_index.get(int(r), -1) for r in rk], np.int32)
            mv = (ci >= 0) & ~cam_fixed[np.clip(ci, 0, None)]
            if mv.any():
                c = ci[mv]
                for i in (0, 1):
                    pc_ = np.einsum("nij,nj->ni", cam_R[c],
                                    ln_ep[:kl][mv, i]) + cam_t[c]
                    nep[:kl][mv, i] = np.einsum(
                        "nji,nj->ni", nR[c], pc_ - nt[c])
        # write back — guarding landmarks/KFs erased while the lock was out
        for i, c in enumerate(cams):
            if not cam_fixed[i] and m.kf_valid[c]:
                m.set_kf_pose(c, nR[i], nt[i])
        still = m.pt_valid[pids]
        m.pt_pos[pids[still]] = nxyz[:k][still]
        lstill = m.ln_valid[lids]
        m.ln_ep[lids[lstill]] = nep[:kl][lstill]
        # erase outlier observations (Optimizer.cc:1010-1045)
        for j in range(len(oc)):
            if not inl[j]:
                pid = int(pids[op[j]])
                okf = cams[oc[j]]
                feat = m.pt_obs[pid].pop(okf, None)
                if feat is not None:
                    m.kf_pt_idx[okf, feat] = -1
                if len(m.pt_obs[pid]) == 0:
                    m.erase_point(pid)
        for j in range(len(lc)):
            if not linl[j]:
                lid = int(lids[ll[j]])
                okf = cams[lc[j]]
                feat = m.ln_obs[lid].pop(okf, None)
                if feat is not None:
                    m.kf_ln_idx[okf, feat] = -1
                if len(m.ln_obs[lid]) == 0:
                    m.erase_line(lid)
        self.lock.release()

    def replace_line(self, loser: int, winner: int):
        m = self.map
        m.ln_found[winner] += m.ln_found[loser]
        m.ln_visible[winner] += m.ln_visible[loser]
        for okf, ofeat in list(m.ln_obs[loser].items()):
            if okf in m.ln_obs[winner]:
                m.kf_ln_idx[okf, ofeat] = -1
            else:
                m.kf_ln_idx[okf, ofeat] = winner
                m.ln_obs[winner][okf] = ofeat
        m.ln_obs[loser].clear()
        m.ln_valid[loser] = False
