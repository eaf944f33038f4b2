"""World model: keyframe / map-point / map-line arenas.

Re-design of the reference's pointer-graph map (L2 of SURVEY §1: ``Map``,
``KeyFrame``, ``MapPoint``, ``MapLine`` — /root/reference/src/Map.cc,
KeyFrame.cc, MapPoint.cc, MapLine.cpp) as struct-of-arrays arenas:

- keyframes are rows in pose/feature arrays (feature snapshots are the
  per-frame ``FrameData`` mirrored to host numpy),
- landmarks live in fixed-capacity arenas with free-list allocation,
- observations are encoded by per-keyframe match arrays
  ``kf_pt_idx[kf, feat] -> point_id`` (the inverse of the reference's
  ``MapPoint::mObservations`` map) plus python obs lists for O(1) walks,
- covisibility weights are recomputed from observation joins
  (KeyFrame::UpdateConnections semantics, KeyFrame.cc:363-452),
- the mutex forest disappears: all mutation happens in the sequential
  host passes between device steps.

Host numpy is deliberate: these are small bookkeeping structures; all heavy
compute happens in the jitted device passes that read gathered, padded
views of these arenas.
"""

from __future__ import annotations

from dataclasses import field

import numpy as np

from ..config import SlamConfig


class HostFrame:
    """Numpy mirror of a device FrameData (keyframe feature snapshot)."""

    __slots__ = (
        "kp_xy", "kp_xy_un", "kp_resp", "kp_octave", "kp_angle", "kp_desc",
        "kp_depth", "kp_ur", "kp_valid",
        "ln_ep", "ln_ep_un", "ln_angle", "ln_length", "ln_coeff", "ln_desc",
        "ln_depth", "ln_valid",
    )

    def __init__(self, fd):
        for k in self.__slots__:
            setattr(self, k, np.asarray(getattr(fd, k)))


class SlamMap:
    """Global map arenas + keyframe registry."""

    def __init__(self, cfg: SlamConfig):
        self.cfg = cfg
        cap = cfg.capacity
        n_kp = cfg.orb.max_keypoints
        n_ln = cfg.lines.max_lines

        # keyframes
        self.kf_R = np.zeros((cap.max_keyframes, 3, 3), np.float32)
        self.kf_t = np.zeros((cap.max_keyframes, 3), np.float32)
        self.kf_valid = np.zeros(cap.max_keyframes, bool)
        self.kf_frame_id = np.full(cap.max_keyframes, -1, np.int64)
        self.kf_timestamp = np.zeros(cap.max_keyframes, np.float64)
        self.kf_frames: list[HostFrame | None] = [None] * cap.max_keyframes
        # device-resident feature snapshots (see device_frame)
        self.kf_frames_dev: list = [None] * cap.max_keyframes
        self.kf_pt_idx = np.full((cap.max_keyframes, n_kp), -1, np.int32)
        self.kf_ln_idx = np.full((cap.max_keyframes, n_ln), -1, np.int32)
        # spanning tree (KeyFrame::mpParent/mspChildrens): attached on the
        # keyframe's first covisibility update, used by the essential graph
        # and by erase-time reparenting
        self.kf_parent = np.full(cap.max_keyframes, -1, np.int32)
        self.kf_children: list[set[int]] = [set() for _ in range(cap.max_keyframes)]
        # persistent loop edges (KeyFrame::mspLoopEdges, KeyFrame.cc:
        # 491-502): every closed loop's (loop_kf, current_kf) pair; later
        # essential-graph runs must keep re-asserting old loop constraints
        # (Optimizer.cc:1270-1290) or a second correction can tear them
        self.loop_edges: list[tuple[int, int]] = []
        # cull chain for trajectory healing (KeyFrame::mTcp, KeyFrame.cc:
        # SetBadFlag tail): when a keyframe is culled, its pose relative to
        # its then-parent is frozen here so frames referenced to it can be
        # re-expressed against a surviving ancestor at save time
        # (System::SaveTrajectoryTUM, System.cc:337-396)
        self.kf_cull_parent = np.full(cap.max_keyframes, -1, np.int32)
        self.kf_cull_Rcp = np.zeros((cap.max_keyframes, 3, 3), np.float32)
        self.kf_cull_tcp = np.zeros((cap.max_keyframes, 3), np.float32)
        self.n_kf = 0

        # map points
        self.pt_pos = np.zeros((cap.max_points, 3), np.float32)
        self.pt_desc = np.zeros((cap.max_points, 32), np.uint8)
        self.pt_normal = np.zeros((cap.max_points, 3), np.float32)
        self.pt_min_dist = np.zeros(cap.max_points, np.float32)
        self.pt_max_dist = np.zeros(cap.max_points, np.float32)
        self.pt_valid = np.zeros(cap.max_points, bool)
        self.pt_first_kf = np.full(cap.max_points, -1, np.int32)
        self.pt_visible = np.zeros(cap.max_points, np.int32)
        self.pt_found = np.zeros(cap.max_points, np.int32)
        self.pt_obs: list[dict[int, int]] = [dict() for _ in range(cap.max_points)]
        # Monotonic allocation — freed ids are NOT recycled: the tracker's
        # device-resident local map holds ids between refreshes, and a
        # recycled id would silently rebind its matches to an unrelated new
        # landmark. (Compaction at a safe sync point is the long-run story;
        # the arena is sized for full-sequence footprints.)
        self._pt_next = 0

        # map lines (endpoint representation; Plücker derived on the fly)
        self.ln_ep = np.zeros((cap.max_lines, 2, 3), np.float32)
        self.ln_desc = np.zeros((cap.max_lines, 72), np.uint8)  # quantized LBD (ops/lbd.py LBD_DIM)
        self.ln_valid = np.zeros(cap.max_lines, bool)
        self.ln_first_kf = np.full(cap.max_lines, -1, np.int32)
        self.ln_visible = np.zeros(cap.max_lines, np.int32)
        self.ln_found = np.zeros(cap.max_lines, np.int32)
        # viewing statistics (MapLine::UpdateAverageDir, MapLine.cpp:427):
        # mean viewing direction of the midpoint + scale distance band,
        # refreshed with the distinctive-descriptor pass
        self.ln_normal = np.zeros((cap.max_lines, 3), np.float32)
        self.ln_min_dist = np.zeros(cap.max_lines, np.float32)
        self.ln_max_dist = np.zeros(cap.max_lines, np.float32)
        self.ln_obs: list[dict[int, int]] = [dict() for _ in range(cap.max_lines)]
        self._ln_next = 0

        self.big_change_idx = 0  # Map::InformNewBigChange counter

        # Device descriptor arenas — the authoritative store the matching
        # kernels read. Binary descriptors are incompressible, so shipping
        # them through the tunnel (as wire downloads per frame, or as
        # local-map/fusion-candidate uploads per keyframe event) is the
        # single largest byte stream in the system; keeping them in HBM and
        # gathering by landmark id (ids are tiny and compressible) removes
        # it. Landmarks created from tracking scatter their rows straight
        # from the keyframe's device FrameData; host-authored descriptors
        # (tests, tools) are staged dirty and flushed on first kernel read.
        self._pt_desc_dev = None
        self._pt_desc_dirty: list[int] = []
        self._ln_desc_dev = None
        self._ln_desc_dirty: list[int] = []

    # ---------------------------------------------------- descriptor arenas
    def point_desc_arena(self):
        """(max_points, 32) uint8 device array, host-dirty rows flushed."""
        self._pt_desc_dev, self._pt_desc_dirty[:] = _flush_arena(
            self._pt_desc_dev, self._pt_desc_dirty, self.pt_desc), []
        return self._pt_desc_dev

    def line_desc_arena(self):
        self._ln_desc_dev, self._ln_desc_dirty[:] = _flush_arena(
            self._ln_desc_dev, self._ln_desc_dirty, self.ln_desc), []
        return self._ln_desc_dev

    def scatter_point_descs_from(self, src_desc_dev, feats, pids):
        """arena[pids] = src[feats], entirely on device (KF creation path:
        ``src_desc_dev`` is the new keyframe's fd.kp_desc)."""
        if len(pids) == 0:
            return
        # ONE fixed pad size (src has <= max_keypoints rows): variable
        # power-of-two buckets compiled a new scatter program per size
        # class, and each first-hit compile/cache-load stalls the frame
        # loop ~0.5-1.5 s through the tunneled backend
        self._pt_desc_dev = _scatter_from(
            self.point_desc_arena(), src_desc_dev,
            *_pad_ids(feats, pids, src_desc_dev.shape[0]))

    def scatter_line_descs_from(self, src_desc_dev, feats, lids):
        if len(lids) == 0:
            return
        self._ln_desc_dev = _scatter_from(
            self.line_desc_arena(), src_desc_dev,
            *_pad_ids(feats, lids, src_desc_dev.shape[0]))

    # ---------------------------------------------------------------- points
    def add_point(self, pos, desc, normal, min_d, max_d, first_kf) -> int:
        """``desc=None`` means device-managed: the caller scatters the row
        into the device arena itself (scatter_point_descs_from)."""
        pid = self._pt_next
        if pid >= self.pt_pos.shape[0]:
            raise RuntimeError("point arena full — compaction needed")
        self._pt_next += 1
        self.pt_pos[pid] = pos
        if desc is not None:
            self.pt_desc[pid] = desc
            self._pt_desc_dirty.append(pid)
        self.pt_normal[pid] = normal
        self.pt_min_dist[pid] = min_d
        self.pt_max_dist[pid] = max_d
        self.pt_valid[pid] = True
        self.pt_first_kf[pid] = first_kf
        self.pt_visible[pid] = 1
        self.pt_found[pid] = 1
        self.pt_obs[pid].clear()
        return pid

    def erase_point(self, pid: int):
        if not self.pt_valid[pid]:
            return
        for kf, feat in self.pt_obs[pid].items():
            if self.kf_pt_idx[kf, feat] == pid:
                self.kf_pt_idx[kf, feat] = -1
        self.pt_obs[pid].clear()
        self.pt_valid[pid] = False

    def add_point_obs(self, pid: int, kf: int, feat: int):
        # a landmark observes a keyframe at ONE feature (MapPoint::
        # AddObservation upsert): re-binding clears the previous slot,
        # else the old kf_pt_idx entry would orphan when the dict moves on
        prev = self.pt_obs[pid].get(kf)
        if prev is not None and prev != feat and \
                self.kf_pt_idx[kf, prev] == pid:
            self.kf_pt_idx[kf, prev] = -1
        self.pt_obs[pid][kf] = feat
        self.kf_pt_idx[kf, feat] = pid

    # ----------------------------------------------------------------- lines
    def add_line(self, ep, desc, first_kf) -> int:
        """``desc=None`` means device-managed (scatter_line_descs_from)."""
        lid = self._ln_next
        if lid >= self.ln_ep.shape[0]:
            raise RuntimeError("line arena full — compaction needed")
        self._ln_next += 1
        self.ln_ep[lid] = ep
        if desc is not None:
            self.ln_desc[lid] = desc
            self._ln_desc_dirty.append(lid)
        self.ln_valid[lid] = True
        self.ln_first_kf[lid] = first_kf
        self.ln_visible[lid] = 1
        self.ln_found[lid] = 1
        self.ln_obs[lid].clear()
        # initial viewing stats from the creating keyframe (refreshed by
        # distinctive.update_line_stats as observations accumulate)
        if 0 <= first_kf < self.n_kf:
            c = self.kf_camera_center(first_kf)
            mid = 0.5 * (np.asarray(ep[0]) + np.asarray(ep[1]))
            v = mid - c
            d = float(np.linalg.norm(v))
            self.ln_normal[lid] = v / max(d, 1e-6)
            self.ln_max_dist[lid] = 1.6 * d
            self.ln_min_dist[lid] = d / 1.6
        return lid

    def erase_line(self, lid: int):
        if not self.ln_valid[lid]:
            return
        for kf, feat in self.ln_obs[lid].items():
            if self.kf_ln_idx[kf, feat] == lid:
                self.kf_ln_idx[kf, feat] = -1
        self.ln_obs[lid].clear()
        self.ln_valid[lid] = False

    def add_line_obs(self, lid: int, kf: int, feat: int):
        prev = self.ln_obs[lid].get(kf)
        if prev is not None and prev != feat and \
                self.kf_ln_idx[kf, prev] == lid:
            self.kf_ln_idx[kf, prev] = -1
        self.ln_obs[lid][kf] = feat
        self.kf_ln_idx[kf, feat] = lid

    # ------------------------------------------------------------- keyframes
    def add_keyframe(self, host_frame: HostFrame, R, t, frame_id, timestamp,
                     fd_dev=None) -> int:
        """``fd_dev``: the frame's device-resident FrameData, if the caller
        still holds it (the tracker always does — features were computed on
        device). Keeping it lets the mapper's fusion kernels read keyframe
        features straight from HBM instead of re-uploading snapshots through
        the tunnel (~55 KB/KF, descriptors incompressible)."""
        kf = self.n_kf
        if kf >= self.kf_R.shape[0]:
            raise RuntimeError("keyframe arena full")
        self.kf_R[kf] = R
        self.kf_t[kf] = t
        self.kf_valid[kf] = True
        self.kf_frame_id[kf] = frame_id
        self.kf_timestamp[kf] = timestamp
        self.kf_frames[kf] = host_frame
        self.kf_frames_dev[kf] = fd_dev
        self.n_kf += 1
        return kf

    def device_frame(self, kf: int):
        """Device FrameData for a keyframe: cached from tracking when
        available, else uploaded once from the host snapshot and cached."""
        fd = self.kf_frames_dev[kf]
        if fd is None:
            import jax.numpy as jnp

            from .frame import FrameData

            host = self.kf_frames[kf]
            fd = FrameData(*(jnp.asarray(getattr(host, f))
                             for f in FrameData._fields))
            self.kf_frames_dev[kf] = fd
        return fd

    def erase_keyframe(self, kf: int):
        """KeyFrame::SetBadFlag (KeyFrame.cc:526-618): detach every
        observation and retire the row. KF0 is never erased. The reference's
        spanning-tree reparenting is implicit here: pose-graph edges are
        rebuilt from surviving keyframes, and landmarks whose reference
        (first) keyframe dies are re-anchored to another observer so loop
        corrections keep propagating to them."""
        if kf == 0 or not self.kf_valid[kf]:
            return
        row = self.kf_pt_idx[kf]
        for feat in np.nonzero(row >= 0)[0]:
            pid = int(row[feat])
            obs = self.pt_obs[pid]
            if obs.get(kf) == int(feat):
                obs.pop(kf)
                if self.pt_valid[pid]:
                    if not obs:
                        self.erase_point(pid)
                    elif self.pt_first_kf[pid] == kf:
                        self.pt_first_kf[pid] = min(obs)
        self.kf_pt_idx[kf] = -1
        lrow = self.kf_ln_idx[kf]
        for feat in np.nonzero(lrow >= 0)[0]:
            lid = int(lrow[feat])
            obs = self.ln_obs[lid]
            if obs.get(kf) == int(feat):
                obs.pop(kf)
                if self.ln_valid[lid]:
                    if not obs:
                        self.erase_line(lid)
                    elif self.ln_first_kf[lid] == kf:
                        self.ln_first_kf[lid] = min(obs)
        self.kf_ln_idx[kf] = -1
        # freeze the relative pose to the (pre-reparenting) parent so the
        # trajectory healer can chain through culled keyframes
        parent = int(self.kf_parent[kf])
        if parent < 0:
            parent = 0  # KF0 is never erased
        Rcp = self.kf_R[kf] @ self.kf_R[parent].T
        self.kf_cull_parent[kf] = parent
        self.kf_cull_Rcp[kf] = Rcp
        self.kf_cull_tcp[kf] = self.kf_t[kf] - Rcp @ self.kf_t[parent]
        self._reparent_children(kf)
        self.kf_valid[kf] = False
        self.kf_frames[kf] = None  # release the feature snapshots
        self.kf_frames_dev[kf] = None

    def update_spanning_tree(self, kf: int):
        """Attach ``kf`` to its strongest covisible predecessor
        (KeyFrame::UpdateConnections tail, KeyFrame.cc:443-451)."""
        if kf == 0 or self.kf_parent[kf] >= 0:
            return
        counts = self.covisibility_counts(kf)
        best, parent = 0, -1
        for o, c in counts.items():
            if o != kf and o < kf and self.kf_valid[o] and c > best:
                best, parent = c, o
        if parent < 0:  # no covisibility yet: previous surviving keyframe
            prev = [o for o in range(kf) if self.kf_valid[o]]
            parent = prev[-1] if prev else -1
        if parent >= 0:
            self.kf_parent[kf] = parent
            self.kf_children[parent].add(kf)

    def _reparent_children(self, kf: int):
        """KeyFrame::SetBadFlag reparenting (KeyFrame.cc:552-615): each
        child re-attaches to its strongest covisible inside the candidate
        set (initially the dying keyframe's parent, growing as children are
        adopted); leftovers fall back to the dying keyframe's parent."""
        parent = int(self.kf_parent[kf])
        children = set(self.kf_children[kf])
        cands = {parent} if parent >= 0 else set()
        while children and cands:
            best = (0, -1, -1)  # (weight, child, new_parent)
            for ch in children:
                counts = self.covisibility_counts(ch)
                for o, c in counts.items():
                    if o in cands and c > best[0]:
                        best = (c, ch, o)
            if best[1] < 0:
                break
            _, ch, npar = best
            self.kf_parent[ch] = npar
            self.kf_children[npar].add(ch)
            children.discard(ch)
            cands.add(ch)
        for ch in children:
            self.kf_parent[ch] = parent
            if parent >= 0:
                self.kf_children[parent].add(ch)
        if parent >= 0:
            self.kf_children[parent].discard(kf)
        self.kf_children[kf] = set()
        self.kf_parent[kf] = -1

    def kf_camera_center(self, kf: int) -> np.ndarray:
        return -self.kf_R[kf].T @ self.kf_t[kf]

    def set_kf_pose(self, kf: int, R, t):
        self.kf_R[kf] = R
        self.kf_t[kf] = t

    # ---------------------------------------------------------- covisibility
    def covisibility_counts(self, kf: int) -> dict[int, int]:
        """Shared-map-point counts with every other KF (UpdateConnections).

        Vectorized as a membership join over the ``kf_pt_idx`` match
        matrix (the inverse observation map): one (n_kf, N) mask + row sum
        replaces the reference's per-point observation-dict walk
        (KeyFrame.cc:363-452) — and the python dict walk this method used
        to do, which at ~80 calls per keyframe event was the tracker's
        host-side hot spot."""
        row = self.kf_pt_idx[kf]
        pids = row[row >= 0]
        if len(pids) == 0:
            return {}
        lut = np.zeros(self.pt_pos.shape[0], bool)
        lut[pids] = True
        sub = self.kf_pt_idx[: self.n_kf]
        mask = (sub >= 0) & lut[np.clip(sub, 0, None)]
        counts = mask.sum(1)
        counts[kf] = 0
        nz = np.nonzero(counts)[0]
        return {int(o): int(counts[o]) for o in nz}

    def covisible_keyframes(self, kf: int, k: int | None = None,
                            min_weight: int = 1) -> list[int]:
        """Best covisible KFs ordered by weight (GetBestCovisibilityKeyFrames)."""
        counts = self.covisibility_counts(kf)
        ordered = sorted(
            (c, okf) for okf, c in counts.items()
            if c >= min_weight and self.kf_valid[okf]
        )[::-1]
        out = [okf for _, okf in ordered]
        return out[:k] if k is not None else out

    # ------------------------------------------------------------ compaction
    def compact(self):
        """Reclaim erased landmark slots: survivors move to a dense prefix
        and every id-bearing structure is remapped. Monotonic allocation
        (see _pt_next) makes this necessary for unbounded runs; it must be
        called at a SAFE SYNC POINT — no in-flight frames, mapper idle —
        because device-resident slot tables hold landmark ids
        (System.compact_map orchestrates that). Returns (pt_map, ln_map):
        old-id -> new-id arrays (-1 for erased)."""
        import jax.numpy as jnp

        pt_map = np.full(self.pt_pos.shape[0], -1, np.int32)
        old_p = np.nonzero(self.pt_valid)[0]
        pt_map[old_p] = np.arange(len(old_p), dtype=np.int32)
        for name in ("pt_pos", "pt_desc", "pt_normal", "pt_min_dist",
                     "pt_max_dist", "pt_valid", "pt_first_kf",
                     "pt_visible", "pt_found"):
            arr = getattr(self, name)
            moved = arr[old_p]
            arr[:] = 0
            arr[: len(old_p)] = moved
        self.pt_valid[: len(old_p)] = True
        new_obs = [self.pt_obs[p] for p in old_p]
        new_obs += [dict() for _ in range(len(self.pt_obs) - len(old_p))]
        self.pt_obs = new_obs
        self._pt_next = len(old_p)
        if self._pt_desc_dev is not None:
            pad = np.zeros(self.pt_pos.shape[0], np.int32)
            pad[: len(old_p)] = old_p
            self._pt_desc_dev = self._pt_desc_dev[jnp.asarray(pad)]
        # keyframe match tables
        self.kf_pt_idx[:] = np.where(
            self.kf_pt_idx >= 0,
            pt_map[np.clip(self.kf_pt_idx, 0, None)], -1)

        ln_map = np.full(self.ln_ep.shape[0], -1, np.int32)
        old_l = np.nonzero(self.ln_valid)[0]
        ln_map[old_l] = np.arange(len(old_l), dtype=np.int32)
        for name in ("ln_ep", "ln_desc", "ln_valid", "ln_first_kf",
                     "ln_visible", "ln_found", "ln_normal",
                     "ln_min_dist", "ln_max_dist"):
            arr = getattr(self, name)
            moved = arr[old_l]
            arr[:] = 0
            arr[: len(old_l)] = moved
        self.ln_valid[: len(old_l)] = True
        new_lobs = [self.ln_obs[l] for l in old_l]
        new_lobs += [dict() for _ in range(len(self.ln_obs) - len(old_l))]
        self.ln_obs = new_lobs
        self._ln_next = len(old_l)
        if self._ln_desc_dev is not None:
            pad = np.zeros(self.ln_ep.shape[0], np.int32)
            pad[: len(old_l)] = old_l
            self._ln_desc_dev = self._ln_desc_dev[jnp.asarray(pad)]
        self.kf_ln_idx[:] = np.where(
            self.kf_ln_idx >= 0,
            ln_map[np.clip(self.kf_ln_idx, 0, None)], -1)
        return pt_map, ln_map

    # ------------------------------------------------------------ statistics
    def n_points(self) -> int:
        return int(self.pt_valid.sum())

    def n_lines(self) -> int:
        return int(self.ln_valid.sum())

    def point_ids(self) -> np.ndarray:
        return np.nonzero(self.pt_valid)[0]

    def line_ids(self) -> np.ndarray:
        return np.nonzero(self.ln_valid)[0]

    def reset(self):
        self.__init__(self.cfg)


# --------------------------------------------------------------------------
# Device descriptor-arena helpers.
def _pad_ids(feats, ids, bucket: int):
    """Pad (feats, ids) to ONE fixed ``bucket`` length (the source array's
    row count) so each scatter program compiles exactly once. Padding
    repeats the last pair — scattering the same row twice is idempotent.
    The padded index upload is tiny and compresses to nothing; variable
    buckets traded that for mid-run compile stalls."""
    import jax.numpy as jnp

    feats = np.asarray(feats, np.int32)[:bucket]
    ids = np.asarray(ids, np.int32)[:bucket]
    pf = np.full(bucket, feats[-1] if len(feats) else 0, np.int32)
    pi = np.full(bucket, ids[-1] if len(ids) else 0, np.int32)
    pf[: len(feats)] = feats
    pi[: len(ids)] = ids
    return jnp.asarray(pf), jnp.asarray(pi)


def _flush_arena(arena, dirty, host_rows):
    import jax.numpy as jnp

    if arena is None:
        arena = jnp.zeros(host_rows.shape, jnp.uint8)
    if dirty:
        ids = np.array(sorted(set(dirty)), np.int32)
        n = len(ids)
        b = 8
        while b < n:
            b *= 2
        pad = np.full(b, ids[-1], np.int32)
        pad[:n] = ids
        arena = _scatter_rows(arena, jnp.asarray(pad),
                              jnp.asarray(host_rows[pad]))
    return arena


def _scatter_rows(arena, ids, rows):
    import jax

    global _scatter_rows_jit
    if _scatter_rows_jit is None:
        _scatter_rows_jit = jax.jit(lambda a, i, r: a.at[i].set(r))
    return _scatter_rows_jit(arena, ids, rows)


def _scatter_from(arena, src, feats, ids):
    import jax

    global _scatter_from_jit
    if _scatter_from_jit is None:
        _scatter_from_jit = jax.jit(lambda a, s, f, i: a.at[i].set(s[f]))
    return _scatter_from_jit(arena, src, feats, ids)


_scatter_rows_jit = None
_scatter_from_jit = None
