"""Loop closing: detection, relative-pose solve, correction, global refine.

Re-design of the reference ``LoopClosing`` thread (/root/reference/src/
LoopClosing.cc) as a sequential pass per keyframe:

- DetectLoop (:143-341): min BoW score over covisible KFs → database
  candidates → covisibility-consistency chaining over >=3 consecutive
  keyframes.
- ComputeSim3 (:359-617): per-candidate dense ratio matching of map-point
  descriptors, then a vmapped 3-point Kabsch RANSAC on the 3D-3D pairs in
  camera coordinates (RGB-D: scale observable → rigid, the reference's
  bFixScale=true path), then a projection verification against the
  candidate's covisibility neighborhood (accept >= 40 matches, :575-607).
- CorrectLoop (:619-891): propagate the corrected pose to the current
  covisibility group and its map points, fuse duplicates, optimize the
  essential graph (optim.pose_graph — SE(3), fixed scale), and run a global
  bundle adjustment (optim.local_ba at full-map capacity — the reference
  spawns a GBA thread; here it is one more jitted pass).

The reference's loop pipeline is points-only (SURVEY §2 row 19); so is this
one — map lines ride along via the pose correction of their reference KFs.
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SlamConfig

_log = logging.getLogger(__name__)
from ..optim import horn
from ..ops import matching, hamming
from .map import SlamMap

SIM3_MATCH_MIN = 20
# RANSAC seed bar before SearchBySim3 expansion (the ≥20 acceptance bar
# applies to the post-expansion set, LoopClosing.cc:450-480)
SIM3_SEED_INLIERS = 8
LOOP_PROJ_ACCEPT = 40
# minimum shared-point weight for a fused cross-sector pair to become an
# essential-graph loop connection (Optimizer.cc:1131 minFeat=100; lower
# here — our feature budget is 1000 vs the reference's per-image ~1000 but
# synthetic scenes bind fewer)
LOOP_CONN_MIN_WEIGHT = 30
# agreeing map-line matches that corroborate a borderline point count in
# loop verification (no reference analogue — its loops are points-only)
LOOP_LINE_ACCEPT = 5


class LoopCloser:
    def __init__(self, cfg: SlamConfig, slam_map: SlamMap, kfdb, voc,
                 local_mapper=None, tracker=None):
        import threading

        self.cfg = cfg
        self.map = slam_map
        self.kfdb = kfdb
        self.voc = voc
        self.local_mapper = local_mapper
        self.tracker = tracker
        self.prev_groups: list[tuple[set[int], int]] = []
        self.last_loop_kf = -(10**9)
        self.last_loop_pair: tuple[int, int] | None = None  # (kf1, kf2)
        self.n_loops_closed = 0
        self.enable_gba = True
        # map-update lock shared with the mapper/tracker (RLock: nested
        # acquisition from the synchronous call path is fine). Held for
        # host mutation phases only — never across a device round trip.
        self.lock = getattr(local_mapper, "lock", None) or threading.RLock()

    # ------------------------------------------------------------------ main
    def process_keyframe(self, kf: int):
        if self.map.n_kf < self.cfg.loop.min_kf_gap:
            return
        if kf < self.last_loop_kf + self.cfg.loop.min_kf_gap:
            return
        with self.lock:  # host-side dict walks over live map state
            cands = self._detect_loop(kf)
        if not cands:
            return
        for cand in cands:
            out = self._compute_relative(kf, cand)
            if out is not None:
                R12, t12, s12, pairs = out
                self._correct_loop(kf, cand, R12, t12, s12)
                self.n_loops_closed += 1
                self.last_loop_kf = kf
                self.last_loop_pair = (kf, cand)
                return

    # ----------------------------------------------------------- detection
    def _detect_loop(self, kf: int) -> list[int]:
        m = self.map
        bow = self.kfdb.get_bow(kf)
        covis = set(m.covisible_keyframes(kf))
        # min-score floor (DetectLoop's vpConnectedKeyFrames minimum,
        # LoopClosing.cc:167-185). The floor statistic needs baseline
        # VARIETY: at sequence scale the reference's connected set spans
        # wide baselines, but a tight revisit tail can leave only 1-2
        # near-duplicate covisibles whose mutual similarity sets an
        # unreachably high floor (no genuine loop candidate can look as
        # similar as the immediately previous frame). Recent temporal
        # keyframes are connected views too (spanning-tree edges), so they
        # join the floor statistic; an island keyframe (post-discontinuity,
        # no covisibles at all) falls back to them entirely.
        anchors = set(covis)
        anchors |= {q for q in range(max(0, kf - 5), kf)
                    if m.kf_valid[q] and self.kfdb.has[q]}
        if not anchors:
            return []
        scores = self.kfdb.score_all(bow)
        min_score = min(scores[c] for c in anchors)
        # candidate exclusion: the covisible set (KeyFrameDatabase.cc:
        # 129-141) plus a temporal recency window — loops connect to the
        # DISTANT past; without the window, a lowered floor could surface
        # the current sector's own recent keyframes as candidates when a
        # discontinuity has cut their covisibility links
        exclude = covis | {q for q in range(max(0, kf - 10), kf + 1)}
        cands = self.kfdb.detect_loop_candidates(
            kf, bow, float(min_score), exclude, m
        )
        # group-connectivity gate: if the current covisibility GROUP is
        # already strongly connected to the candidate's group, the revisit
        # has been absorbed by fusion — the drift lives in reconciled
        # shared landmarks and a full-Sim3 correction would tear that
        # reconciliation apart (measured: mass chi2 erasure at the revisit
        # keyframes). One-hop extension of the reference's direct-covisible
        # candidate exclusion (KeyFrameDatabase.cc:129-141): loop closure
        # is for DISCONNECTED sectors; connected drift belongs to local
        # BA + fusion. "Strongly connected" uses its own (much higher)
        # threshold than generic covisibility: per-KF fusion at a revisit
        # creates a few dozen shared points before any loop event fires,
        # and that trickle must not permanently suppress a genuine
        # large-drift loop (config.loop.group_connectivity_min).
        th_strong = self.cfg.loop.group_connectivity_min
        strong = set()
        for g in [kf] + m.covisible_keyframes(kf, 20, min_weight=15):
            strong.update(
                o for o, c in m.covisibility_counts(g).items()
                if c >= th_strong)
            strong.add(g)
        cands = [
            c for c in cands
            if not (({c} | set(m.covisible_keyframes(c, 10))) & strong)
        ]
        # consistency chaining (LoopClosing.cc:203-341)
        current_groups: list[tuple[set[int], int]] = []
        consistent: list[int] = []
        for c in cands:
            group = set(m.covisible_keyframes(c, 10)) | {c}
            count = 0
            for prev_set, prev_count in self.prev_groups:
                if group & prev_set:
                    count = max(count, prev_count + 1)
            current_groups.append((group, count))
            if count >= self.cfg.loop.covisibility_consistency_th - 1:
                consistent.append(c)
        self.prev_groups = current_groups
        return consistent

    # ------------------------------------------------------- relative pose
    def _compute_relative(self, kf1: int, kf2: int):
        """Match map points of kf1 vs kf2, Kabsch-RANSAC the camera-frame
        3D pairs, verify by neighborhood projection. Returns (R12, t12,
        n_pairs) with x_c1 = R12 x_c2 + t12, or None."""
        m = self.map
        with self.lock:
            p1 = m.kf_pt_idx[kf1].copy()
            p2 = m.kf_pt_idx[kf2].copy()
            has1 = (p1 >= 0) & m.pt_valid[np.clip(p1, 0, None)]
            has2 = (p2 >= 0) & m.pt_valid[np.clip(p2, 0, None)]
            if has1.sum() < SIM3_MATCH_MIN or has2.sum() < SIM3_MATCH_MIN:
                return None
            d1 = m.device_frame(kf1)
            d2 = m.device_frame(kf2)
        dist = hamming.hamming_matrix(d1.kp_desc, d2.kp_desc)
        gate = jnp.asarray(has1)[:, None] & jnp.asarray(has2)[None, :]
        mm = matching.best_matches(dist, gate, max_dist=60,
                                   nn_ratio=self.cfg.matcher.nn_ratio_reloc)
        mm = matching.dedupe_targets(mm, len(p2))
        ok = np.asarray(mm.ok)
        idx = np.asarray(mm.idx)
        n_match = int(ok.sum())
        if n_match < SIM3_MATCH_MIN:
            return None
        # camera-frame 3D of the matched map points
        w1 = m.pt_pos[p1[ok]]
        w2 = m.pt_pos[p2[idx[ok]]]
        x1 = w1 @ m.kf_R[kf1].T + m.kf_t[kf1]
        x2 = w2 @ m.kf_R[kf2].T + m.kf_t[kf2]
        N = 512
        src = np.zeros((N, 3), np.float32)
        dst = np.zeros((N, 3), np.float32)
        val = np.zeros(N, bool)
        k = min(len(x1), N)
        src[:k] = x2[:k]
        dst[:k] = x1[:k]
        val[:k] = True
        s, R12, t12, inl, n_inl = horn.ransac_align(
            jnp.asarray(src), jnp.asarray(dst), jnp.asarray(val),
            jax.random.PRNGKey(kf1), thresh=0.10,
            with_scale=not self.cfg.loop.fix_scale,
        )
        # a small but coherent seed is enough to bootstrap the expansion
        # stage below (the reference's Sim3Solver also iterates from tiny
        # minimal sets; the ≥20 bar is applied AFTER SearchBySim3 grows
        # the correspondence set, LoopClosing.cc:450-480)
        if int(n_inl) < SIM3_SEED_INLIERS:
            return None
        # SearchBySim3 expansion (ORBmatcher::SearchBySim3, /root/
        # reference/src/ORBmatcher.cc:1441-1599; driven by the
        # ComputeSim3 iterate loop LoopClosing.cc:450-480): project kf2's
        # landmarks into kf1's image with the current transform estimate
        # and harvest descriptor matches the appearance-only ratio test
        # missed — narrow view overlap or culled intermediate keyframes
        # leave the initial set thin, and the ≥20 acceptance is meant to
        # count the EXPANDED set. Two rounds: wide radius from the Kabsch
        # seed, tighter radius from the reprojection-refined similarity.
        # The harvest matches against min(single-view feature descriptor,
        # multi-view distinctive landmark descriptor) — the reference's
        # SearchBySim3 uses MapPoint::GetDescriptor for the same reason
        # (wide-baseline repeatability).
        h1 = m.kf_frames[kf1]
        h2 = m.kf_frames[kf2]
        cam = self.cfg.camera
        with self.lock:
            pt_desc2 = m.point_desc_arena()[
                jnp.asarray(np.clip(p2, 0, None))]
        dist_min = jnp.minimum(
            dist, hamming.hamming_matrix(d1.kp_desc, pt_desc2))
        x2_all = m.pt_pos[np.clip(p2, 0, None)] @ m.kf_R[kf2].T \
            + m.kf_t[kf2]
        s_n = 0
        for rnd, rad in ((1, 15.0), (2, 9.0)):
            s0 = float(np.asarray(s))
            R0 = np.asarray(R12)
            t0 = np.asarray(t12)
            x1_pred = s0 * (x2_all @ R0.T) + t0
            z = x1_pred[:, 2]
            uv_pred = np.stack([
                cam.fx * x1_pred[:, 0] / np.maximum(z, 1e-6) + cam.cx,
                cam.fy * x1_pred[:, 1] / np.maximum(z, 1e-6) + cam.cy,
            ], -1)
            pix_d = np.linalg.norm(
                h1.kp_xy_un[:, None, :] - uv_pred[None, :, :], axis=-1)
            gate2 = (has1[:, None] & has2[None, :] & (z > 0.1)[None, :]
                     & (pix_d < rad))
            mm2 = matching.best_matches(dist_min, jnp.asarray(gate2),
                                        max_dist=50)
            mm2 = matching.dedupe_targets(mm2, len(p2))
            ok2 = np.asarray(mm2.ok)
            idx2 = np.asarray(mm2.idx)
            # merge: earlier (ratio-test / prior-round) matches win
            grown = ok2 & ~ok
            ok = ok | grown
            idx = np.where(grown, idx2, idx)
            w1 = m.pt_pos[p1[ok]]
            w2 = m.pt_pos[p2[idx[ok]]]
            x1 = w1 @ m.kf_R[kf1].T + m.kf_t[kf1]
            x2 = w2 @ m.kf_R[kf2].T + m.kf_t[kf2]
            src = np.zeros((N, 3), np.float32)
            dst = np.zeros((N, 3), np.float32)
            val = np.zeros(N, bool)
            k = min(len(x1), N)
            src[:k] = x2[:k]
            dst[:k] = x1[:k]
            val[:k] = True
            s, R12, t12, inl, n_inl = horn.ransac_align(
                jnp.asarray(src), jnp.asarray(dst), jnp.asarray(val),
                jax.random.fold_in(jax.random.PRNGKey(kf1), rnd),
                thresh=0.10, with_scale=not self.cfg.loop.fix_scale,
            )
            # the 0.10 m 3D gate is stricter than the reference's
            # Sim3Solver (CheckInliers is bidirectional REPROJECTION,
            # Sim3Solver.cc:200-260, tolerant of the drift field's depth
            # nonrigidity) — the ≥20 acceptance applies to reprojection
            # inliers below; here only the seed bar
            if int(n_inl) < SIM3_SEED_INLIERS:
                return None
            # Sim3 LM refinement on bidirectional reprojection
            # (Optimizer::OptimizeSim3, Optimizer.cc:1400-1659)
            feats1 = np.nonzero(ok)[0][:N]
            feats2 = idx[feats1]
            uv1 = np.zeros((N, 2), np.float32)
            uv2 = np.zeros((N, 2), np.float32)
            uv1[: len(feats1)] = h1.kp_xy_un[feats1]
            uv2[: len(feats1)] = h2.kp_xy_un[feats2]
            s_r, R_r, t_r, s_inl, s_n = horn.refine_sim3(
                cam, s, R12, t12,
                jnp.asarray(dst), jnp.asarray(uv1),
                jnp.asarray(src), jnp.asarray(uv2),
                jnp.asarray(val),
                with_scale=not self.cfg.loop.fix_scale,
            )
            if int(s_n) >= max(SIM3_SEED_INLIERS, int(n_inl)):
                s, R12, t12 = s_r, R_r, t_r
        # acceptance (OptimizeSim3's nInliers >= 20, LoopClosing.cc:480):
        # reprojection inliers of the refined similarity, or the 3D-3D
        # Kabsch count if that was already decisive. A slightly-under
        # count (>= 0.75x) may PROCEED — the neighborhood-projection
        # verification below (the reference's own final >= 40 bar) is a
        # far stronger test than a couple of extra pair inliers, and a
        # sparse surviving-keyframe graph (wide culling at a revisit) can
        # leave a genuine loop with a thin direct-pair pool
        n_sim3 = max(int(s_n), int(n_inl))
        if n_sim3 < int(0.75 * self.cfg.loop.sim3_min_inliers):
            return None
        strict_sim3 = n_sim3 >= self.cfg.loop.sim3_min_inliers
        s12 = float(np.asarray(s))
        R12 = np.asarray(R12)
        t12 = np.asarray(t12)

        # verification: project kf2's neighborhood points into kf1 with the
        # corrected pose; require enough matches (LoopClosing.cc:575-607)
        with self.lock:
            neigh = [kf2] + m.covisible_keyframes(kf2, 10)
            pids = np.unique(m.kf_pt_idx[neigh])
            pids = pids[(pids >= 0) & m.pt_valid[np.clip(pids, 0, None)]]
            if len(pids) == 0:
                return None
            # corrected kf1 pose: T_c1w = T_12 ∘ T_c2w
            Rc = R12 @ m.kf_R[kf2]
            tc = R12 @ m.kf_t[kf2] + t12
        from .local_mapping import fuse_step

        C = 4096
        p3d = np.zeros((C, 3), np.float32)
        mind = np.zeros(C, np.float32)
        maxd = np.ones(C, np.float32)
        valid = np.zeros(C, bool)
        pid_pad = np.zeros(C, np.int32)
        k = min(len(pids), C)
        p3d[:k] = m.pt_pos[pids[:k]]
        mind[:k] = m.pt_min_dist[pids[:k]]
        maxd[:k] = m.pt_max_dist[pids[:k]]
        valid[:k] = True
        pid_pad[:k] = pids[:k]
        desc = m.point_desc_arena()[jnp.asarray(pid_pad)]
        # radius 10*scale: the reference's loop verification projector is
        # WIDER than fusion's (matcher.SearchByProjection(..., Scw, ..., 10)
        # at LoopClosing.cc:575 vs Fuse's th=3) — the Sim3 estimate carries
        # more error than a tracked pose
        fidx, fok = fuse_step(
            self.cfg,
            d1.kp_xy_un, d1.kp_octave, d1.kp_desc, d1.kp_valid,
            jnp.asarray(p3d), desc, jnp.asarray(mind),
            jnp.asarray(maxd), jnp.asarray(valid),
            jnp.asarray(Rc), jnp.asarray(tc),
            radius_px=10.0,
        )
        n_proj = int(np.asarray(fok)[:k].sum())
        # line verification (EXCEEDS the reference — LoopClosing.cc is
        # points-only, SURVEY §2 row 19): project the loop neighborhood's
        # map LINES into kf1 at the corrected pose and run the strict gate
        # cascade; agreeing line structure lets a loop with a slightly
        # under-threshold point count through (geometry corroborated by an
        # independent feature modality), and is logged either way
        n_line = self._count_line_agreement(kf2, d1, Rc, tc) \
            if self.cfg.use_lines else 0
        if n_proj < LOOP_PROJ_ACCEPT and not (
                n_proj >= int(0.7 * LOOP_PROJ_ACCEPT)
                and n_line >= LOOP_LINE_ACCEPT):
            return None
        if not strict_sim3 and n_proj < 2 * LOOP_PROJ_ACCEPT \
                and n_line < LOOP_LINE_ACCEPT:
            # an under-strength Sim3 set needs OVERWHELMING projection
            # support (or corroborating line structure) to be believed
            return None
        return R12, t12, s12, n_match

    def _count_line_agreement(self, kf2: int, d1, Rc, tc) -> int:
        """Match kf2's neighborhood map lines against kf1's frame lines
        under the corrected pose (strict cascade, no relaxed retry)."""
        from ..ops import line_matching

        m = self.map
        with self.lock:
            neigh = [kf2] + m.covisible_keyframes(kf2, 10)
            lids = np.unique(m.kf_ln_idx[neigh])
            lids = lids[(lids >= 0) & m.ln_valid[np.clip(lids, 0, None)]]
            if len(lids) == 0:
                return 0
            LC = 256
            kl = min(len(lids), LC)
            ep = np.zeros((LC, 2, 3), np.float32)
            lval = np.zeros(LC, bool)
            lid_pad = np.zeros(LC, np.int32)
            ep[:kl] = m.ln_ep[lids[:kl]]
            lval[:kl] = True
            lid_pad[:kl] = lids[:kl]
        ldesc = m.line_desc_arena()[jnp.asarray(lid_pad)]
        projl = line_matching.project_lines(
            self.cfg.camera, jnp.asarray(Rc), jnp.asarray(tc),
            jnp.asarray(ep), jnp.asarray(lval))
        res = line_matching.match_lines(
            projl, ldesc, d1.ln_ep_un, d1.ln_angle, d1.ln_length,
            d1.ln_desc, d1.ln_valid, self.cfg.lines, allow_relax=False)
        return int(np.asarray(res.count))

    # ---------------------------------------------------------- correction
    def _correct_loop(self, kf1: int, kf2: int, R12, t12, s12=1.0):
        """Sim3 loop correction (LoopClosing::CorrectLoop). For RGB-D /
        stereo ``s12`` is 1 (fix_scale); for monocular the similarity's
        scale folds into the written SE3 poses as [R | t/s] — the
        reference's CorrectedSim3 convention (LoopClosing.cc:700-760)."""
        m = self.map
        with self.lock:
            # snapshot PRE-correction poses: the essential graph's tree/
            # covis edges must be measured from the drifted-but-smooth
            # odometry, not from post-propagation poses (NonCorrectedSim3,
            # LoopClosing.cc:670-700 / Optimizer.cc:1180-1260) — rebuilding
            # measurements from already-moved poses bakes the propagation
            # seams into the graph
            K0 = m.n_kf
            R_before = m.kf_R[:K0].copy()
            t_before = m.kf_t[:K0].copy()
            # corrected current pose: S_1w = S_12 * S_2w, S_2w scale 1
            R1_corr = R12 @ m.kf_R[kf2]
            t1_corr = s12 * (R12 @ m.kf_t[kf2]) + t12
            s1_corr = s12

            # propagate to the current covisibility group
            # (LoopClosing.cc:660-760) — host numpy, a few ms, under lock
            group = [kf1] + m.covisible_keyframes(kf1)
            R1_old = m.kf_R[kf1].copy()
            t1_old = m.kf_t[kf1].copy()
            self._propagate_group(group, R1_old, t1_old,
                                  R1_corr, t1_corr, s1_corr)

        # SearchAndFuse (LoopClosing.cc:893-931): project the LOOP side's
        # landmarks into the corrected current group and merge — this is
        # what stitches the two sectors' observation graphs back together;
        # without the cross-sector observations it creates, the global BA
        # has no loop information at all and relaxes the correction away.
        # Snapshot pre-fusion covisibility to harvest LoopConnections
        # (LoopClosing.cc:768-791).
        with self.lock:
            gset = set(group)
            pre_covis = {g: set(self.map.covisibility_counts(g))
                         for g in group if self.map.kf_valid[g]}
        self._search_and_fuse(group, kf2)
        loop_conns: list[tuple[int, int]] = []
        with self.lock:
            for g, before in pre_covis.items():
                counts = m.covisibility_counts(g)
                for o, c in counts.items():
                    if (o not in gset and o not in before
                            and c >= LOOP_CONN_MIN_WEIGHT
                            and m.kf_valid[o]):
                        loop_conns.append((o, g))

        # essential-graph optimization (Optimizer.cc:1064-1399 semantics);
        # group_scale lets the 7-dof (mono) branch rebuild the corrected
        # group's true Sim3 nodes from the scale-folded SE3 write-back
        self._optimize_essential_graph(kf1, kf2, set(group),
                                       R_before, t_before,
                                       loop_conns=loop_conns,
                                       group_scale=s12)

        # global BA (the reference spawns a GBA thread; here the stepped,
        # abortable BA runs on whichever thread called us — the async
        # wrapper makes that a worker)
        if self.enable_gba:
            self._global_ba(kf1)
        with self.lock:
            m.loop_edges.append((kf2, kf1))  # KeyFrame::AddLoopEdge
            m.big_change_idx += 1
            if self.tracker is not None:
                # publish the rigid gauge delta D = T1_old^-1 . T1_final so
                # the tracker folds the correction into its pipelined state
                # at its next frame (Tracker.apply_gauge_correction)
                Rd = R1_old.T @ m.kf_R[kf1]
                td = R1_old.T @ (m.kf_t[kf1] - t1_old)
                self.tracker.apply_gauge_correction(Rd, td)

    def _propagate_group(self, group, R1_old, t1_old,
                         R1_corr, t1_corr, s1_corr):
        """Propagate the corrected kf1 pose to its covisibility group and
        their landmarks (CorrectLoop's CorrectedSim3 application). Caller
        holds the map lock."""
        m = self.map
        R1_old_inv = R1_old.T
        t1_old_inv = -R1_old_inv @ t1_old
        corrected_pts: set[int] = set()
        for k in group:
            # S_k1 = T_kw_old * T_1w_old^-1 ; S_kw_new = S_k1 * S_1w_new
            Rk1 = m.kf_R[k] @ R1_old_inv
            tk1 = m.kf_R[k] @ t1_old_inv + m.kf_t[k]
            R_new = Rk1 @ R1_corr
            t_new = Rk1 @ t1_corr + tk1  # S_k1 has unit scale
            s_new = s1_corr
            # correct this KF's landmarks: pw' = S_kw_new^-1 (T_kw_old pw)
            pids = m.kf_pt_idx[k]
            pids = pids[(pids >= 0)]
            pids = np.array(
                [p for p in pids if m.pt_valid[p] and p not in corrected_pts],
                np.int64,
            )
            if len(pids):
                pw = m.pt_pos[pids]
                pc = pw @ m.kf_R[k].T + m.kf_t[k]
                m.pt_pos[pids] = ((pc - t_new) / s_new) @ R_new
                corrected_pts.update(int(p) for p in pids)
            lids = m.kf_ln_idx[k]
            lids = lids[lids >= 0]
            lids = np.array([l for l in lids if m.ln_valid[l]], np.int64)
            if len(lids):
                for i in (0, 1):
                    ep = m.ln_ep[lids, i]
                    epc = ep @ m.kf_R[k].T + m.kf_t[k]
                    m.ln_ep[lids, i] = ((epc - t_new) / s_new) @ R_new
            # fold scale into SE3: [R | t/s] (CorrectedSim3 write-back)
            m.set_kf_pose(k, R_new, t_new / s_new)

    def _search_and_fuse(self, group, kf2: int):
        """SearchAndFuse (LoopClosing.cc:893-931): project the loop-side
        neighborhood's map points into every corrected current-group
        keyframe and bind/merge. Replacement PREFERS the loop-side landmark
        (the reference calls ``pRep->Replace(mvpLoopMapPoints[i])``
        unconditionally), transplanting the anchor region onto the loop
        sector's geometry."""
        from .local_mapping import fuse_multi_step

        m = self.map
        with self.lock:
            neigh = [kf2] + m.covisible_keyframes(kf2, 10)
            pids, pid_counts = np.unique(m.kf_pt_idx[neigh],
                                         return_counts=True)
            keep = (pids >= 0) & m.pt_valid[np.clip(pids, 0, None)]
            pids, pid_counts = pids[keep], pid_counts[keep]
            if len(pids) == 0:
                return
            # cap pressure: keep the MOST-OBSERVED loop-side landmarks
            # (strongest stitch anchors), not the lowest arena ids
            if len(pids) > 4096:
                _log.warning("SearchAndFuse point cap truncates: 4096/%d "
                             "loop-side landmarks", len(pids))
                pids = pids[np.argsort(-pid_counts, kind="stable")[:4096]]
            targets = [g for g in group if m.kf_valid[g]]
            if len(targets) > 10:
                _log.warning("SearchAndFuse target cap truncates: 10/%d "
                             "group keyframes", len(targets))
                targets = targets[:10]
            if not targets:
                return
            C = 4096
            k = min(len(pids), C)
            p3d = np.zeros((C, 3), np.float32)
            mind = np.zeros(C, np.float32)
            maxd = np.ones(C, np.float32)
            valid = np.zeros(C, bool)
            pid_pad = np.zeros(C, np.int32)
            p3d[:k] = m.pt_pos[pids[:k]]
            mind[:k] = m.pt_min_dist[pids[:k]]
            maxd[:k] = m.pt_max_dist[pids[:k]]
            valid[:k] = True
            pid_pad[:k] = pids[:k]
            K_FIX = 10
            pad_t = targets + [targets[-1]] * (K_FIX - len(targets))
            dev = [m.device_frame(o) for o in pad_t]
            Rs = np.stack([m.kf_R[o] for o in pad_t])
            ts = np.stack([m.kf_t[o] for o in pad_t])
        kxy = jnp.stack([f.kp_xy_un for f in dev])
        koct = jnp.stack([f.kp_octave for f in dev])
        kdesc = jnp.stack([f.kp_desc for f in dev])
        kval = jnp.stack(
            [f.kp_valid if i < len(targets) else jnp.zeros_like(f.kp_valid)
             for i, f in enumerate(dev)])
        desc = m.point_desc_arena()[jnp.asarray(pid_pad)]
        idx2, ok2 = fuse_multi_step(
            self.cfg, kxy, koct, kdesc, kval,
            jnp.asarray(p3d), desc, jnp.asarray(mind),
            jnp.asarray(maxd), jnp.asarray(valid),
            jnp.asarray(Rs), jnp.asarray(ts),
            radius_px=5.0,
        )
        idx2, ok2 = jax.device_get((idx2, ok2))
        ok2 = ok2.copy()
        ok2[:, k:] = False
        lm = self.local_mapper
        base = getattr(lm, "inner", lm)
        if base is None:
            return
        touched: list[int] = []
        with self.lock:
            for ki, okf in enumerate(targets):
                for i in np.nonzero(ok2[ki])[0]:
                    pid = int(pids[i])
                    if not m.pt_valid[pid]:
                        continue
                    feat = int(idx2[ki, i])
                    bound = int(m.kf_pt_idx[okf, feat])
                    if bound < 0:
                        if okf not in m.pt_obs[pid]:
                            m.add_point_obs(pid, okf, feat)
                            touched.append(pid)
                    elif bound != pid and m.pt_valid[bound]:
                        base.replace_point(bound, pid)  # loop side wins
                        touched.append(pid)
        if touched and base is not None:
            base._refresh_descriptors(touched)

    def _optimize_essential_graph(self, kf1: int, kf2: int, group: set[int],
                                  R_before=None, t_before=None,
                                  loop_conns=None, group_scale=1.0):
        """Essential-graph pose optimization. ``R_before/t_before``: poses
        snapshotted BEFORE the loop propagation — tree/covisibility edge
        measurements come from them (the reference's NonCorrectedSim3,
        Optimizer.cc:1180-1260); only the loop edge uses corrected poses.
        ``group_scale``: the Sim3 correction's scale (mono loops; 1 for
        RGB-D/stereo). The map stores the corrected group as scale-folded
        SE3 ([R | t/s], CorrectedSim3 write-back); the 7-dof solver needs
        the TRUE Sim3 nodes [s, R, s*t_folded] or every intra-group edge
        residual is off by the fold factor."""
        from ..optim import pose_graph

        m = self.map
        with self.lock:
            K = m.n_kf
            built, s_node, s_meas = self._build_essential_problem(
                pose_graph, kf1, kf2, K, R_before, t_before,
                loop_conns or [], group=group, group_scale=group_scale)
        prob = built
        if self.cfg.loop.fix_scale:
            Rn, tn = pose_graph.optimize_pose_graph(
                prob, iters=self.cfg.loop.essential_graph_iters
            )
            sn = np.ones(Rn.shape[0], np.float32)
            s_old = None
        else:
            # monocular: 7-dof nodes absorb scale drift
            # (OptimizeEssentialGraph fix_scale=false, Optimizer.cc:1135);
            # corrected-group nodes enter at their true Sim3 (scale
            # group_scale, unfolded translation) — the reference keeps
            # vScw's non-unit scale for exactly these nodes
            # (Optimizer.cc:1135-1160 CorrectedSim3 initialization)
            t_init = np.array(prob.t)
            gl = [k for k in group if k < K]
            t_init[gl] = t_init[gl] * group_scale
            sprob = pose_graph.make_sim3_problem(prob.R.shape[0],
                                                 prob.ei.shape[0])
            sprob = sprob._replace(
                R=prob.R, t=jnp.asarray(t_init), s=jnp.asarray(s_node),
                fixed=prob.fixed, valid=prob.valid,
                ei=prob.ei, ej=prob.ej, R_meas=prob.R_meas,
                t_meas=prob.t_meas, s_meas=jnp.asarray(s_meas),
                w=prob.w, e_valid=prob.e_valid,
            )
            Rn, tn, sn = pose_graph.optimize_pose_graph_sim3(
                sprob, iters=self.cfg.loop.essential_graph_iters
            )
            sn = np.asarray(sn)
            s_old = s_node[:K]
        Rn = np.asarray(Rn)
        tn = np.asarray(tn)
        with self.lock:
            # apply (mono: fold scale into SE3 as [R | t/s]) + correct
            # landmarks via their first KF's Sim3 correction; keyframes
            # appended while the solver ran ride along via their anchor
            old_R = m.kf_R[:K].copy()
            old_t = m.kf_t[:K].copy()
            for k in range(K):
                if m.kf_valid[k]:
                    m.set_kf_pose(k, Rn[k], tn[k] / sn[k])
            self._transport_landmarks(K, old_R, old_t, Rn, tn, sn,
                                      s_old=s_old)
            self._correct_appended_kfs(K, old_R, old_t)

    def _build_essential_problem(self, pose_graph, kf1, kf2, K,
                                 R_before, t_before, loop_conns=(),
                                 group=(), group_scale=1.0):
        """Returns (SE3 problem, node scales, edge scale measurements).
        Node scales are 1 except the corrected group under a mono (scaled)
        correction; edge scale measurements follow: pre-correction odometry
        edges are scale-1, corrected-pose edges between nodes of scales
        (s_i, s_j) measure s_i/s_j (Sim3 relative S_i * S_j^-1)."""
        m = self.map
        conn_set = {frozenset(p) for p in loop_conns}
        if R_before is None:
            R_meas_src, t_meas_src = m.kf_R, m.kf_t
        else:
            # measurement source: pre-correction pose where available
            R_meas_src = np.concatenate([R_before, m.kf_R[len(R_before):K]])
            t_meas_src = np.concatenate([t_before, m.kf_t[len(t_before):K]])
        KCAP = 1 << (K - 1).bit_length()
        edges = []  # (i, j, weight, measure_from_current_poses)
        # spanning-tree edges (OptimizeEssentialGraph, Optimizer.cc:1180);
        # falls back to the previous surviving KF for never-attached rows
        # (maps built without a LocalMapper pass)
        prev_valid = -1
        for k in range(1, K):
            if not m.kf_valid[k]:
                continue
            p = int(m.kf_parent[k])
            if p < 0 or not m.kf_valid[p]:
                p = prev_valid
            if p >= 0:
                edges.append((p, k, 1.0, False))
            prev_valid = k
        # strong covisibility edges — EXCLUDING pairs whose covisibility was
        # created by the loop fusion (those get LoopConnections edges below:
        # their pre-correction relative would encode the very drift the loop
        # is healing)
        for k in range(K):
            if not m.kf_valid[k]:
                continue
            counts = m.covisibility_counts(k)
            for o, c in counts.items():
                if c >= 100 and o > k + 1 and \
                        frozenset((k, o)) not in conn_set:
                    edges.append((k, o, 1.0, False))
        # LoopConnections (Optimizer.cc:1123-1179): fusion-discovered
        # cross-sector pairs, measured from the CORRECTED (current) poses
        for (a, b) in loop_conns:
            if m.kf_valid[a] and m.kf_valid[b] and a < K and b < K:
                edges.append((a, b, 2.0, True))
        # previous loops' edges (KeyFrame::mspLoopEdges, persisted in
        # SlamMap.loop_edges; Optimizer.cc:1270-1290): re-asserted on every
        # later essential-graph run, measured from current poses — the map
        # was made consistent across them when they closed
        for (a, b) in m.loop_edges:
            if (a < K and b < K and m.kf_valid[a] and m.kf_valid[b]
                    and {a, b} != {kf1, kf2}):
                edges.append((a, b, 5.0, True))
        # the loop edge
        edges.append((kf2, kf1, 5.0, True))
        E = len(edges)
        ECAP = 1 << (E - 1).bit_length()
        prob = pose_graph.make_problem(KCAP, ECAP)
        R = np.array(prob.R)
        t = np.array(prob.t)
        R[:K] = m.kf_R[:K]
        t[:K] = m.kf_t[:K]
        valid = np.zeros(KCAP, bool)
        valid[:K] = m.kf_valid[:K]
        # ONLY the loop keyframe is fixed (Optimizer.cc:1117): it alone
        # anchors the gauge. Fixing KF0 as well plants a second anchor in
        # the pre-correction gauge — the graph then cannot heal the drift
        # between the two anchors (measured: a progressive-drift loop test
        # barely improved, 19.9cm -> 18.6cm, until this was removed).
        fixed = np.zeros(KCAP, bool)
        fixed[kf2] = True
        ei = np.zeros(ECAP, np.int32)
        ej = np.zeros(ECAP, np.int32)
        Rm = np.array(prob.R_meas)
        tm = np.array(prob.t_meas)
        w = np.zeros(ECAP, np.float32)
        ev = np.zeros(ECAP, bool)
        s_node = np.ones(KCAP, np.float32)
        if group_scale != 1.0:
            s_node[[k for k in group if k < K]] = group_scale
        s_meas = np.ones(ECAP, np.float32)
        for n, (i, j, wt, use_cur) in enumerate(edges):
            ei[n] = i
            ej[n] = j
            # tree/covis edges: PRE-correction odometry measurement; loop +
            # LoopConnections edges: the corrected relative pose (current
            # poses — the propagation put kf1's group into kf2's frame)
            Rs, ts_ = (m.kf_R, m.kf_t) if use_cur else \
                (R_meas_src, t_meas_src)
            Rji = Rs[j].T
            tji = -Rji @ ts_[j]
            Rm[n] = Rs[i] @ Rji
            tm[n] = Rs[i] @ tji + ts_[i]
            if use_cur:
                # corrected poses are scale-folded SE3; the true Sim3
                # relative S_i * S_j^-1 has scale s_i/s_j and translation
                # s_i * tm_SE3 (both reduce to the SE3 values when the
                # correction is rigid)
                s_meas[n] = s_node[i] / s_node[j]
                tm[n] *= s_node[i]
            w[n] = wt
            ev[n] = True
        return prob._replace(
            R=jnp.asarray(R), t=jnp.asarray(t),
            fixed=jnp.asarray(fixed), valid=jnp.asarray(valid),
            ei=jnp.asarray(ei), ej=jnp.asarray(ej),
            R_meas=jnp.asarray(Rm), t_meas=jnp.asarray(tm),
            w=jnp.asarray(w), e_valid=jnp.asarray(ev),
        ), s_node, s_meas

    def _transport_landmarks(self, K, old_R, old_t, Rn, tn, sn, s_old=None):
        """Move every landmark rigidly with its first (reference) keyframe's
        pose update (CorrectLoop's per-point Sim3 transport) — vectorized
        batched 3x3 einsums instead of the reference's per-point walk.
        ``s_old``: pre-solve node scales (mono; the stored old poses are
        scale-folded SE3, so true camera coords are s_old * (R x + t))."""
        m = self.map
        if s_old is None:
            s_old = np.ones(K, np.float32)
        pids = m.point_ids()
        if len(pids):
            rk = np.clip(m.pt_first_kf[pids], 0, K - 1)
            pc = (np.einsum("nij,nj->ni", old_R[rk], m.pt_pos[pids])
                  + old_t[rk]) * s_old[rk, None]
            m.pt_pos[pids] = np.einsum(
                "nji,nj->ni", Rn[rk], (pc - tn[rk]) / sn[rk, None])
        lids = m.line_ids()
        if len(lids):
            rk = np.clip(m.ln_first_kf[lids], 0, K - 1)
            for i in (0, 1):
                pc = (np.einsum("nij,nj->ni", old_R[rk], m.ln_ep[lids, i])
                      + old_t[rk]) * s_old[rk, None]
                m.ln_ep[lids, i] = np.einsum(
                    "nji,nj->ni", Rn[rk], (pc - tn[rk]) / sn[rk, None])

    def _correct_appended_kfs(self, K, old_R, old_t):
        """Keyframes appended while a correction's device solve ran (the
        tracker kept going) still carry the PRE-correction gauge: re-express
        each against its anchor (parent, or the last pre-correction KF) —
        the reference's post-GBA spanning-tree propagation
        (LoopClosing.cc:1040-1090). Caller holds the map lock."""
        m = self.map
        for k in range(K, m.n_kf):
            if not m.kf_valid[k]:
                continue
            a = int(m.kf_parent[k])
            if a < 0 or a >= K:
                a = K - 1
            while a > 0 and not m.kf_valid[a]:
                a -= 1
            # T_k_new = (T_k_old ∘ T_a_old^-1) ∘ T_a_new
            Rka = m.kf_R[k] @ old_R[a].T
            tka = m.kf_t[k] - Rka @ old_t[a]
            m.set_kf_pose(k, Rka @ m.kf_R[a], Rka @ m.kf_t[a] + tka)

    def _global_ba(self, kf1: int):
        """Full-map BA (RunGlobalBundleAdjustment, LoopClosing.cc:972-1119).
        Up to the dense-Schur camera cap this is the MXU dense solve; past
        it the local-BA gatherer routes through the matrix-free PCG Schur
        solver (optim.ba_cg), so the whole map participates regardless of
        keyframe count."""
        if self.local_mapper is None:
            return
        m = self.map
        # window covering every keyframe; caps scale with the map
        window = 1 << max(8, (m.n_kf - 1).bit_length())
        n_pts = m.n_points()
        point_cap = 1 << max(12, (max(n_pts, 1) - 1).bit_length())
        obs_cap = max(65536, 4 * point_cap)
        # line caps scale with the map like the point caps (the reference's
        # GBA refines every landmark it is given, Optimizer.cc:1670-2108)
        line_cap = 1 << max(8, (max(m.n_lines(), 1) - 1).bit_length())
        lobs_cap = max(4096, 4 * line_cap)
        with self.lock:
            K = m.n_kf
            old_R = m.kf_R[:K].copy()
            old_t = m.kf_t[:K].copy()
        self.local_mapper.run_local_ba(
            kf1, window=window, obs_cap=obs_cap, point_cap=point_cap,
            line_cap=line_cap, lobs_cap=lobs_cap, max_kf=K)
        with self.lock:
            # keyframes created while GBA iterated ride along via their
            # anchors (RunGlobalBundleAdjustment tail, LoopClosing.cc:
            # 1040-1090)
            self._correct_appended_kfs(K, old_R, old_t)
