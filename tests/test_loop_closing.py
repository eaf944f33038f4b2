import pytest

pytestmark = pytest.mark.slow  # system-level e2e tier

import os

import numpy as np
import jax.numpy as jnp

from plslam_tpu.bow.database import KeyFrameDatabase
from plslam_tpu.bow.vocabulary import Vocabulary
from plslam_tpu.config import SlamConfig
from plslam_tpu.geometry import se3
from plslam_tpu.geometry.projection import Camera
from plslam_tpu.models.local_mapping import LocalMapper
from plslam_tpu.models.loop_closing import LoopCloser
from plslam_tpu.models.map import SlamMap
from plslam_tpu.models.tracking import Tracker
from plslam_tpu.utils.synthetic import RoomScene

VOC_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plslam_tpu", "bow", "vocab_synth.npz",
)
CAM = Camera(fx=525.0, fy=525.0, cx=319.5, cy=239.5, bf=40.0)


def orbit_poses(n, radius=0.45):
    """Camera orbiting the room center, yawing a full turn — returns to the
    starting view at the end (a guaranteed loop)."""
    poses = []
    for i in range(n):
        a = 2 * np.pi * i / (n - 30)  # completes the turn well before the
                                      # end: a sustained revisit phase
        c = np.array(
            [radius * np.sin(a), 0.0, 1.25 + radius * np.cos(a)], np.float32
        )
        Rwc = np.asarray(se3.so3_exp(jnp.asarray([0.0, a, 0.0], jnp.float32)))
        R = Rwc.T.astype(np.float32)
        t = (-R @ c).astype(np.float32)
        poses.append((R, t))
    return poses


def build_system(use_lines=False, cull=True):
    """``cull=False`` disables KeyFrameCulling — the severed-map scenarios
    need it OFF: with the r5 frontend binding ~900 points/frame, live
    culling removes every old keyframe whose view the revisit re-covers
    (legitimately — the map stays connected), and the post-hoc severance
    then leaves NO old keyframe overlapping the revisit views, a state
    where even a ground-truth Sim3 projects <12 matches (physically
    unclosable; measured r5). Culling policy has its own regression test
    (test_kf_culling.py); these scenarios gate the LOOP PIPELINE."""
    import dataclasses as _dc

    cfg = SlamConfig(camera=CAM, use_lines=use_lines)
    if not cull:
        cfg = cfg.replace(mapping=_dc.replace(
            cfg.mapping, kf_culling_redundancy=10.0))  # never fires
    voc = Vocabulary.load(VOC_PATH)
    m = SlamMap(cfg)
    kfdb = KeyFrameDatabase(voc, max_kf=cfg.capacity.max_keyframes)
    lm = LocalMapper(cfg, m, kfdb=kfdb)
    lc = LoopCloser(cfg, m, kfdb, voc, local_mapper=lm)
    tr = Tracker(cfg, m, local_mapper=lm, loop_closer=lc, voc=voc, kfdb=kfdb)
    lc.tracker = tr
    return cfg, m, lm, lc, tr


def inject_drift(m, tr, kf_cut, W_R, W_t, spare_live=True):
    """Displace the OLD map sector (keyframes < kf_cut and their landmarks)
    by a world transform — emulating accumulated drift between the first
    visit and the revisit, exactly the discontinuity loop closing exists to
    heal. ``spare_live`` keeps the points the tracker currently anchors to
    untouched: otherwise the displaced anchors sit in the live local map
    and the tracker simply follows the teleport (fusion then reconnects
    and no loop is ever needed — the engine got too robust for the naive
    version of this scenario)."""
    live = set()
    if spare_live and tr.last_pt_ids is not None:
        # only the CURRENTLY BOUND anchors — sparing the whole local map
        # leaves a bridge of original-gauge points that lets fusion absorb
        # the teleport without a loop closure
        live |= set(int(p) for p in tr.last_pt_ids[tr.last_pt_ids >= 0])
    for k in range(kf_cut):
        if not m.kf_valid[k]:
            continue
        R, t = m.kf_R[k], m.kf_t[k]
        m.set_kf_pose(k, R @ W_R, R @ W_t + t)
    pids = m.point_ids()
    sel = np.array(
        [p for p in pids if m.pt_first_kf[p] < kf_cut and int(p) not in live],
        np.int64)
    m.pt_pos[sel] = (m.pt_pos[sel] - W_t) @ W_R
    lids = m.line_ids()
    lsel = lids[m.ln_first_kf[lids] < kf_cut]
    for i in (0, 1):
        m.ln_ep[lsel, i] = (m.ln_ep[lsel, i] - W_t) @ W_R


def sever_and_displace(m, tr, kf_cut, W_R, W_t, s=1.0):
    """Put the map into the kidnapped-sector state loop closing exists
    for: split every landmark shared across the cut (the old sector gets
    a duplicate), drop cross-sector line observations, then displace the
    old sector by W. The sectors then share NOTHING — no covisibility, no
    fusion bridge — so only the BoW loop pipeline can reconnect them
    (the discontinuity real long-horizon drift produces).

    ``s``: similarity scale of the displacement (mono scale drift). The
    old sector stays internally self-consistent — poses become
    [R@W_R | (R@W_t + t)/s] and landmarks (W^-1 p)/s, so reprojections
    are unchanged (camera coords scale uniformly by 1/s) — but its metric
    scale now disagrees with the new sector by the factor s, which only a
    7-dof (Sim3) loop correction can heal."""
    desc_arena = np.asarray(m.point_desc_arena())
    for pid in list(m.point_ids()):
        obs = m.pt_obs[pid]
        old_obs = {k: f for k, f in obs.items() if k < kf_cut}
        new_obs = {k: f for k, f in obs.items() if k >= kf_cut}
        if old_obs and new_obs:
            # the duplicate keeps the REAL distinctive descriptor: a real
            # drifted map's landmarks are fully described — zero-desc dups
            # would starve descriptor-gated stages (SearchAndFuse, the
            # loop verification projector) artificially
            dup = m.add_point(m.pt_pos[pid].copy(),
                              desc_arena[pid].copy(),
                              m.pt_normal[pid], m.pt_min_dist[pid],
                              m.pt_max_dist[pid], min(old_obs))
            for k, f in old_obs.items():
                m.pt_obs[pid].pop(k)
                m.add_point_obs(dup, k, f)
            m.pt_first_kf[pid] = min(new_obs)
    for lid in list(m.line_ids()):
        obs = m.ln_obs[lid]
        old = [k for k in obs if k < kf_cut]
        if old and any(k >= kf_cut for k in obs):
            for k in old:
                f = obs.pop(k)
                if m.kf_ln_idx[k, f] == lid:
                    m.kf_ln_idx[k, f] = -1
            if m.ln_first_kf[lid] < kf_cut:
                m.ln_first_kf[lid] = min(obs) if obs else kf_cut
    # displace the old sector RIGIDLY (pose + landmarks by the same W):
    # the loop pipeline's Kabsch stage assumes the revisited geometry is
    # rigid in the drifted gauge, which is what slow accumulated drift
    # looks like locally around the loop anchor
    for k in range(kf_cut):
        if not m.kf_valid[k]:
            continue
        R, t = m.kf_R[k], m.kf_t[k]
        m.set_kf_pose(k, R @ W_R, (R @ W_t + t) / s)
    pids = m.point_ids()
    sel = pids[m.pt_first_kf[pids] < kf_cut]
    m.pt_pos[sel] = ((m.pt_pos[sel] - W_t) @ W_R) / s
    lids = m.line_ids()
    lsel = lids[m.ln_first_kf[lids] < kf_cut]
    for i in (0, 1):
        m.ln_ep[lsel, i] = ((m.ln_ep[lsel, i] - W_t) @ W_R) / s


def _rel_err_vs_gt(m, tr, poses):
    """Camera-center error of (last pose relative to KF0) vs ground truth —
    invariant to any world-gauge motion from corrections."""
    Re, te = tr.last_pose
    R0e, t0e = m.kf_R[0], m.kf_t[0]
    Rrel_e = Re @ R0e.T
    trel_e = te - Rrel_e @ t0e
    Rg, tg = poses[-1]
    R0g, t0g = poses[0]
    Rrel_g = Rg @ R0g.T
    trel_g = tg - Rrel_g @ t0g
    return float(
        np.linalg.norm(-Rrel_e.T @ trel_e - (-Rrel_g.T @ trel_g))
    )


def run_severed_loop_check(n: int):
    """Severed-map loop pipeline assertions. n=150 is the validated
    scenario (the orbit rate 2pi/(n-30) grows hostile below ~140 frames:
    at n=100 the 5.1 deg/frame spin breaks tracking outright, so a
    reduced-frame midslow variant is not viable — the midslow tier runs
    THIS test instead, ~6 min)."""
    cfg, m, lm, lc, tr, kf_cut, pre_R, pre_t = (
        TestLoopClosing._severed_map(n))
    poses = orbit_poses(n)
    fid = m.kf_frame_id[:m.n_kf]
    gt_R = np.stack([poses[int(f)][0] for f in fid])
    gt_t = np.stack([poses[int(f)][1] for f in fid])
    k = max(q for q in range(m.n_kf) if m.kf_valid[q])
    disp_R = m.kf_R[:m.n_kf].copy()
    disp_t = m.kf_t[:m.n_kf].copy()
    # the revisit tail only spans ~2 keyframes, so the 3-round consistency
    # chain is driven by re-submitting the newest keyframe (in live
    # operation consecutive revisit KFs do this)
    for _ in range(3):
        lc.process_keyframe(k)
        if lc.n_loops_closed:
            break
    assert lc.n_loops_closed >= 1, "loop closure never fired"
    k1, k2 = lc.last_loop_pair
    assert k2 < kf_cut <= k1, f"loop pair {k1},{k2} not cross-sector"
    # the fusion must have stitched the sectors' observation graphs back
    # together (SearchAndFuse; without this the GBA relaxes the correction
    # away — round-3's failure mode)
    cross = sum(
        1 for pid in m.point_ids()
        if any(q < kf_cut for q in m.pt_obs[pid])
        and any(q >= kf_cut for q in m.pt_obs[pid]))
    assert cross >= 20, f"only {cross} cross-sector landmarks after fuse"
    err_before = TestLoopClosing._cross_sector_err(
        disp_R, disp_t, k2, k1, gt_R, gt_t)
    err_after = TestLoopClosing._cross_sector_err(
        m.kf_R, m.kf_t, k2, k1, gt_R, gt_t)
    assert err_before > 0.05, "severance did not displace the anchor"
    assert err_after < 0.05, (
        f"correction did not land on the physical relative: "
        f"{err_before*100:.1f}cm -> {err_after*100:.1f}cm vs GT")
    assert err_after < 0.3 * err_before, (
        f"correction did not converge at the anchor: "
        f"{err_before*100:.1f}cm -> {err_after*100:.1f}cm vs GT")


class TestLoopClosing:
    def test_full_orbit_stays_connected(self):
        """Without drift, revisiting is absorbed by fusion — tracking must
        survive the whole orbit and keep the pose consistent."""
        cfg, m, lm, lc, tr = build_system()
        scene = RoomScene(3)
        n = 150
        poses = orbit_poses(n)
        R0g, t0g = poses[0]
        tracked = 0
        for i, (R, t) in enumerate(poses):
            g, d = scene.render(CAM, R, t)
            if tr.process(g, d, i / 30.0) is not None:
                tracked += 1
        assert tracked > 0.95 * n, f"tracked {tracked}/{n}"
        err = _rel_err_vs_gt(m, tr, poses)
        # a full fast orbit (3 deg/frame = 90 deg/s — 3-4x faster than TUM
        # handheld motion) accumulates real drift; the bound checks the
        # revisit pulled the estimate back together
        assert err < 0.25, f"final pose err {err*100:.1f}cm"

    def test_drift_absorbed_without_explicit_loop(self):
        """A moderate (19 cm / 6 deg) teleport of the old map sector that
        leaves ANY landmark bridge is absorbed by tracking + fusion alone —
        the engine self-heals and no loop closure is needed. (Round 2's
        version of this test required the loop to fire; the round-3
        frontend is robust enough that the same injection no longer breaks
        connectivity — the explicit pipeline is exercised by the severed
        scenario below.)"""
        cfg, m, lm, lc, tr = build_system()
        scene = RoomScene(3)
        n = 150
        poses = orbit_poses(n)
        W_R = np.asarray(
            se3.so3_exp(jnp.asarray([0.0, 0.10, 0.0], jnp.float32))
        ).astype(np.float32)
        W_t = np.array([0.15, 0.0, -0.12], np.float32)
        for i, (R, t) in enumerate(poses):
            g, d = scene.render(CAM, R, t)
            tr.process(g, d, i / 30.0)
            if i == 90:
                inject_drift(m, tr, max(m.n_kf // 2, 1), W_R, W_t)
                tr._refresh_local_map(tr.last_pt_ids, tr.last_ln_ids)
        tr.flush()
        err = _rel_err_vs_gt(m, tr, poses)
        assert err < 0.25, f"KF0-relative pose err {err*100:.1f}cm"

    @staticmethod
    def _severed_map(n=150, s=1.0):
        """Track a full orbit, then put the map into the kidnapped-sector
        state (severed + displaced old half). Returns everything the loop
        pipeline needs plus the pre-displacement pose snapshot. ``s``:
        similarity scale of the displacement (mono scale-drift scenario)."""
        cfg, m, lm, lc, tr = build_system(cull=False)
        scene = RoomScene(3)
        poses = orbit_poses(n)
        for i, (R, t) in enumerate(poses):
            g, d = scene.render(CAM, R, t)
            tr.process(g, d, i / 30.0)
        tr.flush()
        W_R = np.asarray(
            se3.so3_exp(jnp.asarray([0.0, 0.10, 0.0], jnp.float32))
        ).astype(np.float32)
        W_t = np.array([0.15, 0.0, -0.12], np.float32)
        kf_cut = m.n_kf // 2
        pre_R = m.kf_R[:m.n_kf].copy()
        pre_t = m.kf_t[:m.n_kf].copy()
        sever_and_displace(m, tr, kf_cut, W_R, W_t, s=s)
        # reset ALL loop-closer state: the improved pipeline can close a
        # loop DURING the orbit (live revisit), and a stale n_loops_closed
        # would short-circuit the post-severance assertions
        lc.prev_groups = []
        lc.last_loop_kf = -(10**9)
        lc.n_loops_closed = 0
        lc.last_loop_pair = None
        return cfg, m, lm, lc, tr, kf_cut, pre_R, pre_t

    @staticmethod
    def _cross_sector_err(R_arr, t_arr, a, b, pre_R, pre_t):
        """Translation error of the a-vs-b relative pose in (R_arr, t_arr)
        against the pre-displacement (ground-truth-consistent) relative —
        gauge invariant."""
        Rab = R_arr[a] @ R_arr[b].T
        tab = t_arr[a] - Rab @ t_arr[b]
        Rab0 = pre_R[a] @ pre_R[b].T
        tab0 = pre_t[a] - Rab0 @ pre_t[b]
        return float(np.linalg.norm(tab - tab0))

    @pytest.mark.midslow
    def test_loop_detected_and_corrected_on_severed_map(self):
        """The explicit loop pipeline end-to-end: with the sectors sharing
        NOTHING (no covisibility, no fusion bridge — the discontinuity of
        real long-horizon drift), BoW detection → covisibility-consistency
        chain → Kabsch RANSAC Sim3 → correction + SearchAndFuse +
        essential graph + GBA must fire and pull the sectors back together.

        The convergence target is the GROUND-TRUTH relative pose at the
        anchor, NOT the pre-displacement tracked relative: the fast orbit
        (3 deg/frame) accumulates ~20 cm of REAL drift between the sectors'
        geometry estimates, comparable to the injected displacement, so the
        pre-displacement map is itself far from truth there. The loop
        pipeline measures the PHYSICAL relative from revisited landmarks
        (instrumented: the trimmed Kabsch core agrees with GT to ~6 mm) and
        the corrected map must land on it."""
        run_severed_loop_check(n=150)

    @staticmethod
    def _sector_scale_ratio(m, pre_R, pre_t, lo, hi):
        """Median ratio of consecutive-keyframe camera-center distances
        (current map / pre-displacement map) over valid KFs in [lo, hi) —
        the per-sector gauge scale relative to the as-tracked map."""
        ks = [k for k in range(lo, hi) if m.kf_valid[k]]
        r = []
        for a, b in zip(ks[:-1], ks[1:]):
            ca0 = -pre_R[a].T @ pre_t[a]
            cb0 = -pre_R[b].T @ pre_t[b]
            d0 = np.linalg.norm(ca0 - cb0)
            if d0 < 1e-4:
                continue
            ca = -m.kf_R[a].T @ m.kf_t[a]
            cb = -m.kf_R[b].T @ m.kf_t[b]
            r.append(np.linalg.norm(ca - cb) / d0)
        return float(np.median(r))

    def test_mono_scale_drift_healed_by_sim3_graph(self):
        """Monocular loop pipeline (fix_scale=False): the severed old
        sector is displaced by a SIMILARITY with scale 1.3 — the scale
        drift a monocular run accumulates, which no rigid correction can
        heal. Detection → scaled Kabsch/Umeyama Sim3 → 7-dof essential
        graph (optimize_pose_graph_sim3) must pull the sectors onto ONE
        uniform gauge (OptimizeEssentialGraph fix_scale=false,
        /root/reference/src/Optimizer.cc:1064-1399; mbFixScale wiring
        LoopClosing.cc:37-43). GBA is off: reprojection BA over this
        RGB-D-built map would re-impose the stored depths' metric scale,
        which a real mono map does not have — the 7-dof graph is the
        stage under test."""
        import dataclasses as _dc

        s = 1.3
        cfg, m, lm, lc, tr, kf_cut, pre_R, pre_t = self._severed_map(
            n=150, s=s)
        lc.cfg = cfg.replace(loop=_dc.replace(cfg.loop, fix_scale=False))
        lc.enable_gba = False
        K0 = m.n_kf
        r_old = self._sector_scale_ratio(m, pre_R, pre_t, 0, kf_cut)
        r_new = self._sector_scale_ratio(m, pre_R, pre_t, kf_cut, K0)
        tear0 = r_new / r_old
        assert tear0 > 1.2, f"injection produced no scale tear ({tear0:.3f})"
        k = max(q for q in range(m.n_kf) if m.kf_valid[q])
        for _ in range(3):
            lc.process_keyframe(k)
            if lc.n_loops_closed:
                break
        assert lc.n_loops_closed >= 1, "mono loop closure never fired"
        k1, k2 = lc.last_loop_pair
        assert k2 < kf_cut <= k1, f"loop pair {k1},{k2} not cross-sector"
        r_old2 = self._sector_scale_ratio(m, pre_R, pre_t, 0, kf_cut)
        r_new2 = self._sector_scale_ratio(m, pre_R, pre_t, kf_cut, K0)
        tear1 = r_new2 / r_old2
        assert abs(np.log(tear1)) < np.log(1.08), (
            f"7-dof graph did not heal the scale tear: "
            f"{tear0:.3f} -> {tear1:.3f} (want ~1.0)")
        # and the anchor-relative pose must land near truth like the rigid
        # scenario (the healed gauge is the old sector's: compare in it)
        fid = m.kf_frame_id[:K0]
        poses = orbit_poses(150)
        gt_R = np.stack([poses[int(f)][0] for f in fid])
        gt_t = np.stack([poses[int(f)][1] for f in fid])
        # relative translations in the healed (old-sector) gauge are the
        # physical ones divided by s; _cross_sector_err is linear in t
        err_after = self._cross_sector_err(
            m.kf_R, m.kf_t * s, k2, k1, gt_R, gt_t)
        assert err_after < 0.08, (
            f"corrected anchor relative off truth by {err_after*100:.1f}cm")


class TestTrajectoryHealing:
    def _track_short(self, n=60):
        cfg, m, lm, lc, tr = build_system()
        scene = RoomScene(3)
        poses = orbit_poses(150)[:n]
        for i, (R, t) in enumerate(poses):
            g, d = scene.render(CAM, R, t)
            tr.process(g, d, i / 30.0)
        tr.flush()
        return m, tr, poses

    def test_healing_follows_map_corrections_exactly(self):
        """Mechanism check: applying a rigid world transform to every
        keyframe (what a GBA/loop correction does to the map gauge) must
        move every healed frame pose by exactly that transform, while the
        as-tracked poses stay put."""
        m, tr, _ = self._track_short()
        assert len(tr.traj_refs) == len(tr.trajectory)
        before = tr.healed_trajectory()
        W_R = np.asarray(
            se3.so3_exp(jnp.asarray([0.02, -0.03, 0.01], jnp.float32))
        ).astype(np.float32)
        W_t = np.array([0.15, -0.08, 0.30], np.float32)
        for k in range(m.n_kf):
            if m.kf_valid[k]:
                R, t = m.kf_R[k], m.kf_t[k]
                m.set_kf_pose(k, R @ W_R, R @ W_t + t)
        after = tr.healed_trajectory()
        for (_, Rb, tb), (_, Ra, ta) in zip(before, after):
            np.testing.assert_allclose(Ra, Rb @ W_R, atol=1e-5)
            np.testing.assert_allclose(ta, Rb @ W_t + tb, atol=1e-5)

    def test_healing_survives_reference_kf_culling(self):
        """Culling a reference keyframe must leave healed poses unchanged
        (the cull-time relative pose chains to a surviving ancestor —
        KeyFrame::mTcp semantics, System.cc:355-365)."""
        m, tr, _ = self._track_short()
        before = tr.healed_trajectory()
        refs = sorted({r for r, _, _ in tr.traj_refs if r > 0})
        assert refs, "no non-root reference keyframes recorded"
        victim = refs[len(refs) // 2]
        m.erase_keyframe(victim)
        assert not m.kf_valid[victim]
        after = tr.healed_trajectory()
        for (_, Rb, tb), (_, Ra, ta) in zip(before, after):
            np.testing.assert_allclose(Ra, Rb, atol=1e-4)
            np.testing.assert_allclose(ta, tb, atol=1e-4)

    def test_saved_trajectory_healed_through_loop_correction(self):
        """End-to-end (the round-2 gap): drive a REAL loop closure and
        assert the saved (healed) trajectory is consistent with the
        CORRECTED map — every frame recorded at a keyframe's timestamp
        re-composes onto that keyframe's post-correction pose (the
        System::SaveTrajectoryTUM guarantee). The as-tracked list cannot
        satisfy this: its pre-correction entries keep their old poses.

        (An absolute healed-vs-raw ATE comparison is NOT asserted here: the
        drift is a synthetic map teleport, so ground truth stays with the
        as-tracked gauge by construction — only real accumulated drift
        rewards healing in ATE, and the frontend no longer produces enough
        of it on this scene. The exactness tests above cover the
        composition; this one covers the loop pipeline feeding it.)"""
        cfg, m, lm, lc, tr, kf_cut, pre_R, pre_t = (
            TestLoopClosing._severed_map())
        k = max(q for q in range(m.n_kf) if m.kf_valid[q])
        for _ in range(3):
            lc.process_keyframe(k)
            if lc.n_loops_closed:
                break
        assert lc.n_loops_closed >= 1, "loop closure never fired"
        heal = tr.healed_trajectory()
        assert len(heal) == len(tr.trajectory) == len(tr.traj_refs)
        # healed poses at keyframe timestamps == the corrected keyframe
        # poses; the as-tracked (pre-correction) entries disagree
        ts_to_heal = {round(ts, 6): (R, t) for ts, R, t in heal}
        ts_to_raw = {round(ts, 6): (R, t) for ts, R, t in tr.trajectory}
        checked = 0
        max_raw_err = 0.0
        for k in range(m.n_kf):
            if not m.kf_valid[k]:
                continue
            key = round(float(m.kf_timestamp[k]), 6)
            if key not in ts_to_heal:
                continue
            Rh, th = ts_to_heal[key]
            ch = -(Rh.T @ th)
            ck = -(m.kf_R[k].T @ m.kf_t[k])
            assert np.linalg.norm(ch - ck) < 0.02, (
                f"healed frame at KF {k} off by "
                f"{np.linalg.norm(ch - ck)*100:.1f}cm")
            Rr, tr_ = ts_to_raw[key]
            max_raw_err = max(max_raw_err,
                              float(np.linalg.norm(-(Rr.T @ tr_) - ck)))
            checked += 1
        assert checked >= 5, f"only {checked} keyframe timestamps matched"
        # the correction moved pre-loop keyframes; as-tracked records keep
        # the old gauge and must disagree for at least one of them
        assert max_raw_err > 0.05, (
            "as-tracked poses already match the corrected map — "
            "the loop did not move anything this test can observe")


def test_refine_sim3_recovers_similarity():
    """Sim3 reprojection LM (Optimizer::OptimizeSim3 parity) sharpens a
    perturbed RANSAC estimate to the true similarity."""
    import jax.numpy as jnp
    import numpy as np

    from plslam_tpu.geometry.projection import Camera
    from plslam_tpu.optim import horn

    cam = Camera(fx=525.0, fy=525.0, cx=319.5, cy=239.5, bf=40.0)
    rng = np.random.default_rng(0)
    N = 512
    n = 200
    x2 = rng.uniform([-2, -1.5, 2.0], [2, 1.5, 6.0], (n, 3)).astype(
        np.float32)
    # true S12: rotation + translation + scale
    aa = np.array([0.03, -0.05, 0.02])
    th = np.linalg.norm(aa)
    k = aa / th
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    R_true = (np.eye(3) + np.sin(th) * K
              + (1 - np.cos(th)) * K @ K).astype(np.float32)
    t_true = np.array([0.2, -0.1, 0.05], np.float32)
    s_true = 1.08
    x1 = (s_true * x2 @ R_true.T + t_true).astype(np.float32)

    def proj(p):
        return np.stack([cam.fx * p[:, 0] / p[:, 2] + cam.cx,
                         cam.fy * p[:, 1] / p[:, 2] + cam.cy], -1)

    uv1 = np.zeros((N, 2), np.float32)
    uv2 = np.zeros((N, 2), np.float32)
    X1 = np.zeros((N, 3), np.float32)
    X2 = np.zeros((N, 3), np.float32)
    val = np.zeros(N, bool)
    uv1[:n] = proj(x1)
    uv2[:n] = proj(x2)
    X1[:n] = x1
    X2[:n] = x2
    val[:n] = True

    # perturbed initialization (what RANSAC would hand over)
    R0 = R_true @ (np.eye(3) + np.array(
        [[0, -0.01, 0], [0.01, 0, 0], [0, 0, 0]])).astype(np.float32)
    s, R, t, inl, n_in = horn.refine_sim3(
        cam, 1.0, jnp.asarray(R0.astype(np.float32)),
        jnp.asarray(t_true + np.float32([0.03, -0.02, 0.01])),
        jnp.asarray(X1), jnp.asarray(uv1),
        jnp.asarray(X2), jnp.asarray(uv2), jnp.asarray(val))
    assert int(n_in) > 0.9 * n
    assert abs(float(s) - s_true) < 0.01
    assert np.abs(np.asarray(R) - R_true).max() < 5e-3
    assert np.abs(np.asarray(t) - t_true).max() < 2e-2
