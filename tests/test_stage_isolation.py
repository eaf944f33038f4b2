"""Stage-isolation tests with GROUND-TRUTH poses injected — the reference's
own test strategy (SURVEY §4): its Test/LastFrameProjection.cpp,
RefKeyFrameProjectionTest.cpp and LocalMapProjectionTest.cpp build real
frames with the production extractors, set poses from ground truth (so
matching quality is measured independently of pose-estimation error), run
ONE matcher stage, and count matches. Here the TUM dataset is replaced by
the synthetic room with exact ground truth.
"""

import numpy as np

import tests.conftest  # noqa: F401
import jax
import jax.numpy as jnp

from plslam_tpu.config import SlamConfig
from plslam_tpu.geometry.projection import Camera
from plslam_tpu.models import frame as mframe
from plslam_tpu.ops import line_matching, matching
from plslam_tpu.utils.synthetic import RoomScene, smooth_trajectory

CFG = SlamConfig(camera=Camera(fx=525.0, fy=525.0, cx=319.5, cy=239.5,
                               bf=40.0))


def _build(scene, R, t):
    gray, depth = scene.render(CFG.camera, R, t)
    fd = mframe.build_frame(jnp.asarray(gray.astype(np.float32)),
                            jnp.asarray(depth.astype(np.float32)), CFG)
    return jax.device_get(fd)


def _backproject(fd, R, t):
    """World-space 3D features of a frame using its GT pose + sensor depth."""
    cam = CFG.camera
    Rwc = R.T
    c = -Rwc @ t
    x = (fd.kp_xy_un[:, 0] - cam.cx) / cam.fx
    y = (fd.kp_xy_un[:, 1] - cam.cy) / cam.fy
    pc = np.stack([x * fd.kp_depth, y * fd.kp_depth, fd.kp_depth], -1)
    pw = pc @ Rwc.T + c
    ok = fd.kp_valid & (fd.kp_depth > 0)
    ep_w = np.zeros((fd.ln_valid.shape[0], 2, 3), np.float32)
    for k in (0, 1):
        xk = (fd.ln_ep_un[:, k, 0] - cam.cx) / cam.fx
        yk = (fd.ln_ep_un[:, k, 1] - cam.cy) / cam.fy
        pck = np.stack([xk * fd.ln_depth[:, k], yk * fd.ln_depth[:, k],
                        fd.ln_depth[:, k]], -1)
        ep_w[:, k] = pck @ Rwc.T + c
    lok = fd.ln_valid & (fd.ln_depth > 0).all(1)
    return pw.astype(np.float32), ok, ep_w, lok


class TestLastFrameProjection:
    """LineMatcher::SearchByProjection(cur, last) in isolation with GT poses
    (Test/LastFrameProjection.cpp counterpart)."""

    def setup_method(self):
        self.scene = RoomScene(0)
        poses = smooth_trajectory(40)
        (self.R1, self.t1), (self.R2, self.t2) = poses[10], poses[13]
        self.fd1 = _build(self.scene, self.R1, self.t1)
        self.fd2 = _build(self.scene, self.R2, self.t2)

    def test_line_projection_matches(self):
        _, _, ep_w, lok = _backproject(self.fd1, self.R1, self.t1)
        proj = line_matching.project_lines(
            CFG.camera, jnp.asarray(self.R2), jnp.asarray(self.t2),
            jnp.asarray(ep_w), jnp.asarray(lok))
        res = line_matching.match_lines(
            proj, jnp.asarray(self.fd1.ln_desc),
            jnp.asarray(self.fd2.ln_ep_un), jnp.asarray(self.fd2.ln_angle),
            jnp.asarray(self.fd2.ln_length), jnp.asarray(self.fd2.ln_desc),
            jnp.asarray(self.fd2.ln_valid), CFG.lines)
        idx, ok = jax.device_get((res.idx, res.ok))
        n_lines = int(lok.sum())
        n_match = int((ok & lok).sum())
        assert n_lines >= 10, "scene must produce lines"
        assert n_match >= 0.4 * n_lines, f"{n_match}/{n_lines} line matches"
        # matched pairs must land near the projection (reprojection sanity)
        puv = np.asarray(proj.uv)
        for i in np.nonzero(ok & lok)[0][:50]:
            mid_p = puv[i].mean(0)
            mid_f = self.fd2.ln_ep_un[idx[i]].mean(0)
            assert np.linalg.norm(mid_p - mid_f) < 60.0

    def test_point_projection_matches(self):
        """ORBmatcher::SearchByProjection(cur, last) counterpart: project
        last-frame 3D points at the GT pose, window-gate, Hamming match."""
        pw, ok1, _, _ = _backproject(self.fd1, self.R1, self.t1)
        cam = CFG.camera
        pc = pw @ self.R2.T + self.t2
        z = np.maximum(pc[:, 2], 1e-6)
        uv = np.stack([cam.fx * pc[:, 0] / z + cam.cx,
                       cam.fy * pc[:, 1] / z + cam.cy], -1).astype(np.float32)
        in_img = (pc[:, 2] > 0.05) & (uv[:, 0] >= 0) & (uv[:, 0] < cam.width) \
            & (uv[:, 1] >= 0) & (uv[:, 1] < cam.height)
        q_ok = ok1 & in_img
        gate = (matching.window_gate(jnp.asarray(uv),
                                     jnp.asarray(self.fd2.kp_xy_un),
                                     jnp.full(uv.shape[0], 15.0))
                & jnp.asarray(q_ok)[:, None]
                & jnp.asarray(self.fd2.kp_valid)[None, :])
        m = matching.match_descriptors(
            jnp.asarray(self.fd1.kp_desc), jnp.asarray(self.fd2.kp_desc),
            gate, 100)
        idx, mok = jax.device_get((m.idx, m.ok))
        n_q = int(q_ok.sum())
        n_m = int((mok & q_ok).sum())
        assert n_q > 200
        assert n_m >= 0.35 * n_q, f"{n_m}/{n_q} point matches"
        # matched features must sit inside the search window of the GT
        # projection (the stage contract — window_gate is a BOX |du|,|dv|<r,
        # GetFeaturesInArea semantics, so check per component)
        sel = np.nonzero(mok & q_ok)[0]
        duv = np.abs(self.fd2.kp_xy_un[idx[sel]] - uv[sel])
        assert (duv <= 15.0 + 1e-3).all()


class TestWiderBaselineProjection:
    """RefKeyFrame/LocalMap projection counterpart: a wider baseline (the
    keyframe gap) must still produce enough line matches for the gate
    cascade's relaxed retry to be meaningful."""

    def test_line_matches_survive_baseline(self):
        scene = RoomScene(0)
        poses = smooth_trajectory(60)
        (R1, t1), (R2, t2) = poses[5], poses[15]
        fd1 = _build(scene, R1, t1)
        fd2 = _build(scene, R2, t2)
        _, _, ep_w, lok = _backproject(fd1, R1, t1)
        proj = line_matching.project_lines(
            CFG.camera, jnp.asarray(R2), jnp.asarray(t2),
            jnp.asarray(ep_w), jnp.asarray(lok))
        res = line_matching.match_lines(
            proj, jnp.asarray(fd1.ln_desc),
            jnp.asarray(fd2.ln_ep_un), jnp.asarray(fd2.ln_angle),
            jnp.asarray(fd2.ln_length), jnp.asarray(fd2.ln_desc),
            jnp.asarray(fd2.ln_valid), CFG.lines)
        ok = np.asarray(res.ok)
        n_lines = int(lok.sum())
        n_match = int((ok & lok).sum())
        assert n_lines >= 8
        assert n_match >= 4, f"{n_match}/{n_lines} across the KF baseline"
