import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plslam_tpu.geometry import se3, sim3, lines, projection


def rand_rot(rng):
    w = rng.standard_normal(3)
    return np.asarray(se3.so3_exp(jnp.asarray(w, jnp.float32)))


class TestSO3:
    def test_exp_log_roundtrip(self):
        rng = np.random.default_rng(0)
        for _ in range(20):
            w = rng.standard_normal(3).astype(np.float32)
            w = w / np.linalg.norm(w) * rng.uniform(0, 3.0)
            R = se3.so3_exp(jnp.asarray(w))
            w2 = np.asarray(se3.so3_log(R))
            np.testing.assert_allclose(w2, w, atol=2e-4)

    def test_exp_zero(self):
        R = se3.so3_exp(jnp.zeros(3))
        np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-6)

    def test_log_near_pi(self):
        w = np.array([np.pi - 1e-4, 0.0, 0.0], np.float32)
        R = se3.so3_exp(jnp.asarray(w))
        w2 = np.asarray(se3.so3_log(R))
        np.testing.assert_allclose(np.abs(w2), np.abs(w), atol=1e-2)

    def test_orthonormal(self):
        R = se3.so3_exp(jnp.asarray([0.3, -0.5, 0.2]))
        np.testing.assert_allclose(np.asarray(R @ R.T), np.eye(3), atol=1e-6)
        assert abs(float(jnp.linalg.det(R)) - 1) < 1e-6


class TestSE3:
    def test_exp_log_roundtrip(self):
        rng = np.random.default_rng(1)
        for _ in range(20):
            xi = rng.standard_normal(6).astype(np.float32) * 0.8
            R, t = se3.se3_exp(jnp.asarray(xi))
            xi2 = np.asarray(se3.se3_log(R, t))
            np.testing.assert_allclose(xi2, xi, atol=3e-4)

    def test_compose_inverse(self):
        rng = np.random.default_rng(2)
        xi = jnp.asarray(rng.standard_normal(6).astype(np.float32))
        R, t = se3.se3_exp(xi)
        Ri, ti = se3.inverse(R, t)
        Rc, tc = se3.compose(R, t, Ri, ti)
        np.testing.assert_allclose(np.asarray(Rc), np.eye(3), atol=1e-6)
        np.testing.assert_allclose(np.asarray(tc), 0, atol=1e-6)

    def test_quat_roundtrip(self):
        rng = np.random.default_rng(3)
        for _ in range(20):
            R = jnp.asarray(rand_rot(rng), jnp.float32)
            q = se3.rot_to_quat(R)
            R2 = se3.quat_to_rot(q)
            np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)

    def test_apply_matches_matmul(self):
        rng = np.random.default_rng(4)
        R = jnp.asarray(rand_rot(rng), jnp.float32)
        t = jnp.asarray(rng.standard_normal(3), jnp.float32)
        p = jnp.asarray(rng.standard_normal((10, 3)), jnp.float32)
        out = se3.apply(R, t, p)
        expect = (np.asarray(R) @ np.asarray(p).T).T + np.asarray(t)
        np.testing.assert_allclose(np.asarray(out), expect, atol=1e-5)


class TestSim3:
    def test_exp_log_roundtrip(self):
        rng = np.random.default_rng(5)
        for _ in range(20):
            xi = rng.standard_normal(7).astype(np.float32) * 0.5
            s, R, t = sim3.exp(jnp.asarray(xi))
            xi2 = np.asarray(sim3.log(s, R, t))
            np.testing.assert_allclose(xi2, xi, atol=5e-4)

    def test_sigma_zero_matches_se3(self):
        rng = np.random.default_rng(6)
        xi6 = rng.standard_normal(6).astype(np.float32)
        s, R, t = sim3.exp(jnp.concatenate([jnp.asarray(xi6), jnp.zeros(1)]))
        R2, t2 = se3.se3_exp(jnp.asarray(xi6))
        assert abs(float(s) - 1) < 1e-6
        np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-5)
        np.testing.assert_allclose(np.asarray(t), np.asarray(t2), atol=1e-4)

    def test_compose_inverse(self):
        rng = np.random.default_rng(7)
        xi = jnp.asarray(rng.standard_normal(7).astype(np.float32) * 0.3)
        s, R, t = sim3.exp(xi)
        si, Ri, ti = sim3.inverse(s, R, t)
        sc, Rc, tc = sim3.compose(s, R, t, si, Ri, ti)
        assert abs(float(sc) - 1) < 1e-5
        np.testing.assert_allclose(np.asarray(Rc), np.eye(3), atol=1e-5)
        np.testing.assert_allclose(np.asarray(tc), 0, atol=1e-5)

    def test_apply(self):
        p = jnp.asarray([[1.0, 0.0, 0.0]])
        s = jnp.float32(2.0)
        R = se3.so3_exp(jnp.asarray([0.0, 0.0, jnp.pi / 2]))
        t = jnp.asarray([0.0, 1.0, 0.0])
        out = np.asarray(sim3.apply(s, R, t, p))
        np.testing.assert_allclose(out, [[0.0, 3.0, 0.0]], atol=1e-5)


class TestProjection:
    cam = projection.Camera(fx=517.3, fy=516.5, cx=318.6, cy=255.3)

    def test_project_backproject(self):
        rng = np.random.default_rng(8)
        uv = jnp.asarray(rng.uniform(50, 400, (20, 2)), jnp.float32)
        d = jnp.asarray(rng.uniform(0.5, 5.0, (20,)), jnp.float32)
        pc = projection.backproject(self.cam, uv, d)
        uv2 = projection.project(self.cam, pc)
        np.testing.assert_allclose(np.asarray(uv2), np.asarray(uv), atol=1e-3)

    def test_undistort_identity_when_no_distortion(self):
        uv = jnp.asarray([[100.0, 200.0]])
        out = projection.undistort_points(self.cam, uv)
        np.testing.assert_allclose(np.asarray(out), np.asarray(uv), atol=1e-5)

    def test_undistort_matches_opencv(self):
        import cv2

        cam = projection.Camera(
            fx=517.306408, fy=516.469215, cx=318.643040, cy=255.313989,
            k1=0.262383, k2=-0.953104, p1=-0.005358, p2=0.002628, k3=1.163314,
        )
        rng = np.random.default_rng(9)
        pts = rng.uniform(100, 500, (50, 2)).astype(np.float32)
        K = np.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]], np.float32)
        dist = np.array([cam.k1, cam.k2, cam.p1, cam.p2, cam.k3], np.float32)
        cv_out = cv2.undistortPoints(pts.reshape(-1, 1, 2), K, dist, P=K).reshape(-1, 2)
        out = np.asarray(projection.undistort_points(cam, jnp.asarray(pts), iters=20))
        np.testing.assert_allclose(out, cv_out, atol=0.1)


class TestLines:
    def test_plucker_projection_consistency(self):
        """A 3D segment's projected infinite line must pass through the
        projections of its endpoints."""
        rng = np.random.default_rng(10)
        cam = projection.Camera(fx=500.0, fy=500.0, cx=320.0, cy=240.0)
        Kl = lines.line_intrinsics(cam.fx, cam.fy, cam.cx, cam.cy)
        for _ in range(10):
            ps = jnp.asarray(rng.uniform(-1, 1, 3) + [0, 0, 3], jnp.float32)
            pe = jnp.asarray(rng.uniform(-1, 1, 3) + [0, 0, 3], jnp.float32)
            n, v = lines.plucker_from_endpoints(ps, pe)
            l = lines.project_plucker(Kl, n)
            for p in (ps, pe):
                uv = projection.project(cam, p)
                d = lines.point_line_distance(l, uv)
                assert abs(float(d)) < 1e-2

    def test_plucker_transform(self):
        rng = np.random.default_rng(11)
        R = jnp.asarray(rand_rot(rng), jnp.float32)
        t = jnp.asarray(rng.standard_normal(3), jnp.float32)
        ps = jnp.asarray(rng.standard_normal(3), jnp.float32)
        pe = jnp.asarray(rng.standard_normal(3), jnp.float32)
        n, v = lines.plucker_from_endpoints(ps, pe)
        nc, vc = lines.transform_plucker(R, t, n, v)
        ps_c, pe_c = se3.apply(R, t, ps), se3.apply(R, t, pe)
        nc2, vc2 = lines.plucker_from_endpoints(ps_c, pe_c)
        np.testing.assert_allclose(np.asarray(nc), np.asarray(nc2), atol=1e-4)
        np.testing.assert_allclose(np.asarray(vc), np.asarray(vc2), atol=1e-4)

    def test_liang_barsky(self):
        p0 = jnp.asarray([[-10.0, 50.0], [10.0, 10.0], [-50.0, -50.0]])
        p1 = jnp.asarray([[50.0, 50.0], [90.0, 90.0], [-10.0, -10.0]])
        q0, q1, valid = lines.liang_barsky(p0, p1, 0.0, 0.0, 100.0, 100.0)
        assert bool(valid[0]) and bool(valid[1]) and not bool(valid[2])
        np.testing.assert_allclose(np.asarray(q0[0]), [0.0, 50.0], atol=1e-4)
        np.testing.assert_allclose(np.asarray(q1[0]), [50.0, 50.0], atol=1e-4)
        np.testing.assert_allclose(np.asarray(q0[1]), [10.0, 10.0], atol=1e-4)

    def test_segment_overlap(self):
        assert abs(float(lines.segment_overlap(0.0, 10.0, 5.0, 15.0)) - 0.5) < 1e-5
        assert float(lines.segment_overlap(0.0, 10.0, 20.0, 30.0)) == 0.0
        assert abs(float(lines.segment_overlap(0.0, 10.0, 2.0, 8.0)) - 1.0) < 1e-5

    def test_line_equation_2d(self):
        e0 = jnp.asarray([0.0, 0.0])
        e1 = jnp.asarray([10.0, 10.0])
        l = lines.line_equation_2d(e0, e1)
        # point on line
        assert abs(float(lines.point_line_distance(l, jnp.asarray([5.0, 5.0])))) < 1e-5
        # distance of (10,0) to y=x is 10/sqrt(2)
        d = abs(float(lines.point_line_distance(l, jnp.asarray([10.0, 0.0]))))
        np.testing.assert_allclose(d, 10 / np.sqrt(2), atol=1e-4)
