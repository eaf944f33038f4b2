import jax.numpy as jnp
import numpy as np

from plslam_tpu.ops import hamming, matching


def rand_desc(rng, n):
    return rng.integers(0, 256, (n, 32), dtype=np.uint8)


class TestHamming:
    def test_matrix_matches_numpy_popcount(self):
        rng = np.random.default_rng(0)
        a, b = rand_desc(rng, 64), rand_desc(rng, 96)
        ours = np.asarray(hamming.hamming_matrix(jnp.asarray(a), jnp.asarray(b)))
        ref = np.unpackbits(a[:, None, :] ^ b[None, :, :], axis=2).sum(2)
        np.testing.assert_array_equal(ours, ref)

    def test_pairs(self):
        rng = np.random.default_rng(1)
        a, b = rand_desc(rng, 50), rand_desc(rng, 50)
        ours = np.asarray(hamming.hamming_pairs(jnp.asarray(a), jnp.asarray(b)))
        ref = np.unpackbits(a ^ b, axis=1).sum(1)
        np.testing.assert_array_equal(ours, ref)

    def test_zero_distance_self(self):
        rng = np.random.default_rng(2)
        a = rand_desc(rng, 10)
        d = np.asarray(hamming.hamming_matrix(jnp.asarray(a), jnp.asarray(a)))
        assert np.all(np.diag(d) == 0)


class TestMatching:
    def test_best_matches_with_gate(self):
        rng = np.random.default_rng(3)
        t = rand_desc(rng, 100)
        # queries = noisy copies of targets 10..29
        q = t[10:30].copy()
        flip = rng.integers(0, 32, (20, 3))
        for i in range(20):
            for j in flip[i]:
                q[i, j] ^= 1 << int(rng.integers(0, 8))
        dist = hamming.hamming_matrix(jnp.asarray(q), jnp.asarray(t))
        gate = jnp.ones((20, 100), bool)
        m = matching.best_matches(dist, gate, max_dist=50)
        idx = np.asarray(m.idx)
        assert np.all(idx == np.arange(10, 30))
        assert int(m.count) == 20

    def test_gate_blocks(self):
        rng = np.random.default_rng(4)
        t = rand_desc(rng, 50)
        q = t[:5].copy()
        dist = hamming.hamming_matrix(jnp.asarray(q), jnp.asarray(t))
        gate = jnp.zeros((5, 50), bool)
        m = matching.best_matches(dist, gate, max_dist=50)
        assert int(m.count) == 0

    def test_window_gate(self):
        uv_p = jnp.asarray([[100.0, 100.0], [200.0, 200.0]])
        uv_t = jnp.asarray([[105.0, 103.0], [300.0, 300.0], [198.0, 201.0]])
        g = np.asarray(matching.window_gate(uv_p, uv_t, jnp.asarray([10.0, 5.0])))
        assert g[0, 0] and not g[0, 1] and not g[0, 2]
        assert g[1, 2] and not g[1, 0]

    def test_ratio_test(self):
        # two similar targets at distances 8 and 9 -> ratio test kills it
        q = np.zeros((1, 32), np.uint8)
        t = np.zeros((2, 32), np.uint8)
        t[0, 0] = 0xFF  # 8 bits from q
        t[1, 0] = 0xFF
        t[1, 1] = 0x01  # 9 bits from q
        dist = hamming.hamming_matrix(jnp.asarray(q), jnp.asarray(t))
        gate = jnp.ones((1, 2), bool)
        m = matching.best_matches(dist, gate, max_dist=50, nn_ratio=0.7)
        assert int(m.count) == 0
        m2 = matching.best_matches(dist, gate, max_dist=50)
        assert int(m2.count) == 1

    def test_rotation_consistency(self):
        rng = np.random.default_rng(5)
        n = 100
        t = rand_desc(rng, n)
        dist = hamming.hamming_matrix(jnp.asarray(t), jnp.asarray(t))
        gate = jnp.ones((n, n), bool)
        m = matching.best_matches(dist, gate, max_dist=50)
        # 90 matches rotated consistently by 10 deg, 10 outliers scattered
        ang_q = np.zeros(n, np.float32)
        ang_t = np.full(n, 10.0, np.float32)
        ang_t[:10] = rng.uniform(90, 270, 10)
        m2 = matching.rotation_consistency(
            jnp.asarray(ang_q), jnp.asarray(ang_t), m
        )
        ok = np.asarray(m2.ok)
        assert ok[10:].all()
        assert not ok[:10].any()

    def test_dedupe(self):
        # two queries matched to the same target: better one wins
        idx = jnp.asarray([5, 5, 7], jnp.int32)
        dist = jnp.asarray([10, 4, 3], jnp.int32)
        ok = jnp.asarray([True, True, True])
        m = matching.MatchResult(idx, dist, ok)
        m2 = matching.dedupe_targets(m, 10)
        ok2 = np.asarray(m2.ok)
        assert list(ok2) == [False, True, True]


def test_distinctive_descriptors_min_median():
    """The winning descriptor minimizes the median Hamming distance to the
    other observations (MapPoint::ComputeDistinctiveDescriptors)."""
    import numpy as np

    from plslam_tpu.config import SlamConfig
    from plslam_tpu.geometry.projection import Camera
    from plslam_tpu.models.distinctive import refresh_distinctive_descriptors
    from plslam_tpu.models.frame import FrameData
    from plslam_tpu.models.map import HostFrame, SlamMap

    cfg = SlamConfig(camera=Camera(fx=525.0, fy=525.0, cx=319.5, cy=239.5,
                                   bf=40.0))
    m = SlamMap(cfg)
    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, 32).astype(np.uint8)
    far = base ^ 0xFF  # 256 bits away
    mid = base.copy()
    mid[0] ^= 0x0F     # 4 bits away from base
    descs = [base, mid, far]

    n = cfg.orb.max_keypoints
    nl = cfg.lines.max_lines
    z = np.zeros
    for k, d in enumerate(descs):
        kp_desc = z((n, 32), np.uint8)
        kp_desc[0] = d
        kp_valid = z(n, bool)
        kp_valid[0] = True
        fd = FrameData(
            kp_xy=z((n, 2), np.float32), kp_xy_un=z((n, 2), np.float32),
            kp_resp=z(n, np.float32), kp_octave=z(n, np.int32),
            kp_angle=z(n, np.float32), kp_desc=kp_desc,
            kp_depth=z(n, np.float32), kp_ur=z(n, np.float32),
            kp_valid=kp_valid,
            ln_ep=z((nl, 2, 2), np.float32),
            ln_ep_un=z((nl, 2, 2), np.float32),
            ln_angle=z(nl, np.float32), ln_length=z(nl, np.float32),
            ln_coeff=z((nl, 3), np.float32), ln_desc=z((nl, 72), np.uint8),
            ln_depth=z((nl, 2), np.float32), ln_valid=z(nl, bool),
        )
        m.add_keyframe(HostFrame(fd), np.eye(3, dtype=np.float32),
                       np.zeros(3, np.float32), k, float(k))
    pid = m.add_point([0, 0, 1], far, [0, 0, 1], 0.1, 10.0, 0)
    for k in range(3):
        m.add_point_obs(pid, k, 0)
    assert refresh_distinctive_descriptors(m, [pid]) == 1
    import jax

    got = np.asarray(jax.device_get(m.point_desc_arena()))[pid]
    # base and mid tie closely; far must lose. Accept base or mid.
    assert np.array_equal(got, base) or np.array_equal(got, mid)
    assert not np.array_equal(got, far)
