import cv2
import jax
import jax.numpy as jnp
import numpy as np

from plslam_tpu.config import LineConfig
from plslam_tpu.ops import lbd, lsd

CFG = LineConfig()


def paint_scene(seed=0, texture=True, shift=(0, 0), gain=1.0, bias=0.0):
    rng = np.random.default_rng(seed)
    if texture:
        img = rng.uniform(90, 130, (120, 160)).astype(np.float32)
        img = cv2.resize(img, (640, 480), interpolation=cv2.INTER_CUBIC)
    else:
        img = np.full((480, 640), 128, np.float32)
    dx, dy = shift
    segs = [
        ((60 + dx, 60 + dy), (310 + dx, 90 + dy)),
        ((400 + dx, 110 + dy), (420 + dx, 380 + dy)),
        ((110 + dx, 300 + dy), (490 + dx, 320 + dy)),
        ((580 + dx, 60 + dy), (510 + dx, 250 + dy)),
        ((60 + dx, 400 + dy), (260 + dx, 420 + dy)),
    ]
    for (x0, y0), (x1, y1) in segs:
        cv2.line(img, (x0, y0), (x1, y1), 255, 3)
    img = np.clip(cv2.GaussianBlur(img, (3, 3), 0.8) * gain + bias, 0, 255)
    return img.astype(np.float32), segs


def seg_dist(a, b):
    d1 = np.linalg.norm(a - b, axis=1).sum()
    d2 = np.linalg.norm(a[::-1] - b, axis=1).sum()
    return min(d1, d2)


class TestLsd:
    def test_detects_painted_segments(self):
        img, segs = paint_scene(texture=False)
        f = lsd.detect_lines(jnp.asarray(img), CFG, (480, 640))
        ep = np.asarray(f.endpoints)[np.asarray(f.valid)]
        assert len(ep) >= 5
        hits = 0
        for (x0, y0), (x1, y1) in segs:
            gt = np.array([[x0, y0], [x1, y1]], float)
            if min(seg_dist(e, gt) for e in ep) < 60:
                hits += 1
        assert hits >= 4, f"only {hits}/5 painted lines found"

    def test_robust_to_texture(self):
        img, segs = paint_scene(texture=True)
        f = lsd.detect_lines(jnp.asarray(img), CFG, (480, 640))
        ep = np.asarray(f.endpoints)[np.asarray(f.valid)]
        hits = 0
        for (x0, y0), (x1, y1) in segs:
            gt = np.array([[x0, y0], [x1, y1]], float)
            if min(seg_dist(e, gt) for e in ep) < 80:
                hits += 1
        assert hits >= 4, f"only {hits}/5 painted lines found with texture"

    def test_output_invariants(self):
        img, _ = paint_scene(texture=False)
        f = lsd.detect_lines(jnp.asarray(img), CFG, (480, 640))
        v = np.asarray(f.valid)
        ln = np.asarray(f.length)
        ep = np.asarray(f.endpoints)
        co = np.asarray(f.coeff)
        assert (ln[v] >= CFG.min_length_px).all()
        # coeff is the normalized line through the endpoints
        for i in np.nonzero(v)[0][:10]:
            for k in (0, 1):
                d = co[i, 0] * ep[i, k, 0] + co[i, 1] * ep[i, k, 1] + co[i, 2]
                assert abs(d) < 1.0
        # response = length / max dim
        np.testing.assert_allclose(
            np.asarray(f.response)[v], ln[v] / 640.0, rtol=1e-5
        )

    def test_empty_image(self):
        img = np.full((480, 640), 100, np.float32)
        f = lsd.detect_lines(jnp.asarray(img), CFG, (480, 640))
        assert int(np.asarray(f.valid).sum()) == 0


class TestLbd:
    def _detect_with_desc(self, img):
        f = lsd.detect_lines(jnp.asarray(img), CFG, (480, 640))
        desc = lbd.extract_lbd(jnp.asarray(img), f.endpoints, f.valid, CFG)
        return f, np.asarray(desc)

    def _match_lines(self, fa, fb):
        """Associate lines of two frames by endpoint proximity (geometric
        GT). Tight threshold: only true same-edge pairs qualify (a loose
        one pairs e.g. the two opposite edges of a painted stripe, which
        legitimately have different descriptors)."""
        epa = np.asarray(fa.endpoints)
        epb = np.asarray(fb.endpoints)
        va, vb = np.asarray(fa.valid), np.asarray(fb.valid)
        pairs = []
        for i in np.nonzero(va)[0]:
            best, bj = 1e9, -1
            for j in np.nonzero(vb)[0]:
                d = seg_dist(epa[i], epb[j])
                if d < best:
                    best, bj = d, j
            if best < 16:
                pairs.append((i, bj))
        return pairs

    def test_descriptor_stability_under_motion(self):
        """Warp the whole image (the realistic inter-frame transformation:
        line AND its surroundings move together) — corresponding lines must
        have descriptor distances well below unrelated pairs."""
        img1, _ = paint_scene(texture=True)
        M = np.float32(
            [[np.cos(0.03), -np.sin(0.03), 6], [np.sin(0.03), np.cos(0.03), 4]]
        )
        img2 = cv2.warpAffine(
            img1, M, (640, 480), borderMode=cv2.BORDER_REFLECT_101
        ).astype(np.float32)
        f1, d1 = self._detect_with_desc(img1)
        f2, d2 = self._detect_with_desc(img2)
        # pair via the known warp
        epa = np.asarray(f1.endpoints).copy()
        w = epa.copy()
        w[..., 0] = epa[..., 0] * M[0, 0] + epa[..., 1] * M[0, 1] + M[0, 2]
        w[..., 1] = epa[..., 0] * M[1, 0] + epa[..., 1] * M[1, 1] + M[1, 2]
        epb = np.asarray(f2.endpoints)
        va, vb = np.asarray(f1.valid), np.asarray(f2.valid)
        pairs = []
        for i in np.nonzero(va)[0]:
            cands = [(seg_dist(w[i], epb[j]), j) for j in np.nonzero(vb)[0]]
            d, bj = min(cands)
            if d < 16:
                pairs.append((i, bj))
        assert len(pairs) >= 5
        dist = self._dist(d1, d2)
        same = [dist[i, j] for i, j in pairs]
        assert np.median(same) < 0.45, f"median same-line dist {np.median(same)}"
        rng = np.random.default_rng(0)
        vai = np.nonzero(va)[0]
        d11 = self._dist(d1, d1)
        cross = []
        for _ in range(80):
            i, j = rng.choice(vai, 2, replace=False)
            cross.append(d11[i, j])
        assert np.median(cross) > np.median(same) + 0.3

    @staticmethod
    def _dist(da, db):
        """Flip-invariant normalized squared-L2 (the production metric)."""
        import jax

        return np.asarray(jax.device_get(
            lbd.lbd_distance_matrix(jnp.asarray(da), jnp.asarray(db))
        )) / (127.0 * 127.0)

    def test_brightness_invariance(self):
        img1, _ = paint_scene(texture=True)
        img2 = np.clip(img1 * 1.3 - 20, 0, 255).astype(np.float32)
        f1, d1 = self._detect_with_desc(img1)
        f2, d2 = self._detect_with_desc(img2)
        pairs = self._match_lines(f1, f2)
        assert len(pairs) >= 3
        dist = self._dist(d1, d2)
        dists = [dist[i, j] for i, j in pairs]
        assert np.median(dists) < 0.3, f"median {np.median(dists)}"

    def test_flip_invariance(self):
        """Swapping a segment's endpoints permutes the descriptor; the
        flip-min distance must treat the two as identical."""
        img, _ = paint_scene(texture=True)
        f, d = self._detect_with_desc(img)
        ep = np.asarray(f.endpoints)
        flipped = lbd.extract_lbd(
            jnp.asarray(img), jnp.asarray(ep[:, ::-1]),
            jnp.asarray(f.valid), CFG)
        dist = self._dist(d, np.asarray(flipped))
        v = np.nonzero(np.asarray(f.valid))[0]
        self_d = np.array([dist[i, i] for i in v])
        assert np.median(self_d) < 0.1, f"flip self-dist {np.median(self_d)}"
