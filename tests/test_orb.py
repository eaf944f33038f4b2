import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from plslam_tpu.config import OrbConfig
from plslam_tpu.ops import fast, image, orb


def make_test_image(seed=0, h=240, w=320):
    """Synthetic textured image: smoothed noise + high-contrast shapes."""
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 255, (h // 4, w // 4)).astype(np.float32)
    img = cv2.resize(img, (w, h), interpolation=cv2.INTER_CUBIC)
    cv2.rectangle(img, (40, 40), (120, 100), 255, -1)
    cv2.rectangle(img, (60, 60), (100, 80), 0, -1)
    cv2.circle(img, (220, 150), 40, 200, -1)
    cv2.line(img, (10, 200), (300, 220), 30, 3)
    return np.clip(img, 0, 255).astype(np.uint8)


class TestFast:
    def test_matches_opencv_detection(self):
        img = make_test_image()
        th = 20
        cv_kps = cv2.FastFeatureDetector_create(
            threshold=th, nonmaxSuppression=True
        ).detect(img)
        cv_set = {(int(k.pt[1]), int(k.pt[0])) for k in cv_kps}
        # exclude border region where our implementation masks out
        cv_set = {
            (y, x) for (y, x) in cv_set if 3 <= y < img.shape[0] - 3 and 3 <= x < img.shape[1] - 3
        }

        score = fast.fast_score_map(jnp.asarray(img, jnp.float32), float(th))
        score = fast.nms3x3(score)
        ours = np.argwhere(np.asarray(score) > 0)
        our_set = {(int(y), int(x)) for y, x in ours}

        # every OpenCV corner should be ours or a 1px neighbor (NMS ties)
        def near(s, p):
            y, x = p
            return any((y + dy, x + dx) in s for dy in (-1, 0, 1) for dx in (-1, 0, 1))

        recall = sum(near(our_set, p) for p in cv_set) / max(len(cv_set), 1)
        precision = sum(near(cv_set, p) for p in our_set) / max(len(our_set), 1)
        assert len(cv_set) > 30
        assert recall > 0.9, f"recall {recall:.2f} ({len(cv_set)} cv corners)"
        assert precision > 0.8, f"precision {precision:.2f}"

    def test_score_threshold_semantics(self):
        """score > t must coincide with cv2.FAST detection at threshold t."""
        img = make_test_image(seed=1)
        score = np.asarray(fast.fast_score_map(jnp.asarray(img, jnp.float32), 7.0))
        for th in (10, 25, 40):
            cv_kps = cv2.FastFeatureDetector_create(
                threshold=th, nonmaxSuppression=False
            ).detect(img)
            cv_mask = np.zeros(img.shape, bool)
            for k in cv_kps:
                cv_mask[int(k.pt[1]), int(k.pt[0])] = True
            inner = np.zeros(img.shape, bool)
            inner[4:-4, 4:-4] = True
            ours = (score > th) & inner
            both = cv_mask & inner
            agree = (ours == both)[inner].mean()
            assert agree > 0.999, f"th={th} agreement {agree}"

    def test_cellwise_budget(self):
        img = make_test_image(seed=2)
        score = fast.nms3x3(fast.fast_score_map(jnp.asarray(img, jnp.float32), 7.0))
        ys, xs, resp = fast.detect_cellwise(score, 20.0, 32, 8, 19)
        ys2, xs2, resp2, valid = fast.top_n_keypoints(ys, xs, resp, 200)
        assert int(valid.sum()) > 50
        # all selected keypoints respect the border
        v = np.asarray(valid)
        assert np.all(np.asarray(ys2)[v] >= 19)
        assert np.all(np.asarray(xs2)[v] < img.shape[1] - 19)


class TestOrbDescriptors:
    def _cv_orb_octave0(self, img):
        det = cv2.ORB_create(nfeatures=300, nlevels=1, edgeThreshold=31, fastThreshold=20)
        kps = det.detect(img)
        kps, desc = det.compute(img, kps)
        return kps, desc

    def test_ic_angle_matches_opencv(self):
        img = make_test_image(seed=3)
        kps, _ = self._cv_orb_octave0(img)
        assert len(kps) > 20
        ys = jnp.asarray([int(round(k.pt[1])) for k in kps])
        xs = jnp.asarray([int(round(k.pt[0])) for k in kps])
        ours = np.asarray(orb.ic_angles(jnp.asarray(img, jnp.float32), ys, xs))
        cv_angles = np.array([k.angle for k in kps])
        diff = np.abs(((ours - cv_angles) + 180) % 360 - 180)
        # integer-position moments match cv2 almost exactly
        assert np.median(diff) < 1.0, f"median angle diff {np.median(diff)}"

    def test_descriptors_match_opencv(self):
        img = make_test_image(seed=4)
        kps, cv_desc = self._cv_orb_octave0(img)
        assert len(kps) > 20
        ys = jnp.asarray([int(round(k.pt[1])) for k in kps])
        xs = jnp.asarray([int(round(k.pt[0])) for k in kps])
        angles = jnp.asarray([k.angle for k in kps], jnp.float32)
        blurred = image.gaussian_blur(jnp.asarray(img, jnp.float32))
        ours = np.asarray(orb.brief_descriptors(blurred, ys, xs, angles))
        # Hamming distance between our bytes and cv2 bytes
        x = np.unpackbits(ours ^ cv_desc, axis=1)
        hamming = x.sum(axis=1)
        assert np.median(hamming) <= 8, f"median hamming {np.median(hamming)}"
        assert np.mean(hamming) <= 16, f"mean hamming {np.mean(hamming)}"

    def test_full_extraction(self):
        img = make_test_image(seed=5, h=480, w=640)
        cfg = OrbConfig()
        feats = orb.extract_orb(jnp.asarray(img, jnp.float32), cfg, (480, 640))
        n_valid = int(np.asarray(feats.valid).sum())
        assert feats.xy.shape == (cfg.max_keypoints, 2)
        assert feats.desc.shape == (cfg.max_keypoints, 32)
        assert n_valid > 300, f"only {n_valid} keypoints"
        v = np.asarray(feats.valid)
        xy = np.asarray(feats.xy)[v]
        assert xy[:, 0].max() < 640 and xy[:, 1].max() < 480
        assert (np.asarray(feats.octave)[v] >= 0).all()
        # multiple octaves represented
        assert len(np.unique(np.asarray(feats.octave)[v])) >= 4


class TestImageOps:
    def test_gaussian_blur_matches_opencv(self):
        img = make_test_image(seed=6).astype(np.float32)
        ours = np.asarray(image.gaussian_blur(jnp.asarray(img)))
        cv_out = cv2.GaussianBlur(img, (7, 7), 2, borderType=cv2.BORDER_REFLECT_101)
        np.testing.assert_allclose(ours, cv_out, atol=0.05)

    def test_pyramid_shapes(self):
        shapes = image.pyramid_shapes(480, 640, 8, 1.2)
        assert shapes[0] == (480, 640)
        assert shapes[1] == (400, 533)
        assert len(shapes) == 8
