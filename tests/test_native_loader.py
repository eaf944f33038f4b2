import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from plslam_tpu.native import TumLoader, native_available


@pytest.fixture(scope="module")
def tum_dir(tmp_path_factory):
    """Synthesize a tiny TUM-format dataset on disk (PNG rgb + 16-bit depth)."""
    root = tmp_path_factory.mktemp("tum")
    (root / "rgb").mkdir()
    (root / "depth").mkdir()
    rng = np.random.default_rng(0)
    lines = []
    for i in range(5):
        ts = 1000.0 + i * 0.033
        rgb = rng.integers(0, 255, (120, 160, 3), np.uint8)
        depth = (rng.uniform(0.5, 4.0, (120, 160)) * 5000).astype(np.uint16)
        cv2.imwrite(str(root / "rgb" / f"{ts:.6f}.png"), rgb)
        cv2.imwrite(str(root / "depth" / f"{ts:.6f}.png"), depth)
        lines.append(
            f"{ts:.6f} rgb/{ts:.6f}.png {ts:.6f} depth/{ts:.6f}.png\n"
        )
    with open(root / "assoc.txt", "w") as f:
        f.writelines(lines)
    return root


class TestNativeLoader:
    def test_builds(self):
        assert native_available(), "native loader failed to build"

    def test_reads_frames_match_cv2(self, tum_dir):
        loader = TumLoader(str(tum_dir / "assoc.txt"), width=160, height=120)
        assert len(loader) == 5
        frames = list(loader)
        assert len(frames) == 5
        # compare first frame with cv2's decode
        gray, depth, ts = frames[0]
        rgb_path = str(tum_dir / "rgb" / f"{ts:.6f}.png")
        d_path = str(tum_dir / "depth" / f"{ts:.6f}.png")
        bgr = cv2.imread(rgb_path, cv2.IMREAD_UNCHANGED)
        # our loader reads PNG channels in file order (RGB); cv2 gives BGR
        ref_gray = cv2.cvtColor(bgr[:, :, ::-1], cv2.COLOR_RGB2GRAY)
        ref_depth = cv2.imread(d_path, cv2.IMREAD_UNCHANGED).astype(np.float32) / 5000.0
        assert gray.shape == (120, 160)
        np.testing.assert_allclose(gray, ref_gray, atol=1.0)
        np.testing.assert_allclose(depth, ref_depth, atol=1e-5)
        # timestamps ascend
        ts_all = [f[2] for f in frames]
        assert ts_all == sorted(ts_all)
