"""Extract the standard rBRIEF bit_pattern_31 constant table to a .npy file.

The 256-pair / 512-point sampling pattern originates from the ORB paper
(Rublee et al., ICCV 2011) and ships identically in OpenCV and every
ORB-SLAM variant. We parse the numeric table out of the reference's
``src/ORBextractor.cc`` (data, not code) so our descriptors are bit-compatible
with OpenCV's — which is what lets tests cross-validate against cv2 and lets
users reuse existing ORB vocabularies.

Run once: python scripts/extract_orb_pattern.py
Writes: plslam_tpu/ops/orb_pattern.npy  (int8 array of shape (512, 2))
"""

import re
import sys
from pathlib import Path

import numpy as np

SRC = Path("/root/reference/src/ORBextractor.cc")
OUT = Path(__file__).resolve().parent.parent / "plslam_tpu" / "ops" / "orb_pattern.npy"


def main():
    text = SRC.read_text()
    start = text.index("bit_pattern_31_")
    # table ends at the closing brace of the initializer
    end = text.index("};", start)
    body = text[text.index("=", start):end]
    body = re.sub(r"/\*.*?\*/", "", body, flags=re.S)  # strip comments
    nums = [int(x) for x in re.findall(r"-?\d+", body)]
    assert len(nums) == 256 * 4, f"parsed {len(nums)} ints"
    arr = np.array(nums, dtype=np.int8).reshape(512, 2)
    # sanity: pattern coordinates live within the 31x31 patch
    assert arr.min() >= -15 and arr.max() <= 15, (arr.min(), arr.max())
    np.save(OUT, arr)
    print(f"wrote {OUT} shape={arr.shape} range=[{arr.min()},{arr.max()}]")


if __name__ == "__main__":
    sys.exit(main())
