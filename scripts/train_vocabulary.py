"""Train the built-in ORB vocabulary from synthetic scene renders.

The reference requires an externally supplied ORBvoc.txt (not shipped in
its snapshot); this engine ships a self-trained vocabulary so retrieval
works out of the box, and can load DBoW2 text vocabularies when available.

Run: JAX_PLATFORMS=cpu python scripts/train_vocabulary.py
Writes: plslam_tpu/bow/vocab_synth.npz
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from plslam_tpu.bow import vocabulary
from plslam_tpu.config import OrbConfig
from plslam_tpu.geometry.projection import Camera
from plslam_tpu.ops import orb
from plslam_tpu.utils.synthetic import RoomScene, smooth_trajectory


def main():
    cam = Camera(fx=525.0, fy=525.0, cx=319.5, cy=239.5)
    cfg = OrbConfig()
    descs = []
    for seed in range(10):
        scene = RoomScene(seed)
        for R, t in smooth_trajectory(8, amplitude=0.8):
            g, _ = scene.render(cam, R, t)
            f = orb.extract_orb(jnp.asarray(g), cfg, (480, 640))
            v = np.asarray(f.valid)
            descs.append(np.asarray(f.desc)[v])
    corpus = np.concatenate(descs)
    print(f"corpus: {corpus.shape[0]} descriptors")
    voc = vocabulary.train_vocabulary(corpus, k=10, levels=4)
    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "plslam_tpu", "bow",
        "vocab_synth.npz",
    )
    voc.save(out)
    print(f"wrote {out} ({voc.n_words} words)")


if __name__ == "__main__":
    main()
