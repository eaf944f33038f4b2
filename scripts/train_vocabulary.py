"""Train the built-in ORB vocabulary from synthetic scene renders.

The reference requires an externally supplied 1M-word ORBvoc.txt (not
shipped in its snapshot; System.cc:64-65); this engine ships self-trained
vocabularies so retrieval works out of the box, and loads DBoW2 text
vocabularies when available.

Run:
  python scripts/train_vocabulary.py                    # 10^4 words (k=10, L=4)
  python scripts/train_vocabulary.py --levels 5 \\
      --scenes 40 --frames 16 --out vocab_100k.npz      # 10^5 words

Descriptor extraction runs on whatever backend JAX provides (TPU when
reachable — extraction is the slow part); the hierarchical k-majority
training is host numpy.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--levels", type=int, default=4)
    ap.add_argument("--scenes", type=int, default=10)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--out", default="vocab_synth.npz")
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU (default: use the fastest backend)")
    ap.add_argument("--augment", type=int, default=0,
                    help="grow the corpus to this many descriptors by "
                         "bit-flip jitter of extracted ones (~8/256 bits, "
                         "the cross-view descriptor noise level) — ORBvoc-"
                         "scale (10^6-word) training needs a corpus larger "
                         "than this environment can render in-budget")
    ap.add_argument("--corpus-cache", default=None,
                    help="npy path: save/reuse the extracted corpus")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from plslam_tpu.bow import vocabulary
    from plslam_tpu.config import OrbConfig
    from plslam_tpu.geometry.projection import Camera
    from plslam_tpu.ops import orb
    from plslam_tpu.utils.synthetic import RoomScene, smooth_trajectory

    cam = Camera(fx=525.0, fy=525.0, cx=319.5, cy=239.5)
    cfg = OrbConfig()
    if args.corpus_cache and os.path.exists(args.corpus_cache):
        corpus = np.load(args.corpus_cache)
        print(f"corpus (cached): {corpus.shape[0]}", flush=True)
    else:
        descs = []
        for seed in range(args.scenes):
            scene = RoomScene(seed)
            amp = 0.5 + 0.5 * (seed % 4) / 3
            for R, t in smooth_trajectory(args.frames, amplitude=amp):
                g, _ = scene.render(cam, R, t)
                f = orb.extract_orb(jnp.asarray(g), cfg, (480, 640))
                v = np.asarray(f.valid)
                descs.append(np.asarray(f.desc)[v])
            if (seed + 1) % 10 == 0:
                print(f"scene {seed + 1}/{args.scenes}", flush=True)
        corpus = np.concatenate(descs)
        if args.corpus_cache:
            np.save(args.corpus_cache, corpus)
    if args.augment > corpus.shape[0]:
        rng = np.random.default_rng(7)
        extra = args.augment - corpus.shape[0]
        base = corpus[rng.integers(0, corpus.shape[0], extra)]
        bits = np.unpackbits(base, axis=1)
        flips = rng.random(bits.shape) < (8.0 / 256.0)
        corpus = np.concatenate([corpus, np.packbits(bits ^ flips, axis=1)])
    print(f"corpus: {corpus.shape[0]} descriptors", flush=True)
    voc = vocabulary.train_vocabulary(corpus, k=args.k, levels=args.levels)
    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "plslam_tpu", "bow",
        args.out,
    )
    voc.save(out)
    print(f"wrote {out} ({voc.n_words} words)")


if __name__ == "__main__":
    main()
