"""Loop-candidate precision/recall of a vocabulary at place-recognition.

Protocol: two laps of the room orbit; lap-1 frames (every Nth) register in
a KeyFrameDatabase, lap-2 frames query it. Ground truth: a database entry
is a true match when its orbit viewing angle is within --gt-deg of the
query's. Reports top-1 precision and recall@k of the L1 ranking plus the
shared-word gate's survival rate — the numbers that decide whether a
vocabulary discriminates at loop-closing scale.

Usage: python scripts/eval_bow_recall.py [--vocab plslam_tpu/bow/vocab_synth.npz]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


class _NoCovisMap:
    def covisible_keyframes(self, kf, k=10):
        return []


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vocab", default=None)
    ap.add_argument("--n", type=int, default=120, help="frames per lap")
    ap.add_argument("--db-stride", type=int, default=4)
    ap.add_argument("--gt-deg", type=float, default=18.0)
    ap.add_argument("--seed", type=int, default=5)
    ap.add_argument("--distractors", type=int, default=3,
                    help="distractor scenes registered as confusers")
    ap.add_argument("--perturb", action="store_true",
                    help="photometric perturbation of queries (gamma + "
                         "brightness + sensor noise) — the hard protocol "
                         "that separates vocabulary scales")
    ap.add_argument("--gamma", type=float, default=0.7)
    ap.add_argument("--noise", type=float, default=6.0)
    ap.add_argument("--brightness", type=float, default=20.0)
    ap.add_argument("--radius-jitter", type=float, default=0.0,
                    help="query orbit radius offset (viewpoint change)")
    args = ap.parse_args()

    import jax.numpy as jnp

    from plslam_tpu.bow.database import KeyFrameDatabase
    from plslam_tpu.bow.vocabulary import Vocabulary
    from plslam_tpu.config import OrbConfig
    from plslam_tpu.geometry.projection import Camera
    from plslam_tpu.ops import orb
    from plslam_tpu.utils.synthetic import RoomScene
    from plslam_tpu.geometry import se3

    vocab_path = args.vocab or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plslam_tpu", "bow", "vocab_synth.npz")
    voc = Vocabulary.load(vocab_path)
    print(f"vocabulary: {vocab_path} ({voc.n_words} words)")

    cam = Camera(fx=525.0, fy=525.0, cx=319.5, cy=239.5)
    ocfg = OrbConfig()
    scene = RoomScene(args.seed)
    n = args.n

    def orbit_pose(i, radius=0.45, jitter=0.0):
        a = 2 * np.pi * i / n
        c = np.array([radius * np.sin(a), jitter,
                      1.25 + radius * np.cos(a)], np.float32)
        Rwc = np.asarray(se3.so3_exp(jnp.asarray([0.0, a, 0.0], jnp.float32)))
        R = Rwc.T.astype(np.float32)
        return a, R, (-R @ c).astype(np.float32)

    prng = np.random.default_rng(args.seed + 1)

    def perturb(g):
        # gamma + brightness + sensor noise: the photometric gap between a
        # mapping session and a revisit (what kills weak vocabularies on
        # real data)
        g = 255.0 * (np.clip(g, 0, 255) / 255.0) ** args.gamma
        g = g + args.brightness + prng.normal(0.0, args.noise, g.shape)
        return np.clip(g, 0, 255).astype(np.float32)

    def bow_of(i, jitter, radius=0.45, hard=False):
        a, R, t = orbit_pose(i, radius=radius, jitter=jitter)
        g, _ = scene.render(cam, R, t)
        if hard and args.perturb:
            g = perturb(g)
        f = orb.extract_orb(jnp.asarray(g), ocfg, (480, 640))
        _, bow = voc.transform(f.desc, f.valid)
        return a, np.asarray(bow)

    n_entries = (n // args.db_stride + 1) + args.distractors * (
        n // (args.db_stride * 2) + 1)
    db = KeyFrameDatabase(voc, max_kf=max(512, 2 * n_entries))
    db_angles = {}
    k = 0
    for i in range(0, n, args.db_stride):
        a, bow = bow_of(i, jitter=0.0)
        db.add(k, bow)
        db_angles[k] = a
        k += 1
    # distractors: other scenes' views — the confusers a discriminative
    # vocabulary must rank below the true revisit
    for ds in range(args.distractors):
        dscene = RoomScene(100 + ds)
        for i in range(0, n, args.db_stride * 2):
            a, R, t = orbit_pose(i)
            g, _ = dscene.render(cam, R, t)
            f = orb.extract_orb(jnp.asarray(g), ocfg, (480, 640))
            _, bow = voc.transform(f.desc, f.valid)
            db.add(k, np.asarray(bow))  # not in db_angles: never correct
            k += 1

    gt_rad = np.deg2rad(args.gt_deg)

    def ang_diff(x, y):
        d = abs(x - y) % (2 * np.pi)
        return min(d, 2 * np.pi - d)

    def is_true(j, a):
        ang = db_angles.get(int(j))
        return ang is not None and ang_diff(ang, a) <= gt_rad

    top1_ok = 0
    recall5 = 0
    gate_ok = 0
    n_q = 0
    # lap 2: offset phase + small lateral jitter = a genuine revisit
    for i in range(0, n, 3):
        a, bow = bow_of(i + 1, jitter=0.03,
                        radius=0.45 + args.radius_jitter, hard=True)
        scores = db.score_all(bow)
        shared = db.shared_words(bow)
        order = np.argsort(scores)[::-1]
        n_q += 1
        if is_true(order[0], a):
            top1_ok += 1
        if any(is_true(j, a) for j in order[:5]):
            recall5 += 1
        # the 0.8*max shared-word gate must keep at least one true match
        min_common = 0.8 * shared.max()
        survivors = np.nonzero(shared > min_common)[0]
        if any(is_true(k2, a) for k2 in survivors):
            gate_ok += 1

    print(f"queries: {n_q}  (db entries: {k}, "
          f"{k - len(db_angles)} distractors)")
    print(f"top1_precision {top1_ok / n_q:.3f}")
    print(f"recall@5       {recall5 / n_q:.3f}")
    print(f"gate_survival  {gate_ok / n_q:.3f}")


if __name__ == "__main__":
    main()
