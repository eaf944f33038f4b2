import os

import jax.numpy as jnp
import numpy as np

from plslam_tpu.bow import vocabulary
from plslam_tpu.bow.database import KeyFrameDatabase
from plslam_tpu.config import OrbConfig
from plslam_tpu.geometry.projection import Camera
from plslam_tpu.ops import orb
from plslam_tpu.utils.synthetic import RoomScene, smooth_trajectory

VOC_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plslam_tpu", "bow", "vocab_synth.npz",
)
CAM = Camera(fx=525.0, fy=525.0, cx=319.5, cy=239.5)


def frame_bow(voc, scene, pose):
    g, _ = scene.render(CAM, *pose)
    f = orb.extract_orb(jnp.asarray(g), OrbConfig(), (480, 640))
    words, bow = voc.transform(f.desc, f.valid)
    return np.asarray(bow)


class TestVocabulary:
    def test_transform_deterministic(self):
        voc = vocabulary.Vocabulary.load(VOC_PATH)
        rng = np.random.default_rng(0)
        desc = jnp.asarray(rng.integers(0, 256, (64, 32)), jnp.uint8)
        valid = jnp.ones(64, bool)
        w1, b1 = voc.transform(desc, valid)
        w2, b2 = voc.transform(desc, valid)
        np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))
        assert abs(float(jnp.sum(jnp.abs(b1))) - 1.0) < 1e-4  # L1 normalized

    def test_similar_views_score_higher(self):
        voc = vocabulary.Vocabulary.load(VOC_PATH)
        scene_a = RoomScene(10)   # unseen seeds (vocab trained on 0..5)
        scene_b = RoomScene(11)
        poses = smooth_trajectory(20, amplitude=0.4)
        b0 = frame_bow(voc, scene_a, poses[0])
        b1 = frame_bow(voc, scene_a, poses[1])     # same place, next frame
        b_far = frame_bow(voc, scene_a, poses[10])  # same room, other view
        b_other = frame_bow(voc, scene_b, poses[0])  # different room
        refs = jnp.asarray(np.stack([b1, b_far, b_other]))
        s = np.asarray(vocabulary.l1_scores(jnp.asarray(b0), refs))
        assert s[0] > s[2], f"same-place {s[0]} !> other-room {s[2]}"
        assert s[0] > 0.3, f"same-place score too low: {s[0]}"

    def test_word_distribution(self):
        voc = vocabulary.Vocabulary.load(VOC_PATH)
        scene = RoomScene(12)
        g, _ = scene.render(CAM, *smooth_trajectory(4)[0])
        f = orb.extract_orb(jnp.asarray(g), OrbConfig(), (480, 640))
        words, _ = voc.transform(f.desc, f.valid)
        v = np.asarray(f.valid)
        used = np.unique(np.asarray(words)[v])
        # a frame should touch a healthy number of distinct words
        assert len(used) > 100, f"only {len(used)} distinct words"


class TestDatabase:
    def test_reloc_candidates_find_right_place(self):
        voc = vocabulary.Vocabulary.load(VOC_PATH)
        db = KeyFrameDatabase(voc, max_kf=32)
        scene = RoomScene(13)
        poses = smooth_trajectory(24, amplitude=0.5)

        class FakeMap:
            def covisible_keyframes(self, kf, k):
                return [kf - 1] if kf > 0 else []

        fm = FakeMap()
        bows = []
        for i in range(0, 24, 3):
            b = frame_bow(voc, scene, poses[i])
            db.add(i // 3, b)
            bows.append(b)
        # query with a view very close to pose 9 (stored as kf 3)
        q = frame_bow(voc, scene, poses[10])
        cands = db.detect_reloc_candidates(q, fm)
        assert len(cands) >= 1
        assert any(abs(c - 3) <= 1 for c in cands), f"candidates {cands}"


def test_100k_vocabulary_and_sparse_kfdb():
    """The shipped 100k-word vocabulary loads and drives the sparse
    inverted-file KFDB (round-2 gap: the dense (K, W) matrix was O(K*W)
    and unusable past ~10^4 words)."""
    import os

    from plslam_tpu.bow.database import KeyFrameDatabase
    from plslam_tpu.bow.vocabulary import Vocabulary

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plslam_tpu", "bow", "vocab_100k.npz")
    voc = Vocabulary.load(path)
    assert voc.n_words == 100000
    rng = np.random.default_rng(0)
    db = KeyFrameDatabase(voc, max_kf=16)
    bows = []
    for k in range(4):
        desc = jnp.asarray(rng.integers(0, 256, (256, 32)), jnp.uint8)
        _, bow = voc.transform(desc, jnp.ones(256, bool))
        bow = np.asarray(bow)
        db.add(k, bow)
        bows.append(bow)
    # self-score is the best score (L1 of identical normalized vectors = 2)
    s = db.score_all(bows[1])
    assert np.argmax(s) == 1
    assert abs(s[1] - 2.0) < 1e-3
    # erase drops the keyframe from every posting list
    db.erase(1)
    s = db.score_all(bows[1])
    assert s[1] == 0.0


def test_dbow2_text_round_trip(tmp_path):
    """Write-then-load in the exact ORBvoc.txt format (System.cc:64-72's
    entry path; TemplatedVocabulary.h:1206-1296): the reloaded vocabulary
    must transform identically to the in-memory original — node tree,
    weights and all (round-3 gap: load_dbow2_text had zero coverage)."""
    voc = vocabulary.Vocabulary.load(VOC_PATH)
    path = str(tmp_path / "voc.txt")
    vocabulary.save_dbow2_text(voc, path)
    # spot-check the serialized format the reference's parser expects:
    # header "k L s1 s2", then "parent is_leaf d0..d31 weight" per node
    with open(path) as f:
        header = f.readline().split()
        assert header[0] == str(voc.k) and header[1] == str(voc.levels)
        first = f.readline().split()
        assert len(first) == 35
        assert first[0] == "0"  # level-0 nodes parent to the root
    voc2 = vocabulary.load_dbow2_text(path)
    assert voc2.k == voc.k and voc2.levels == voc.levels
    assert voc2.n_words == voc.n_words
    for l in range(voc.levels):
        np.testing.assert_array_equal(
            np.asarray(voc2.node_desc[l]), np.asarray(voc.node_desc[l]))
    np.testing.assert_allclose(
        np.asarray(voc2.idf), np.asarray(voc.idf), rtol=1e-5)
    rng = np.random.default_rng(7)
    desc = jnp.asarray(rng.integers(0, 256, (128, 32)), jnp.uint8)
    valid = jnp.ones(128, bool)
    w1, b1 = voc.transform(desc, valid)
    w2, b2 = voc2.transform(desc, valid)
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), atol=1e-6)
