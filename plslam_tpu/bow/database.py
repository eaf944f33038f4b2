"""Keyframe database: BoW retrieval for loop closing and relocalization.

Replaces the reference's inverted-file ``KeyFrameDatabase``
(/root/reference/src/KeyFrameDatabase.cc). The reference walks word →
keyframe lists with shared-word counting (:113-271); here every keyframe's
tf-idf vector lives in one dense (K, W) matrix and a query is scored
against ALL keyframes in a single batched min-sum (bow.vocabulary.l1_scores)
— the "batched popcount scoring" design. The candidate-selection protocol
is reproduced exactly:

- DetectLoopCandidates: exclude covisible KFs, require shared words >=
  0.8 * max shared, accumulate scores over covisibility groups, accept
  groups >= 0.75 * best accumulated score (:113-271).
- DetectRelocalizationCandidates: same without the covisible exclusion
  (:274-413).
"""

from __future__ import annotations

import numpy as np

from .vocabulary import Vocabulary, l1_scores


class KeyFrameDatabase:
    def __init__(self, voc: Vocabulary, max_kf: int = 1024):
        self.voc = voc
        self.bows = np.zeros((max_kf, voc.n_words), np.float32)
        self.has = np.zeros(max_kf, bool)

    def add(self, kf: int, bow: np.ndarray):
        self.bows[kf] = bow
        self.has[kf] = True

    def erase(self, kf: int):
        self.has[kf] = False

    def score_all(self, bow: np.ndarray) -> np.ndarray:
        import jax.numpy as jnp

        s = np.array(l1_scores(jnp.asarray(bow), jnp.asarray(self.bows)))
        s[~self.has] = 0.0
        return s

    def shared_words(self, bow: np.ndarray) -> np.ndarray:
        q = bow > 0
        return ((self.bows > 0) & q[None, :]).sum(1) * self.has

    def detect_loop_candidates(self, kf: int, bow: np.ndarray,
                               min_score: float, covisible: set[int],
                               slam_map) -> list[int]:
        """KeyFrameDatabase::DetectLoopCandidates semantics."""
        shared = self.shared_words(bow)
        shared[kf] = 0
        for c in covisible:
            shared[c] = 0
        if shared.max() == 0:
            return []
        min_common = 0.8 * shared.max()
        scores = self.score_all(bow)
        cand = np.nonzero((shared > min_common) & (scores >= min_score))[0]
        if len(cand) == 0:
            return []
        # accumulate score over covisibility groups (best 10 neighbors)
        acc = []
        for c in cand:
            group = [c] + slam_map.covisible_keyframes(int(c), 10)
            g_scores = [
                scores[g] for g in group
                if shared[g] > min_common and scores[g] >= min_score
            ] or [scores[c]]
            best_in_group = group[int(np.argmax([scores[g] for g in group]))]
            acc.append((float(sum(g_scores)), int(best_in_group)))
        best_acc = max(a for a, _ in acc)
        th = 0.75 * best_acc
        out = []
        seen = set()
        for a, b in acc:
            if a > th and b not in seen:
                out.append(b)
                seen.add(b)
        return out

    def detect_reloc_candidates(self, bow: np.ndarray, slam_map) -> list[int]:
        """KeyFrameDatabase::DetectRelocalizationCandidates semantics."""
        shared = self.shared_words(bow)
        if shared.max() == 0:
            return []
        min_common = 0.8 * shared.max()
        scores = self.score_all(bow)
        cand = np.nonzero(shared > min_common)[0]
        if len(cand) == 0:
            return []
        acc = []
        for c in cand:
            group = [c] + slam_map.covisible_keyframes(int(c), 10)
            g_scores = [scores[g] for g in group if shared[g] > min_common] or [
                scores[c]
            ]
            best_in_group = group[int(np.argmax([scores[g] for g in group]))]
            acc.append((float(sum(g_scores)), int(best_in_group)))
        best_acc = max(a for a, _ in acc)
        th = 0.75 * best_acc
        out = []
        seen = set()
        for a, b in acc:
            if a > th and b not in seen:
                out.append(b)
                seen.add(b)
        return out
