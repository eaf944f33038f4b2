"""Point-feature association primitives.

Implements the semantics of the reference's ``ORBmatcher`` search family
(/root/reference/src/ORBmatcher.cc — SearchByProjection x4 :72,:423,:1710,
:1891, SearchByBoW :247,:729, SearchForTriangulation :884, Fuse :1107) the
TPU way: every search is (1) a dense (Nq, Nt) Hamming matrix from the MXU,
(2) a boolean gate matrix built from projections / windows / octave ranges,
(3) a masked argmin + ratio test, (4) an optional rotation-consistency
histogram, (5) an optional one-target-one-query dedupe. The reference's
CPU accelerations (64x48 grid buckets, DBoW2 FeatureVector node alignment)
are deliberately NOT reproduced — at 1024x1024 scale the dense matrix is
faster than any indirection on TPU and strictly higher recall.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import hamming

INVALID = jnp.int32(-1)
BIG = jnp.int32(1 << 20)


class MatchResult(NamedTuple):
    idx: jax.Array   # (Nq,) int32 target index or -1
    dist: jax.Array  # (Nq,) int32 best distance (BIG where invalid)
    ok: jax.Array    # (Nq,) bool

    @property
    def count(self):
        return jnp.sum(self.ok.astype(jnp.int32))


def window_gate(
    uv_proj: jax.Array,       # (Nq, 2) projected query positions
    uv_tgt: jax.Array,        # (Nt, 2) target keypoint positions
    radius: jax.Array,        # (Nq,) per-query search radius (px)
) -> jax.Array:
    """|du| < r AND |dv| < r box gate (reference GetFeaturesInArea semantics,
    Frame.cc:432-485). Returns (Nq, Nt) bool."""
    du = jnp.abs(uv_proj[:, None, 0] - uv_tgt[None, :, 0])
    dv = jnp.abs(uv_proj[:, None, 1] - uv_tgt[None, :, 1])
    r = radius[:, None]
    return (du < r) & (dv < r)


def octave_gate(
    oct_q: jax.Array, oct_t: jax.Array, min_off: int, max_off: int
) -> jax.Array:
    """Target octave within [oct_q + min_off, oct_q + max_off] — the
    forward/backward scale gating of SearchByProjection (ORBmatcher.cc:
    1770-1780). Returns (Nq, Nt) bool."""
    d = oct_t[None, :] - oct_q[:, None]
    return (d >= min_off) & (d <= max_off)


def best_matches(
    dist: jax.Array,           # (Nq, Nt) int32
    gate: jax.Array,           # (Nq, Nt) bool
    max_dist: int,
    nn_ratio: float | None = None,
) -> MatchResult:
    """Masked argmin with optional Lowe ratio test (best < ratio * second)."""
    masked = jnp.where(gate, dist, BIG)
    best_idx = jnp.argmin(masked, axis=1).astype(jnp.int32)
    best = jnp.min(masked, axis=1)
    ok = best <= max_dist
    if nn_ratio is not None:
        nt = masked.shape[1]
        second = jnp.min(
            jnp.where(
                jax.nn.one_hot(best_idx, nt, dtype=bool), BIG, masked
            ),
            axis=1,
        )
        ok = ok & (best.astype(jnp.float32) < nn_ratio * second.astype(jnp.float32))
    return MatchResult(jnp.where(ok, best_idx, INVALID), jnp.where(ok, best, BIG), ok)


def rotation_consistency(
    angle_q: jax.Array,   # (Nq,) degrees
    angle_t: jax.Array,   # (Nt,) degrees
    m: MatchResult,
    histo_length: int = 30,
    keep_top: int = 3,
) -> MatchResult:
    """Keep only matches whose angle difference falls in the top-``keep_top``
    histogram bins (ORBmatcher.cc rotation histogram, :2035-2081)."""
    rot = angle_q - angle_t[jnp.clip(m.idx, 0, None)]
    rot = jnp.where(rot < 0, rot + 360.0, rot)
    binw = 360.0 / histo_length
    bins = jnp.clip((rot / binw).astype(jnp.int32), 0, histo_length - 1)
    counts = jnp.zeros((histo_length,), jnp.int32).at[bins].add(
        m.ok.astype(jnp.int32)
    )
    top_vals, top_idx = jax.lax.top_k(counts, keep_top)
    # reference ind3 rule: drop 3rd (and 2nd) bin if much smaller than best
    keep2 = top_vals[1].astype(jnp.float32) >= 0.1 * top_vals[0].astype(jnp.float32)
    keep3 = top_vals[2].astype(jnp.float32) >= 0.1 * top_vals[0].astype(jnp.float32)
    in_top = (bins == top_idx[0]) | (keep2 & (bins == top_idx[1])) | (
        keep3 & (bins == top_idx[2])
    )
    ok = m.ok & in_top
    return MatchResult(jnp.where(ok, m.idx, INVALID), jnp.where(ok, m.dist, BIG), ok)


def dedupe_targets(m: MatchResult, n_targets: int) -> MatchResult:
    """Enforce one query per target, keeping the lowest distance (the
    replace-if-better rule of e.g. ORBmatcher.cc:1846-1862)."""
    nq = m.idx.shape[0]
    qid = jnp.arange(nq, dtype=jnp.int32)
    # composite key makes the winner unique even on distance ties; distances
    # are Hamming (<=256), so clamp to 511 to keep key within int32 for any
    # realistic query capacity (511 * nq + nq < 2^31 for nq up to ~2M)
    d = jnp.minimum(jnp.where(m.ok, m.dist, 511), 511)
    key = d * nq + qid
    sentinel = 511 * nq + nq  # larger than any valid key
    tgt = jnp.clip(m.idx, 0, n_targets - 1)
    best_key = jnp.full((n_targets,), sentinel, jnp.int32).at[tgt].min(
        jnp.where(m.ok, key, sentinel)
    )
    ok = m.ok & (best_key[tgt] == key)
    return MatchResult(jnp.where(ok, m.idx, INVALID), jnp.where(ok, m.dist, BIG), ok)


def match_descriptors(
    desc_q: jax.Array,
    desc_t: jax.Array,
    gate: jax.Array,
    max_dist: int,
    nn_ratio: float | None = None,
    angle_q: jax.Array | None = None,
    angle_t: jax.Array | None = None,
    histo_length: int = 30,
    dedupe: bool = True,
) -> MatchResult:
    """One-stop search: Hamming matrix + gates + ratio + rotation + dedupe."""
    dist = hamming.hamming_matrix(desc_q, desc_t)
    m = best_matches(dist, gate, max_dist, nn_ratio)
    if angle_q is not None and angle_t is not None:
        m = rotation_consistency(angle_q, angle_t, m, histo_length)
    if dedupe:
        m = dedupe_targets(m, desc_t.shape[0])
    return m
