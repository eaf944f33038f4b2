"""Fused Pallas Hamming top-2 vs the XLA reference path (interpret mode on
CPU; the real TPU lowering exercises the same kernel)."""

import jax.numpy as jnp
import numpy as np
import pytest

from plslam_tpu.ops import hamming, pallas_matching


@pytest.mark.skipif(not pallas_matching.available(), reason="no pallas")
def test_matches_xla_reference():
    rng = np.random.default_rng(0)
    N, M = 256, 384
    q = rng.integers(0, 256, (N, 32), np.uint8)
    t = rng.integers(0, 256, (M, 32), np.uint8)
    gate = rng.random((N, M)) < 0.3
    gate[5] = False  # fully-gated row

    best, idx, second = pallas_matching.hamming_top2(
        jnp.asarray(q), jnp.asarray(t), jnp.asarray(gate), interpret=True)
    best, idx, second = np.asarray(best), np.asarray(idx), np.asarray(second)

    dist = np.asarray(hamming.hamming_matrix(jnp.asarray(q), jnp.asarray(t)))
    dist = np.where(gate, dist, 1 << 20)
    ref_best = dist.min(1)
    ref_idx = dist.argmin(1)
    one_hot = np.zeros_like(dist, bool)
    one_hot[np.arange(N), ref_idx] = True
    ref_second = np.where(one_hot, 1 << 20, dist).min(1)

    np.testing.assert_array_equal(best, ref_best)
    np.testing.assert_array_equal(second, ref_second)
    # winners must agree wherever the row isn't fully gated (ties may pick
    # a different argmin — accept any index achieving the best distance)
    open_rows = gate.any(1)
    assert (dist[np.arange(N), np.clip(idx, 0, M - 1)][open_rows]
            == ref_best[open_rows]).all()
    assert best[5] == 1 << 20  # fully gated row stays BIG
