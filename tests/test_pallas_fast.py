"""Pallas fused FAST score+NMS kernel vs the XLA reference formulation."""

import numpy as np

import tests.conftest  # noqa: F401  (forces CPU platform)
import jax.numpy as jnp

from plslam_tpu.ops import fast
from plslam_tpu.ops.pallas_fast import fast_score_nms


def _reference(img, min_th):
    return fast.nms3x3(fast.fast_score_map(img, min_th))


def test_matches_xla_formulation_random():
    rng = np.random.default_rng(7)
    img = jnp.asarray(
        rng.integers(0, 256, size=(120, 160)).astype(np.float32)
    )
    got = fast_score_nms(img, 7.0, interpret=True)
    want = _reference(img, 7.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0)


def test_matches_xla_formulation_structured():
    # corners of a bright square on a dark background + gradient ramp
    img = np.zeros((97, 201), np.float32)  # deliberately non-aligned shape
    img += np.linspace(0, 40, 201)[None, :]
    img[30:60, 50:120] = 200.0
    img[10:14, 150:154] = 255.0
    got = fast_score_nms(jnp.asarray(img), 7.0, interpret=True)
    want = _reference(jnp.asarray(img), 7.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0)
    assert float(jnp.sum(got > 0)) > 0  # the square's corners fire


def test_threshold_gate():
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.integers(0, 256, size=(64, 128)).astype(np.float32))
    hi = fast_score_nms(img, 20.0, interpret=True)
    want = _reference(img, 20.0)
    np.testing.assert_allclose(np.asarray(hi), np.asarray(want), atol=0)
