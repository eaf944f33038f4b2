"""Fused FAST-9 corner score + 3x3 NMS as a single Pallas TPU kernel.

The XLA formulation in ``ops/fast.py`` materializes a (16, H, W) stack of
rolled images plus four more stacks for the log-doubling arc-min — at
640x480 that is ~100 MB of HBM traffic per pyramid level for what is
fundamentally a 7x7-stencil computation. This kernel keeps one row-tile
(+4px halo) of the image in VMEM, forms the 16 Bresenham-circle
differences as lane rolls + sublane slices, reduces the circular 9-windows
in registers, applies non-max suppression and the border mask, and writes
the finished score map once.

Replaces the per-cell ``cv::FAST`` of the reference's
``ORBextractor::ComputeKeyPointsOctTree``
(/root/reference/src/ORBextractor.cc:765-853) together with
``ops/fast.py``'s ``fast_score_map`` + ``nms3x3`` (bit-identical output,
see tests/test_pallas_fast.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fast import ARC_LEN, CIRCLE_OFFSETS

# 3px circle halo + 1px NMS halo
_HALO = 4
_TILE_H = 32
_LANES = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(img_hbm, out_ref, blk, sem, *, h, w, tile_h, min_th):
    i = pl.program_id(0)
    dma = pltpu.make_async_copy(
        img_hbm.at[pl.ds(i * tile_h, tile_h + 2 * _HALO), :], blk, sem
    )
    dma.start()
    dma.wait()

    # Load the VMEM block ONCE; all rolls/slices below act on the value,
    # not the Ref (lazy ref reads inside pltpu.roll sub-jaxprs trip
    # "JaxprInputEffect does not have corresponding jaxpr input").
    x = blk[:]

    sh = tile_h + 2  # score rows: output rows plus 1px NMS halo each side
    center = x[_HALO - 1 : _HALO - 1 + sh, :]

    # 16 circle differences; x-shift as a circular lane roll (wraparound
    # lands in the >=4px horizontal padding, masked off below), y-shift as
    # a sublane slice into the halo.
    wp = x.shape[1]
    diffs = []
    for dx, dy in CIRCLE_OFFSETS:
        dxi, dyi = int(dx), int(dy)
        rolled = pltpu.roll(x, (-dxi) % wp, axis=1) if dxi else x
        diffs.append(rolled[_HALO - 1 + dyi : _HALO - 1 + dyi + sh, :] - center)

    def arc_score(d):
        # m9[k] = min(d[k..k+8] circular); score = max_k m9[k]
        m2 = [jnp.minimum(d[k], d[(k + 1) % 16]) for k in range(16)]
        m4 = [jnp.minimum(m2[k], m2[(k + 2) % 16]) for k in range(16)]
        m8 = [jnp.minimum(m4[k], m4[(k + 4) % 16]) for k in range(16)]
        m9 = [jnp.minimum(m8[k], d[(k + ARC_LEN - 1) % 16]) for k in range(16)]
        out = m9[0]
        for k in range(1, 16):
            out = jnp.maximum(out, m9[k])
        return out

    score = jnp.maximum(arc_score(diffs), arc_score([-d for d in diffs]))
    score = jnp.where(score > min_th, score, 0.0)

    # mask outside the 3px-inset image interior (global coordinates);
    # kills the roll wraparound and the host-side padding in one go.
    gy = (
        jax.lax.broadcasted_iota(jnp.int32, score.shape, 0)
        + i * tile_h
        - 1
    )
    # image pixels live in padded columns [_HALO, _HALO + w)
    gx = jax.lax.broadcasted_iota(jnp.int32, score.shape, 1) - _HALO
    inside = (gy >= 3) & (gy < h - 3) & (gx >= 3) & (gx < w - 3)
    score = jnp.where(inside, score, 0.0)

    # 3x3 NMS on the (tile_h+2)-row score strip -> tile_h output rows
    m = score
    for dxi in (-1, 1):
        m = jnp.maximum(m, pltpu.roll(score, (-dxi) % wp, axis=1))
    nm = jnp.maximum(jnp.maximum(m[0:tile_h, :], m[1 : tile_h + 1, :]), m[2:, :])
    c = score[1 : tile_h + 1, :]
    out_ref[:] = jnp.where(c >= nm, c, 0.0)


@functools.partial(jax.jit, static_argnames=("min_threshold", "interpret"))
def fast_score_nms(
    img: jax.Array, min_threshold: float, *, interpret: bool = False
) -> jax.Array:
    """NMS'd FAST-9 corner-score map of ``img`` ((H, W) float32, 0..255).

    Matches ``nms3x3(fast_score_map(img, min_threshold))`` exactly.
    """
    img = img.astype(jnp.float32)  # VMEM scratch is f32; accept uint8 input
    h, w = img.shape
    hp = _round_up(h, _TILE_H)
    wp = _round_up(w + 2 * _HALO, _LANES)
    padded = jnp.zeros((hp + 2 * _HALO, wp), jnp.float32)
    padded = jax.lax.dynamic_update_slice(padded, img, (_HALO, _HALO))

    grid = hp // _TILE_H
    kernel = functools.partial(
        _kernel, h=h, w=w, tile_h=_TILE_H, min_th=float(min_threshold)
    )
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (_TILE_H, wp), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((_TILE_H + 2 * _HALO, wp), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(padded)
    return jax.lax.slice(out, (0, _HALO), (h, _HALO + w))
