"""Pallas TPU kernel: fused Hamming distance + gate + top-2 reduction.

The matcher hot path (ops.matching.match_descriptors over
ops.hamming.hamming_matrix) materializes a (N, M) int32 distance matrix in
HBM, re-reads it for the masked argmin, and re-reads it again (one-hot
masked) for the second-best. This kernel fuses the whole pipeline per
128x128 tile in VMEM:

- descriptors are consumed as (N, 8) int32 words (bitcast of the 32-byte
  rows), XOR'd per pair and popcounted with the SWAR bit trick — all VPU
  integer ops, no unpacked (N, 256) expansion, no MXU dependency,
- the gate tile masks distances to +inf,
- best/second/argmin fold across the M-tile grid axis in VMEM scratch, so
  the (N, M) matrix never exists in HBM.

STATUS — measured on the v5 lite chip and NOT enabled in the hot path:
the XLA pipeline (unpack + MXU dot + masked top-2, ops.matching) runs the
full 1024x1024 match in ~1.2 ms; this kernel, bit-identical, lowers to
~25 ms through Mosaic (the per-tile f32 argmin/one-hot reductions and the
revisited output blocks dominate; the dot is microseconds). XLA's
producer-consumer fusion already keeps the distance matrix out of HBM
well enough at these sizes. Kept as a verified reference point for the
speed-of-light accounting in PERF.md — at 100x larger match sizes the
balance may flip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

TILE = 128
BIG = 1 << 20  # python int: jnp constants may not be captured by kernels


def _popcount32(v):
    """SWAR popcount of int32 lanes (Hacker's Delight / the reference's
    ORBmatcher.cc:2098-2102, vectorized)."""
    v = v - ((v >> 1) & 0x55555555)
    v = (v & 0x33333333) + ((v >> 2) & 0x33333333)
    v = (v + (v >> 4)) & 0x0F0F0F0F
    return (v * 0x01010101) >> 24


def _kernel(q_ref, t_ref, gate_ref, best_ref, idx_ref, second_ref):
    mi = pl.program_id(0)
    mj = pl.program_id(1)

    @pl.when(mj == 0)
    def _init():
        best_ref[mi, :] = jnp.full((TILE,), BIG, jnp.int32)
        idx_ref[mi, :] = jnp.full((TILE,), -1, jnp.int32)
        second_ref[mi, :] = jnp.full((TILE,), BIG, jnp.int32)

    qb = q_ref[:]                     # (TILE, 256) f32 descriptor bits
    tb = t_ref[:]                     # (TILE, 256) f32
    # popcount(a XOR b) = |a| + |b| - 2 a.b — one 128x256x128 MXU dot
    g = jnp.dot(qb, tb.T, preferred_element_type=jnp.float32)
    na = jnp.sum(qb, axis=1, keepdims=True)
    nb = jnp.sum(tb, axis=1, keepdims=True)
    d = (na + nb.T - 2.0 * g).astype(jnp.int32)
    d = jnp.where(gate_ref[:], d, BIG)

    # fold this tile's best two into the running top-2. Mosaic's index
    # reductions only lower for float32 — distances are <= 2^20, exact in
    # f32, so reduce in float and cast back.
    df = d.astype(jnp.float32)
    tile_best = jnp.min(df, axis=1).astype(jnp.int32)
    tile_arg = jnp.argmin(df, axis=1).astype(jnp.int32) + mj * TILE
    masked = jnp.where(
        jax.nn.one_hot(tile_arg - mj * TILE, TILE, dtype=jnp.bool_),
        jnp.float32(BIG), df)
    tile_second = jnp.min(masked, axis=1).astype(jnp.int32)

    b0 = best_ref[mi, :]
    i0 = idx_ref[mi, :]
    s0 = second_ref[mi, :]
    new_best = jnp.minimum(b0, tile_best)
    new_idx = jnp.where(tile_best < b0, tile_arg, i0)
    # second best = min of all non-winning candidates
    new_second = jnp.minimum(
        jnp.maximum(b0, tile_best),          # the loser of the two bests
        jnp.minimum(s0, tile_second),
    )
    best_ref[mi, :] = new_best
    idx_ref[mi, :] = new_idx
    second_ref[mi, :] = new_second


try:  # pallas import is deferred-failure: CPU wheels may lack TPU lowering
    from jax.experimental import pallas as pl

    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    pl = None
    _HAVE_PALLAS = False


@functools.partial(jax.jit, static_argnames=("interpret",))
def hamming_top2(q_desc, t_desc, gate, interpret: bool = False):
    """Fused masked Hamming top-2. q_desc (N,32) u8, t_desc (M,32) u8,
    gate (N,M) bool -> (best (N,), idx (N,), second (N,)) int32.
    N and M must be multiples of 128 (the engine's fixed capacities are)."""
    from . import hamming as _h

    N = q_desc.shape[0]
    M = t_desc.shape[0]
    # bit unpack stays in XLA (layout-friendly); the kernel fuses the MXU
    # popcount dot with the gate and the running top-2
    qw = _h.unpack_bits(q_desc).astype(jnp.float32)
    tw = _h.unpack_bits(t_desc).astype(jnp.float32)
    grid = (N // TILE, M // TILE)
    best, idx, second = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, 256), lambda i, j: (i, 0)),
            pl.BlockSpec((TILE, 256), lambda i, j: (j, 0)),
            pl.BlockSpec((TILE, TILE), lambda i, j: (i, j)),
        ],
        out_specs=[
            pl.BlockSpec((N // TILE, TILE), lambda i, j: (0, 0)),
            pl.BlockSpec((N // TILE, TILE), lambda i, j: (0, 0)),
            pl.BlockSpec((N // TILE, TILE), lambda i, j: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N // TILE, TILE), jnp.int32),
            jax.ShapeDtypeStruct((N // TILE, TILE), jnp.int32),
            jax.ShapeDtypeStruct((N // TILE, TILE), jnp.int32),
        ],
        interpret=interpret,
    )(qw, tw, gate)
    return best.reshape(N), idx.reshape(N), second.reshape(N)


def available() -> bool:
    return _HAVE_PALLAS
