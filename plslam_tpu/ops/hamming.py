"""Batched 256-bit Hamming distance on the MXU.

TPU-native replacement for the reference's per-pair popcount loop
(``ORBmatcher::DescriptorDistance``, /root/reference/src/ORBmatcher.cc:
2083-2104, the 13-op bit trick): instead of scalar popcounts we compute ALL
pairwise distances at once. For 0/1 bit vectors a, b:

    hamming(a, b) = sum(a) + sum(b) - 2 * dot(a, b)

so the (N, M) distance matrix is one int8 matmul on the 128x128 systolic
array — a (N,256)x(256,M) contraction, plus rank-1 corrections. At the
frame scale (1024x1024 pairs) this is ~0.5 MFLOP-equivalent: effectively
free, which is what makes brute-force gating matrices (replacing the
reference's grid buckets and BoW-node alignment) the right TPU design.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def unpack_bits(desc_u8: jax.Array) -> jax.Array:
    """(N, 32) uint8 descriptors -> (N, 256) int8 bits (LSB-first per byte,
    matching the OpenCV byte layout used by ops.orb)."""
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (desc_u8[:, :, None] >> shifts[None, None, :]) & 1  # (N, 32, 8)
    return bits.reshape(desc_u8.shape[0], 256).astype(jnp.int8)


def hamming_matrix(a_u8: jax.Array, b_u8: jax.Array) -> jax.Array:
    """All-pairs Hamming distances. a: (N, 32) u8, b: (M, 32) u8 -> (N, M) i32."""
    a = unpack_bits(a_u8)
    b = unpack_bits(b_u8)
    g = jax.lax.dot_general(
        a, b,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (N, M) popcount(a AND b)
    na = jnp.sum(a.astype(jnp.int32), axis=1)  # (N,)
    nb = jnp.sum(b.astype(jnp.int32), axis=1)  # (M,)
    return na[:, None] + nb[None, :] - 2 * g


def hamming_pairs(a_u8: jax.Array, b_u8: jax.Array) -> jax.Array:
    """Row-wise Hamming distance between aligned pairs: (N,32),(N,32)->(N,)."""
    x = jnp.bitwise_xor(a_u8, b_u8)
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (x[:, :, None] >> shifts[None, None, :]) & 1
    return jnp.sum(bits.astype(jnp.int32), axis=(1, 2))
