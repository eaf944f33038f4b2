"""Single-message device->host wire packing.

The tunneled TPU transport charges a fixed ~1-3 ms per device->host
message on top of byte time, so fetching a dozen small per-frame result
arrays costs more in message overhead than in payload. Packing every
host-bound result into ONE uint8 buffer (bitcast + concatenate, zero
device compute of note) makes the per-frame result fetch a single
message. The host unpacks with zero-copy ``np.frombuffer`` views.

No reference analogue: the reference's tracker is host-resident
(Tracking.cc keeps all per-frame state in process memory); this is the
TPU-native equivalent of "the tracker's working set lives on device and
only one compact record crosses back per frame".
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def pack(arrays) -> jax.Array:
    """Concatenate arrays (any fixed shapes/dtypes) into one uint8 vector."""
    parts = []
    for x in arrays:
        if x.dtype == jnp.bool_:
            x = x.astype(jnp.uint8)
        if x.dtype != jnp.uint8:
            x = jax.lax.bitcast_convert_type(x, jnp.uint8)
        parts.append(x.reshape(-1))
    return jnp.concatenate(parts)


def unpack(buf: np.ndarray, shapes_dtypes) -> list[np.ndarray]:
    """Split a fetched pack() buffer back into (read-only) array views.

    ``shapes_dtypes``: iterable of (shape, dtype) in pack() order — e.g.
    ``[(f.shape, f.dtype) for f in fields]`` of the same device arrays.
    """
    buf = np.ascontiguousarray(buf)
    out = []
    off = 0
    for shape, dtype in shapes_dtypes:
        dt = np.dtype(dtype)
        n = int(np.prod(shape, dtype=np.int64)) if len(shape) else 1
        a = np.frombuffer(buf, dt, count=n, offset=off).reshape(shape)
        out.append(a)
        off += n * dt.itemsize
    return out
