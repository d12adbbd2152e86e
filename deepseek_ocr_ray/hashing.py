"""Shared stable-hash helpers — ONE implementation of the bucket mixes.

Every keyed exchange in the engine buckets rows by a process-stable hash
(Python's ``hash()`` is salted per process and must never partition data).
Integer keys use a splitmix64-style mix (vectorized, allocation-free);
string keys use md5 (C-speed, stable).  Centralized here so dedup, joins,
windows and assembly cannot drift apart.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def splitmix_bucket(vals: np.ndarray, n_buckets: int) -> np.ndarray:
    """Vectorized stable bucket of an int64/uint64 array."""
    x = vals.astype(np.uint64)
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xFF51AFD7ED558CCD)
    x ^= x >> np.uint64(33)
    return (x % np.uint64(n_buckets)).astype(np.int64)


def md5_bucket(value: str | bytes, n_buckets: int) -> int:
    if isinstance(value, str):
        value = value.encode()
    return int.from_bytes(hashlib.md5(value).digest()[:4], "little") % n_buckets


def id_bucket_array(ids: pa.Array | pa.ChunkedArray, n_buckets: int) -> pa.Array:
    """Stable bucket column for an id column of integer OR string type."""
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    if pa.types.is_integer(ids.type):
        x = ids.to_numpy(zero_copy_only=False)
        return pa.array(splitmix_bucket(x, n_buckets), pa.int64())
    return pa.array(
        [md5_bucket(str(v), n_buckets) for v in ids.to_pylist()], pa.int64()
    )
