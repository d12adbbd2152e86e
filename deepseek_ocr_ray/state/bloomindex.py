"""Per-file Bloom-filter index — equality-predicate data skipping.

The complement of the zone map (``state/zonemap.py``): min/max ranges
prune RANGE scans on a column correlated with the file layout, but a
POINT lookup on a column uncorrelated with it (one customer's orders in
date-sorted files) overlaps every file's range.  A per-file Bloom filter
answers "might this file contain value v?" instead — a file whose filter
misses provably lacks the value; hits may be false positives, so
:func:`scan_pruned_eq` always applies the residual equality filter and
correctness NEVER depends on the pruning (the zonemap convention).

* :func:`build_bloom_index` — a distributed sweep over the file list;
  each task reads ONLY the indexed column of its file (column-pruned
  read, no other pages move), hashes the distinct values once
  (``hash64_array``) and sets ``k`` double-hashed bits in an m-bit
  filter sized from the file's distinct count (``bits_per_key``, m
  rounded to whole bytes).  The manifest (path, m, k, n_distinct,
  packed bitmap) lands as parquet with atomic rename and the zonemap's
  input-fingerprint idempotence;
* :func:`pruned_files` — manifest-only probe: k bit tests per file;
  files missing from the manifest are kept conservatively; a stale
  manifest raises loudly;
* :func:`scan_pruned_eq` — reads the kept files with the explicit
  vectorized equality filter stage.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data

from ..cluster import arrow_block_refs
from ..hashing import hash64_array, mix64
from .zonemap import _data_files, _fingerprint

__all__ = ["build_bloom_index", "pruned_files", "scan_pruned_eq"]

_MANIFEST = "_BLOOMINDEX"


def _probe_bits(h: np.ndarray, m: int, k: int) -> np.ndarray:
    """(n, k) bit positions via double hashing — h1 + i·h2 mod m, h2
    forced odd so the stride never degenerates."""
    h1 = h % np.uint64(m)
    h2 = (mix64(h) | np.uint64(1)) % np.uint64(m)
    i = np.arange(k, dtype=np.uint64)
    return (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m)


def _manifest_path(dir_path: str, column: str) -> str:
    return os.path.join(dir_path, f"{_MANIFEST}_{column}.parquet")


def build_bloom_index(
    dir_path: str, column: str, *, bits_per_key: int = 16, k: int = 7
) -> str:
    """Build (or reuse) the Bloom manifest for ``column`` over every
    ``*.parquet`` data file in ``dir_path``.  Returns the manifest path."""
    files = _data_files(dir_path)
    if not files:
        raise ValueError(f"no parquet data files under {dir_path}")
    mpath = _manifest_path(dir_path, column)
    fp = _fingerprint(files)
    if os.path.exists(mpath):
        meta = pq.read_table(mpath).schema.metadata or {}
        old = json.loads(meta.get(b"fingerprint", b"{}"))
        if old == fp:
            return mpath

    kk = int(k)
    bpk = int(bits_per_key)

    def sweep(batch: pa.Table) -> pa.Table:
        paths = batch["path"].to_pylist()
        rows = {"path": [], "m": [], "k": [], "n_distinct": [], "bits": []}
        for p in paths:
            col = pq.read_table(p, columns=[column])[column]
            h = np.unique(hash64_array(col.combine_chunks()))
            n = int(h.size)
            m = max(64, ((n * bpk + 7) // 8) * 8)  # whole bytes
            bitmap = np.zeros(m, dtype=bool)
            if n:
                pos = _probe_bits(h, m, kk).ravel().astype(np.int64)
                bitmap[pos] = True
            rows["path"].append(os.path.basename(p))
            rows["m"].append(m)
            rows["k"].append(kk)
            rows["n_distinct"].append(n)
            rows["bits"].append(np.packbits(bitmap).tobytes())
        return pa.table(
            {
                "path": pa.array(rows["path"], pa.string()),
                "m": pa.array(rows["m"], pa.int64()),
                "k": pa.array(rows["k"], pa.int64()),
                "n_distinct": pa.array(rows["n_distinct"], pa.int64()),
                "bits": pa.array(rows["bits"], pa.binary()),
            }
        )

    import ray as _ray

    listing = ray.data.from_arrow(
        pa.table({"path": pa.array(files, pa.string())})
    )
    parts = [
        t
        for t in _ray.get(
            arrow_block_refs(
            listing.map_batches(sweep, batch_format="pyarrow")
        )
        )
        if "bits" in t.column_names
    ]
    manifest = pa.concat_tables(parts, promote_options="default")
    manifest = manifest.replace_schema_metadata(
        {b"fingerprint": json.dumps(fp).encode(), b"column": column.encode()}
    )
    tmp = mpath + ".tmp"
    pq.write_table(manifest, tmp)
    os.replace(tmp, mpath)
    return mpath


def pruned_files(dir_path: str, column: str, value) -> list[str]:
    """Files that MIGHT contain ``value`` (manifest-only; conservative
    for files missing from the manifest; loud on a stale manifest)."""
    files = _data_files(dir_path)
    mpath = _manifest_path(dir_path, column)
    if not os.path.exists(mpath):
        raise FileNotFoundError(
            f"no Bloom manifest for {column!r} under {dir_path} — run "
            "build_bloom_index first"
        )
    manifest = pq.read_table(mpath)
    meta = manifest.schema.metadata or {}
    if json.loads(meta.get(b"fingerprint", b"{}")) != _fingerprint(files):
        raise ValueError(
            f"Bloom manifest {mpath} is stale (files changed since the "
            "build) — rebuild it"
        )
    if isinstance(value, str):
        varr = pa.array([value], pa.large_string())
    elif isinstance(value, (int, np.integer)):
        varr = pa.array([int(value)], pa.int64())
    else:
        raise ValueError(f"unsupported lookup value type {type(value)}")
    h = hash64_array(varr)
    by_name = {
        manifest["path"][i].as_py(): i for i in range(manifest.num_rows)
    }
    keep = []
    for f in files:
        i = by_name.get(os.path.basename(f))
        if i is None:
            keep.append(f)  # unknown file: conservative
            continue
        m = manifest["m"][i].as_py()
        kk = manifest["k"][i].as_py()
        bitmap = np.unpackbits(
            np.frombuffer(manifest["bits"][i].as_py(), np.uint8)
        ).astype(bool)
        pos = _probe_bits(h, m, kk).ravel().astype(np.int64)
        if bitmap[pos].all():
            keep.append(f)
    return keep


def scan_pruned_eq(
    dir_path: str, column: str, value, **read_args
) -> ray.data.Dataset:
    """Equality scan over the Bloom-pruned file set, with the residual
    filter applied explicitly so correctness never depends on pruning.
    An all-pruned set returns a typed empty from the directory schema."""
    files = pruned_files(dir_path, column, value)
    if not files:
        all_files = _data_files(dir_path)
        schema = pq.read_schema(all_files[0])
        empty = pa.table(
            {n: pa.array([], schema.field(n).type) for n in schema.names}
        )
        return ray.data.from_arrow(empty)
    ds = ray.data.read_parquet(files, **read_args)

    def residual(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.fill_null(pc.equal(batch[column], value), False)
        )

    return ds.map_batches(residual, batch_format="pyarrow")
