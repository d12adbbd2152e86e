"""Parquet small-files compaction.

At 100 TB the small-files problem is operational reality: upstream stages
(checkpointed partitions, per-shard exports, streaming sinks) land
thousands of KB-scale parquet files whose per-file open/footer cost then
dominates every downstream scan.  :func:`compact_parquet` re-packs a file
set into ~``target_bytes`` files with a minimal-movement plan:

- the file count is sized from ON-DISK bytes (compressed), not row
  counts, so output files land near the target regardless of schema;
- ``repartition(n)`` without shuffle coalesces/splits neighboring blocks
  — no all-to-all exchange, rows move at most once;
- output is written to a temp dir and LANDED with a manifest marker
  (``_COMPACTION.json``) after the write completes — a killed run leaves
  the input untouched and a re-run starts clean (the resumable-output
  convention of ``state/checkpoint.py``); a completed output is reused.

The input is never deleted — compaction is a copy, and retiring the
source files is the caller's (atomic) decision.
"""

from __future__ import annotations

import json
import os
import shutil

import ray.data

__all__ = ["compact_parquet"]

_MARKER = "_COMPACTION.json"


def _parquet_files(input_path: str | list[str]) -> list[str]:
    paths = [input_path] if isinstance(input_path, str) else list(input_path)
    files: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            for root, _dirs, names in os.walk(p):
                files += [
                    os.path.join(root, n)
                    for n in names
                    if n.endswith(".parquet")
                ]
        elif os.path.isfile(p):
            files.append(p)
    if not files:
        raise ValueError(f"compact_parquet: no parquet files under {paths}")
    return sorted(files)


def compact_parquet(
    input_path: str | list[str],
    output_dir: str,
    *,
    target_bytes: int = 256 << 20,
    columns: list[str] | None = None,
) -> dict:
    """Re-pack parquet files into ~``target_bytes``-sized files under
    ``output_dir``.  Returns the manifest dict (also persisted as
    ``_COMPACTION.json``): input file count/bytes, output file count,
    rows.  Idempotent — a completed output (matching input fingerprint)
    is reused without rereading the data."""
    files = _parquet_files(input_path)
    in_bytes = sum(os.path.getsize(f) for f in files)
    fingerprint = f"{len(files)}:{in_bytes}:{columns}"

    marker = os.path.join(output_dir, _MARKER)
    if os.path.exists(marker):
        with open(marker) as fh:
            manifest = json.load(fh)
        if manifest.get("fingerprint") == fingerprint:
            return manifest
        shutil.rmtree(output_dir)

    n_out = max(1, -(-in_bytes // max(1, target_bytes)))
    ds = ray.data.read_parquet(files, columns=columns)
    rows = ds.count()
    tmp_dir = output_dir.rstrip("/") + ".tmp"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    ds.repartition(int(n_out)).write_parquet(tmp_dir)
    shutil.rmtree(output_dir, ignore_errors=True)
    os.replace(tmp_dir, output_dir)

    manifest = {
        "fingerprint": fingerprint,
        "n_input_files": len(files),
        "input_bytes": int(in_bytes),
        "n_output_files": len(
            [n for n in os.listdir(output_dir) if n.endswith(".parquet")]
        ),
        "rows": int(rows),
        "target_bytes": int(target_bytes),
    }
    with open(marker, "w") as fh:
        json.dump(manifest, fh)
    return manifest
