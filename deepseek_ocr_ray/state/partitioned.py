"""Hive-style value-partitioned parquet layout — write, discover, prune.

The layout every lake uses (``col=value/`` directories): writing a table
partitioned by a low-cardinality column makes later scans that filter on
it read ONLY the matching directories — partition pruning at the
directory level, one step coarser than the zone-map's file-level pruning
(``state/zonemap.py``) and free of any manifest.

* :func:`write_partitioned` — ``write_parquet(partition_cols=…)`` into a
  temp dir, landed ATOMICALLY by rename with a ``_PARTITIONED.json``
  manifest (the ``compact.py`` convention), so a killed write is redone
  rather than half-read; a partition-column cardinality past
  ``max_partitions`` raises loudly (a million tiny directories is a
  filesystem DoS, not a layout);
* :func:`partition_values` — discover the written values from directory
  names alone (no data pages);
* :func:`read_partitions` — scan ONLY the requested values' directories
  (missing values raise loudly by default — a silent empty scan hides
  typos).  Ray's parquet reader recovers the partition column from the
  hive path, so the result schema matches the original table.
"""

from __future__ import annotations

import json
import os
import shutil
from urllib.parse import unquote

import ray.data

__all__ = ["write_partitioned", "partition_values", "read_partitions"]

_MANIFEST = "_PARTITIONED.json"


def write_partitioned(
    ds: ray.data.Dataset,
    out_dir: str,
    by: list[str],
    *,
    max_partitions: int = 100_000,
) -> None:
    """Write ``ds`` as a hive-partitioned parquet tree at ``out_dir``
    (replacing any previous tree atomically)."""
    if not by:
        raise ValueError("need at least one partition column")
    parent = os.path.dirname(os.path.abspath(out_dir)) or "."
    os.makedirs(parent, exist_ok=True)
    tmp = out_dir.rstrip("/") + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    ds.write_parquet(tmp, partition_cols=list(by))
    n_dirs = sum(len(dirs) for _, dirs, _ in os.walk(tmp))
    if n_dirs > max_partitions:
        shutil.rmtree(tmp, ignore_errors=True)
        raise ValueError(
            f"write_partitioned: {n_dirs} partition directories exceed "
            f"max_partitions={max_partitions} — partition by a "
            "lower-cardinality column (or bucket the values first)"
        )
    with open(os.path.join(tmp, _MANIFEST), "w") as f:
        json.dump({"by": list(by), "partitions": n_dirs}, f)
    shutil.rmtree(out_dir, ignore_errors=True)
    os.rename(tmp, out_dir)


def _manifest(root: str) -> dict:
    p = os.path.join(root, _MANIFEST)
    if not os.path.exists(p):
        raise FileNotFoundError(
            f"{root} has no {_MANIFEST} — not a write_partitioned tree "
            "(or the write never completed; rerun it)"
        )
    with open(p) as f:
        return json.load(f)


def partition_values(root: str, col: str | None = None) -> list[str]:
    """Top-level partition values discovered from directory names (no
    data pages read).  ``col`` defaults to the manifest's first column
    and is validated against it."""
    m = _manifest(root)
    lead = m["by"][0]
    if col is not None and col != lead:
        raise ValueError(
            f"top-level partition column is {lead!r}, not {col!r} "
            f"(tree is partitioned by {m['by']})"
        )
    vals = []
    for name in sorted(os.listdir(root)):
        if "=" in name and os.path.isdir(os.path.join(root, name)):
            c, v = name.split("=", 1)
            if c == lead:
                vals.append(unquote(v))
    return vals


def read_partitions(
    root: str,
    values: list[str],
    *,
    missing_ok: bool = False,
    **read_args,
) -> ray.data.Dataset:
    """Scan ONLY the given top-level partition values' directories.
    Unknown values raise (set ``missing_ok=True`` to skip them — e.g.
    when probing a value that may not have arrived yet)."""
    m = _manifest(root)
    lead = m["by"][0]
    # map the logical (unquoted) value back to the RAW directory name —
    # hive encoding URL-escapes spaces and specials on disk
    have: dict[str, str] = {}
    for name in sorted(os.listdir(root)):
        if "=" in name and os.path.isdir(os.path.join(root, name)):
            c, v = name.split("=", 1)
            if c == lead:
                have[unquote(v)] = name
    dirs, missing = [], []
    for v in values:
        if v in have:
            dirs.append(os.path.join(root, have[v]))
        else:
            missing.append(v)
    if missing and not missing_ok:
        raise ValueError(
            f"partition values {missing} not present under {root} "
            f"(have: {sorted(have)[:20]}…) — pass missing_ok=True to skip"
        )
    if not dirs:
        raise ValueError(
            f"no requested partition of {values} exists under {root}"
        )
    # Ray 2.49's read_parquet expands ONE directory (and recovers the
    # hive column from the path) but rejects a LIST of directories —
    # read each and union (a handful of partition dirs, not a fan-out).
    # The recovered column keeps the RAW (URL-encoded) path value, so a
    # value whose encoding differs is overwritten with the logical one —
    # constant per directory by construction.
    import pyarrow as pa

    def _one(dir_path: str) -> ray.data.Dataset:
        d = ray.data.read_parquet(dir_path, **read_args)
        raw = os.path.basename(dir_path).split("=", 1)[1]
        logical = unquote(raw)
        if logical == raw:
            return d

        def fix(batch: pa.Table) -> pa.Table:
            i = batch.column_names.index(lead)
            return batch.set_column(
                i, lead, pa.array([logical] * batch.num_rows, pa.string())
            )

        return d.map_batches(fix, batch_format="pyarrow")

    out = _one(dirs[0])
    for d in dirs[1:]:
        out = out.union(_one(d))
    return out
