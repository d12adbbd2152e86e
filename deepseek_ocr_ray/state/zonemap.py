"""Zone maps — file-level min/max statistics and predicate-pruned scans.

The lakehouse data-skipping primitive: a manifest of per-file min/max
statistics (read from parquet FOOTERS only — no data pages move) lets a
range predicate skip whole files before the scan starts.  On a 100-TB
table laid out sorted/clustered by the predicate column (the layout
``compact_parquet`` + a sort produce), a narrow range touches a handful
of files instead of all of them — pruning happens at the FILE level,
before Ray Data's own row-group/row-level pushdown takes over inside the
selected files.

- :func:`build_zonemap` is a distributed footer sweep: the file list
  streams through ``map_batches`` tasks that each open footers and emit
  one stats row per (file, column) — millions of files never collect on
  the driver; the manifest lands as parquet next to the data
  (``_zonemap/``, atomic temp-dir rename, resumable via an input
  fingerprint like ``_COMPACTION.json``).
- :func:`pruned_files` reads ONLY the manifest (with a column-pushdown
  filter) and returns the overlapping file set.  Unknown statistics keep
  the file (conservative); an all-null or empty file is provably
  disjoint from any range and drops.  Values are normalized per kind:
  integers as-is, timestamps → epoch µs, strings lexicographic — the
  same total order parquet stats use.
- :func:`scan_pruned` reads the selected files and applies the residual
  range as an explicit vectorized filter stage (exact row-level
  semantics), so correctness never depends on the pruning: the zone map
  only shrinks the file list.  (The residual is NOT pushed via
  ``read_parquet(filter=...)`` — Ray 2.49 emits a schema-less
  zero-column block when a pushed filter empties a file, and those
  blocks bypass ``map_batches``, so an all-empty result would lose its
  schema.)
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

__all__ = ["build_zonemap", "pruned_files", "scan_pruned", "ZONEMAP_DIR"]

ZONEMAP_DIR = "_zonemap"


def _norm(value, typ: pa.DataType):
    """Normalize a stats/predicate value into the manifest's (kind, int|str)
    encoding; returns (kind, int_val, str_val)."""
    if value is None:
        return None
    if pa.types.is_timestamp(typ):
        scalar = pa.scalar(value, typ) if not isinstance(value, pa.Scalar) else value
        return ("int", scalar.cast(pa.int64()).as_py(), None)
    if pa.types.is_date(typ):
        scalar = pa.scalar(value, typ) if not isinstance(value, pa.Scalar) else value
        return ("int", scalar.cast(pa.int32()).cast(pa.int64()).as_py(), None)
    if pa.types.is_integer(typ):
        return ("int", int(value if not isinstance(value, pa.Scalar) else value.as_py()), None)
    if pa.types.is_string(typ) or pa.types.is_large_string(typ):
        v = value.as_py() if isinstance(value, pa.Scalar) else value
        return ("str", None, str(v))
    return None  # unsupported kind — recorded as stats-less (conservative keep)


def _file_stats(path: str, columns: list[str]) -> list[dict]:
    """Per-column (min, max, nulls, rows) of ONE parquet file from its
    footer metadata — no data pages are read."""
    f = pq.ParquetFile(path)
    md = f.metadata
    schema = f.schema_arrow
    name_to_idx = {md.row_group(0).column(i).path_in_schema: i
                   for i in range(md.num_columns)} if md.num_row_groups else {}
    out = []
    for col in columns:
        typ = schema.field(col).type if col in schema.names else None
        mn = mx = None
        nulls = rows = 0
        have = md.num_row_groups > 0 and col in name_to_idx and typ is not None
        for rg in range(md.num_row_groups):
            cc = md.row_group(rg).column(name_to_idx[col]) if have else None
            rows += md.row_group(rg).num_rows
            st = cc.statistics if (cc is not None and cc.is_stats_set) else None
            if st is None or st.min is None or st.max is None:
                if cc is not None and st is not None and st.null_count == md.row_group(rg).num_rows:
                    nulls += st.null_count
                    continue  # all-null row group contributes no range
                have = False
                break
            nulls += st.null_count or 0
            mn = st.min if mn is None or st.min < mn else mn
            mx = st.max if mx is None or st.max > mx else mx
        kind, mn_i, mn_s = (None, None, None)
        mx_i = mx_s = None
        if have and mn is not None:
            n1, n2 = _norm(mn, typ), _norm(mx, typ)
            if n1 is not None and n2 is not None:
                kind, mn_i, mn_s = n1
                _, mx_i, mx_s = n2
        out.append(
            {
                "path": path,
                "column": col,
                "kind": kind,
                "num_rows": rows,
                "null_count": nulls,
                "all_null_or_empty": bool(have and mn is None),
                "min_i": mn_i, "max_i": mx_i,
                "min_s": mn_s, "max_s": mx_s,
            }
        )
    return out


def _data_files(dir_path: str) -> list[str]:
    return sorted(
        os.path.join(dir_path, f)
        for f in os.listdir(dir_path)
        if f.endswith(".parquet") and not f.startswith("_")
    )


def _fingerprint(files: list[str]) -> dict:
    return {
        "n_files": len(files),
        "total_bytes": int(sum(os.path.getsize(f) for f in files)),
    }


def build_zonemap(dir_path: str, columns: list[str]) -> str:
    """Build (or reuse) the zone-map manifest for every ``*.parquet`` data
    file in ``dir_path`` over ``columns``; returns the manifest directory.
    Idempotent via an input fingerprint; the footer sweep is a distributed
    ``map_batches`` over the file list."""
    files = _data_files(dir_path)
    if not files:
        raise FileNotFoundError(f"no parquet data files under {dir_path!r}")
    zdir = os.path.join(dir_path, ZONEMAP_DIR)
    marker = os.path.join(zdir, "_ZONEMAP.json")
    fp = {**_fingerprint(files), "columns": sorted(columns)}
    if os.path.exists(marker):
        with open(marker) as fh:
            if json.load(fh) == fp:
                return zdir
    import shutil

    tmp = zdir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(zdir, ignore_errors=True)

    def sweep(batch: pa.Table) -> pa.Table:
        rows: list[dict] = []
        for p in batch["path"].to_pylist():
            rows.extend(_file_stats(p, columns))
        return pa.table(
            {
                "path": pa.array([r["path"] for r in rows], pa.string()),
                "column": pa.array([r["column"] for r in rows], pa.string()),
                "kind": pa.array([r["kind"] for r in rows], pa.string()),
                "num_rows": pa.array([r["num_rows"] for r in rows], pa.int64()),
                "null_count": pa.array([r["null_count"] for r in rows], pa.int64()),
                "all_null_or_empty": pa.array(
                    [r["all_null_or_empty"] for r in rows], pa.bool_()
                ),
                "min_i": pa.array([r["min_i"] for r in rows], pa.int64()),
                "max_i": pa.array([r["max_i"] for r in rows], pa.int64()),
                "min_s": pa.array([r["min_s"] for r in rows], pa.string()),
                "max_s": pa.array([r["max_s"] for r in rows], pa.string()),
            }
        )

    (
        ray.data.from_items([{"path": f} for f in files])
        .map_batches(sweep, batch_format="pyarrow", batch_size=64)
        .write_parquet(tmp)
    )
    os.replace(tmp, zdir)
    with open(marker, "w") as fh:
        json.dump(fp, fh)
    return zdir


def pruned_files(
    dir_path: str, column: str, lo, hi
) -> tuple[list[str], int]:
    """(files overlapping ``[lo, hi]`` on ``column``, total data files).
    Reads only the manifest; a file with unknown statistics is kept
    (conservative), an all-null/empty file drops."""
    files = _data_files(dir_path)
    zdir = os.path.join(dir_path, ZONEMAP_DIR)
    if not os.path.isdir(zdir):
        raise FileNotFoundError(
            f"no zone map at {zdir!r} — run build_zonemap first"
        )
    man = pq.read_table(
        zdir,
        filters=[("column", "=", column)],
    )
    by_path = {}
    for i in range(man.num_rows):
        by_path[man["path"][i].as_py()] = i
    missing = [f for f in files if f not in by_path]
    if missing:
        raise ValueError(
            f"zone map is stale: {len(missing)} data files missing from the "
            "manifest (first: " + missing[0] + ") — rebuild with build_zonemap"
        )
    kinds = man["kind"].to_pylist()
    keep: list[str] = []
    for f in files:
        i = by_path[f]
        if man["all_null_or_empty"][i].as_py():
            continue  # provably disjoint from any range predicate
        kind = kinds[i]
        if kind is None:
            keep.append(f)  # unknown stats — conservative
            continue
        if kind == "int":
            mn, mx = man["min_i"][i].as_py(), man["max_i"][i].as_py()
            lo_v = _coerce_int(lo)
            hi_v = _coerce_int(hi)
        else:
            mn, mx = man["min_s"][i].as_py(), man["max_s"][i].as_py()
            lo_v, hi_v = str(lo), str(hi)
        if mx >= lo_v and mn <= hi_v:
            keep.append(f)
    return keep, len(files)


def _coerce_int(v) -> int:
    """Normalize a predicate bound to the manifest's int encoding
    (timestamps/datetime64 → epoch µs)."""
    if isinstance(v, np.datetime64):
        return int(v.astype("datetime64[us]").astype(np.int64))
    if hasattr(v, "timestamp"):  # datetime.datetime / pandas Timestamp
        return pa.scalar(v, pa.timestamp("us")).cast(pa.int64()).as_py()
    return int(v)


def scan_pruned(
    dir_path: str,
    column: str,
    lo,
    hi,
    *,
    columns: list[str] | None = None,
) -> tuple[ray.data.Dataset, int, int]:
    """Range scan ``column BETWEEN lo AND hi`` over a zone-mapped parquet
    directory: file-level pruning from the manifest, then the exact range
    pushed down into the selected files' scans (row-level semantics do not
    depend on the pruning).  Returns ``(dataset, files_read, files_total)``."""
    keep, total = pruned_files(dir_path, column, lo, hi)
    file_schema = pq.read_schema(_data_files(dir_path)[0])
    names = columns if columns is not None else file_schema.names
    if not keep:
        return (
            ray.data.from_arrow(
                pa.table(
                    {n: pa.array([], file_schema.field(n).type) for n in names}
                )
            ),
            0,
            total,
        )
    # the residual range runs as an explicit vectorized map stage rather
    # than read_parquet(filter=...): Ray 2.49 emits a schema-LESS
    # zero-column block when a pushed-down filter empties a file, and
    # map_batches never even sees those blocks, so an all-empty result
    # would lose its schema — a typed batch.filter() cannot
    col_type = file_schema.field(column).type
    lo_s, hi_s = pa.scalar(lo, col_type), pa.scalar(hi, col_type)
    read_cols = columns
    if columns is not None and column not in columns:
        read_cols = [*columns, column]

    def residual(batch: pa.Table) -> pa.Table:
        col = batch[column]
        mask = pc.and_kleene(
            pc.greater_equal(col, lo_s), pc.less_equal(col, hi_s)
        )
        out = batch.filter(pc.fill_null(mask, False))
        return out.select(names) if read_cols is not columns else out

    ds = ray.data.read_parquet(keep, columns=read_cols).map_batches(
        residual, batch_format="pyarrow"
    )
    return ds, len(keep), total
