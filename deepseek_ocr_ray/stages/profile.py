"""Distributed table profiler — per-column statistics in two passes.

The data-engineering "what is in this table" primitive: row count, null
count, EXACT distinct count, and min/max per column, computed without ever
materializing a column on the driver:

- **stats pass**: each block reduces to ≤ |columns| partial rows (count,
  null count, typed min/max via ``pc.min_max``) — combined through a
  |columns|-key groupby (tiny);
- **distinct pass**: each block emits its per-column DISTINCT canonical
  values (``pc.unique``), hash-bucketed on (column, value) so one keyed
  exchange carries only per-block-distinct rows; each bucket re-distincts
  in C++ and emits per-column partial counts, summed in a tiny final
  groupby.  Exchange volume is Σ per-block distinct values — the exact
  analog of the map-combined dedup plan, never an all-rows shuffle.

min/max combine on the TYPED channel (an integer column's min is numeric,
not lexicographic) and render to strings only at the end, matching SQL's
``CAST(min(col) AS VARCHAR)``.  Supported column families: integers and
strings (the driver-gate surface); floats/timestamps need a rendering
contract first and are rejected loudly.  No reference counterpart.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..hashing import hash64_columns


def profile_table(
    ds: ray.data.Dataset,
    columns: list[str],
    *,
    n_buckets: int = 64,
) -> pa.Table:
    """Profile ``columns`` of ``ds`` → one pa.Table row per column:
    ``(col, n, n_nulls, n_distinct, min_val, max_val)`` with min/max
    rendered as strings (integer rendering identical to SQL VARCHAR
    casts).  Returns a small in-memory table (|columns| rows)."""
    schema = ds.schema().base_schema
    types = {}
    for c in columns:
        t = schema.field(c).type
        if not (pa.types.is_integer(t) or pa.types.is_string(t)
                or pa.types.is_large_string(t)):
            raise ValueError(
                f"profile_table: column {c!r} has type {t} — only integer "
                "and string columns have a defined min/max rendering here"
            )
        types[c] = t
    ds = ds.select_columns(columns)

    def stats_partial(batch: pa.Table) -> pa.Table:
        rows = {
            "col": [], "n": [], "n_nulls": [],
            "min_i": [], "max_i": [], "min_s": [], "max_s": [],
        }
        for c in columns:
            arr = batch[c]
            rows["col"].append(c)
            rows["n"].append(len(arr))
            rows["n_nulls"].append(arr.null_count)
            mm = pc.min_max(arr)
            mn, mx = mm["min"].as_py(), mm["max"].as_py()
            if pa.types.is_integer(types[c]):
                rows["min_i"].append(mn)
                rows["max_i"].append(mx)
                rows["min_s"].append(None)
                rows["max_s"].append(None)
            else:
                rows["min_i"].append(None)
                rows["max_i"].append(None)
                rows["min_s"].append(mn)
                rows["max_s"].append(mx)
        return pa.table(
            {
                "col": pa.array(rows["col"], pa.string()),
                "n": pa.array(rows["n"], pa.int64()),
                "n_nulls": pa.array(rows["n_nulls"], pa.int64()),
                "min_i": pa.array(rows["min_i"], pa.int64()),
                "max_i": pa.array(rows["max_i"], pa.int64()),
                "min_s": pa.array(rows["min_s"], pa.string()),
                "max_s": pa.array(rows["max_s"], pa.string()),
            }
        )

    def stats_combine(group: pa.Table) -> pa.Table:
        g = group.group_by("col").aggregate(
            [
                ("n", "sum"), ("n_nulls", "sum"),
                ("min_i", "min"), ("max_i", "max"),
                ("min_s", "min"), ("max_s", "max"),
            ]
        )
        return pa.table(
            {
                "col": g["col"],
                "n": g["n_sum"],
                "n_nulls": g["n_nulls_sum"],
                "min_i": g["min_i_min"],
                "max_i": g["max_i_max"],
                "min_s": g["min_s_min"],
                "max_s": g["max_s_max"],
            }
        )

    stats_rows = (
        ds.map_batches(stats_partial, batch_format="pyarrow")
        .groupby("col")
        .map_groups(stats_combine, batch_format="pyarrow")
        .take_all()
    )  # bounded: one row per column

    def distinct_partial(batch: pa.Table) -> pa.Table:
        outs = []
        for c in columns:
            vals = pc.unique(batch[c].drop_null().combine_chunks())
            if pa.types.is_integer(types[c]):
                vals = pc.cast(vals, pa.string())
            outs.append(
                pa.table(
                    {
                        "col": pa.array([c] * len(vals), pa.string()),
                        "val": vals.cast(pa.string()),
                    }
                )
            )
        t = pa.concat_tables(outs)
        bucket = hash64_columns(t, ["col", "val"]) % np.uint64(n_buckets)
        return t.append_column(
            "bucket", pa.array(bucket.astype(np.int64), pa.int64())
        )

    def distinct_count(group: pa.Table) -> pa.Table:
        u = group.group_by(["col", "val"]).aggregate([])
        g = u.group_by("col").aggregate([([], "count_all")])
        return pa.table(
            {
                "col": g["col"],
                "nd": g["count_all"].cast(pa.int64()),
            }
        )

    nd_rows = (
        ds.map_batches(distinct_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(distinct_count, batch_format="pyarrow")
        .groupby("col")
        .sum("nd")
        .take_all()
    )  # bounded: one row per column
    nd = {r["col"]: r["sum(nd)"] for r in nd_rows}

    def render(r) -> tuple[str | None, str | None]:
        if pa.types.is_integer(types[r["col"]]):
            mn, mx = r["min_i"], r["max_i"]
            return (
                None if mn is None else str(mn),
                None if mx is None else str(mx),
            )
        return r["min_s"], r["max_s"]

    stats_rows.sort(key=lambda r: r["col"])
    out = {
        "col": [], "n": [], "n_nulls": [], "n_distinct": [],
        "min_val": [], "max_val": [],
    }
    for r in stats_rows:
        mn, mx = render(r)
        out["col"].append(r["col"])
        out["n"].append(r["n"])
        out["n_nulls"].append(r["n_nulls"])
        out["n_distinct"].append(nd.get(r["col"], 0))
        out["min_val"].append(mn)
        out["max_val"].append(mx)
    return pa.table(
        {
            "col": pa.array(out["col"], pa.string()),
            "n": pa.array(out["n"], pa.int64()),
            "n_nulls": pa.array(out["n_nulls"], pa.int64()),
            "n_distinct": pa.array(out["n_distinct"], pa.int64()),
            "min_val": pa.array(out["min_val"], pa.string()),
            "max_val": pa.array(out["max_val"], pa.string()),
        }
    )
