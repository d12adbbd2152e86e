"""Coarse-bucket exact aggregation — the engine's fast path for
high-cardinality GROUP BY.

Ray's built-in ``groupby().aggregate(Sum/Count/...)`` runs a Python
accumulator per key (measured ~3.7 s per 150k keys in this sandbox) — fine
for low-cardinality groups, painful for per-(user, day)-style keys.  This
operator keeps every interior in Arrow C++:

1. map side: per-block ``pa.Table.group_by`` combine (one partial row per
   key per block) + a combined-key coarse bucket column;
2. ONE keyed exchange on the bucket (64 coarse groups, so the sort-based
   shuffle moves small int keys);
3. per-bucket C++ ``group_by`` finalize.

Exact for SUM / COUNT (partial counts re-enter as sums), associative and
order-independent, so results are parallelism-invariant by construction.
No reference counterpart (the reference has no aggregation surface).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..hashing import hash64_columns


def bucket_groupby_sum(
    ds: ray.data.Dataset,
    keys: list[str],
    sum_cols: list[str],
    *,
    count_col: str | None = None,
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """Exact ``SELECT keys, SUM(c)..., COUNT(*) GROUP BY keys`` via
    per-block C++ combine + one coarse-bucket exchange + C++ finalize.

    Output columns: ``keys + sum_cols (+ count_col)``; sums keep their
    input integer types widened to int64, the count is int64.
    """
    if not sum_cols and count_col is None:
        raise ValueError("nothing to aggregate")

    def partial(batch: pa.Table) -> pa.Table:
        aggs = [(c, "sum") for c in sum_cols]
        if count_col is not None:
            aggs.append(([], "count_all"))
        g = batch.group_by(keys).aggregate(aggs)
        cols = {k: g[k] for k in keys}
        for c in sum_cols:
            cols[c] = g[f"{c}_sum"].cast(pa.int64())
        if count_col is not None:
            cols[count_col] = g["count_all"].cast(pa.int64())
        t = pa.table(cols)
        bucket = hash64_columns(t, keys) % np.uint64(n_buckets)
        return t.append_column(
            "bucket", pa.array(bucket.astype(np.int64), pa.int64())
        )

    value_cols = list(sum_cols) + ([count_col] if count_col else [])

    def finalize(group: pa.Table) -> pa.Table:
        g = group.group_by(keys).aggregate([(c, "sum") for c in value_cols])
        cols = {k: g[k] for k in keys}
        for c in value_cols:
            cols[c] = g[f"{c}_sum"].cast(pa.int64())
        return pa.table(cols)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(finalize, batch_format="pyarrow")
    )
