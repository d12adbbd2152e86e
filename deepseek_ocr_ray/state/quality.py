"""Data-quality constraint checks — the Deequ / dbt-test shape.

A release pipeline asserts its tables before shipping: primary keys are
unique, foreign keys resolve, required columns are non-null, measures sit
in their accepted ranges.  Each check here is a distributed count of
VIOLATIONS (0 = passed) with SQL-identical semantics, and
:func:`quality_audit` folds any mix of them into one
``(check_name, violations, passed)`` table — the data card a 100-TB drop
attaches.

Scale shapes (none materializes the fact table):

* ``not_null`` / ``accepted_range`` — one streaming scan; every block
  emits ONE count row; the driver sums (blocks-bounded).  Range
  violations follow SQL three-valued logic: a NULL value is neither
  below nor above the range, so it never counts (pair with ``not_null``
  for that).
* ``unique`` — per-key counts reduce per block through the C++ bucket
  aggregate (the exchange carries DISTINCT keys only), then each reduced
  block counts keys with n > 1 and the driver sums.
* ``foreign_key`` — the parent's distinct keys collect once
  (dimension-side convention, loud ``max_parent_keys`` cap naming the
  anti-join escalation) and broadcast sorted via ``ray.put``; child
  blocks probe with one ``searchsorted`` and emit ONE miss-count row.
  NULL child keys are skipped, per SQL FK semantics.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..cluster import arrow_block_refs

__all__ = [
    "check_not_null",
    "check_range",
    "check_unique",
    "check_foreign_key",
    "quality_audit",
]


def _sum_block_counts(ds: ray.data.Dataset, count_fn) -> int:
    """Run ``count_fn(batch) -> int`` over every block, sum on the driver.
    The collected volume is one int64 row per block."""
    import ray as _ray

    def emit(batch: pa.Table) -> pa.Table:
        return pa.table({"_c": pa.array([int(count_fn(batch))], pa.int64())})

    parts = _ray.get(
        arrow_block_refs(ds.map_batches(emit, batch_format="pyarrow"))
    )
    total = 0
    for t in parts:
        if t.num_rows and "_c" in t.column_names:
            total += int(pc.sum(t["_c"]).as_py() or 0)
    return total


def check_not_null(ds: ray.data.Dataset, col: str) -> int:
    """Rows where ``col`` IS NULL."""
    return _sum_block_counts(
        ds.select_columns([col]), lambda b: b[col].null_count
    )


def check_range(ds: ray.data.Dataset, col: str, lo, hi) -> int:
    """Rows where ``col < lo OR col > hi`` — NULLs never count (SQL
    three-valued logic; assert them with :func:`check_not_null`)."""

    def count(batch: pa.Table) -> int:
        c = batch[col]
        bad = pc.or_(pc.less(c, lo), pc.greater(c, hi))
        return pc.sum(pc.fill_null(bad, False).cast(pa.int64())).as_py() or 0

    return _sum_block_counts(ds.select_columns([col]), count)


def check_unique(
    ds: ray.data.Dataset, keys: list[str], *, n_buckets: int = 64
) -> int:
    """Distinct key tuples that appear MORE than once."""
    from ..stages.agg import bucket_groupby_agg

    counts = bucket_groupby_agg(
        ds.select_columns(list(keys)),
        list(keys),
        [(None, "count", "_n")],
        n_buckets=n_buckets,
    )
    return _sum_block_counts(
        counts,
        lambda b: pc.sum(
            pc.greater(b["_n"], 1).cast(pa.int64())
        ).as_py()
        or 0,
    )


def check_foreign_key(
    child: ray.data.Dataset,
    col: str,
    parent: ray.data.Dataset,
    parent_col: str,
    *,
    max_parent_keys: int = 50_000_000,
) -> int:
    """Child ROWS whose non-null key has no match in the parent column."""
    import ray as _ray

    def blk_keys(batch: pa.Table) -> pa.Table:
        u = pc.drop_null(pc.unique(batch[parent_col].combine_chunks()))
        return pa.table({"_k": u.cast(pa.int64())})

    parts = _ray.get(
        arrow_block_refs(
            parent.select_columns([parent_col])
            .map_batches(blk_keys, batch_format="pyarrow")
        )
    )
    # an all-empty parent can surface schema-less zero-row blocks that
    # bypass map_batches (Ray 2.49 convention — see state/zonemap.py)
    parts = [t for t in parts if "_k" in t.column_names]
    if parts:
        merged = pa.concat_tables(parts, promote_options="default")
        pkeys = np.unique(merged["_k"].to_numpy(zero_copy_only=False))
    else:
        pkeys = np.array([], np.int64)
    if pkeys.size > max_parent_keys:
        raise ValueError(
            f"check_foreign_key: parent side has {pkeys.size} distinct keys "
            f"(> max_parent_keys={max_parent_keys}) — use a bucketed "
            "anti-join for fact-to-fact referential checks"
        )
    pref = _ray.put(pkeys)

    def count(batch: pa.Table) -> int:
        pk = _ray.get(pref)
        c = batch[col].cast(pa.int64())
        valid = np.asarray(c.is_valid())
        v = c.to_numpy(zero_copy_only=False)
        v = np.where(valid, v, 0).astype(np.int64)
        if pk.size == 0:
            return int(valid.sum())
        pos = np.searchsorted(pk, v)
        np.clip(pos, 0, pk.size - 1, out=pos)
        miss = valid & (pk[pos] != v)
        return int(miss.sum())

    return _sum_block_counts(child.select_columns([col]), count)


def quality_audit(
    checks: list[tuple[str, object]],
) -> pa.Table:
    """Run named checks and fold into one (check_name, violations, passed)
    table.  ``checks`` is ``[(name, thunk)]`` where each thunk returns the
    violation count (the ``check_*`` functions above, partially applied)."""
    names, counts = [], []
    seen = set()
    for name, thunk in checks:
        if name in seen:
            raise ValueError(f"duplicate check name {name!r}")
        seen.add(name)
        names.append(name)
        counts.append(int(thunk()))
    return pa.table(
        {
            "check_name": pa.array(names, pa.string()),
            "violations": pa.array(counts, pa.int64()),
            "passed": pa.array([c == 0 for c in counts], pa.bool_()),
        }
    )
