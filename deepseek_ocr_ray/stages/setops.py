"""Relational set operations — distributed ``EXCEPT`` / ``INTERSECT`` /
``UNION`` with DISTINCT semantics, every interior in Arrow C++.

SQL's bag-free set ops reduce to per-key presence logic: after projecting
both inputs to the key columns and deduplicating, a key survives

* ``except``     iff it appears on the left and not the right,
* ``intersect``  iff it appears on both sides,
* ``union``      unconditionally (dedup across both inputs).

Plan (the engine's standard coarse-bucket exchange, cf. ``stages/agg.py``):

1. map side, each input independently: project to ``keys``, per-block
   C++ distinct (``pa.Table.group_by(keys)``), tag a constant ``side``
   column (0 = left, 1 = right), attach a 64-way hash bucket over the key
   tuple — so the exchange carries one row per (block, distinct key), not
   per input row;
2. ONE keyed exchange: ``left.union(right)`` (lazy concatenation, no
   shuffle of its own) then ``groupby("bucket")``;
3. per-bucket C++ finalize: ``group_by(keys).aggregate(min/max(side))``
   — left-only keys have ``min = max = 0``, right-only ``min = max = 1``,
   both-sides ``min = 0, max = 1`` — one vectorized mask picks survivors.

Results are sets, so they are parallelism-invariant by construction.
No reference counterpart (the reference has no relational surface); the
capability is table-stakes for corpus curation (held-out id subtraction,
split-membership checks).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..hashing import hash64_columns

HOW = ("except", "intersect", "union")


def set_op(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    keys: list[str],
    how: str = "except",
    *,
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """``SELECT keys FROM left  <EXCEPT|INTERSECT|UNION>  SELECT keys
    FROM right`` (SQL DISTINCT-set semantics).  Output columns = ``keys``.

    Both inputs must expose every column in ``keys``; they are projected
    and deduplicated map-side, so the exchange volume is bounded by the
    number of distinct keys per block, independent of input row counts.
    """
    if how not in HOW:
        raise ValueError(f"set_op: how={how!r} must be one of {HOW}")
    if not keys:
        raise ValueError("set_op: keys must be non-empty")
    # the exchange concatenates blocks of both sides — pin the right side's
    # key types to the left's so an int32-vs-int64 mismatch casts (or fails
    # LOUDLY here) instead of corrupting the union downstream.  A computed
    # dataset that turns out empty has no derivable schema (Dataset.schema()
    # is None) — then there is nothing to pin: no rows will reach the
    # exchange from that side, so skip the cast rather than crash.
    l_sch = left.schema()
    key_schema = (
        pa.schema([(k, l_sch.base_schema.field(k).type) for k in keys])
        if l_sch is not None
        else None
    )

    def _tag(side: int):
        def partial(batch: pa.Table) -> pa.Table:
            t = batch.group_by(keys).aggregate([])
            t = t.select(keys)
            if key_schema is not None:
                t = t.cast(key_schema)
            bucket = hash64_columns(t, keys) % np.uint64(n_buckets)
            return t.append_column(
                "side", pa.array(np.full(t.num_rows, side, np.int64))
            ).append_column(
                "bucket", pa.array(bucket.astype(np.int64), pa.int64())
            )

        return partial

    def finalize(group: pa.Table) -> pa.Table:
        g = group.group_by(keys).aggregate([("side", "min"), ("side", "max")])
        if how == "union":  # every distinct key survives — no mask needed
            return g.select(keys)
        lo, hi = g["side_min"], g["side_max"]
        if how == "except":
            mask = pc.equal(hi, 0)  # never on the right
        else:  # intersect
            mask = pc.and_(pc.equal(lo, 0), pc.equal(hi, 1))
        return g.filter(mask).select(keys)

    tagged = left.map_batches(_tag(0), batch_format="pyarrow").union(
        right.map_batches(_tag(1), batch_format="pyarrow")
    )
    return tagged.groupby("bucket").map_groups(finalize, batch_format="pyarrow")
