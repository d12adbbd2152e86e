"""Categorical feature encoding — sorted-vocabulary dictionary encode.

The feature-engineering twin of ``agg.group_standardize``: map each string
column to its dense integer index in the column's SORTED distinct
vocabulary (the deterministic equivalent of sklearn's OrdinalEncoder /
a feature-store dictionary encode).  Sorted order makes the index a pure
function of the value set — independent of row order, block layout and
parallelism — and matches SQL's
``ROW_NUMBER() OVER (ORDER BY v) - 1`` over ``SELECT DISTINCT``
(UTF-8 byte order == code-point order for valid UTF-8, so Arrow, numpy
and DuckDB binary collation all agree).

Plan — two streaming scans, no row-level exchange:

1. vocab pass: every block reduces to its per-column distinct values
   (``pc.unique`` — C++), so the collected volume is
   O(blocks × per-block distinct), bounded by blocks × vocab; the driver
   de-duplicates and sorts once per column.  A vocabulary past
   ``max_vocab`` raises loudly — unbounded domains want a hash feature
   (``curation.dsir_scores``-style) or a join encode, not a broadcast;
2. encode pass: the sorted vocab arrays broadcast once via ``ray.put``
   and each block probes them with ``pc.index_in`` (C++ hash probe).
   NULL input stays NULL index.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

__all__ = ["categorical_encode"]


def categorical_encode(
    ds: ray.data.Dataset,
    cols: list[str],
    *,
    suffix: str = "_idx",
    max_vocab: int = 2_000_000,
) -> ray.data.Dataset:
    """Append ``<col><suffix>`` int64 dense-rank columns for each string
    column in ``cols`` (index = position in the column's sorted distinct
    non-null vocabulary; NULL in → NULL index out)."""
    import ray as _ray

    schema = ds.schema().base_schema
    if not isinstance(schema, pa.Schema):
        raise ValueError("categorical_encode requires an Arrow-block dataset")
    for c in cols:
        if c not in schema.names:
            raise ValueError(f"column {c!r} not in the input")
        t = schema.field(c).type
        if not (pa.types.is_string(t) or pa.types.is_large_string(t)):
            raise ValueError(
                f"column {c!r} must be string (got {t}) — integers are "
                "already ordinal"
            )
        if f"{c}{suffix}" in schema.names:
            raise ValueError(f"output column {c}{suffix!r} already exists")

    def blk_vocab(batch: pa.Table) -> pa.Table:
        ids, vals = [], []
        for i, c in enumerate(cols):
            u = pc.drop_null(pc.unique(batch[c].combine_chunks()))
            ids.append(pa.array([i] * len(u), pa.int32()))
            vals.append(u.cast(pa.large_string()))
        return pa.table(
            {
                "_col": pa.concat_arrays(ids),
                "_val": pa.concat_arrays([v for v in vals]),
            }
        )

    parts = _ray.get(
        ds.map_batches(blk_vocab, batch_format="pyarrow").to_arrow_refs()
    )
    merged = pa.concat_tables(parts, promote_options="default")
    vocabs: list[pa.Array] = []
    for i, c in enumerate(cols):
        vals = merged.filter(pc.equal(merged["_col"], i))["_val"]
        vocab = pc.unique(vals.combine_chunks())
        if len(vocab) > max_vocab:
            raise ValueError(
                f"categorical_encode: column {c!r} has {len(vocab)} distinct "
                f"values (> max_vocab={max_vocab}) — use a hashed feature or "
                "a join encode for unbounded domains"
            )
        vocabs.append(vocab.take(pc.array_sort_indices(vocab)))
    vocab_ref = _ray.put(vocabs)

    def encode(batch: pa.Table) -> pa.Table:
        vs = _ray.get(vocab_ref)
        out = batch
        for i, c in enumerate(cols):
            idx = pc.index_in(
                batch[c].cast(pa.large_string()), value_set=vs[i]
            ).cast(pa.int64())
            out = out.append_column(f"{c}{suffix}", idx)
        return out

    return ds.map_batches(encode, batch_format="pyarrow")
