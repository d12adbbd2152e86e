"""SCD Type-2 dimension build — versioned history from a keyed change log.

The temporal member of the lakehouse family (``merge.py`` applies a change
set, ``diff.py`` recovers one, ``compact.py`` re-packs the files): given a
TIMESTAMPED change log ``(key, ts, op ∈ {'upsert','delete'}, value…)``,
emit the classic slowly-changing-dimension type-2 table — one row per
version interval ``(key, value…, valid_from, valid_to, is_current)`` where
``valid_to`` is the next change's timestamp (NULL while the version is
still open) and a ``'delete'`` closes the open interval without opening a
new one.

Semantics (ANSI window-function equivalent, the oracle mirrors it):

* each key's history orders by ``ts``; a duplicate ``(key, ts)`` raises
  loudly — two changes at the same instant have no defined order;
* ``suppress_unchanged=True`` (default) drops an upsert whose value
  columns are ``IS NOT DISTINCT FROM``-equal to the immediately preceding
  event when that event is also an upsert.  Comparing against the
  IMMEDIATE predecessor is sufficient: value equality is transitive, so a
  chain of equal upserts collapses onto its surviving head, and a delete
  in between (which resets state) blocks suppression by the
  ``prev-op = upsert`` condition.  This is exactly the SQL
  ``LAG(...) OVER (PARTITION BY key ORDER BY ts)`` filter;
* deletes and delete-first / consecutive-delete sequences emit nothing
  themselves — a delete only matters as the closing timestamp of the
  version before it.

Plan — ONE keyed exchange, full-width rows (the output IS the versioned
values, so value columns must move once; there is no reduced-pair trick
like ``diff``'s because every surviving row lands in the result):

1. every block validates ops, casts the key to int64 and shadows the
   timestamp as int64 (timestamps sort as epoch micros), and tags a
   splitmix coarse bucket of the key — volume-sized via
   ``assembly_buckets_for_bytes`` over the metadata byte estimate so no
   group outgrows a task heap at any corpus size;
2. the per-bucket walk is a single ``np.lexsort`` over (key, ts) plus
   shifted-array comparisons — suppression, the within-key lead, and the
   upsert emission mask are all vectorized; no Python loop touches rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..hashing import splitmix_bucket

__all__ = ["scd2_build"]

_OPS = ("upsert", "delete")


def _is_ts_sortable(typ: pa.DataType) -> bool:
    return pa.types.is_integer(typ) or pa.types.is_timestamp(typ)


def scd2_build(
    changes: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    op_col: str = "op",
    value_cols: list[str] | None = None,
    suppress_unchanged: bool = True,
    n_buckets: int | None = None,
) -> ray.data.Dataset:
    """Build the SCD type-2 version table from a keyed change log.

    Returns a Dataset with columns ``key_col`` (int64), the value columns
    (input types), ``valid_from`` / ``valid_to`` (the input timestamp
    type; ``valid_to`` NULL for open versions) and ``is_current`` (bool).
    """
    schema = changes.schema().base_schema
    names = list(schema.names)
    for c in (key_col, ts_col, op_col):
        if c not in names:
            raise ValueError(f"change log is missing required column {c!r}")
    if value_cols is None:
        value_cols = [c for c in names if c not in (key_col, ts_col, op_col)]
    else:
        missing = [c for c in value_cols if c not in names]
        if missing:
            raise ValueError(f"value columns {missing} not in the change log")
    key_typ = schema.field(key_col).type
    if not pa.types.is_integer(key_typ):
        raise ValueError(
            f"key column {key_col!r} must be integer (got {key_typ}) — "
            "hash or dictionary-encode string keys per the engine convention"
        )
    ts_typ = schema.field(ts_col).type
    if not _is_ts_sortable(ts_typ):
        raise ValueError(
            f"timestamp column {ts_col!r} must be integer or timestamp "
            f"(got {ts_typ})"
        )
    for reserved in ("valid_from", "valid_to", "is_current", "_tsi", "_opc", "_b"):
        if reserved in value_cols:
            raise ValueError(f"value column name {reserved!r} is reserved")

    from ..cluster import assembly_buckets_for_bytes, dataset_size_estimate

    if n_buckets is None:
        n_buckets = assembly_buckets_for_bytes(dataset_size_estimate(changes))

    val_types = {c: schema.field(c).type for c in value_cols}
    empty = pa.table(
        {
            key_col: pa.array([], pa.int64()),
            **{c: pa.array([], val_types[c]) for c in value_cols},
            "valid_from": pa.array([], ts_typ),
            "valid_to": pa.array([], ts_typ),
            "is_current": pa.array([], pa.bool_()),
        }
    )

    nb = int(n_buckets)

    def tag(batch: pa.Table) -> pa.Table:
        op = batch[op_col]
        is_up = pc.equal(op, "upsert")
        is_de = pc.equal(op, "delete")
        known = pc.fill_null(pc.or_(is_up, is_de), False)
        if not pc.all(known).as_py() and batch.num_rows:
            bad = pc.filter(op, pc.invert(known))
            raise ValueError(
                f"unknown op value {bad[0].as_py()!r} — ops must be one of "
                f"{_OPS}"
            )
        keys = batch[key_col].cast(pa.int64())
        kv = keys.to_numpy(zero_copy_only=False)
        opc = np.where(
            pc.fill_null(is_de, False).to_numpy(zero_copy_only=False), 1, 0
        ).astype(np.int8)
        ts = batch[ts_col]
        if pc.count(ts, mode="only_null").as_py():
            raise ValueError(f"timestamp column {ts_col!r} contains nulls")
        return pa.table(
            {
                key_col: keys,
                "_tsi": ts.cast(pa.int64()),
                "_opc": pa.array(opc, pa.int8()),
                ts_col: ts,
                **{c: batch[c] for c in value_cols},
                "_b": pa.array(splitmix_bucket(kv, nb), pa.int64()),
            }
        )

    tagged = changes.map_batches(tag, batch_format="pyarrow")

    def build_versions(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or key_col not in group.column_names:
            return empty
        keys = group[key_col].to_numpy(zero_copy_only=False)
        tsi = group["_tsi"].to_numpy(zero_copy_only=False)
        opc = group["_opc"].to_numpy(zero_copy_only=False)
        order = np.lexsort((tsi, keys))
        keys, tsi, opc = keys[order], tsi[order], opc[order]
        n = keys.size
        same_prev = np.zeros(n, bool)
        if n > 1:
            same_prev[1:] = keys[1:] == keys[:-1]
            dup = same_prev[1:] & (tsi[1:] == tsi[:-1])
            if dup.any():
                i = int(np.flatnonzero(dup)[0]) + 1
                raise ValueError(
                    f"duplicate (key, ts) in the change log: key "
                    f"{int(keys[i])} at ts {int(tsi[i])} — two changes at "
                    "the same instant have no defined order"
                )
        take = pa.array(order.astype(np.int64))
        vals = {
            c: group[c].take(take).combine_chunks() for c in value_cols
        }
        ts_sorted = group[ts_col].take(take).combine_chunks()

        suppress = np.zeros(n, bool)
        if suppress_unchanged and n > 1:
            equal_prev = np.ones(n - 1, bool)
            for c in value_cols:
                a = vals[c].slice(1)
                b = vals[c].slice(0, n - 1)
                va = np.asarray(a.is_valid())
                vb = np.asarray(b.is_valid())
                neq = pc.fill_null(pc.not_equal(a, b), False).to_numpy(
                    zero_copy_only=False
                )
                # IS DISTINCT FROM: null-ness differs, or both valid and !=
                equal_prev &= ~((va != vb) | (va & vb & neq))
            suppress[1:] = (
                same_prev[1:] & (opc[1:] == 0) & (opc[:-1] == 0) & equal_prev
            )

        kept = np.flatnonzero(~suppress)
        m = kept.size
        if m == 0:
            return empty
        k_keys = keys[kept]
        k_opc = opc[kept]
        # within-key lead over the kept sequence: the next kept event's
        # index into the SORTED arrays, or -1 at each key's chain end
        next_idx = np.full(m, -1, np.int64)
        if m > 1:
            nxt_same = k_keys[:-1] == k_keys[1:]
            next_idx[:-1][nxt_same] = kept[1:][nxt_same]

        emit = k_opc == 0
        if not emit.any():
            return empty
        ei = kept[emit]
        nxt = next_idx[emit]
        has_next = nxt >= 0
        take_emit = pa.array(ei.astype(np.int64))
        valid_to = ts_sorted.take(
            pa.array(np.where(has_next, nxt, 0), mask=~has_next)
        )
        return pa.table(
            {
                key_col: pa.array(keys[ei], pa.int64()),
                **{c: vals[c].take(take_emit) for c in value_cols},
                "valid_from": ts_sorted.take(take_emit),
                "valid_to": valid_to,
                "is_current": pa.array(~has_next),
            }
        )

    return tagged.groupby("_b").map_groups(build_versions, batch_format="pyarrow")
