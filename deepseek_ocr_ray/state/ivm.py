"""Incremental aggregate view maintenance — refresh a keyed SUM/COUNT
materialized view from a CDC batch WITHOUT rescanning the base table.

The lakehouse family's fourth member (``merge`` applies row changes,
``diff`` recovers them, ``scd`` keeps the history — this keeps an
AGGREGATE current): given the view ``(key, n, Σv…)`` and a change stream
``(op ∈ {'insert','delete'}, key, v…)`` (an update is delete-old +
insert-new, the classic CDC decomposition), produce the updated view.
SUM and COUNT are self-maintainable aggregates — the delta is itself a
sum — which is exactly why this works without the base; MIN/MAX are not
(a deleted max needs the base) and are rejected by construction.

Semantics:

* per-key delta: ``dn = #inserts − #deletes``, ``dv = Σ(+v | −v)``;
* merged ``n = n₀ + dn`` must be ≥ 0 — a key driven negative means the
  change stream deletes rows the view never counted: raise loudly;
* a key whose merged n = 0 leaves the view (its sums are exactly 0 by
  construction if the stream is consistent — also checked);
* NULL values in a summed column are rejected (a CDC row must carry its
  full image; SQL's null-skipping SUM would make delete-then-insert
  non-cancelling).

Plan — both sides already reduced, ONE keyed exchange:

1. the change stream folds map-side to per-key (dn, dv…) partials via
   the C++ bucket aggregate (sign applied at the derive), so the
   exchange carries distinct CHANGED keys only — at 100 TB the view and
   the delta are both group-domain-sized, and base FACTS never move;
2. view rows (side 0) and delta rows (side 1) union through one
   volume-sized coarse-bucket exchange on the splitmix key hash;
3. the per-bucket walk is two sorts + one searchsorted alignment —
   vectorized adds, no per-key Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..hashing import splitmix_bucket

__all__ = ["incremental_agg"]


def incremental_agg(
    view: ray.data.Dataset,
    changes: ray.data.Dataset,
    *,
    key_col: str,
    count_col: str,
    sum_cols: list[str],
    op_col: str = "op",
    n_buckets: int | None = None,
) -> ray.data.Dataset:
    """Updated ``(key, count, sums…)`` view.  ``view`` columns must be
    exactly ``[key_col, count_col, *sum_cols]`` (int64); ``changes``
    must carry ``[op_col, key_col, *sum_cols]``."""
    vs = view.schema().base_schema
    want = [key_col, count_col, *sum_cols]
    if sorted(vs.names) != sorted(want):
        raise ValueError(
            f"view columns {sorted(vs.names)} != expected {sorted(want)}"
        )
    cs = changes.schema().base_schema
    for c in (op_col, key_col, *sum_cols):
        if c not in cs.names:
            raise ValueError(f"change stream is missing column {c!r}")
    for name, sch in (("view", vs), ("changes", cs)):
        for c in [key_col, *sum_cols] + ([count_col] if name == "view" else []):
            if not pa.types.is_integer(sch.field(c).type):
                raise ValueError(
                    f"{name} column {c!r} must be integer (got "
                    f"{sch.field(c).type}) — quantize per the engine "
                    "convention"
                )

    from ..cluster import assembly_buckets_for_bytes, dataset_size_estimate
    from ..stages.agg import bucket_groupby_agg

    def sign_derive(batch: pa.Table) -> pa.Table:
        op = batch[op_col]
        is_ins = pc.equal(op, "insert")
        is_del = pc.equal(op, "delete")
        known = pc.fill_null(pc.or_(is_ins, is_del), False)
        if batch.num_rows and not pc.all(known).as_py():
            bad = pc.filter(op, pc.invert(known))
            raise ValueError(
                f"unknown op {bad[0].as_py()!r} — ops are 'insert'/'delete' "
                "(an update is delete-old + insert-new)"
            )
        sign = np.where(
            pc.fill_null(is_del, False).to_numpy(zero_copy_only=False),
            -1,
            1,
        ).astype(np.int64)
        cols = {
            key_col: batch[key_col].cast(pa.int64()),
            "_dn": pa.array(sign, pa.int64()),
        }
        for c in sum_cols:
            col = batch[c]
            if col.null_count:
                raise ValueError(
                    f"change stream column {c!r} contains nulls — a CDC "
                    "row must carry its full image"
                )
            v = col.cast(pa.int64()).to_numpy(zero_copy_only=False)
            cols[f"_d_{c}"] = pa.array(sign * v, pa.int64())
        return pa.table(cols)

    deltas = bucket_groupby_agg(
        changes.map_batches(sign_derive, batch_format="pyarrow"),
        [key_col],
        [("_dn", "sum", "_dn")]
        + [(f"_d_{c}", "sum", f"_d_{c}") for c in sum_cols],
    )

    if n_buckets is None:
        n_buckets = assembly_buckets_for_bytes(
            (dataset_size_estimate(view) or 0)
            + (dataset_size_estimate(changes) or 0)
        )
    nb = int(n_buckets)
    ncols = 1 + len(sum_cols)  # dn + per-sum deltas

    def tag_view(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].cast(pa.int64())
        kv = keys.to_numpy(zero_copy_only=False)
        return pa.table(
            {
                key_col: keys,
                "_c0": batch[count_col].cast(pa.int64()),
                **{
                    f"_c{i + 1}": batch[c].cast(pa.int64())
                    for i, c in enumerate(sum_cols)
                },
                "_side": pa.array(np.zeros(len(kv), np.int8), pa.int8()),
                "_b": pa.array(splitmix_bucket(kv, nb), pa.int64()),
            }
        )

    def tag_delta(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].cast(pa.int64())
        kv = keys.to_numpy(zero_copy_only=False)
        return pa.table(
            {
                key_col: keys,
                "_c0": batch["_dn"].cast(pa.int64()),
                **{
                    f"_c{i + 1}": batch[f"_d_{c}"].cast(pa.int64())
                    for i, c in enumerate(sum_cols)
                },
                "_side": pa.array(np.ones(len(kv), np.int8), pa.int8()),
                "_b": pa.array(splitmix_bucket(kv, nb), pa.int64()),
            }
        )

    tagged = view.map_batches(tag_view, batch_format="pyarrow").union(
        deltas.map_batches(tag_delta, batch_format="pyarrow")
    )

    empty = pa.table(
        {
            key_col: pa.array([], pa.int64()),
            count_col: pa.array([], pa.int64()),
            **{c: pa.array([], pa.int64()) for c in sum_cols},
        }
    )

    def merge(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or key_col not in group.column_names:
            return empty
        keys = group[key_col].to_numpy(zero_copy_only=False)
        side = group["_side"].to_numpy(zero_copy_only=False)
        mats = [
            group[f"_c{i}"].to_numpy(zero_copy_only=False)
            for i in range(ncols)
        ]
        v_rows = np.flatnonzero(side == 0)
        d_rows = np.flatnonzero(side == 1)
        kv, kd = keys[v_rows], keys[d_rows]
        ov = np.argsort(kv, kind="stable")
        od = np.argsort(kd, kind="stable")
        kv, kd = kv[ov], kd[od]
        for k_arr, label in ((kv, "view"), (kd, "delta")):
            if k_arr.size > 1 and (k_arr[1:] == k_arr[:-1]).any():
                dup = int(k_arr[np.flatnonzero(k_arr[1:] == k_arr[:-1])[0]])
                raise ValueError(
                    f"duplicate key {dup} on the {label} side — a keyed "
                    "view must be unique per key"
                )
        # union of keys, aligned adds from both sides
        all_k = np.union1d(kv, kd)
        out = [np.zeros(all_k.size, np.int64) for _ in range(ncols)]
        pos_v = np.searchsorted(all_k, kv)
        pos_d = np.searchsorted(all_k, kd)
        for i in range(ncols):
            out[i][pos_v] += mats[i][v_rows][ov]
            out[i][pos_d] += mats[i][d_rows][od]
        n_new = out[0]
        if (n_new < 0).any():
            k_bad = int(all_k[np.flatnonzero(n_new < 0)[0]])
            raise ValueError(
                f"incremental_agg: key {k_bad} driven to negative count — "
                "the change stream deletes rows the view never counted"
            )
        gone = n_new == 0
        if gone.any():
            for i in range(1, ncols):
                bad = gone & (out[i] != 0)
                if bad.any():
                    k_bad = int(all_k[np.flatnonzero(bad)[0]])
                    raise ValueError(
                        f"incremental_agg: key {k_bad} reaches count 0 with "
                        "a nonzero sum — the delete images disagree with "
                        "the inserts they cancel"
                    )
        keep = ~gone
        return pa.table(
            {
                key_col: pa.array(all_k[keep], pa.int64()),
                count_col: pa.array(n_new[keep], pa.int64()),
                **{
                    c: pa.array(out[i + 1][keep], pa.int64())
                    for i, c in enumerate(sum_cols)
                },
            }
        )

    return tagged.groupby("_b").map_groups(merge, batch_format="pyarrow")
