"""Snapshot diff — keyed comparison of two versions of a table.

The read-side twin of ``state/merge.py``: given two snapshots of a keyed
table (``old`` and ``new``, same schema, unique key per side), emit one
row per NON-identical key classified as ``'added'`` (key only in new),
``'deleted'`` (key only in old) or ``'changed'`` (key in both, any value
column distinct).  Identical rows — the overwhelming majority between two
snapshots of a 100-TB table — produce nothing.

Plan — reduced pairs only, ONE keyed exchange:

1. each side scans once; every block reduces to ``(key:int64,
   fp:uint64-as-int64, side:int8)`` where ``fp`` is the shared
   stable row fingerprint (:func:`hashing.hash64_columns` over the value
   columns — vectorized, null-aware, process/parallelism-stable).  Value
   columns NEVER cross the wire in the default mode: the exchange carries
   17 bytes per row regardless of row width;
2. one coarse-bucket exchange on the splitmix hash of the key co-locates
   each key's (at most two) reduced rows; bucket count is volume-sized
   (``assembly_buckets_for_bytes`` over the metadata byte estimate of the
   REDUCED stream) so no group outgrows a task heap at any corpus size;
3. the per-bucket walk is three ``np.searchsorted`` probes over the two
   sorted key vectors — no pairs, no Python loops.  Duplicate keys within
   a side raise loudly (a keyed snapshot must be unique per key — the
   same ANSI discipline ``merge_into`` enforces on its change set).

``mode="columns"`` is the exact parity path: the value columns ride the
exchange and 'changed' is decided column-by-column with SQL
``IS DISTINCT FROM`` null semantics.  The fingerprint mode's only
approximation is a per-matched-key false-'identical' probability of
2^-64 (the old and new values of the SAME key hashing equal) — there is
no birthday effect because fingerprints are only ever compared within a
key.  Fingerprint mode requires integer/string/binary value columns (the
``hash64_array`` domain) and names the columns mode in its error
otherwise; floats should be integerized per the engine convention
anyway.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..hashing import hash64_columns, splitmix_bucket

__all__ = ["table_diff", "table_fingerprint"]


def _empty_result(key_col: str) -> pa.Table:
    return pa.table(
        {key_col: pa.array([], pa.int64()), "change": pa.array([], pa.string())}
    )


def table_diff(
    old: ray.data.Dataset,
    new: ray.data.Dataset,
    *,
    key_col: str,
    mode: str = "fingerprint",
    n_buckets: int | None = None,
) -> ray.data.Dataset:
    """Diff two snapshots of a keyed table; returns a Dataset of
    ``(key_col:int64, change:string)`` rows, one per added / deleted /
    changed key (identical keys emit nothing).  Keys must be integral and
    unique per side; both sides must share the same column set."""
    from ..cluster import assembly_buckets_for_bytes, dataset_size_estimate

    if mode not in ("fingerprint", "columns"):
        raise ValueError(f"unknown mode {mode!r}; use 'fingerprint' or 'columns'")

    old_schema = old.schema().base_schema
    new_schema = new.schema().base_schema
    if key_col not in old_schema.names or key_col not in new_schema.names:
        raise ValueError(f"both sides need key column {key_col!r}")
    if not pa.types.is_integer(old_schema.field(key_col).type):
        raise ValueError(
            f"key column {key_col!r} must be integral (got "
            f"{old_schema.field(key_col).type})"
        )
    val_cols = sorted(n for n in old_schema.names if n != key_col)
    new_vals = sorted(n for n in new_schema.names if n != key_col)
    if val_cols != new_vals:
        raise ValueError(
            f"snapshot schemas disagree: old value columns {val_cols} vs "
            f"new {new_vals}"
        )
    if mode == "fingerprint":
        bad = [
            n
            for n in val_cols
            if not (
                pa.types.is_integer(old_schema.field(n).type)
                or pa.types.is_string(old_schema.field(n).type)
                or pa.types.is_large_string(old_schema.field(n).type)
                or pa.types.is_binary(old_schema.field(n).type)
                or pa.types.is_large_binary(old_schema.field(n).type)
            )
        ]
        if bad:
            raise ValueError(
                f"fingerprint mode cannot hash columns {bad} (integer/"
                "string/binary only) — integerize them per the engine "
                "convention or use mode='columns'"
            )

    if n_buckets is None:
        est_old = dataset_size_estimate(old)
        est_new = dataset_size_estimate(new)
        approx = None
        if est_old is not None and est_new is not None:
            # the exchange carries the REDUCED stream (~17 B/row in
            # fingerprint mode); full-width bytes overestimate it, so
            # scale the estimate down rather than over-bucket tiny inputs
            approx = (est_old + est_new) // (4 if mode == "fingerprint" else 1)
        n_buckets = assembly_buckets_for_bytes(approx)

    fp_mode = mode == "fingerprint"

    def reduce_side(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            keys = batch[key_col].cast(pa.int64())
            kv = keys.to_numpy(zero_copy_only=False)
            cols = {
                key_col: keys,
                "_side": pa.array(
                    np.full(batch.num_rows, side, np.int8), pa.int8()
                ),
                "_b": pa.array(splitmix_bucket(kv, n_buckets), pa.int64()),
            }
            if fp_mode:
                fp = hash64_columns(batch.select(val_cols), val_cols)
                cols["_fp"] = pa.array(fp.view(np.int64), pa.int64())
            else:
                for c in val_cols:
                    cols[c] = batch[c]
            return pa.table(cols)

        return fn

    reduced = old.map_batches(
        reduce_side(0), batch_format="pyarrow"
    ).union(new.map_batches(reduce_side(1), batch_format="pyarrow"))

    empty = _empty_result(key_col)

    def classify(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or key_col not in group.column_names:
            return empty
        side = group["_side"].to_numpy(zero_copy_only=False)
        keys = group[key_col].to_numpy(zero_copy_only=False)
        o_rows = np.flatnonzero(side == 0)
        n_rows = np.flatnonzero(side == 1)
        ko, kn = keys[o_rows], keys[n_rows]
        oo, on = np.argsort(ko, kind="stable"), np.argsort(kn, kind="stable")
        ko, kn = ko[oo], kn[on]
        for k_arr, label in ((ko, "old"), (kn, "new")):
            if k_arr.size > 1 and (k_arr[1:] == k_arr[:-1]).any():
                dup = int(k_arr[np.flatnonzero(k_arr[1:] == k_arr[:-1])[0]])
                raise ValueError(
                    f"duplicate key {dup} in the {label} snapshot — a keyed "
                    "table must be unique per key"
                )
        # membership probes over the two sorted key vectors
        pos_o_in_n = np.searchsorted(kn, ko)
        np.clip(pos_o_in_n, 0, max(kn.size - 1, 0), out=pos_o_in_n)
        in_new = kn[pos_o_in_n] == ko if kn.size else np.zeros(ko.size, bool)
        pos_n_in_o = np.searchsorted(ko, kn)
        np.clip(pos_n_in_o, 0, max(ko.size - 1, 0), out=pos_n_in_o)
        in_old = ko[pos_n_in_o] == kn if ko.size else np.zeros(kn.size, bool)

        deleted = ko[~in_new]
        added = kn[~in_old]
        # matched pairs, aligned old→new
        m_o = np.flatnonzero(in_new)
        m_n = pos_o_in_n[m_o]
        if fp_mode:
            fp = group["_fp"].to_numpy(zero_copy_only=False)
            fpo = fp[o_rows][oo]
            fpn = fp[n_rows][on]
            differs = fpo[m_o] != fpn[m_n]
        else:
            differs = np.zeros(m_o.size, bool)
            take_o = pa.array((o_rows[oo][m_o]).astype(np.int64))
            take_n = pa.array((n_rows[on][m_n]).astype(np.int64))
            for c in val_cols:
                a = group[c].take(take_o).combine_chunks()
                b = group[c].take(take_n).combine_chunks()
                va = np.asarray(a.is_valid())
                vb = np.asarray(b.is_valid())
                neq = pc.fill_null(pc.not_equal(a, b), False).to_numpy(
                    zero_copy_only=False
                )
                # IS DISTINCT FROM: null-ness differs, or both valid and !=
                differs |= (va != vb) | (va & vb & neq)
        changed = ko[m_o][differs]

        n_out = deleted.size + added.size + changed.size
        if n_out == 0:
            return empty
        return pa.table(
            {
                key_col: pa.array(
                    np.concatenate([added, deleted, changed]), pa.int64()
                ),
                "change": pa.array(
                    ["added"] * added.size
                    + ["deleted"] * deleted.size
                    + ["changed"] * changed.size,
                    pa.string(),
                ),
            }
        )

    return reduced.groupby("_b").map_groups(classify, batch_format="pyarrow")


def table_fingerprint(
    ds: ray.data.Dataset,
    cols: list[str],
    *,
    method: str = "fast",
) -> pa.Table:
    """Order-independent whole-table fingerprint — the "are these two
    tables identical" primitive (replication checks, migration
    verification, snapshot equality) beside the keyed :func:`table_diff`.

    The fingerprint is the SUM of per-row hashes modulo ``2^63 − 1`` —
    commutative and associative, so it is invariant to row order, block
    layout and parallelism, while still counting duplicate rows by
    multiplicity (an XOR would cancel even multiplicities).  Each block
    reduces to one (partial_sum, count) pair; NOTHING row-sized crosses
    the wire.

    ``method="fast"`` (production): the vectorized engine row hash
    (``hashing.hash64_columns`` — null-aware, process-stable).
    ``method="md5"`` (SQL-parity): ``md5('|'.join(str(col)...))`` first
    12 hex chars — DuckDB can replicate it exactly
    (``CAST(CONCAT('0x', SUBSTR(md5(...), 1, 12)) AS BIGINT)``), at the
    documented per-row-Python tax the md5 samplers share.  NULLs render
    as the empty string in md5 mode (match COALESCE(CAST(c AS VARCHAR),
    '') in SQL).

    Returns one row: ``(fingerprint, n_rows)``.
    """
    if method not in ("fast", "md5"):
        raise ValueError(f"unknown method {method!r}")
    MOD = (1 << 63) - 1

    def partial(batch: pa.Table) -> pa.Table:
        b = batch.select(cols)
        if method == "fast":
            h = hash64_columns(b, cols)
            s = int(np.sum(h.astype(object))) % MOD
        else:
            import hashlib

            rendered = [
                pc.coalesce(pc.cast(b[c], pa.string()), "").to_pylist()
                for c in cols
            ]
            md5 = hashlib.md5
            s = 0
            for parts in zip(*rendered):
                s += int(md5("|".join(parts).encode()).hexdigest()[:12], 16)
            s %= MOD
        return pa.table(
            {
                "ps": pa.array([s], pa.int64()),
                "n": pa.array([b.num_rows], pa.int64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    fp = sum(int(r["ps"]) for r in parts) % MOD
    n = sum(int(r["n"]) for r in parts)
    return pa.table(
        {
            "fingerprint": pa.array([fp], pa.int64()),
            "n_rows": pa.array([n], pa.int64()),
        }
    )
