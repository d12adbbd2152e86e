"""Event-stream operators: sessionization and grouped top-k.

Ray Data has no session-window operator (SURVEY.md §2.12 — the reference has
no streaming semantics either), so these implement the two classic shapes a
training-data/events pipeline needs as compositions of
``map_batches`` + coarse-bucket ``groupby`` + vectorized in-group numpy:

- **sessionize**: gap-based session windows per user (a session breaks when
  the time since the previous event exceeds ``gap``).  Deterministic for
  tied timestamps (gap 0 never breaks).  Partitioning assumption: all events
  of one user fit in one group — guaranteed by grouping on a stable hash
  bucket of ``user_id`` (64 buckets ⇒ ~N/64 users per group, vectorized
  walk inside).
- **grouped_topk**: top-k rows per group key by a measure (rank by value
  desc, tie-break by id asc) — the per-key analog of `ds.sort().limit()`.

Both have exact DuckDB-window-function oracles (see __ray_entry__).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


from ..hashing import splitmix_bucket as _bucket_i64


def sessionize(
    ds: ray.data.Dataset,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_sec: float = 1800.0,
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """Events → one row per (user, session): session_no (1-based per user),
    n_events, session_start/end as ``YYYY-MM-DD HH:MM:SS`` strings."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        users = batch[user_col].to_numpy(zero_copy_only=False)
        out = batch.select([user_col, ts_col])
        return out.append_column(
            "bucket", pa.array(_bucket_i64(users, n_buckets), pa.int64())
        )

    def walk(group: pa.Table) -> pa.Table:
        g = group.sort_by([(user_col, "ascending"), (ts_col, "ascending")])
        users = g[user_col].to_numpy(zero_copy_only=False)
        ts = g[ts_col].cast(pa.timestamp("us")).to_numpy(zero_copy_only=False)
        n = len(users)
        if n == 0:
            return pa.table(
                {
                    user_col: pa.array([], pa.int64()),
                    "session_no": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "session_start": pa.array([], pa.string()),
                    "session_end": pa.array([], pa.string()),
                }
            )
        ts_us = ts.astype("datetime64[us]").astype(np.int64)
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = users[1:] != users[:-1]
        gap_us = np.empty(n, dtype=np.int64)
        gap_us[0] = 0
        gap_us[1:] = ts_us[1:] - ts_us[:-1]
        brk = new_user | (gap_us > int(gap_sec * 1e6))
        # session_no restarts per user: global cumsum minus cumsum at the
        # user's first row
        global_no = np.cumsum(brk)
        first_of_user = np.where(new_user)[0]
        base = np.zeros(n, dtype=np.int64)
        base[first_of_user] = global_no[first_of_user] - 1
        base = np.maximum.accumulate(base)
        session_no = global_no - base

        starts = np.where(brk)[0]
        ends = np.append(starts[1:], n) - 1
        out_users = users[starts]
        out_no = session_no[starts]
        out_count = (ends - starts + 1).astype(np.int64)
        # floor + cast to second resolution: Arrow's %S prints the
        # fractional part whenever the timestamp unit is sub-second
        fmt = pc.strftime(
            pc.floor_temporal(
                pa.array(ts, pa.timestamp("us")), unit="second"
            ).cast(pa.timestamp("s")),
            format="%Y-%m-%d %H:%M:%S",
        )
        return pa.table(
            {
                user_col: pa.array(out_users, pa.int64()),
                "session_no": pa.array(out_no, pa.int64()),
                "n_events": pa.array(out_count, pa.int64()),
                "session_start": pc.take(fmt, pa.array(starts, pa.int64())),
                "session_end": pc.take(fmt, pa.array(ends, pa.int64())),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(walk, batch_format="pyarrow")
    )


def grouped_topk(
    ds: ray.data.Dataset,
    *,
    group_col: str,
    value_col: str,
    id_col: str,
    k: int = 3,
) -> ray.data.Dataset:
    """Top-k rows per group by value desc (ties → smaller id first), with a
    1-based ``rank`` column.  Local per-block top-k first, then a final
    per-group reduce — the shuffle carries ≤ k rows per group per block."""

    def local(batch: pa.Table) -> pa.Table:
        # vectorized per-block top-k: dictionary-encode the group, lexsort
        # by (group, -value, id), then keep each row whose rank within its
        # group run is < k — no per-key Python loop
        keys = batch[group_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        codes = keys.dictionary_encode().indices.to_numpy(
            zero_copy_only=False
        )
        vals = batch[value_col].to_numpy(zero_copy_only=False)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -vals, codes))
        sorted_codes = codes[order]
        n = len(order)
        if n == 0:
            return batch.select([group_col, value_col, id_col])
        # rank within each equal-code run (runs are contiguous after sort)
        is_start = np.ones(n, bool)
        is_start[1:] = sorted_codes[1:] != sorted_codes[:-1]
        starts = np.nonzero(is_start)[0]
        run_id = np.cumsum(is_start) - 1
        rank = np.arange(n) - starts[run_id]
        keep = order[rank < k]
        keep.sort()
        return batch.select([group_col, value_col, id_col]).take(
            pa.array(keep, pa.int64())
        )

    def final(group: pa.Table) -> pa.Table:
        vals = group[value_col].to_numpy(zero_copy_only=False)
        ids = group[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -vals))[:k]
        out = group.take(pa.array(order))
        return out.append_column(
            "rank", pa.array(np.arange(1, len(order) + 1), pa.int32())
        )

    return (
        ds.map_batches(local, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(final, batch_format="pyarrow")
    )


def sliding_window_daily(
    ds: ray.data.Dataset,
    *,
    group_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    window_days: int = 7,
) -> ray.data.Dataset:
    """Sliding (rolling) window aggregate: for every (group, day), the event
    count and integer-cent value sum over the trailing ``window_days`` days
    (current day inclusive).

    Two-phase plan: a distributed daily pre-aggregate (hash groupby with
    map-side combine — the heavy reduction), then the rolling pass runs
    per-group over the now-tiny daily series (groups × days rows) with a
    vectorized prefix-sum difference.  DAYS WITHOUT EVENTS contribute zero
    but still appear inside another day's window — handled by evaluating
    windows on the observed days only and widening with searchsorted over
    day ordinals, which is exactly SQL's ``RANGE BETWEEN INTERVAL ...
    PRECEDING`` frame semantics.
    """

    def prep(batch: pa.Table) -> pa.Table:
        day = pc.strftime(batch[ts_col], format="%Y-%m-%d")
        vals = batch[value_col].to_numpy(zero_copy_only=False)
        cents = np.floor(vals * 100.0 + 0.5).astype(np.int64)
        return pa.table(
            {
                group_col: batch[group_col],
                "day": day,
                "value_cents": pa.array(cents, pa.int64()),
            }
        )

    from ray.data.aggregate import Count, Sum

    daily = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby([group_col, "day"])
        .aggregate(Count(), Sum("value_cents"))
        .rename_columns({"count()": "n", "sum(value_cents)": "cents"})
    )

    def add_group_bucket(batch: pa.Table) -> pa.Table:
        from ..hashing import id_bucket_array

        return batch.append_column(
            "gbucket", id_bucket_array(batch[group_col], 16)
        )

    def roll(group: pa.Table) -> pa.Table:
        g = group.sort_by([(group_col, "ascending"), ("day", "ascending")])
        keys = g[group_col].to_pylist()
        days = g["day"].to_pylist()
        n = g["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = g["cents"].to_numpy(zero_copy_only=False).astype(np.int64)
        # day ordinal for RANGE-frame arithmetic
        ords = np.array(
            [np.datetime64(d).astype("datetime64[D]").astype(np.int64) for d in days]
        )
        out_rows = {k: [] for k in (group_col, "day", "w_events", "w_value_cents")}
        i = 0
        total = len(keys)
        while i < total:
            j = i
            while j < total and keys[j] == keys[i]:
                j += 1
            o = ords[i:j]
            cn = np.concatenate([[0], np.cumsum(n[i:j])])
            cc = np.concatenate([[0], np.cumsum(cents[i:j])])
            # window start index per day: first observed day > d - window
            starts = np.searchsorted(o, o - (window_days - 1), side="left")
            idx = np.arange(j - i)
            out_rows[group_col].extend(keys[i:j])
            out_rows["day"].extend(days[i:j])
            out_rows["w_events"].extend((cn[idx + 1] - cn[starts]).tolist())
            out_rows["w_value_cents"].extend((cc[idx + 1] - cc[starts]).tolist())
            i = j
        return pa.table(
            {
                group_col: pa.array(out_rows[group_col], pa.string()),
                "day": pa.array(out_rows["day"], pa.string()),
                "w_events": pa.array(out_rows["w_events"], pa.int64()),
                "w_value_cents": pa.array(out_rows["w_value_cents"], pa.int64()),
            }
        )

    return (
        daily.map_batches(add_group_bucket, batch_format="pyarrow")
        .groupby("gbucket")
        .map_groups(roll, batch_format="pyarrow")
    )


def hopping_window(
    ds: ray.data.Dataset,
    *,
    ts_col: str = "ts",
    value_col: str = "value",
    group_col: str | None = "event_type",
    size_s: int = 21600,
    hop_s: int = 7200,
) -> ray.data.Dataset:
    """Hopping (sliding-start) window aggregate: per aligned window of
    ``size_s`` seconds starting every ``hop_s`` seconds, the event count
    and integer-cent value sum — tumbling windows are the ``size == hop``
    special case.

    Every event belongs to exactly ``size_s // hop_s`` windows (windows are
    epoch-aligned, so for an event in hop-bucket b the containing starts
    are ``(b - i) * hop_s`` for ``i < size/hop``) — the expansion is a
    bounded, vectorized flat-map (np.repeat/np.tile), NOT a range join.
    The replicated rows are pre-combined per block (C++ group_by) before
    ONE keyed exchange, so the shuffle carries one partial row per
    (window, group) per block at ``size/hop`` × the daily-aggregate cost.
    """
    if size_s % hop_s:
        raise ValueError("size_s must be a multiple of hop_s")
    k = size_s // hop_s

    def expand(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ts = batch[ts_col]
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        epoch_s = ts.cast(pa.int64()).to_numpy(zero_copy_only=False) // 1_000_000
        b = epoch_s // hop_s
        idx = np.repeat(np.arange(n, dtype=np.int64), k)
        i = np.tile(np.arange(k, dtype=np.int64), n)
        start = (b[idx] - i) * hop_s
        vals = batch[value_col].to_numpy(zero_copy_only=False)
        cents = np.floor(vals * 100.0 + 0.5).astype(np.int64)[idx]
        cols = {
            "window_start": pa.array(start, pa.int64()),
            "cents": pa.array(cents, pa.int64()),
        }
        keys = ["window_start"]
        if group_col is not None:
            gc = batch[group_col]
            if isinstance(gc, pa.ChunkedArray):
                gc = gc.combine_chunks()
            cols[group_col] = gc.take(pa.array(idx))
            keys.append(group_col)
        t = pa.table(cols)
        # map-side combine: one partial row per (window, group) per block
        return t.group_by(keys).aggregate(
            [("cents", "sum"), ("cents", "count")]
        ).rename_columns(keys + ["cents_partial", "n_partial"])

    from ray.data.aggregate import Sum

    keys = ["window_start"] + ([group_col] if group_col else [])
    return (
        ds.map_batches(expand, batch_format="pyarrow")
        .groupby(keys if len(keys) > 1 else keys[0])
        .aggregate(Sum("n_partial"), Sum("cents_partial"))
        .rename_columns(
            {
                "sum(n_partial)": "n_events",
                "sum(cents_partial)": "value_cents",
            }
        )
    )


def funnel_conversions(
    ds: ray.data.Dataset,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    step_a: str = "view",
    step_b: str = "purchase",
    window_sec: float = 3600.0,
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """Two-step funnel: per user, how many ``step_a`` events were followed
    by at least one ``step_b`` event STRICTLY within ``(t, t + window]`` —
    the sequence-pattern primitive (MATCH_RECOGNIZE-lite) behind
    conversion-rate and A/B metrics.

    Shape: one coarse-bucket exchange on a stable hash of the user (all
    events of one user land in one group), then a FULLY vectorized
    in-group pass — events lexsorted by (user, ts), users dense-ranked,
    each row encoded as ``urank·T + dt`` (``T`` sized so ``dt + window``
    cannot wrap into the next user, with an explicit int64-overflow
    guard), so one ``np.searchsorted`` pair per side plus a
    purchase-prefix-sum answers every "any B in (t, t+W] for this user"
    question with zero per-row or per-user Python.
    """
    window_us = int(round(window_sec * 1e6))

    def add_bucket(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(
            batch[type_col], value_set=pa.array([step_a, step_b], pa.string())
        )
        out = batch.select([user_col, ts_col, type_col]).filter(keep)
        users = out[user_col].to_numpy(zero_copy_only=False)
        return out.append_column(
            "bucket", pa.array(_bucket_i64(users, n_buckets), pa.int64())
        )

    empty = pa.table(
        {
            user_col: pa.array([], pa.int64()),
            "n_a": pa.array([], pa.int64()),
            "n_conv": pa.array([], pa.int64()),
        }
    )

    def walk(group: pa.Table) -> pa.Table:
        g = group.sort_by([(user_col, "ascending"), (ts_col, "ascending")])
        n = g.num_rows
        if n == 0:
            return empty
        users = g[user_col].to_numpy(zero_copy_only=False)
        ts_us = (
            g[ts_col]
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        is_b = pc.equal(g[type_col], step_b).to_numpy(zero_copy_only=False)
        is_a = pc.equal(g[type_col], step_a).to_numpy(zero_copy_only=False)

        # dense-rank users (input already sorted by user)
        new_user = np.empty(n, bool)
        new_user[0] = True
        new_user[1:] = users[1:] != users[:-1]
        urank = np.cumsum(new_user) - 1
        dt = ts_us - ts_us.min()
        T = int(dt.max()) + window_us + 2
        if (int(urank[-1]) + 1) * T >= 2**63:
            raise OverflowError(
                "funnel_conversions: users-per-bucket x time-range too "
                "large for the int64 combined key — raise n_buckets"
            )
        comb = urank * np.int64(T) + dt
        # purchases among the first k rows
        pp = np.concatenate(([0], np.cumsum(is_b)))
        a_idx = np.flatnonzero(is_a)
        code_a = comb[a_idx]
        j1 = np.searchsorted(comb, code_a, side="right")
        j2 = np.searchsorted(comb, code_a + window_us, side="right")
        conv = (pp[j2] - pp[j1]) > 0

        # aggregate per user over step_a rows
        ua = urank[a_idx]
        n_users = int(urank[-1]) + 1
        n_a = np.bincount(ua, minlength=n_users)
        n_conv = np.bincount(ua, weights=conv.astype(np.int64), minlength=n_users)
        first_rows = np.flatnonzero(new_user)
        keep = n_a > 0
        return pa.table(
            {
                user_col: pa.array(users[first_rows][keep], pa.int64()),
                "n_a": pa.array(n_a[keep].astype(np.int64), pa.int64()),
                "n_conv": pa.array(n_conv[keep].astype(np.int64), pa.int64()),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(walk, batch_format="pyarrow")
    )


def prior_window_counts(
    ds: ray.data.Dataset,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    anchor_type: str = "purchase",
    count_type: str = "view",
    window_sec: float = 3600.0,
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """Time-RANGE join as a window count: for every ``anchor_type`` event,
    how many ``count_type`` events the same user produced in the half-open
    window ``(t − window, t]`` — the attribution primitive behind
    "views in the hour before each purchase".  One row per anchor event:
    ``(id_col, user_col, n_prior)``.

    A naive range join explodes to |A|·|B| pairs per user; this never
    builds pairs.  Shape: one coarse-bucket exchange on a stable hash of
    the user (both event types of one user land in one group), then the
    funnel kernel's fully-vectorized in-group pass — rows lexsorted by
    (user, ts), users dense-ranked, each row encoded as ``urank·T + dt``
    with ``T`` sized so ``dt + window`` cannot wrap into the next user
    (explicit int64-overflow guard), so ONE ``np.searchsorted`` pair over
    the combined key plus a count-type prefix sum answers every window
    count with zero per-row or per-user Python.  Skew note: a hot user's
    events all land in one bucket — at 64+ buckets this bounds skew to
    max-user-rows/total, the usual salting candidate."""
    window_us = int(round(window_sec * 1e6))

    def add_bucket(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(
            batch[type_col],
            value_set=pa.array([anchor_type, count_type], pa.string()),
        )
        out = batch.select([id_col, user_col, ts_col, type_col]).filter(keep)
        users = out[user_col].to_numpy(zero_copy_only=False)
        return out.append_column(
            "bucket", pa.array(_bucket_i64(users, n_buckets), pa.int64())
        )

    empty = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            user_col: pa.array([], pa.int64()),
            "n_prior": pa.array([], pa.int64()),
        }
    )

    def walk(group: pa.Table) -> pa.Table:
        g = group.sort_by([(user_col, "ascending"), (ts_col, "ascending")])
        n = g.num_rows
        if n == 0:
            return empty
        users = g[user_col].to_numpy(zero_copy_only=False)
        ts_us = (
            g[ts_col]
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        is_anchor = pc.equal(g[type_col], anchor_type).to_numpy(
            zero_copy_only=False
        )
        is_cnt = pc.equal(g[type_col], count_type).to_numpy(
            zero_copy_only=False
        )
        new_user = np.empty(n, bool)
        new_user[0] = True
        new_user[1:] = users[1:] != users[:-1]
        urank = np.cumsum(new_user) - 1
        dt = ts_us - ts_us.min()
        T = int(dt.max()) + window_us + 2
        if (int(urank[-1]) + 1) * T >= 2**63:
            raise OverflowError(
                "prior_window_counts: users-per-bucket x time-range too "
                "large for the int64 combined key — raise n_buckets"
            )
        comb = urank * np.int64(T) + dt
        pv = np.concatenate(([0], np.cumsum(is_cnt)))
        a_idx = np.flatnonzero(is_anchor)
        code_a = comb[a_idx]
        # half-open (t − W, t]: side="right" at t includes ties at t,
        # side="right" at t − W excludes ties exactly at the lower edge
        j_hi = np.searchsorted(comb, code_a, side="right")
        j_lo = np.searchsorted(comb, code_a - window_us, side="right")
        n_prior = pv[j_hi] - pv[j_lo]
        return pa.table(
            {
                id_col: g[id_col].take(pa.array(a_idx, pa.int64())),
                user_col: g[user_col].take(pa.array(a_idx, pa.int64())),
                "n_prior": pa.array(n_prior.astype(np.int64), pa.int64()),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(walk, batch_format="pyarrow")
    )


def funnel3_conversions(
    ds: ray.data.Dataset,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    step_a: str = "view",
    step_b: str = "click",
    step_c: str = "purchase",
    window_ab_sec: float = 3600.0,
    window_bc_sec: float = 3600.0,
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """Three-step funnel A→B→C: per user, how many ``step_a`` events were
    followed by the EARLIEST ``step_b`` strictly within ``(tA, tA+W1]``
    which itself was followed by any ``step_c`` strictly within
    ``(tB, tB+W2]`` — the standard product-analytics chain semantics
    (each step anchors on the previous step's first occurrence).

    Same single-exchange, zero-Python shape as ``funnel_conversions``:
    per-user combined int64 codes, one searchsorted against the B-only
    code array to find each A's earliest B, one searchsorted pair against
    the C-only codes for the final window."""
    w1 = int(round(window_ab_sec * 1e6))
    w2 = int(round(window_bc_sec * 1e6))

    def add_bucket(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(
            batch[type_col],
            value_set=pa.array([step_a, step_b, step_c], pa.string()),
        )
        out = batch.select([user_col, ts_col, type_col]).filter(keep)
        users = out[user_col].to_numpy(zero_copy_only=False)
        return out.append_column(
            "bucket", pa.array(_bucket_i64(users, n_buckets), pa.int64())
        )

    empty = pa.table(
        {
            user_col: pa.array([], pa.int64()),
            "n_a": pa.array([], pa.int64()),
            "n_conv": pa.array([], pa.int64()),
        }
    )

    def walk(group: pa.Table) -> pa.Table:
        g = group.sort_by([(user_col, "ascending"), (ts_col, "ascending")])
        n = g.num_rows
        if n == 0:
            return empty
        users = g[user_col].to_numpy(zero_copy_only=False)
        ts_us = (
            g[ts_col]
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        types = g[type_col]
        is_a = pc.equal(types, step_a).to_numpy(zero_copy_only=False)
        is_b = pc.equal(types, step_b).to_numpy(zero_copy_only=False)
        is_c = pc.equal(types, step_c).to_numpy(zero_copy_only=False)
        new_user = np.empty(n, bool)
        new_user[0] = True
        new_user[1:] = users[1:] != users[:-1]
        urank = np.cumsum(new_user) - 1
        dt = ts_us - ts_us.min()
        # T must cover BOTH windows so a chained code never wraps users
        T = int(dt.max()) + w1 + w2 + 2
        if (int(urank[-1]) + 1) * T >= 2**63:
            raise OverflowError(
                "funnel3_conversions: users-per-bucket x time-range too "
                "large for the int64 combined key — raise n_buckets"
            )
        comb = urank * np.int64(T) + dt
        code_a = comb[is_a]
        comb_b = comb[is_b]
        comb_c = comb[is_c]
        # earliest B strictly after A within (tA, tA+W1] — same user by
        # construction of the combined code
        bcode = np.zeros(len(code_a), np.int64)
        if len(comb_b):
            k = np.searchsorted(comb_b, code_a, side="right")
            has_b = k < len(comb_b)
            bcode[has_b] = comb_b[k[has_b]]
            has_b &= bcode <= code_a + w1
        else:
            has_b = np.zeros(len(code_a), bool)
        # any C strictly after that B within (tB, tB+W2]
        m1 = np.searchsorted(comb_c, bcode, side="right")
        m2 = np.searchsorted(comb_c, bcode + w2, side="right")
        conv = has_b & (m2 > m1)
        ua = urank[is_a]
        n_users = int(urank[-1]) + 1
        n_a = np.bincount(ua, minlength=n_users)
        n_conv = np.bincount(ua, weights=conv.astype(np.int64), minlength=n_users)
        first_rows = np.flatnonzero(new_user)
        keep = n_a > 0
        return pa.table(
            {
                user_col: pa.array(users[first_rows][keep], pa.int64()),
                "n_a": pa.array(n_a[keep].astype(np.int64), pa.int64()),
                "n_conv": pa.array(n_conv[keep].astype(np.int64), pa.int64()),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(walk, batch_format="pyarrow")
    )


def group_rank(
    ds: ray.data.Dataset,
    *,
    keys: list[str],
    order_cols: list[tuple[str, str]],
    rank_col: str = "rnk",
    pct_col: str | None = "pct",
    cume_col: str | None = None,
    dense_col: str | None = None,
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """SQL ``rank()`` (ties share the rank, gaps after), ``percent_rank()``
    and optionally ``cume_dist()`` / ``dense_rank()`` per group — the
    window-function primitives behind per-language quality percentiles and
    leaderboards.  ``cume_dist`` is (rows ordered ≤ current, ties
    inclusive) / group size — one float64 division per row,
    DuckDB-bit-identical; ``dense_rank`` is the tie-group ordinal (no
    gaps), a cumsum of tie boundaries within each run.

    One coarse-bucket exchange on the group keys (a group's rows land in
    one bucket), then a zero-Python in-group pass: C++ sort by
    keys+order, run boundaries and tie boundaries from exact dictionary
    codes, ranks via a cummax over tie-group starts.  ``percent_rank`` is
    ``(rank−1)/(n−1)`` in float64 — one deterministic division per row,
    bit-identical to DuckDB's.  Output = input columns + rank (+ pct).

    Partitioning assumption: one GROUP fits in one bucket's memory — the
    same contract as ``sessionize``; for a single giant group use the
    histogram quantile (``agg.group_quantile_disc``) instead of full
    ranking.
    """
    from ..hashing import hash64_columns

    def add_bucket(batch: pa.Table) -> pa.Table:
        bucket = hash64_columns(batch, keys) % np.uint64(n_buckets)
        return batch.append_column(
            "bucket", pa.array(bucket.astype(np.int64), pa.int64())
        )

    def _codes(col) -> np.ndarray:
        enc = pc.dictionary_encode(col)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        return enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)

    def walk(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["bucket"]).sort_by(
            [(k, "ascending") for k in keys] + list(order_cols)
        )
        n = g.num_rows
        if n == 0:
            out = {c: g[c] for c in g.column_names}
            out[rank_col] = pa.array([], pa.int64())
            if pct_col:
                out[pct_col] = pa.array([], pa.float64())
            if cume_col:
                out[cume_col] = pa.array([], pa.float64())
            if dense_col:
                out[dense_col] = pa.array([], pa.int64())
            return pa.table(out)
        new_run = np.zeros(n, bool)
        new_run[0] = True
        for k in keys:
            c = _codes(g[k])
            new_run[1:] |= c[1:] != c[:-1]
        new_tie = new_run.copy()
        for c_name, _dir in order_cols:
            c = _codes(g[c_name])
            new_tie[1:] |= c[1:] != c[:-1]
        idx = np.arange(n, dtype=np.int64)
        run_start = np.where(new_run, idx, 0)
        run_start = np.maximum.accumulate(run_start)
        tie_start = np.where(new_tie, idx, 0)
        tie_start = np.maximum.accumulate(tie_start)
        rnk = tie_start - run_start + 1
        out = {c: g[c] for c in g.column_names}
        out[rank_col] = pa.array(rnk, pa.int64())
        if pct_col or cume_col:
            starts = np.flatnonzero(new_run)
            lens = np.diff(np.r_[starts, n])
            n_run = np.repeat(lens, lens).astype(np.float64)
        if pct_col:
            denom = np.maximum(n_run - 1.0, 1.0)
            out[pct_col] = pa.array((rnk - 1) / denom, pa.float64())
        if cume_col:
            # rows ≤ current incl. ties = end of the current tie group,
            # relative to the run start
            tie_starts = np.flatnonzero(new_tie)
            tie_lens = np.diff(np.r_[tie_starts, n])
            tie_end = np.repeat(tie_starts + tie_lens, tie_lens)
            out[cume_col] = pa.array(
                (tie_end - run_start).astype(np.float64) / n_run, pa.float64()
            )
        if dense_col:
            # tie-group ordinal within the run: cumulative tie boundaries,
            # rebased so each run starts at 1
            tie_no = np.cumsum(new_tie)
            run_base = np.maximum.accumulate(np.where(new_run, tie_no, 0))
            out[dense_col] = pa.array(
                (tie_no - run_base + 1).astype(np.int64), pa.int64()
            )
        return pa.table(out)

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(walk, batch_format="pyarrow")
    )


def with_lag(
    ds: ray.data.Dataset,
    *,
    keys: list[str],
    order_cols: list[tuple[str, str]],
    col: str,
    out_col: str,
    offset: int = 1,
    lead: bool = False,
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """SQL ``lag(col, offset)`` / ``lead(col, offset)`` OVER (PARTITION BY
    keys ORDER BY order_cols) materialized as a column — the window
    navigation primitive (previous URL, next status, delta bases).  Rows
    with no offset-neighbour in their group get null, like SQL.

    One coarse-bucket exchange co-locates each key group; the walk is a
    C++ sort + one shifted take with run-boundary nulls (a row's neighbour
    must share its group's dictionary-code run).  Output = input columns +
    ``out_col``; full rows survive byte-exact.  ``order_cols`` should be a
    total order (include a unique id) — SQL's lag is equally
    order-sensitive.
    """
    from ..hashing import hash64_columns

    if offset < 1:
        raise ValueError("offset must be >= 1")

    def add_bucket(batch: pa.Table) -> pa.Table:
        bucket = hash64_columns(batch, keys) % np.uint64(n_buckets)
        return batch.append_column(
            "bucket", pa.array(bucket.astype(np.int64), pa.int64())
        )

    def _codes(c) -> np.ndarray:
        enc = pc.dictionary_encode(c)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        return enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)

    def walk(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["bucket"]).sort_by(
            [(k, "ascending") for k in keys] + list(order_cols)
        )
        n = g.num_rows
        if n == 0:
            out = {c: g[c] for c in g.column_names}
            out[out_col] = pa.array([], g.schema.field(col).type)
            return pa.table(out)
        new_run = np.zeros(n, bool)
        new_run[0] = True
        for k in keys:
            c = _codes(g[k])
            new_run[1:] |= c[1:] != c[:-1]
        idx = np.arange(n, dtype=np.int64)
        run_start = np.maximum.accumulate(np.where(new_run, idx, 0))
        if lead:
            src = idx + offset
            # a lead neighbour must belong to the same run: its run start
            # equals ours
            ok = src < n
            ok[ok] &= run_start[src[ok]] == run_start[idx[ok]]
        else:
            src = idx - offset
            ok = src >= run_start  # same run by construction
        src_safe = np.where(ok, src, 0)
        vals = g[col].take(pa.array(src_safe, pa.int64()))
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        out_vals = pc.if_else(pa.array(ok), vals, pa.nulls(n, g.schema.field(col).type))
        out = {c: g[c] for c in g.column_names}
        out[out_col] = out_vals
        return pa.table(out)

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(walk, batch_format="pyarrow")
    )


def gap_stats(
    ds: ray.data.Dataset,
    *,
    keys: list[str],
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """Inter-event gap statistics per key — count / mean / max of
    ``ts − lag(ts)`` within each key group, the cadence metric behind
    session health and crawler-politeness checks.  Keys with a single
    event have no gap and are excluded (SQL ``WHERE gap IS NOT NULL``).

    ONE coarse-bucket exchange co-locates each key's rows, then a
    zero-Python walk: C++ sort by keys+ts+tiebreak, run boundaries from
    exact dictionary codes, one vectorized int64 microsecond diff, and
    per-run ``np.add/maximum.reduceat`` aggregation — the finalize emits
    final per-key rows directly (gaps are integer microseconds, so the
    sum is associative and the single float64 division per key matches
    DuckDB's BIGINT avg bit-exactly).

    Output: keys + ``n_gaps:int64, avg_gap_us:float64, max_gap_us:int64``.
    """
    from ..hashing import hash64_columns

    def add_bucket(batch: pa.Table) -> pa.Table:
        bucket = hash64_columns(batch, keys) % np.uint64(n_buckets)
        return batch.append_column(
            "bucket", pa.array(bucket.astype(np.int64), pa.int64())
        )

    def _codes(col) -> np.ndarray:
        enc = pc.dictionary_encode(col)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        return enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)

    def walk(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["bucket"]).sort_by(
            [(k, "ascending") for k in keys]
            + [(ts_col, "ascending"), (tiebreak_col, "ascending")]
        )
        n = g.num_rows
        empty = pa.table(
            {
                **{k: pa.array([], g.schema.field(k).type) for k in keys},
                "n_gaps": pa.array([], pa.int64()),
                "avg_gap_us": pa.array([], pa.float64()),
                "max_gap_us": pa.array([], pa.int64()),
            }
        )
        if n == 0:
            return empty
        new_run = np.zeros(n, bool)
        new_run[0] = True
        for k in keys:
            c = _codes(g[k])
            new_run[1:] |= c[1:] != c[:-1]
        ts = (
            g[ts_col]
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        # gap[i] pairs row i with row i+1 of the SAME run
        gap = ts[1:] - ts[:-1]
        in_run = ~new_run[1:]
        starts = np.flatnonzero(new_run)
        lens = np.diff(np.r_[starts, n])
        keep_run = lens > 1  # single-event keys have no gaps
        if not keep_run.any():
            return empty
        # segment boundaries in gap-index space: run starting at row s with
        # L rows owns gaps [s, s+L-1) — reduceat over kept runs only
        seg = starts[keep_run]
        gl = (lens - 1)[keep_run]
        valid_gap = gap[in_run]
        # reindex: gaps of kept runs are contiguous after dropping the
        # cross-run diffs; their segment starts are cumsum of lengths
        seg_starts = np.r_[0, np.cumsum(gl)[:-1]]
        n_gaps = gl.astype(np.int64)
        sums = np.add.reduceat(valid_gap, seg_starts)
        maxs = np.maximum.reduceat(valid_gap, seg_starts)
        first_rows = pa.array(seg)
        out = {k: g[k].take(first_rows) for k in keys}
        out["n_gaps"] = pa.array(n_gaps, pa.int64())
        out["avg_gap_us"] = pa.array(
            sums.astype(np.float64) / n_gaps.astype(np.float64), pa.float64()
        )
        out["max_gap_us"] = pa.array(maxs, pa.int64())
        return pa.table(out)

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(walk, batch_format="pyarrow")
    )


def group_ntile(
    ds: ray.data.Dataset,
    *,
    keys: list[str],
    order_cols: list[tuple[str, str]],
    n_tiles: int,
    tile_col: str = "tile",
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """SQL ``ntile(k)`` per group: rows are split into ``k`` buckets as
    equal as possible, the first ``n % k`` buckets one row larger — the
    quartile/decile assignment used for stratifying corpora by quality or
    length.  Same single coarse-bucket exchange and zero-Python in-group
    walk as ``group_rank``.

    ``order_cols`` MUST be a total order within each group (include a
    unique id as the last column): ntile numbers ROWS, not tie groups, so
    a non-total order would make the assignment execution-dependent —
    here and in any SQL engine.  Output = input columns + ``tile_col``.
    """
    from ..hashing import hash64_columns

    if n_tiles < 1:
        raise ValueError("n_tiles must be >= 1")

    def add_bucket(batch: pa.Table) -> pa.Table:
        bucket = hash64_columns(batch, keys) % np.uint64(n_buckets)
        return batch.append_column(
            "bucket", pa.array(bucket.astype(np.int64), pa.int64())
        )

    def _codes(col) -> np.ndarray:
        enc = pc.dictionary_encode(col)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        return enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)

    def walk(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["bucket"]).sort_by(
            [(k, "ascending") for k in keys] + list(order_cols)
        )
        n = g.num_rows
        if n == 0:
            out = {c: g[c] for c in g.column_names}
            out[tile_col] = pa.array([], pa.int64())
            return pa.table(out)
        new_run = np.zeros(n, bool)
        new_run[0] = True
        for k in keys:
            c = _codes(g[k])
            new_run[1:] |= c[1:] != c[:-1]
        idx = np.arange(n, dtype=np.int64)
        run_start = np.maximum.accumulate(np.where(new_run, idx, 0))
        starts = np.flatnonzero(new_run)
        lens = np.diff(np.r_[starts, n])
        n_g = np.repeat(lens, lens)          # group size per row
        i = idx - run_start                  # 0-based row number in group
        small = n_g // n_tiles               # rows per small tile
        big = n_g % n_tiles                  # number of one-larger tiles
        cut = big * (small + 1)              # rows covered by big tiles
        # small == 0 (fewer rows than tiles): each row its own tile i+1;
        # the big-branch formula i // (small+1) + 1 == i + 1 covers it.
        tile = np.where(
            (i < cut) | (small == 0),
            i // np.maximum(small + 1, 1) + 1,
            big + (i - cut) // np.maximum(small, 1) + 1,
        )
        out = {c: g[c] for c in g.column_names}
        out[tile_col] = pa.array(tile.astype(np.int64), pa.int64())
        return pa.table(out)

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(walk, batch_format="pyarrow")
    )


def debounce(
    ds: ray.data.Dataset,
    *,
    keys: list[str],
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    window_sec: float = 3600.0,
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """Stream debounce with SQL ``lag()`` semantics: a row survives iff it
    is the first of its key group or the PREVIOUS row of the same key
    (ordered by ts, tiebreak) is more than ``window_sec`` older — the
    rapid-repeat suppressor for event logs (double-clicks, retry storms).

    One coarse-bucket exchange on the first key's hash (all rows of a key
    land together), then a zero-Python walk: C++ sort by keys+ts+tiebreak,
    run boundaries from exact dictionary codes, one vectorized diff
    against the previous row.  Full rows survive byte-exact."""
    from ..hashing import hash64_columns

    window_us = int(round(window_sec * 1e6))

    def add_bucket(batch: pa.Table) -> pa.Table:
        bucket = hash64_columns(batch, [keys[0]]) % np.uint64(n_buckets)
        return batch.append_column(
            "bucket", pa.array(bucket.astype(np.int64), pa.int64())
        )

    def _codes(col) -> np.ndarray:
        enc = pc.dictionary_encode(col)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        return enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)

    def walk(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["bucket"]).sort_by(
            [(k, "ascending") for k in keys]
            + [(ts_col, "ascending"), (tiebreak_col, "ascending")]
        )
        n = g.num_rows
        if n == 0:
            return g
        new_run = np.zeros(n, bool)
        new_run[0] = True
        for k in keys:
            c = _codes(g[k])
            new_run[1:] |= c[1:] != c[:-1]
        ts = (
            g[ts_col]
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        keep = new_run.copy()
        keep[1:] |= (ts[1:] - ts[:-1]) > window_us
        return g.filter(pa.array(keep))

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(walk, batch_format="pyarrow")
    )


def rolling_distinct_daily(
    ds: ray.data.Dataset,
    *,
    id_col: str = "user_id",
    ts_col: str = "ts",
    window_days: int = 7,
    n_buckets: int | None = None,
) -> ray.data.Dataset:
    """Rolling-window DISTINCT cardinality: for every observed day, the
    exact number of distinct ids active in the trailing ``window_days``
    days (current day inclusive) — the DAU/WAU-style metric a rolling SUM
    cannot answer because distinctness does not pre-aggregate.

    Plan: (1) a tiny ts-only pass collects the OBSERVED day set (bounded
    by the calendar) and broadcasts its sorted ordinals; (2) blocks reduce
    to distinct (id, day) pairs before ONE id-keyed exchange; (3) each
    bucket re-distincts, fans every pair out to the observed window days
    it contributes to (searchsorted against the broadcast ordinals — at
    most ``window_days`` rows each, RANGE-frame semantics: absent days
    don't emit rows but are still looked through), re-distincts the
    (id, window-day) pairs — exact because ALL of one id's pairs live in
    this bucket — and emits per-day partial counts; (4) the final
    exchange sums one partial row per (day, bucket).  Nothing bigger than the
    distinct-pair stream ever moves."""
    import ray

    from ..cluster import assembly_buckets_for_bytes, dataset_size_estimate

    if n_buckets is None:
        # the exchange carries distinct (id, day) pairs — size its group
        # count from the input estimate, never a fixed 64
        n_buckets = assembly_buckets_for_bytes(dataset_size_estimate(ds))

    def prep(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col].cast(pa.timestamp("us")).cast(pa.int64())
        od = np.floor_divide(
            ts.to_numpy(zero_copy_only=False), 86_400_000_000
        )
        t = pa.table({"id": batch[id_col], "od": pa.array(od, pa.int64())})
        return t.group_by(["id", "od"]).aggregate([])

    def days_only(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col].cast(pa.timestamp("us")).cast(pa.int64())
        od = np.floor_divide(
            ts.to_numpy(zero_copy_only=False), 86_400_000_000
        )
        return pa.table({"od": pa.array(od, pa.int64())}).group_by(
            "od"
        ).aggregate([])

    from ..cluster import collect_table

    obs = collect_table(ds.map_batches(days_only, batch_format="pyarrow"))
    if obs is None:
        return ray.data.from_arrow(
            pa.table(
                {"day": pa.array([], pa.string()),
                 "n_distinct": pa.array([], pa.int64())}
            )
        )
    ods = np.unique(obs["od"].to_numpy(zero_copy_only=False))
    obs_ref = ray.put(ods)

    def add_bucket(batch: pa.Table) -> pa.Table:
        ids = batch["id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        from ..hashing import id_bucket_array

        return batch.append_column(
            "bucket", id_bucket_array(ids, n_buckets)
        )

    def per_bucket(group: pa.Table) -> pa.Table:
        g = group.select(["id", "od"]).group_by(["id", "od"]).aggregate([])
        od = g["od"].to_numpy(zero_copy_only=False)
        days = ray.get(obs_ref)
        lo = np.searchsorted(days, od, "left")
        hi = np.searchsorted(days, od + window_days, "left")
        cnt = hi - lo
        total = int(cnt.sum())
        # segmented arange over the observed-day slots each pair covers
        offs = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(cnt) - cnt, cnt
        )
        wod = days[np.repeat(lo, cnt) + offs]
        ids = g["id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        ids_rep = ids.take(
            pa.array(np.repeat(np.arange(len(od), dtype=np.int64), cnt))
        )
        pairs = pa.table(
            {"id": ids_rep, "wod": pa.array(wod, pa.int64())}
        ).group_by(["id", "wod"]).aggregate([])
        counts = pairs.group_by("wod").aggregate([([], "count_all")])
        return pa.table(
            {
                "wod": counts["wod"],
                "n": counts["count_all"].cast(pa.int64()),
            }
        )

    from .agg import bucket_groupby_sum

    agg = bucket_groupby_sum(
        ds.map_batches(prep, batch_format="pyarrow")
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow"),
        ["wod"],
        ["n"],
    )

    def to_day(batch: pa.Table) -> pa.Table:
        # wod is epoch DAYS; scale to seconds before the timestamp cast
        od = pc.multiply(batch["wod"], 86_400).cast(pa.timestamp("s"))
        return pa.table(
            {
                "day": pc.strftime(od, format="%Y-%m-%d"),
                "n_distinct": batch["n"],
            }
        )

    return agg.map_batches(to_day, batch_format="pyarrow").sort("day")


def group_running_sum(
    ds: ray.data.Dataset,
    *,
    keys: list[str],
    order_cols: list[tuple[str, str]],
    col: str,
    out_col: str,
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """SQL ``SUM(col) OVER (PARTITION BY keys ORDER BY order_cols ROWS
    UNBOUNDED PRECEDING)`` — the running-total window aggregate
    (cumulative revenue per customer, balance after each transaction).
    Integer-only per the engine's exactness contract (a float running sum
    would still be deterministic here since each group computes in one
    fixed order, but int keeps it bit-trivial and matches the cents/ppm
    convention); NULL values add nothing and carry the running total
    forward, exactly SQL's null-skipping SUM — a group whose prefix is
    all-NULL yields NULL, not 0.

    Same skeleton as :func:`with_lag` (one coarse-bucket exchange, C++
    sort per bucket): the walk is ONE global ``np.cumsum`` minus each
    run's offset (the prefix total just before the run starts) — no
    per-group loop.  ``order_cols`` should be a total order (include a
    unique id), as for any SQL running window.
    """
    from ..hashing import hash64_columns

    schema = ds.schema().base_schema
    if not pa.types.is_integer(schema.field(col).type):
        raise ValueError(
            f"{col!r} must be integer (got {schema.field(col).type}) — "
            "quantize floats to cents/ppm per the engine convention"
        )

    def add_bucket(batch: pa.Table) -> pa.Table:
        bucket = hash64_columns(batch, keys) % np.uint64(n_buckets)
        return batch.append_column(
            "bucket", pa.array(bucket.astype(np.int64), pa.int64())
        )

    def _codes(c) -> np.ndarray:
        enc = pc.dictionary_encode(c)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        return enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)

    def walk(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["bucket"]).sort_by(
            [(k, "ascending") for k in keys] + list(order_cols)
        )
        n = g.num_rows
        if n == 0:
            out = {c: g[c] for c in g.column_names}
            out[out_col] = pa.array([], pa.int64())
            return pa.table(out)
        new_run = np.zeros(n, bool)
        new_run[0] = True
        for k in keys:
            c = _codes(g[k])
            new_run[1:] |= c[1:] != c[:-1]
        vcol = g[col].cast(pa.int64())
        if isinstance(vcol, pa.ChunkedArray):
            vcol = vcol.combine_chunks()
        valid = np.asarray(vcol.is_valid())
        v = vcol.to_numpy(zero_copy_only=False)
        v = np.where(valid, v, 0).astype(np.int64)
        idx = np.arange(n, dtype=np.int64)
        run_start = np.maximum.accumulate(np.where(new_run, idx, 0))
        # int64 honesty: the global cumsum's CROSS-run wrap cancels in the
        # base subtraction (two's complement), but each run's true total
        # must itself fit — guard max run length × max |v|
        starts = np.flatnonzero(new_run)
        run_len = int(np.diff(np.append(starts, n)).max())
        vmax = int(np.abs(v).max()) if n else 0
        if vmax and run_len > int((2**63 - 1) * 0.9) // vmax:
            raise ValueError(
                "group_running_sum: a group risks the int64 running-total "
                f"horizon (len {run_len} × max|v| {vmax}) — rescale the "
                "quantization"
            )
        total = np.cumsum(v)
        # prefix total just before each run starts
        base = np.where(run_start > 0, total[run_start - 1], 0)
        run_sum = total - base
        # SQL SUM over an all-NULL prefix is NULL: a row's window has a
        # value iff any valid value appeared in its run so far
        seen = np.cumsum(valid.astype(np.int64))
        seen_base = np.where(run_start > 0, seen[run_start - 1], 0)
        has_val = (seen - seen_base) > 0
        out = {c: g[c] for c in g.column_names}
        out[out_col] = pa.array(run_sum, mask=~has_val, type=pa.int64())
        return pa.table(out)

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(walk, batch_format="pyarrow")
    )


def group_rolling_sum(
    ds: ray.data.Dataset,
    *,
    keys: list[str],
    order_cols: list[tuple[str, str]],
    col: str,
    out_col: str,
    window: int,
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """SQL ``SUM(col) OVER (PARTITION BY keys ORDER BY order_cols ROWS
    BETWEEN window−1 PRECEDING AND CURRENT ROW)`` — the row-based rolling
    aggregate beside the time-based ``sliding_window_daily``.  Integer
    only; SQL null semantics (a NULL adds nothing; a frame whose values
    are all NULL yields NULL).

    Same one-exchange skeleton as :func:`group_running_sum`; the walk is
    the cumsum-minus-shifted-cumsum identity with the shift CLAMPED at
    each run's start (``total[i] − total[max(i−window, run_start)−1]``) —
    two gathers, no per-group loop.  The int64 horizon bounds
    ``min(window, max run length) × max|v|``.
    """
    from ..hashing import hash64_columns

    if window < 1:
        raise ValueError("window must be >= 1")
    schema = ds.schema().base_schema
    if not pa.types.is_integer(schema.field(col).type):
        raise ValueError(
            f"{col!r} must be integer (got {schema.field(col).type}) — "
            "quantize floats to cents/ppm per the engine convention"
        )

    def add_bucket(batch: pa.Table) -> pa.Table:
        bucket = hash64_columns(batch, keys) % np.uint64(n_buckets)
        return batch.append_column(
            "bucket", pa.array(bucket.astype(np.int64), pa.int64())
        )

    def _codes(c) -> np.ndarray:
        enc = pc.dictionary_encode(c)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        return enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)

    def walk(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["bucket"]).sort_by(
            [(k, "ascending") for k in keys] + list(order_cols)
        )
        n = g.num_rows
        if n == 0:
            out = {c: g[c] for c in g.column_names}
            out[out_col] = pa.array([], pa.int64())
            return pa.table(out)
        new_run = np.zeros(n, bool)
        new_run[0] = True
        for k in keys:
            c = _codes(g[k])
            new_run[1:] |= c[1:] != c[:-1]
        vcol = g[col].cast(pa.int64())
        if isinstance(vcol, pa.ChunkedArray):
            vcol = vcol.combine_chunks()
        valid = np.asarray(vcol.is_valid())
        v = vcol.to_numpy(zero_copy_only=False)
        v = np.where(valid, v, 0).astype(np.int64)
        idx = np.arange(n, dtype=np.int64)
        run_start = np.maximum.accumulate(np.where(new_run, idx, 0))
        starts = np.flatnonzero(new_run)
        run_len = int(np.diff(np.append(starts, n)).max())
        vmax = int(np.abs(v).max()) if n else 0
        eff = min(window, run_len)
        if vmax and eff > int((2**63 - 1) * 0.9) // vmax:
            raise ValueError(
                "group_rolling_sum: the frame risks the int64 horizon "
                f"(window {eff} × max|v| {vmax}) — rescale the quantization"
            )
        total = np.cumsum(v)
        seen = np.cumsum(valid.astype(np.int64))
        # frame start: max(i − window + 1, run_start); base index is one
        # before it (−1 → contribute 0)
        fstart = np.maximum(idx - window + 1, run_start)
        base_idx = fstart - 1
        has_base = base_idx >= 0
        base = np.where(has_base, total[np.maximum(base_idx, 0)], 0)
        roll = total - base
        sbase = np.where(has_base, seen[np.maximum(base_idx, 0)], 0)
        has_val = (seen - sbase) > 0
        out = {c: g[c] for c in g.column_names}
        out[out_col] = pa.array(roll, mask=~has_val, type=pa.int64())
        return pa.table(out)

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(walk, batch_format="pyarrow")
    )


def group_ewma(
    ds: ray.data.Dataset,
    *,
    keys: list[str],
    order_cols: list[tuple[str, str]],
    col: str,
    out_col: str,
    alpha: float,
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """Per-group exponentially weighted moving average — the smoothing
    recurrence ``s_0 = v_0;  s_i = (1−α)·s_{i−1} + α·v_i`` (pandas
    ``ewm(adjust=False)``), SQL-expressible only as a recursive CTE.

    Bit-exactness contract: both sides evaluate the recurrence with the
    IDENTICAL float op sequence — ``(1−α)`` folds to one correctly-rounded
    constant, then per step one multiply (correctly rounded), one
    ``α·v`` multiply, and one add.  With α a negative power of two (0.5,
    0.25, 0.125…) ``α·v`` is an exact exponent shift, leaving exactly two
    rounding sites per step, identical in numpy and DuckDB — the oracle
    must spell the SAME decimal literal for α.

    Vectorization: a sequential recurrence cannot use a closed form
    without changing the rounding, so the walk loops over GROUP-LOCAL
    POSITIONS (step k updates every group's k-th row at once) — O(max
    group length) vector passes, zero per-row Python.  Groups are whole
    by construction (one coarse-bucket exchange, the running-sum
    skeleton); the pass count is bounded by the heaviest key's row count,
    the operator's documented partitioning assumption.

    ``col`` must be float64 and non-null (impute first — a silently
    skipped NULL would desynchronize the two sides' recurrences).
    """
    from ..hashing import hash64_columns

    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    a = np.float64(alpha)
    om = np.float64(1.0) - a  # the oracle's constant-folded (1 − α)

    def add_bucket(batch: pa.Table) -> pa.Table:
        bucket = hash64_columns(batch, keys) % np.uint64(n_buckets)
        return batch.append_column(
            "bucket", pa.array(bucket.astype(np.int64), pa.int64())
        )

    def _codes(c) -> np.ndarray:
        enc = pc.dictionary_encode(c)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        return enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)

    def walk(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["bucket"]).sort_by(
            [(k, "ascending") for k in keys] + list(order_cols)
        )
        n = g.num_rows
        out = {c: g[c] for c in g.column_names}
        if n == 0:
            out[out_col] = pa.array([], pa.float64())
            return pa.table(out)
        vcol = g[col]
        if isinstance(vcol, pa.ChunkedArray):
            vcol = vcol.combine_chunks()
        if not pa.types.is_float64(vcol.type):
            raise ValueError(
                f"group_ewma: {col!r} must be float64 (got {vcol.type})"
            )
        if vcol.null_count:
            raise ValueError(
                f"group_ewma: {col!r} has NULLs — impute first "
                "(stages/encode.impute_value); a skipped NULL would "
                "desynchronize the recurrence vs the SQL oracle"
            )
        v = vcol.to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
        new_run = np.zeros(n, bool)
        new_run[0] = True
        for k in keys:
            c = _codes(g[k])
            new_run[1:] |= c[1:] != c[:-1]
        starts = np.flatnonzero(new_run)
        run_len = np.diff(np.append(starts, n))
        s = np.empty(n, np.float64)
        s[starts] = v[starts]
        max_len = int(run_len.max())
        for k in range(1, max_len):
            sel = starts[run_len > k] + k
            # the pinned two-rounding step: om·prev (rounded) + a·v
            s[sel] = om * s[sel - 1] + a * v[sel]
        out[out_col] = pa.array(s, pa.float64())
        return pa.table(out)

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(walk, batch_format="pyarrow")
    )


def group_rolling_extremes(
    ds: ray.data.Dataset,
    *,
    keys: list[str],
    order_cols: list[tuple[str, str]],
    col: str,
    window: int,
    out_min: str | None = "roll_min",
    out_max: str | None = "roll_max",
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """SQL ``MIN(col) OVER (... ROWS BETWEEN window−1 PRECEDING AND
    CURRENT ROW)`` and/or ``MAX(...)`` — the rolling extremes beside
    :func:`group_rolling_sum` (extremes admit no cumsum identity, so
    this walk is the van Herk–Gil-Werman block decomposition: one
    forward and one backward ``minimum.accumulate`` over width-``window``
    blocks, then every full frame is ``min(R[frame_start], L[i])`` —
    O(n) TOTAL regardless of window width, no per-row loop, no
    (n × window) matrix).  Frames truncated at a group's start (the
    first ``window−1`` rows of each run) instead read a per-run prefix
    accumulate over a (runs × window−1) gather.

    Integer column only (the engine's exactness contract — extremes
    never overflow, but a float column would need the quantize
    convention anyway for the driver hash).  SQL null semantics: NULLs
    are skipped via ±sentinel substitution; an all-NULL frame yields
    NULL.  Emits whichever of ``out_min`` / ``out_max`` is non-None in
    ONE walk over ONE coarse-bucket exchange.
    """
    from ..hashing import hash64_columns

    if window < 1:
        raise ValueError("window must be >= 1")
    if out_min is None and out_max is None:
        raise ValueError("at least one of out_min/out_max is required")
    schema = ds.schema().base_schema
    if not pa.types.is_integer(schema.field(col).type):
        raise ValueError(
            f"{col!r} must be integer (got {schema.field(col).type}) — "
            "quantize floats to cents/ppm per the engine convention"
        )

    def add_bucket(batch: pa.Table) -> pa.Table:
        bucket = hash64_columns(batch, keys) % np.uint64(n_buckets)
        return batch.append_column(
            "bucket", pa.array(bucket.astype(np.int64), pa.int64())
        )

    def _codes(c) -> np.ndarray:
        enc = pc.dictionary_encode(c)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        return enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)

    def _van_herk(
        v: np.ndarray, reduce, sentinel: int
    ) -> tuple[np.ndarray, np.ndarray]:
        """(L, R): within-block prefix and suffix accumulates, blocks of
        width ``window`` by absolute index.  The tail pad must be the
        op's neutral sentinel — R in the final partial block reads it."""
        n = len(v)
        pad = (-n) % window
        vp = np.concatenate([v, np.full(pad, sentinel, v.dtype)])
        m = vp.reshape(-1, window)
        L = reduce.accumulate(m, axis=1).ravel()[:n]
        R = reduce.accumulate(m[:, ::-1], axis=1)[:, ::-1].ravel()[:n]
        return L, R

    def walk(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["bucket"]).sort_by(
            [(k, "ascending") for k in keys] + list(order_cols)
        )
        n = g.num_rows
        out = {c: g[c] for c in g.column_names}
        if n == 0:
            if out_min is not None:
                out[out_min] = pa.array([], pa.int64())
            if out_max is not None:
                out[out_max] = pa.array([], pa.int64())
            return pa.table(out)
        vcol = g[col].cast(pa.int64())
        if isinstance(vcol, pa.ChunkedArray):
            vcol = vcol.combine_chunks()
        valid = np.asarray(vcol.is_valid())
        # null-bearing int64 comes back as float64+NaN — zero-fill BEFORE
        # the int cast (an int64-max sentinel would not survive the float
        # round-trip: float64(2^63−1) == 2^63 overflows back to int64.min)
        vraw = vcol.to_numpy(zero_copy_only=False)
        vraw = np.where(valid, vraw, 0).astype(np.int64)
        new_run = np.zeros(n, bool)
        new_run[0] = True
        for k in keys:
            c = _codes(g[k])
            new_run[1:] |= c[1:] != c[:-1]
        idx = np.arange(n, dtype=np.int64)
        run_start = np.maximum.accumulate(np.where(new_run, idx, 0))
        pos = idx - run_start
        starts = np.flatnonzero(new_run)
        run_len = np.diff(np.append(starts, n))
        fstart = np.maximum(idx - window + 1, run_start)
        # frame null-skipping: any valid value in [fstart, i]?
        seen = np.cumsum(valid.astype(np.int64))
        base_idx = fstart - 1
        has_base = base_idx >= 0
        sbase = np.where(has_base, seen[np.maximum(base_idx, 0)], 0)
        has_val = (seen - sbase) > 0

        def one(reduce, sentinel: int) -> pa.Array:
            v = np.where(valid, vraw, sentinel).astype(np.int64)
            L, R = _van_herk(v, reduce, sentinel)
            full = pos >= window - 1
            res = np.empty(n, np.int64)
            res[full] = reduce(R[fstart[full]], L[idx[full]])
            # truncated frames: per-run prefix accumulate over the first
            # window−1 positions
            if window > 1 and (~full).any():
                k = np.arange(window - 1, dtype=np.int64)
                gi = starts[:, None] + k[None, :]
                inside = k[None, :] < np.minimum(run_len, window - 1)[:, None]
                mat = v[np.minimum(gi, n - 1)]
                mat = np.where(inside, mat, sentinel)
                pref = reduce.accumulate(mat, axis=1)
                tr = np.flatnonzero(~full)
                run_id = np.cumsum(new_run) - 1
                res[tr] = pref[run_id[tr], pos[tr]]
            return pa.array(res, mask=~has_val, type=pa.int64())

        if out_min is not None:
            out[out_min] = one(np.minimum, np.iinfo(np.int64).max)
        if out_max is not None:
            out[out_max] = one(np.maximum, np.iinfo(np.int64).min)
        return pa.table(out)

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(walk, batch_format="pyarrow")
    )


def group_last_match(
    ds: ray.data.Dataset,
    *,
    keys: list[str],
    order_cols: list[tuple[str, str]],
    flag_col: str,
    payload_cols: dict[str, str],
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """For every row, carry the payload columns of the LATEST
    STRICTLY-PRECEDING row in its group whose ``flag_col`` is true — SQL
    ``LAST_VALUE(CASE WHEN flag THEN payload END IGNORE NULLS) OVER
    (PARTITION BY keys ORDER BY order_cols ROWS BETWEEN UNBOUNDED
    PRECEDING AND 1 PRECEDING)``.  The attribution primitive: with
    ``flag = (event_type = 'view')`` each purchase row receives its
    last-touch view; rows with no preceding match carry NULLs.

    ``payload_cols`` maps source column → output column.  The walk is
    three vector ops on top of the running-sum skeleton: a global
    ``maximum.accumulate`` of flagged indices, a one-slot shift for the
    "strictly preceding" frame, and a validity test ``prev ≥ run_start``
    (an earlier GROUP's match index is always < this run's start, so the
    global accumulate needs no segmented reset); payloads gather through
    a null-masked ``take``.  One coarse-bucket exchange, no per-row
    Python.
    """
    from ..hashing import hash64_columns

    if not payload_cols:
        raise ValueError("payload_cols must name at least one column")

    def add_bucket(batch: pa.Table) -> pa.Table:
        bucket = hash64_columns(batch, keys) % np.uint64(n_buckets)
        return batch.append_column(
            "bucket", pa.array(bucket.astype(np.int64), pa.int64())
        )

    def _codes(c) -> np.ndarray:
        enc = pc.dictionary_encode(c)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        return enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)

    def walk(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["bucket"]).sort_by(
            [(k, "ascending") for k in keys] + list(order_cols)
        )
        n = g.num_rows
        out = {c: g[c] for c in g.column_names}
        if n == 0:
            for src, dst in payload_cols.items():
                out[dst] = g[src]
            return pa.table(out)
        fcol = g[flag_col]
        if isinstance(fcol, pa.ChunkedArray):
            fcol = fcol.combine_chunks()
        flag = np.asarray(fcol.is_valid()) & fcol.to_numpy(
            zero_copy_only=False
        ).astype(bool)
        new_run = np.zeros(n, bool)
        new_run[0] = True
        for k in keys:
            c = _codes(g[k])
            new_run[1:] |= c[1:] != c[:-1]
        idx = np.arange(n, dtype=np.int64)
        run_start = np.maximum.accumulate(np.where(new_run, idx, 0))
        last = np.maximum.accumulate(np.where(flag, idx, -1))
        prev = np.r_[np.int64(-1), last[:-1]]
        ok = prev >= run_start  # cross-run indices fail this by ordering
        indices = pa.array(np.maximum(prev, 0), mask=~ok, type=pa.int64())
        for src, dst in payload_cols.items():
            col = g[src]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            out[dst] = col.take(indices)
        return pa.table(out)

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(walk, batch_format="pyarrow")
    )


def group_holt(
    ds: ray.data.Dataset,
    *,
    keys: list[str],
    order_cols: list[tuple[str, str]],
    col: str,
    alpha: float,
    beta: float,
    level_col: str = "level",
    trend_col: str = "trend",
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """Holt double-exponential smoothing per group — the trend-aware
    sibling of :func:`group_ewma`:

        l_0 = v_0;  b_0 = 0
        l_i = α·v_i + (1−α)·(l_{i−1} + b_{i−1})
        b_i = β·(l_i − l_{i−1}) + (1−β)·b_{i−1}

    Same bit-exactness contract (identical correctly-rounded op sequence
    vs the oracle's recursive CTE; α, β SHOULD be negative powers of two
    so the α·v / β·d multiplies are exact shifts) and the same
    position-vectorized walk (two coupled state arrays updated per
    group-local step).  ``col`` must be non-null float64.
    """
    from ..hashing import hash64_columns

    for nm, a in (("alpha", alpha), ("beta", beta)):
        if not (0.0 < a <= 1.0):
            raise ValueError(f"{nm} must be in (0, 1], got {a}")
    a = np.float64(alpha)
    b_ = np.float64(beta)
    oma = np.float64(1.0) - a
    omb = np.float64(1.0) - b_

    def add_bucket(batch: pa.Table) -> pa.Table:
        bucket = hash64_columns(batch, keys) % np.uint64(n_buckets)
        return batch.append_column(
            "bucket", pa.array(bucket.astype(np.int64), pa.int64())
        )

    def _codes(c) -> np.ndarray:
        enc = pc.dictionary_encode(c)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        return enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)

    def walk(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["bucket"]).sort_by(
            [(k, "ascending") for k in keys] + list(order_cols)
        )
        n = g.num_rows
        out = {c: g[c] for c in g.column_names}
        if n == 0:
            out[level_col] = pa.array([], pa.float64())
            out[trend_col] = pa.array([], pa.float64())
            return pa.table(out)
        vcol = g[col]
        if isinstance(vcol, pa.ChunkedArray):
            vcol = vcol.combine_chunks()
        if not pa.types.is_float64(vcol.type):
            raise ValueError(
                f"group_holt: {col!r} must be float64 (got {vcol.type})"
            )
        if vcol.null_count:
            raise ValueError(
                f"group_holt: {col!r} has NULLs — impute first; a skipped "
                "NULL would desynchronize the recurrence vs the oracle"
            )
        v = vcol.to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
        new_run = np.zeros(n, bool)
        new_run[0] = True
        for k in keys:
            c = _codes(g[k])
            new_run[1:] |= c[1:] != c[:-1]
        starts = np.flatnonzero(new_run)
        run_len = np.diff(np.append(starts, n))
        lev = np.empty(n, np.float64)
        trd = np.empty(n, np.float64)
        lev[starts] = v[starts]
        trd[starts] = 0.0
        for k in range(1, int(run_len.max())):
            sel = starts[run_len > k] + k
            lp = lev[sel - 1]
            s = lp + trd[sel - 1]
            l_new = a * v[sel] + oma * s
            lev[sel] = l_new
            trd[sel] = b_ * (l_new - lp) + omb * trd[sel - 1]
        out[level_col] = pa.array(lev, pa.float64())
        out[trend_col] = pa.array(trd, pa.float64())
        return pa.table(out)

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(walk, batch_format="pyarrow")
    )
