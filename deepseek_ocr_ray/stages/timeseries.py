"""Whole-series time-series analytics over daily-bucketed counts —
lead-lag cross-correlation and CUSUM change-point scan.

Both operators share one shape: ONE map-combined count exchange reduces
the event stream to a per-day table (the series' support — bounded by the
calendar span, not the row count), then an exact-integer finalize runs
driver-side over that support (the KS/Mann-Whitney convention in
``stages/profile.py``).  Everything is exact:

- lead-lag: the lag-k dot product Σ_t x_t·y_{t+k} is unchanged by
  zero-filled days (zero terms contribute nothing), so it reduces to a
  sum over OBSERVED day pairs — exact ints, no floats anywhere.
- CUSUM: deviations from the mean are scaled by n to stay integral —
  S_t = Σ_{i≤t} (n·x_i − T) = n·P_t − t·T with P the prefix sum and T
  the total — and the change point is argmax |S_t| (earliest day wins
  ties, pinned).

No reference counterpart (the reference has no analytics surface).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

US_PER_DAY = 86_400_000_000


def daily_counts(
    ds: ray.data.Dataset,
    ts_col: str,
    *,
    flag_cols: dict[str, str] | None = None,
    n_buckets: int = 64,
) -> list[dict]:
    """Reduce an event stream to one row per DISTINCT day
    (``epoch_us // 86400e6`` with INTEGER-DIVISION semantics):
    ``{day, n, <flag sums>}``, sorted ascending.  ``flag_cols`` maps an
    existing 0/1 int column → output sum name.

    Day-bucket rule, pinned for oracle parity: TRUNCATION toward zero —
    what both ``pc.divide`` on int64 and DuckDB's integer ``//``
    actually do (verified: ``SELECT -1 // 86400000000`` → 0 in DuckDB).
    Identical to floor for ts ≥ 0 (every benchmark table); a pre-1970
    timestamp lands one day later than the calendar day — both sides
    agree, which is the contract (see the pre-epoch parity test)."""
    from .agg import bucket_groupby_sum

    flag_cols = flag_cols or {}

    def prep(batch: pa.Table) -> pa.Table:
        day = pc.divide(
            batch[ts_col].cast(pa.int64()), pa.scalar(US_PER_DAY, pa.int64())
        )
        out = {"day": pc.cast(day, pa.int64())}
        for src, dst in flag_cols.items():
            out[dst] = batch[src].cast(pa.int64())
        return pa.table(out)

    rows = bucket_groupby_sum(
        ds.map_batches(prep, batch_format="pyarrow"),
        keys=["day"],
        sum_cols=list(flag_cols.values()),
        count_col="n",
        n_buckets=n_buckets,
    ).take_all()
    rows.sort(key=lambda r: r["day"])
    return rows


def lead_lag_dots(
    ds: ray.data.Dataset,
    ts_col: str,
    x_flag: str,
    y_flag: str,
    *,
    max_lag: int = 7,
    n_buckets: int = 64,
) -> pa.Table:
    """Lead-lag scan: for every lag k in [−max_lag, max_lag], the exact
    integer cross-product ``dot_k = Σ_t x_t · y_{t+k}`` between two daily
    count series (x = per-day sum of ``x_flag``, y = of ``y_flag`` — 0/1
    int columns).  A positive-lag peak means x LEADS y by k days — the
    "do views predict purchases" primitive.

    Zero-filled days drop out of the dot product, so the finalize sums
    over observed day pairs only; every lag row always appears (dot 0
    when no pairs overlap — an empty lag is itself the signal).  Returns
    ``(lag, dot, n_pairs)`` rows, lag ascending.
    """
    if max_lag < 0:
        raise ValueError("max_lag must be >= 0")
    rows = daily_counts(
        ds, ts_col, flag_cols={x_flag: "x", y_flag: "y"}, n_buckets=n_buckets
    )
    xs = {int(r["day"]): int(r["x"]) for r in rows}
    ys = {int(r["day"]): int(r["y"]) for r in rows}
    lags = list(range(-max_lag, max_lag + 1))
    dots = []
    pairs = []
    for k in lags:
        d = 0
        c = 0
        for day, x in xs.items():
            y = ys.get(day + k)
            if y is not None:
                d += x * y  # exact Python ints
                c += 1
        dots.append(d)
        pairs.append(c)
    return pa.table(
        {
            "lag": pa.array(lags, pa.int64()),
            "dot": pa.array(dots, pa.int64()),
            "n_pairs": pa.array(pairs, pa.int64()),
        }
    )


def cusum_change_point(
    ds: ray.data.Dataset,
    ts_col: str,
    *,
    n_buckets: int = 64,
) -> pa.Table:
    """CUSUM change-point scan over the daily event-count series: with
    x_1..x_n the per-day counts over the OBSERVED days (ascending), T
    their total and P_t the prefix sum, the mean-scaled cumulative sum
    ``S_t = n·P_t − t·T`` is exact-integer; the change point is the day
    with max |S_t| (earliest wins ties).  Returns one row:
    ``(change_day, cusum_abs, n_days, total)``.
    """
    rows = daily_counts(ds, ts_col, n_buckets=n_buckets)
    if not rows:
        return pa.table(
            {
                "change_day": pa.array([None], pa.int64()),
                "cusum_abs": pa.array([0], pa.int64()),
                "n_days": pa.array([0], pa.int64()),
                "total": pa.array([0], pa.int64()),
            }
        )
    days = [int(r["day"]) for r in rows]
    x = [int(r["n"]) for r in rows]
    n = len(x)
    total = sum(x)
    best_day = None
    best = -1
    p = 0
    for t in range(n):
        p += x[t]
        s = abs(n * p - (t + 1) * total)  # exact Python ints
        if s > best:
            best = s
            best_day = days[t]
    return pa.table(
        {
            "change_day": pa.array([best_day], pa.int64()),
            "cusum_abs": pa.array([best], pa.int64()),
            "n_days": pa.array([n], pa.int64()),
            "total": pa.array([total], pa.int64()),
        }
    )


def theil_sen_slope(
    ds: ray.data.Dataset,
    ts_col: str,
    *,
    n_buckets: int = 64,
) -> pa.Table:
    """Theil-Sen robust trend of the daily event-count series: the
    DISCRETE median of all pairwise slopes ``(x_j − x_i)/(day_j − day_i)``
    over the calendar support — outlier days cannot drag it the way they
    drag OLS.

    Exactness: each slope is ONE correctly-rounded int/int double
    division; the median picks the sorted element at ``floor((m−1)/2)``
    (the ``quantile_disc`` convention, identical in the oracle), so the
    result is bit-equal to SQL.  The pair set is O(n_days²) — bounded by
    the CALENDAR, not the corpus (the support-finalize convention);
    fewer than two days yields a NULL slope.

    Returns one row: ``(slope, n_days, n_pairs)``.
    """
    rows = daily_counts(ds, ts_col, n_buckets=n_buckets)
    days = np.array([int(r["day"]) for r in rows], np.int64)
    x = np.array([int(r["n"]) for r in rows], np.int64)
    n = len(rows)
    if n < 2:
        return pa.table(
            {
                "slope": pa.array([None], pa.float64()),
                "n_days": pa.array([n], pa.int64()),
                "n_pairs": pa.array([0], pa.int64()),
            }
        )
    i, j = np.triu_indices(n, k=1)
    slopes = (x[j] - x[i]).astype(np.float64) / (days[j] - days[i]).astype(
        np.float64
    )
    slopes.sort(kind="stable")
    m = len(slopes)
    med = float(slopes[(m - 1) // 2])
    return pa.table(
        {
            "slope": pa.array([med], pa.float64()),
            "n_days": pa.array([n], pa.int64()),
            "n_pairs": pa.array([m], pa.int64()),
        }
    )
