"""Lead-lag + CUSUM time-series scans (stages/timeseries.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from deepseek_ocr_ray.stages.timeseries import (
    US_PER_DAY,
    cusum_change_point,
    lead_lag_dots,
)


def _events(days_x, days_y):
    """One event per (day, flag) listing: x-flagged on days_x, y on
    days_y (days may repeat for higher counts)."""
    ts = [d * US_PER_DAY + 1 for d in days_x] + [
        d * US_PER_DAY + 2 for d in days_y
    ]
    is_x = [1] * len(days_x) + [0] * len(days_y)
    is_y = [0] * len(days_x) + [1] * len(days_y)
    return pa.table(
        {
            "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            "x": pa.array(is_x, pa.int64()),
            "y": pa.array(is_y, pa.int64()),
        }
    )


def test_lead_lag_engineered_shift(ray_session):
    """y is exactly x shifted +2 days ⇒ the lag-2 dot dominates."""
    import ray.data

    days_x = [0, 0, 1, 3, 3, 3, 7]
    days_y = [d + 2 for d in days_x]
    t = _events(days_x, days_y)
    got = lead_lag_dots(
        ray.data.from_arrow(t).repartition(3), "ts", "x", "y", max_lag=3
    ).to_pylist()
    assert [r["lag"] for r in got] == list(range(-3, 4))
    by_lag = {r["lag"]: r["dot"] for r in got}
    # dot at +2 = sum of x_d² = 4 + 1 + 9 + 1
    assert by_lag[2] == 15
    assert by_lag[2] == max(by_lag.values())
    # reference at every lag
    from collections import Counter

    cx, cy = Counter(days_x), Counter(days_y)
    for k in range(-3, 4):
        want = sum(v * cy.get(d + k, 0) for d, v in cx.items())
        assert by_lag[k] == want, k


def test_lead_lag_empty_lag_rows_kept(ray_session):
    import ray.data

    t = _events([0], [100])  # no overlap within ±2
    got = lead_lag_dots(
        ray.data.from_arrow(t), "ts", "x", "y", max_lag=2
    ).to_pylist()
    assert len(got) == 5
    assert all(r["dot"] == 0 for r in got)
    with pytest.raises(ValueError, match="max_lag"):
        lead_lag_dots(ray.data.from_arrow(t), "ts", "x", "y", max_lag=-1)


def test_cusum_engineered_level_shift(ray_session):
    """Counts 1,1,1,9,9,9 — the |CUSUM| peak sits at the last low day."""
    import ray.data

    days = []
    for d, c in enumerate([1, 1, 1, 9, 9, 9]):
        days += [d] * c
    ts = [d * US_PER_DAY + 5 for d in days]
    t = pa.table(
        {"ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us"))}
    )
    got = cusum_change_point(
        ray.data.from_arrow(t).repartition(2), "ts"
    ).to_pylist()[0]
    # reference scan
    x = [1, 1, 1, 9, 9, 9]
    n, tot = len(x), sum(x)
    p = 0
    best, best_day = -1, None
    for i, v in enumerate(x):
        p += v
        s = abs(n * p - (i + 1) * tot)
        if s > best:
            best, best_day = s, i
    assert got == {
        "change_day": best_day,
        "cusum_abs": best,
        "n_days": n,
        "total": tot,
    }
    assert best_day == 2  # the last low day


def test_cusum_empty_and_tie(ray_session):
    import ray.data

    empty = pa.table(
        {"ts": pa.array([], pa.int64()).cast(pa.timestamp("us"))}
    )
    got = cusum_change_point(ray.data.from_arrow(empty), "ts").to_pylist()[0]
    assert got["change_day"] is None and got["n_days"] == 0
    # symmetric series: |S| ties — earliest day wins
    days = [0, 1, 1, 2]  # counts 1,2,1 → S = |3·1−4|, |3·3−8|, |0|
    ts = [d * US_PER_DAY for d in days]
    t = pa.table({"ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us"))})
    got = cusum_change_point(ray.data.from_arrow(t), "ts").to_pylist()[0]
    assert got["change_day"] == 0 and got["cusum_abs"] == 1


def test_theil_sen_engineered(ray_session):
    """Linear series with one outlier day: the median slope stays on the
    true trend while OLS would drift."""
    import ray.data

    from deepseek_ocr_ray.stages.timeseries import theil_sen_slope

    # counts 2,4,6,8,100 on days 0..4 — true slope 2, one wild outlier
    days = []
    for d, c in enumerate([2, 4, 6, 8, 100]):
        days += [d] * c
    ts = [d * US_PER_DAY for d in days]
    t = pa.table({"ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us"))})
    got = theil_sen_slope(
        ray.data.from_arrow(t).repartition(2), "ts"
    ).to_pylist()[0]
    assert got["n_days"] == 5 and got["n_pairs"] == 10
    assert got["slope"] == 2.0  # median of pairwise slopes ignores the spike
    # reference: full pairwise median with the same index convention
    import numpy as np

    x = np.array([2, 4, 6, 8, 100], np.float64)
    dd = np.arange(5, dtype=np.float64)
    sl = sorted(
        (x[j] - x[i]) / (dd[j] - dd[i])
        for i in range(5)
        for j in range(i + 1, 5)
    )
    assert got["slope"] == sl[(len(sl) - 1) // 2]


def test_theil_sen_degenerate(ray_session):
    import ray.data

    from deepseek_ocr_ray.stages.timeseries import theil_sen_slope

    one = pa.table(
        {"ts": pa.array([5], pa.int64()).cast(pa.timestamp("us"))}
    )
    got = theil_sen_slope(ray.data.from_arrow(one), "ts").to_pylist()[0]
    assert got == {"slope": None, "n_days": 1, "n_pairs": 0}


def test_daily_counts_pre_epoch_duckdb_parity(ray_session):
    """Pre-1970 timestamps bucket EXACTLY as the DuckDB ``//`` oracle
    does (truncation toward zero — ``SELECT -1 // 86400000000`` is 0 in
    DuckDB, not −1): engine and oracle must agree on negatives too."""
    import duckdb
    import ray.data

    from deepseek_ocr_ray.stages.timeseries import daily_counts

    ts = [-1, -US_PER_DAY, -US_PER_DAY - 1, 0, 1, US_PER_DAY,
          US_PER_DAY - 1, -2 * US_PER_DAY + 5]
    tab = pa.table(
        {"ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us"))}
    )
    rows = daily_counts(ray.data.from_arrow(tab), "ts")
    got = {r["day"]: r["n"] for r in rows}
    want_df = duckdb.sql(
        "SELECT CAST(e // 86400000000 AS BIGINT) AS day,"
        "       CAST(COUNT(*) AS BIGINT) AS n "
        "FROM (SELECT UNNEST({}) AS e) GROUP BY 1".format(ts)
    ).df()
    want = dict(zip(want_df["day"], want_df["n"]))
    assert got == {int(k): int(v) for k, v in want.items()}
    # truncation semantics both sides: ts=-1us is day 0, ts=-D-1 is day -1
    assert got[0] == 4 and got[-1] == 3
