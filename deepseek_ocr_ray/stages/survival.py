"""Survival analysis — the Kaplan-Meier product-limit estimator.

The retention-curve primitive: given per-subject ``(duration, observed)``
pairs (observed = the terminal event happened; 0 = right-censored at that
duration), estimate S(t) = P(survive past t).  No reference counterpart
(the reference has no analytics surface); standard methodology per the
product-limit construction.

Exactness contract (the recursive-CTE recipe shared with
``windows.group_ewma``): the survival recurrence

    s_0 = 1;   s_k = s_{k-1} * (1 - d_k / n_k)

is evaluated with the IDENTICAL float op sequence on both sides — one
correctly-rounded division, one subtraction, one multiplication per event
time, in ascending duration order — so the emitted doubles are bit-equal
to a DuckDB recursive CTE spelling the same expression.  The at-risk
counts, event counts and censor counts are exact integers.

Plan: ONE map-combined count exchange reduces the subjects to one row per
DISTINCT duration (the life table's support — bounded by the duration
domain, not the subject count); the suffix-cumulative at-risk scan and the
product walk run driver-side over that support, mirroring the
KS/Mann-Whitney finalize convention in ``stages/profile.py``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def kaplan_meier(
    ds: ray.data.Dataset,
    duration_col: str,
    observed_col: str,
    *,
    n_buckets: int = 64,
) -> pa.Table:
    """Kaplan-Meier life table over ``(duration_col, observed_col)``
    subject rows — one output row per DISTINCT duration, ascending:
    ``(duration, n_risk, n_event, n_censored, surv)``.

    ``duration_col`` must be integer (days/seconds — quantized time);
    ``observed_col`` must be integer 0/1 (1 = event, 0 = right-censored).
    NULLs in either raise loudly.  Censored-only durations keep their row
    (they shrink the risk set; their factor is exactly 1.0).
    """
    from .agg import bucket_groupby_sum

    schema = ds.schema().base_schema
    for c in (duration_col, observed_col):
        if not pa.types.is_integer(schema.field(c).type):
            raise ValueError(
                f"kaplan_meier: {c!r} must be integer "
                f"(got {schema.field(c).type})"
            )

    def prep(batch: pa.Table) -> pa.Table:
        dur = batch[duration_col]
        obs = batch[observed_col]
        if dur.null_count or obs.null_count:
            raise ValueError(
                "kaplan_meier: NULL duration/observed — filter or impute "
                "first (a dropped subject would shrink the risk set "
                "silently)"
            )
        o = obs.cast(pa.int64())
        bad = pc.any(
            pc.or_(pc.less(o, 0), pc.greater(o, 1))
        ).as_py()
        if bad:
            raise ValueError("kaplan_meier: observed must be 0 or 1")
        return pa.table(
            {
                "dur": dur.cast(pa.int64()),
                "d": o,
                "cens": pc.subtract(pa.scalar(1, pa.int64()), o),
            }
        )

    rows = bucket_groupby_sum(
        ds.map_batches(prep, batch_format="pyarrow"),
        keys=["dur"],
        sum_cols=["d", "cens"],
        n_buckets=n_buckets,
    ).take_all()
    rows.sort(key=lambda r: r["dur"])
    d = np.array([int(r["d"]) for r in rows], np.int64)
    cens = np.array([int(r["cens"]) for r in rows], np.int64)
    tot = d + cens
    # at risk at duration t: subjects with duration >= t (suffix cumsum)
    n_risk = np.cumsum(tot[::-1])[::-1]
    surv = np.empty(len(rows), np.float64)
    s = np.float64(1.0)
    for k in range(len(rows)):
        # the pinned three-op step: d/n (rounded), 1 − · (rounded), s·
        factor = np.float64(1.0) - np.float64(d[k]) / np.float64(n_risk[k])
        s = s * factor
        surv[k] = s
    return pa.table(
        {
            "duration": pa.array([int(r["dur"]) for r in rows], pa.int64()),
            "n_risk": pa.array(n_risk, pa.int64()),
            "n_event": pa.array(d, pa.int64()),
            "n_censored": pa.array(cens, pa.int64()),
            "surv": pa.array(surv, pa.float64()),
        }
    )
