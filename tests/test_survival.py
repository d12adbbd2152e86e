"""Kaplan-Meier product-limit estimator (stages/survival.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from deepseek_ocr_ray.stages.survival import kaplan_meier


def _km_ref(pairs):
    """Independent scalar reference (textbook construction)."""
    from collections import Counter

    durs = sorted(set(d for d, _ in pairs))
    out = []
    s = np.float64(1.0)
    for t in durs:
        n = sum(1 for d, _ in pairs if d >= t)
        dd = sum(1 for d, o in pairs if d == t and o)
        cc = sum(1 for d, o in pairs if d == t and not o)
        s = s * (np.float64(1.0) - np.float64(dd) / np.float64(n))
        out.append((t, n, dd, cc, float(s)))
    return out


def test_km_textbook_fixture(ray_session):
    """Classic small cohort with a censor between event times: censoring
    shrinks the risk set without dropping survival."""
    import ray.data

    pairs = [(1, 1), (2, 1), (2, 0), (3, 1), (5, 0), (6, 1)]
    t = pa.table(
        {
            "dur": pa.array([p[0] for p in pairs], pa.int64()),
            "obs": pa.array([p[1] for p in pairs], pa.int64()),
        }
    )
    got = kaplan_meier(
        ray.data.from_arrow(t).repartition(2), "dur", "obs"
    ).to_pylist()
    want = _km_ref(pairs)
    assert [
        (r["duration"], r["n_risk"], r["n_event"], r["n_censored"], r["surv"])
        for r in got
    ] == want
    # spot values: S(1) = 5/6, S(2) = 5/6 · 3/4 (one event of 4 at risk)
    assert got[0]["surv"] == float(np.float64(1.0) - np.float64(1) / np.float64(6))
    # censored-only duration keeps its row with factor exactly 1.0
    row5 = next(r for r in got if r["duration"] == 5)
    row3 = next(r for r in got if r["duration"] == 3)
    assert row5["n_event"] == 0 and row5["surv"] == row3["surv"]


def test_km_differential_block_invariant(ray_session):
    import random

    import ray.data

    rng = random.Random(31)
    pairs = [(rng.randrange(30), rng.randrange(2)) for _ in range(300)]
    t = pa.table(
        {
            "dur": pa.array([p[0] for p in pairs], pa.int64()),
            "obs": pa.array([p[1] for p in pairs], pa.int64()),
        }
    )
    want = _km_ref(pairs)
    for nblocks in (1, 5):
        got = kaplan_meier(
            ray.data.from_arrow(t).repartition(nblocks), "dur", "obs"
        ).to_pylist()
        assert [
            (r["duration"], r["n_risk"], r["n_event"], r["n_censored"], r["surv"])
            for r in got
        ] == want


def test_km_validation(ray_session):
    import ray.data

    t = pa.table(
        {
            "dur": pa.array([1, None], pa.int64()),
            "obs": pa.array([1, 0], pa.int64()),
        }
    )
    with pytest.raises(Exception, match="NULL"):
        kaplan_meier(ray.data.from_arrow(t), "dur", "obs")
    t2 = pa.table(
        {
            "dur": pa.array([1, 2], pa.int64()),
            "obs": pa.array([1, 2], pa.int64()),
        }
    )
    with pytest.raises(Exception, match="0 or 1"):
        kaplan_meier(ray.data.from_arrow(t2), "dur", "obs")
    tf = pa.table({"dur": [1.5], "obs": [1]})
    with pytest.raises(ValueError, match="integer"):
        kaplan_meier(ray.data.from_arrow(tf), "dur", "obs")
