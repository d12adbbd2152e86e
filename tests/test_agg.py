"""Coarse-bucket exact aggregation (stages/agg.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from deepseek_ocr_ray.stages.agg import bucket_groupby_sum


def _tab(seed=4, n=5000):
    rng = np.random.RandomState(seed)
    return pa.table(
        {
            "g": pa.array(rng.randint(0, 700, n).tolist(), pa.int64()),
            "s": pa.array([f"s{v}" for v in rng.randint(0, 3, n)], pa.string()),
            "v": pa.array(rng.randint(-50, 50, n).tolist(), pa.int64()),
        }
    )


def _naive(tab):
    out = {}
    for i in range(tab.num_rows):
        k = (tab["g"][i].as_py(), tab["s"][i].as_py())
        n, s = out.get(k, (0, 0))
        out[k] = (n + 1, s + tab["v"][i].as_py())
    return out


def test_bucket_groupby_sum_vs_naive(ray_session):
    import ray.data

    tab = _tab()
    got = bucket_groupby_sum(
        ray.data.from_arrow(tab).repartition(5),
        ["g", "s"],
        ["v"],
        count_col="n",
    ).take_all()
    want = _naive(tab)
    got_map = {(r["g"], r["s"]): (r["n"], r["v"]) for r in got}
    assert got_map == want


def test_bucket_groupby_sum_parallelism_invariant(ray_session):
    import ray.data

    tab = _tab(seed=9)
    outs = []
    for parts in (1, 7):
        rows = bucket_groupby_sum(
            ray.data.from_arrow(tab).repartition(parts), ["g"], ["v"]
        ).take_all()
        outs.append(sorted((r["g"], r["v"]) for r in rows))
    assert outs[0] == outs[1]


def test_bucket_groupby_sum_validation(ray_session):
    import ray.data

    with pytest.raises(ValueError, match="nothing to aggregate"):
        bucket_groupby_sum(ray.data.from_arrow(_tab()), ["g"], [])
