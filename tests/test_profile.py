"""Table profiler (stages/profile.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from deepseek_ocr_ray.stages.profile import profile_table


def _tab():
    return pa.table(
        {
            "i": pa.array([5, None, -3, 5, 100, 7], pa.int64()),
            "s": pa.array(["b", "a", None, "zz", "a", "m"], pa.string()),
        }
    )


def test_profile_table_basic(ray_session):
    import ray.data

    got = profile_table(ray.data.from_arrow(_tab()).repartition(3), ["i", "s"])
    rows = {r["col"]: r for r in got.to_pylist()}
    assert rows["i"]["n"] == 6
    assert rows["i"]["n_nulls"] == 1
    assert rows["i"]["n_distinct"] == 4
    # numeric (not lexicographic) min/max, rendered as strings
    assert rows["i"]["min_val"] == "-3"
    assert rows["i"]["max_val"] == "100"
    assert rows["s"]["n_nulls"] == 1
    assert rows["s"]["n_distinct"] == 4
    assert rows["s"]["min_val"] == "a"
    assert rows["s"]["max_val"] == "zz"


def test_profile_table_block_invariance(ray_session):
    import ray.data

    rng = np.random.RandomState(3)
    tab = pa.table(
        {
            "x": pa.array(rng.randint(0, 500, 5000).tolist(), pa.int64()),
        }
    )
    a = profile_table(ray.data.from_arrow(tab), ["x"]).to_pylist()
    b = profile_table(ray.data.from_arrow(tab).repartition(11), ["x"]).to_pylist()
    assert a == b


def test_profile_table_rejects_floats(ray_session):
    import ray.data

    tab = pa.table({"f": pa.array([1.5, 2.5])})
    with pytest.raises(ValueError, match="rendering"):
        profile_table(ray.data.from_arrow(tab), ["f"])
