"""categorical_encode: sorted-rank semantics, nulls, layout invariance,
multi-column, validation, DuckDB differential."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from deepseek_ocr_ray.stages.encode import categorical_encode


def _ds(tbl: pa.Table, nblocks: int = 1) -> ray.data.Dataset:
    ds = ray.data.from_arrow(tbl)
    return ds.repartition(nblocks) if nblocks > 1 else ds


def test_sorted_rank_and_nulls(ray_session):
    tbl = pa.table(
        {
            "id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "c": pa.array(["beta", "alpha", None, "gamma", "alpha"], pa.string()),
        }
    )
    got = (
        categorical_encode(_ds(tbl), ["c"])
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    # sorted vocab: alpha=0, beta=1, gamma=2; null stays null
    vals = [None if pd.isna(x) else int(x) for x in got["c_idx"]]
    assert vals == [1, 0, None, 2, 0]


def test_multi_column_and_layout(ray_session):
    rng = np.random.default_rng(5)
    n = 300
    tbl = pa.table(
        {
            "id": pa.array(np.arange(n), pa.int64()),
            "a": pa.array([f"v{i}" for i in rng.integers(0, 9, n)], pa.string()),
            "b": pa.array([f"w{i}" for i in rng.integers(0, 30, n)], pa.string()),
        }
    )
    ref = None
    for nblocks in (1, 4, 11):
        got = (
            categorical_encode(_ds(tbl, nblocks), ["a", "b"])
            .to_pandas()
            .sort_values("id")
            .reset_index(drop=True)
        )
        cur = (got["a_idx"].tolist(), got["b_idx"].tolist())
        if ref is None:
            ref = cur
            # differential: dense rank over distinct, binary collation
            con = duckdb.connect()
            con.register("t", tbl.to_pandas())
            want = con.sql(
                """
SELECT id,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM (SELECT DISTINCT a AS v FROM t) d
   WHERE d.v < t.a) AS a_idx,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM (SELECT DISTINCT b AS v FROM t) d
   WHERE d.v < t.b) AS b_idx
FROM t ORDER BY id
"""
            ).df()
            assert cur[0] == want["a_idx"].tolist()
            assert cur[1] == want["b_idx"].tolist()
        else:
            assert cur == ref


def test_validation(ray_session):
    tbl = pa.table(
        {
            "id": pa.array([1], pa.int64()),
            "c": pa.array(["x"], pa.string()),
            "c_idx": pa.array([9], pa.int64()),
        }
    )
    with pytest.raises(ValueError, match="already exists"):
        categorical_encode(_ds(tbl), ["c"])
    with pytest.raises(ValueError, match="must be string"):
        categorical_encode(_ds(tbl.drop_columns(["c_idx"])), ["id"])
    with pytest.raises(ValueError, match="not in the input"):
        categorical_encode(_ds(tbl), ["nope"])


def test_max_vocab(ray_session):
    tbl = pa.table(
        {
            "c": pa.array([f"u{i}" for i in range(50)], pa.string()),
        }
    )
    with pytest.raises(ValueError, match="max_vocab"):
        categorical_encode(_ds(tbl), ["c"], max_vocab=10)


def test_large_string_input(ray_session):
    tbl = pa.table(
        {
            "id": pa.array([0, 1], pa.int64()),
            "c": pa.array(["b", "a"], pa.large_string()),
        }
    )
    got = categorical_encode(_ds(tbl), ["c"]).to_pandas()
    assert sorted(zip(got["id"], got["c_idx"])) == [(0, 1), (1, 0)]
