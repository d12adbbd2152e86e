"""incremental_agg: delta semantics (insert/delete/new-key/key-leaves),
consistency errors, layout invariance, DuckDB full-recompute
differential."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from deepseek_ocr_ray.state.ivm import incremental_agg


def _ds(tbl: pa.Table, nblocks: int = 1) -> ray.data.Dataset:
    ds = ray.data.from_arrow(tbl)
    return ds.repartition(nblocks) if nblocks > 1 else ds


VIEW = pa.table(
    {
        "k": pa.array([1, 2, 3], pa.int64()),
        "n": pa.array([2, 1, 1], pa.int64()),
        "s": pa.array([30, 5, 7], pa.int64()),
    }
)
# k=1: one delete (of a 10) -> n 1, s 20; k=2: untouched; k=3: delete its
# only row (image 7) -> leaves; k=9: brand-new key via two inserts
CHANGES = pa.table(
    {
        "op": pa.array(
            ["delete", "delete", "insert", "insert"], pa.string()
        ),
        "k": pa.array([1, 3, 9, 9], pa.int64()),
        "s": pa.array([10, 7, 4, 6], pa.int64()),
    }
)


def _result(out) -> list[tuple]:
    df = out.to_pandas()
    return sorted(zip(df["k"], df["n"], df["s"]))


def test_refresh_fixture(ray_session):
    got = _result(
        incremental_agg(
            _ds(VIEW), _ds(CHANGES), key_col="k", count_col="n", sum_cols=["s"]
        )
    )
    assert got == [(1, 1, 20), (2, 1, 5), (9, 2, 10)]


def test_layout_invariance(ray_session):
    for nv, nc in ((2, 3), (3, 1), (1, 4)):
        got = _result(
            incremental_agg(
                _ds(VIEW, nv),
                _ds(CHANGES, nc),
                key_col="k",
                count_col="n",
                sum_cols=["s"],
            )
        )
        assert got == [(1, 1, 20), (2, 1, 5), (9, 2, 10)]


def test_negative_count_raises(ray_session):
    bad = pa.table(
        {
            "op": pa.array(["delete", "delete"], pa.string()),
            "k": pa.array([2, 2], pa.int64()),
            "s": pa.array([5, 5], pa.int64()),
        }
    )
    with pytest.raises(Exception, match="negative count"):
        incremental_agg(
            _ds(VIEW), _ds(bad), key_col="k", count_col="n", sum_cols=["s"]
        ).materialize()


def test_inconsistent_cancel_raises(ray_session):
    # k=3 cancelled with the WRONG delete image (6 != 7)
    bad = pa.table(
        {
            "op": pa.array(["delete"], pa.string()),
            "k": pa.array([3], pa.int64()),
            "s": pa.array([6], pa.int64()),
        }
    )
    with pytest.raises(Exception, match="nonzero sum"):
        incremental_agg(
            _ds(VIEW), _ds(bad), key_col="k", count_col="n", sum_cols=["s"]
        ).materialize()


def test_validation(ray_session):
    with pytest.raises(ValueError, match="view columns"):
        incremental_agg(
            _ds(CHANGES), _ds(CHANGES), key_col="k", count_col="n", sum_cols=["s"]
        )
    with pytest.raises(ValueError, match="missing column"):
        incremental_agg(
            _ds(VIEW), _ds(VIEW), key_col="k", count_col="n", sum_cols=["s"]
        )
    bad_op = pa.table(
        {
            "op": pa.array(["upsert"], pa.string()),
            "k": pa.array([1], pa.int64()),
            "s": pa.array([1], pa.int64()),
        }
    )
    with pytest.raises(Exception, match="unknown op"):
        incremental_agg(
            _ds(VIEW), _ds(bad_op), key_col="k", count_col="n", sum_cols=["s"]
        ).materialize()
    null_img = pa.table(
        {
            "op": pa.array(["insert"], pa.string()),
            "k": pa.array([1], pa.int64()),
            "s": pa.array([None], pa.int64()),
        }
    )
    with pytest.raises(Exception, match="full image"):
        incremental_agg(
            _ds(VIEW), _ds(null_img), key_col="k", count_col="n", sum_cols=["s"]
        ).materialize()


def test_empty_changes_identity(ray_session):
    empty = pa.table(
        {
            "op": pa.array([], pa.string()),
            "k": pa.array([], pa.int64()),
            "s": pa.array([], pa.int64()),
        }
    )
    got = _result(
        incremental_agg(
            _ds(VIEW), _ds(empty), key_col="k", count_col="n", sum_cols=["s"]
        )
    )
    assert got == [(1, 2, 30), (2, 1, 5), (3, 1, 7)]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_differential_full_recompute(ray_session, seed):
    """Incremental refresh == DuckDB full recompute over base±changes."""
    rng = np.random.default_rng(seed)
    nb = 400
    base = pd.DataFrame(
        {
            "k": rng.integers(0, 30, nb).astype(np.int64),
            "v": rng.integers(-100, 500, nb).astype(np.int64),
            "rid": np.arange(nb, dtype=np.int64),
        }
    )
    # deletes pick actual base rows (full images); inserts are arbitrary
    del_rows = base[base["rid"] % 5 == 0]
    ins = pd.DataFrame(
        {
            "k": rng.integers(0, 35, 80).astype(np.int64),
            "v": rng.integers(-100, 500, 80).astype(np.int64),
        }
    )
    con = duckdb.connect()
    con.register("base", base)
    con.register("dels", del_rows)
    con.register("ins", ins)
    want = con.sql(
        """
WITH parts AS (
  SELECT k, 1 AS cnt, v AS sv FROM base
  UNION ALL SELECT k, -1, -v FROM dels
  UNION ALL SELECT k, 1, v FROM ins
)
SELECT k, CAST(SUM(cnt) AS BIGINT) AS n, CAST(SUM(sv) AS BIGINT) AS s
FROM parts GROUP BY k HAVING SUM(cnt) > 0 ORDER BY k
"""
    ).df()
    view_df = con.sql(
        "SELECT k, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(v) AS BIGINT) AS s "
        "FROM base GROUP BY k"
    ).df()
    view = pa.Table.from_pandas(view_df, preserve_index=False)
    ch = pa.table(
        {
            "op": pa.array(
                ["delete"] * len(del_rows) + ["insert"] * len(ins), pa.string()
            ),
            "k": pa.array(
                np.concatenate([del_rows["k"].values, ins["k"].values]),
                pa.int64(),
            ),
            "s": pa.array(
                np.concatenate([del_rows["v"].values, ins["v"].values]),
                pa.int64(),
            ),
        }
    )
    got = (
        incremental_agg(
            _ds(view, 3), _ds(ch, 4), key_col="k", count_col="n", sum_cols=["s"]
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert got["k"].tolist() == want["k"].tolist()
    assert got["n"].tolist() == want["n"].tolist()
    assert got["s"].tolist() == want["s"].tolist()
