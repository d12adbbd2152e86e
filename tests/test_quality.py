"""Data-quality checks: per-check semantics (SQL three-valued range,
FK null skip, unique tuple counting), layout invariance, caps, audit
fold."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray

from deepseek_ocr_ray.state.quality import (
    check_foreign_key,
    check_not_null,
    check_range,
    check_unique,
    quality_audit,
)


def _ds(tbl: pa.Table, nblocks: int = 1) -> ray.data.Dataset:
    ds = ray.data.from_arrow(tbl)
    return ds.repartition(nblocks) if nblocks > 1 else ds


TBL = pa.table(
    {
        "k": pa.array([1, 1, 2, 3, 3, 3, None], pa.int64()),
        "sub": pa.array([1, 2, 1, 1, 1, 2, 1], pa.int64()),
        "v": pa.array([5, 50, None, -1, 10, 10, 7], pa.int64()),
        "fk": pa.array([10, 20, 99, 10, None, 20, 98], pa.int64()),
    }
)
PARENT = pa.table({"pk": pa.array([10, 20, 30], pa.int64())})


def test_not_null(ray_session):
    assert check_not_null(_ds(TBL), "v") == 1
    assert check_not_null(_ds(TBL), "sub") == 0


def test_range_three_valued(ray_session):
    # violations: 50 (>25) and -1 (<1); the NULL is neither
    assert check_range(_ds(TBL), "v", 1, 25) == 2
    assert check_range(_ds(TBL), "v", -10, 100) == 0


def test_range_float(ray_session):
    t = pa.table({"x": pa.array([0.0, 0.05, 0.0500001, -0.1, None])})
    assert check_range(_ds(t), "x", 0.0, 0.05) == 2


def test_unique(ray_session):
    # bare k: 1 (×2) and 3 (×3) repeat → 2; null key is its own group
    assert check_unique(_ds(TBL), ["k"]) == 2
    # (k, sub): only (3, 1) repeats
    assert check_unique(_ds(TBL), ["k", "sub"]) == 1


def test_foreign_key(ray_session):
    # misses: 99 and 98; the NULL fk is skipped
    assert check_foreign_key(_ds(TBL), "fk", _ds(PARENT), "pk") == 2
    empty_parent = pa.table({"pk": pa.array([], pa.int64())})
    # every non-null child key misses an empty parent
    assert check_foreign_key(_ds(TBL), "fk", _ds(empty_parent), "pk") == 6


def test_foreign_key_cap(ray_session):
    with pytest.raises(ValueError, match="max_parent_keys"):
        check_foreign_key(
            _ds(TBL), "fk", _ds(PARENT), "pk", max_parent_keys=2
        )


def test_layout_invariance(ray_session):
    for nblocks in (2, 4, 7):
        t = _ds(TBL, nblocks)
        assert check_range(t, "v", 1, 25) == 2
        assert check_unique(t, ["k"]) == 2
        assert check_foreign_key(t, "fk", _ds(PARENT, 2), "pk") == 2


def test_quality_audit_fold(ray_session):
    ds = _ds(TBL)
    out = quality_audit(
        [
            ("v_not_null", lambda: check_not_null(ds, "v")),
            ("v_range", lambda: check_range(ds, "v", 1, 25)),
            ("k_unique", lambda: check_unique(ds, ["k", "sub"])),
        ]
    )
    rows = {r["check_name"]: (r["violations"], r["passed"]) for r in out.to_pylist()}
    assert rows == {
        "v_not_null": (1, False),
        "v_range": (2, False),
        "k_unique": (1, False),
    }
    with pytest.raises(ValueError, match="duplicate check name"):
        quality_audit([("a", lambda: 0), ("a", lambda: 0)])


def test_audit_differential(ray_session):
    """Random-frame differential vs DuckDB for all four check kinds."""
    import duckdb
    import pandas as pd

    rng = np.random.default_rng(9)
    n = 500
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 120, n).astype(np.int64),
            "v": pd.array(
                np.where(rng.random(n) < 0.1, pd.NA, rng.integers(-5, 60, n)),
                dtype="Int64",
            ),
            "fk": pd.array(
                np.where(rng.random(n) < 0.1, pd.NA, rng.integers(0, 40, n)),
                dtype="Int64",
            ),
        }
    )
    parent = pd.DataFrame({"pk": np.arange(0, 30, dtype=np.int64)})
    con = duckdb.connect()
    con.register("t", df)
    con.register("p", parent)
    want_nn = con.sql("SELECT COUNT(*) FROM t WHERE v IS NULL").fetchone()[0]
    want_rg = con.sql(
        "SELECT COUNT(*) FILTER (WHERE v < 0 OR v > 50) FROM t"
    ).fetchone()[0]
    want_uq = con.sql(
        "SELECT COUNT(*) FROM (SELECT 1 FROM t GROUP BY k HAVING COUNT(*) > 1)"
    ).fetchone()[0]
    want_fk = con.sql(
        "SELECT COUNT(*) FROM t WHERE fk IS NOT NULL "
        "AND fk NOT IN (SELECT pk FROM p)"
    ).fetchone()[0]
    tbl = pa.Table.from_pandas(df, preserve_index=False)
    pt = pa.Table.from_pandas(parent, preserve_index=False)
    ds, pds = _ds(tbl, 6), _ds(pt, 2)
    assert check_not_null(ds, "v") == want_nn
    assert check_range(ds, "v", 0, 50) == want_rg
    assert check_unique(ds, ["k"]) == want_uq
    assert check_foreign_key(ds, "fk", pds, "pk") == want_fk
