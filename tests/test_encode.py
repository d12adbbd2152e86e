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


# ------------------------------------------------------------- target


def _te_duck(df, loo=True):
    con = duckdb.connect()
    con.register("t", df)
    expr = (
        "CASE WHEN n > 1 THEN CAST(s - v AS DOUBLE)/CAST(n - 1 AS DOUBLE) END"
        if loo
        else "CAST(s AS DOUBLE)/CAST(n AS DOUBLE)"
    )
    return con.sql(
        f"""
WITH m AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS n, SUM(v) AS s FROM t GROUP BY 1
)
SELECT id, t.g, v, {expr} AS te
FROM t JOIN m USING (g) ORDER BY id
"""
    ).df()


@pytest.mark.parametrize("loo", [True, False])
def test_target_encode_differential(ray_session, loo):
    from deepseek_ocr_ray.stages.encode import target_encode

    rng = np.random.default_rng(11)
    n = 600
    df = pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "g": rng.integers(0, 8, n).astype(str),
            "v": rng.integers(-500, 9000, n).astype(np.int64),
        }
    )
    # force a singleton group for the NULL edge
    df.loc[n - 1, "g"] = "solo"
    tbl = pa.Table.from_pandas(df, preserve_index=False)
    got = (
        target_encode(_ds(tbl, 5), ["g"], "v", loo=loo)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    want = _te_duck(df, loo=loo)
    assert got["id"].tolist() == want["id"].tolist()
    g = [None if pd.isna(x) else x for x in got["te"]]
    w = [None if pd.isna(x) else x for x in want["te"]]
    assert g == w  # bit-exact floats + the singleton NULL


def test_target_encode_layout_invariance(ray_session):
    from deepseek_ocr_ray.stages.encode import target_encode

    rng = np.random.default_rng(3)
    tbl = pa.table(
        {
            "id": pa.array(np.arange(200), pa.int64()),
            "g": pa.array([f"g{i}" for i in rng.integers(0, 5, 200)]),
            "v": pa.array(rng.integers(0, 100, 200), pa.int64()),
        }
    )
    ref = None
    for nblocks in (1, 4, 9):
        got = (
            target_encode(_ds(tbl, nblocks), ["g"], "v")
            .to_pandas()
            .sort_values("id")["te"]
            .tolist()
        )
        if ref is None:
            ref = got
        else:
            assert got == ref


def test_target_encode_validation(ray_session):
    from deepseek_ocr_ray.stages.encode import target_encode

    tbl = pa.table(
        {
            "g": pa.array(["a"], pa.string()),
            "v": pa.array([1.5], pa.float64()),
            "te": pa.array([0], pa.int64()),
        }
    )
    with pytest.raises(ValueError, match="must be integer"):
        target_encode(_ds(tbl.drop_columns(["te"])), ["g"], "v")
    with pytest.raises(ValueError, match="already exists"):
        target_encode(_ds(tbl.set_column(1, "v", pa.array([1], pa.int64()))), ["g"], "v")
    nulls = pa.table(
        {
            "g": pa.array(["a", "a"], pa.string()),
            "v": pa.array([1, None], pa.int64()),
        }
    )
    with pytest.raises(Exception, match="contains nulls"):
        target_encode(_ds(nulls), ["g"], "v").materialize()


# ------------------------------------------------------------- binning


def _qb_duck(df, n_bins):
    con = duckdb.connect()
    con.register("t", df)
    qlist = ", ".join(f"{i}.0/{n_bins}" for i in range(1, n_bins))
    return con.sql(
        f"""
WITH bounds AS (
  SELECT g, UNNEST(quantile_disc(v, [{qlist}])) AS b
  FROM t GROUP BY g
)
SELECT id, t.g, v,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM bounds
        WHERE bounds.g = t.g AND bounds.b <= t.v) AS bin
FROM t ORDER BY id
"""
    ).df()


@pytest.mark.parametrize("n_bins", [2, 4, 8])
def test_quantile_bin_differential(ray_session, n_bins):
    from deepseek_ocr_ray.stages.encode import quantile_bin

    rng = np.random.default_rng(n_bins)
    n = 500
    df = pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "g": rng.integers(0, 5, n).astype(str),
            # heavy ties to exercise the deterministic tie rule
            "v": rng.integers(0, 12, n).astype(np.int64),
        }
    )
    tbl = pa.Table.from_pandas(df, preserve_index=False)
    got = (
        quantile_bin(_ds(tbl, 4), ["g"], "v", n_bins)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    want = _qb_duck(df, n_bins)
    assert got["bin"].tolist() == want["bin"].tolist()
    # equal (g, v) pairs always share a bin
    m = got.groupby(["g", "v"])["bin"].nunique()
    assert (m == 1).all()


def test_quantile_bin_layout_and_range(ray_session):
    from deepseek_ocr_ray.stages.encode import quantile_bin

    rng = np.random.default_rng(0)
    tbl = pa.table(
        {
            "id": pa.array(np.arange(300), pa.int64()),
            "g": pa.array(["a"] * 300, pa.string()),
            "v": pa.array(rng.integers(-100, 100, 300), pa.int64()),
        }
    )
    ref = None
    for nblocks in (1, 5):
        got = (
            quantile_bin(_ds(tbl, nblocks), ["g"], "v", 10)
            .to_pandas()
            .sort_values("id")["bin"]
            .tolist()
        )
        assert min(got) >= 0 and max(got) <= 9
        if ref is None:
            ref = got
        else:
            assert got == ref


def test_quantile_bin_validation(ray_session):
    from deepseek_ocr_ray.stages.encode import quantile_bin

    tbl = pa.table(
        {
            "g": pa.array(["a"], pa.string()),
            "v": pa.array([1], pa.int64()),
        }
    )
    with pytest.raises(ValueError, match="n_bins"):
        quantile_bin(_ds(tbl), ["g"], "v", 1)
    nulls = pa.table(
        {
            "g": pa.array(["a", "a", "a"], pa.string()),
            "v": pa.array([1, 2, None], pa.int64()),
        }
    )
    with pytest.raises(Exception, match="contains nulls"):
        quantile_bin(_ds(nulls), ["g"], "v", 2).materialize()


# ------------------------------------------------------------ imputer


def test_impute_group_mean_fixture(ray_session):
    from deepseek_ocr_ray.stages.encode import impute_group_mean

    tbl = pa.table(
        {
            "g": pa.array(["a", "a", "a", "b", "b", "c"], pa.string()),
            # a: mean(10, 15) = 12.5 -> 13 (round half up); b: no nulls;
            # c: all-null group stays null
            "v": pa.array([10, 15, None, 7, None, None], pa.int64()),
        }
    )
    got = (
        impute_group_mean(_ds(tbl, 3), ["g"], "v")
        .to_pandas()
        .sort_values(["g", "v"], na_position="last")
        .reset_index(drop=True)
    )
    a_vals = sorted(got[got["g"] == "a"]["v"].tolist())
    assert a_vals == [10, 13, 15]
    b_vals = got[got["g"] == "b"]["v"].tolist()
    assert sorted(b_vals) == [7, 7]
    assert pd.isna(got[got["g"] == "c"]["v"]).all()
    flags = got.groupby("g")["was_imputed"].sum()
    assert flags["a"] == 1 and flags["b"] == 1 and flags["c"] == 0


def test_impute_group_mean_differential(ray_session):
    import duckdb

    from deepseek_ocr_ray.stages.encode import impute_group_mean

    rng = np.random.default_rng(4)
    n = 500
    df = pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "g": rng.integers(0, 9, n).astype(str),
            "v": pd.array(
                np.where(rng.random(n) < 0.2, pd.NA, rng.integers(-50, 400, n)),
                dtype="Int64",
            ),
        }
    )
    con = duckdb.connect()
    con.register("t", df)
    want = con.sql(
        """
WITH m AS (
  SELECT g, CAST(COUNT(v) AS BIGINT) AS n, SUM(v) AS s
  FROM t GROUP BY g HAVING COUNT(v) > 0
)
SELECT id,
       COALESCE(v, CAST(FLOOR(CAST(s AS DOUBLE)/CAST(n AS DOUBLE) + 0.5)
                        AS BIGINT)) AS v,
       (t.v IS NULL AND m.g IS NOT NULL) AS f
FROM t LEFT JOIN m USING (g) ORDER BY id
"""
    ).df()
    tbl = pa.table(
        {
            "id": pa.array(df["id"], pa.int64()),
            "g": pa.array(df["g"], pa.string()),
            "v": pa.array(
                [None if x is pd.NA else int(x) for x in df["v"]], pa.int64()
            ),
        }
    )
    got = (
        impute_group_mean(_ds(tbl, 5), ["g"], "v", flag_col="f")
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    gv = [None if pd.isna(x) else int(x) for x in got["v"]]
    wv = [None if pd.isna(x) else int(x) for x in want["v"]]
    assert gv == wv
    assert got["f"].tolist() == want["f"].tolist()


def test_impute_validation(ray_session):
    from deepseek_ocr_ray.stages.encode import impute_group_mean

    tbl = pa.table(
        {
            "g": pa.array(["a"], pa.string()),
            "v": pa.array([1.5], pa.float64()),
            "was_imputed": pa.array([True]),
        }
    )
    with pytest.raises(ValueError, match="already exists"):
        impute_group_mean(_ds(tbl), ["g"], "v")
    with pytest.raises(ValueError, match="must be integer"):
        impute_group_mean(_ds(tbl.drop_columns(["was_imputed"])), ["g"], "v")


# ------------------------------------------------------------- minmax


def test_group_minmax_scale_differential(ray_session):
    import duckdb

    from deepseek_ocr_ray.stages.encode import group_minmax_scale

    rng = np.random.default_rng(6)
    n = 500
    df = pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "g": rng.integers(0, 7, n).astype(str),
            "v": rng.integers(-300, 900, n).astype(np.int64),
        }
    )
    # force a constant group for the NULL edge
    df.loc[df["g"] == "6", "v"] = 55
    con = duckdb.connect()
    con.register("t", df)
    want = con.sql(
        """
WITH m AS (SELECT g, MIN(v) mn, MAX(v) mx FROM t GROUP BY 1)
SELECT id, (CAST(v AS DOUBLE) - CAST(mn AS DOUBLE)) /
       NULLIF(CAST(mx AS DOUBLE) - CAST(mn AS DOUBLE), 0.0) AS s
FROM t JOIN m USING (g) ORDER BY id
"""
    ).df()
    tbl = pa.Table.from_pandas(df, preserve_index=False)
    got = (
        group_minmax_scale(_ds(tbl, 5), ["g"], "v", out_col="s")
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    g = [None if pd.isna(x) else x for x in got["s"]]
    w = [None if pd.isna(x) else x for x in want["s"]]
    assert g == w  # bit-exact incl. constant-group NULLs
    live = got[got["s"].notna()]["s"]
    assert live.between(0.0, 1.0).all()


def test_group_minmax_scale_validation(ray_session):
    from deepseek_ocr_ray.stages.encode import group_minmax_scale

    nulls = pa.table(
        {
            "g": pa.array(["a", "a"], pa.string()),
            "v": pa.array([1, None], pa.int64()),
        }
    )
    with pytest.raises(Exception, match="contains nulls"):
        group_minmax_scale(_ds(nulls), ["g"], "v").materialize()
    f = pa.table(
        {"g": pa.array(["a"], pa.string()), "v": pa.array([1.5], pa.float64())}
    )
    with pytest.raises(ValueError, match="must be integer"):
        group_minmax_scale(_ds(f), ["g"], "v")
