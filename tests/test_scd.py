"""scd2_build: version intervals, delete-close, unchanged-upsert
suppression (IS NOT DISTINCT FROM null semantics), layout invariance,
timestamp types, validation, DuckDB differential."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from deepseek_ocr_ray.state.scd import scd2_build


def _ds(rows: dict, nblocks: int = 1) -> ray.data.Dataset:
    ds = ray.data.from_arrow(pa.table(rows))
    return ds.repartition(nblocks) if nblocks > 1 else ds


def _result(ds: ray.data.Dataset) -> list[tuple]:
    df = ds.to_pandas()
    rows = []
    for r in df.itertuples(index=False):
        rows.append(
            tuple(None if (isinstance(x, float) and np.isnan(x)) else x for x in r)
        )
    return sorted(rows, key=lambda t: (t[0], t[-3]))


# key 1: three-version lifetime — v@10 (closed by v@20), v@20 (closed by
#   delete@30), re-insert @40 (open)
# key 2: single open version
# key 3: unchanged-upsert chain — @10, @20 (equal → suppressed), @30
#   (equal → suppressed by transitivity), @40 different → one interval
#   [10,40) plus the open [40,)
# key 4: delete-first (emits nothing), then insert @20 (open)
# key 5: null-value transitions — null@10, null@20 (IS NOT DISTINCT →
#   suppressed), value@30, null@40
# key 6: consecutive deletes after one version
LOG = {
    "k": pa.array(
        [1, 1, 1, 1, 2, 3, 3, 3, 3, 4, 4, 5, 5, 5, 5, 6, 6, 6], pa.int64()
    ),
    "ts": pa.array(
        [10, 20, 30, 40, 10, 10, 20, 30, 40, 10, 20, 10, 20, 30, 40, 10, 20, 30],
        pa.int64(),
    ),
    "op": pa.array(
        [
            "upsert", "upsert", "delete", "upsert",
            "upsert",
            "upsert", "upsert", "upsert", "upsert",
            "delete", "upsert",
            "upsert", "upsert", "upsert", "upsert",
            "upsert", "delete", "delete",
        ],
        pa.string(),
    ),
    "v": pa.array(
        [
            "a", "b", None, "c",
            "x",
            "s", "s", "s", "t",
            None, "y",
            None, None, "w", None,
            "z", None, None,
        ],
        pa.string(),
    ),
}

EXPECT = [
    (1, "a", 10, 20, False),
    (1, "b", 20, 30, False),
    (1, "c", 40, None, True),
    (2, "x", 10, None, True),
    (3, "s", 10, 40, False),
    (3, "t", 40, None, True),
    (4, "y", 20, None, True),
    (5, None, 10, 30, False),
    (5, "w", 30, 40, False),
    (5, None, 40, None, True),
    (6, "z", 10, 20, False),
]


def test_versions_fixture(ray_session):
    got = _result(scd2_build(_ds(LOG), key_col="k", ts_col="ts"))
    assert got == EXPECT


def test_layout_invariance(ray_session):
    for nblocks in (2, 5, 9):
        got = _result(scd2_build(_ds(LOG, nblocks), key_col="k", ts_col="ts"))
        assert got == EXPECT


def test_no_suppression_mode(ray_session):
    got = _result(
        scd2_build(
            _ds(LOG), key_col="k", ts_col="ts", suppress_unchanged=False
        )
    )
    # key 3's equal chain now emits every version; key 5's null@20 too
    assert (3, "s", 10, 20, False) in got
    assert (3, "s", 20, 30, False) in got
    assert (3, "s", 30, 40, False) in got
    assert (5, None, 10, 20, False) in got
    # the others are untouched
    assert (1, "a", 10, 20, False) in got
    assert len(got) == len(EXPECT) + 3


def test_timestamp_type_preserved(ray_session):
    log = {
        "k": LOG["k"],
        "ts": pa.array(
            [int(t) * 86_400_000_000 for t in LOG["ts"].to_pylist()],
            pa.timestamp("us"),
        ),
        "op": LOG["op"],
        "v": LOG["v"],
    }
    out = scd2_build(_ds(log), key_col="k", ts_col="ts")
    tbl = pa.concat_tables(
        ray.get(out.to_arrow_refs()), promote_options="default"
    )
    assert tbl.schema.field("valid_from").type == pa.timestamp("us")
    assert tbl.schema.field("valid_to").type == pa.timestamp("us")
    assert tbl.num_rows == len(EXPECT)
    cur = tbl.filter(tbl["is_current"])
    assert cur.num_rows == sum(1 for e in EXPECT if e[4])


def test_duplicate_key_ts_raises(ray_session):
    log = {
        "k": pa.array([1, 1], pa.int64()),
        "ts": pa.array([10, 10], pa.int64()),
        "op": pa.array(["upsert", "upsert"], pa.string()),
        "v": pa.array(["a", "b"], pa.string()),
    }
    with pytest.raises(Exception, match="duplicate \\(key, ts\\)"):
        scd2_build(_ds(log), key_col="k", ts_col="ts").materialize()


def test_unknown_op_raises(ray_session):
    log = {
        "k": pa.array([1], pa.int64()),
        "ts": pa.array([10], pa.int64()),
        "op": pa.array(["replace"], pa.string()),
        "v": pa.array(["a"], pa.string()),
    }
    with pytest.raises(Exception, match="unknown op"):
        scd2_build(_ds(log), key_col="k", ts_col="ts").materialize()


def test_validation_errors(ray_session):
    ds = _ds(LOG)
    with pytest.raises(ValueError, match="missing required column"):
        scd2_build(ds, key_col="nope", ts_col="ts")
    with pytest.raises(ValueError, match="must be integer or timestamp"):
        scd2_build(ds, key_col="k", ts_col="v")
    str_key = _ds({**LOG, "k": LOG["op"]})
    with pytest.raises(ValueError, match="must be integer"):
        scd2_build(str_key, key_col="k", ts_col="ts")
    with pytest.raises(ValueError, match="not in the change log"):
        scd2_build(ds, key_col="k", ts_col="ts", value_cols=["w"])


def test_null_ts_raises(ray_session):
    log = {
        "k": pa.array([1, 2], pa.int64()),
        "ts": pa.array([10, None], pa.int64()),
        "op": pa.array(["upsert", "upsert"], pa.string()),
        "v": pa.array(["a", "b"], pa.string()),
    }
    with pytest.raises(Exception, match="contains nulls"):
        scd2_build(_ds(log), key_col="k", ts_col="ts").materialize()


def test_empty_log(ray_session):
    log = {
        "k": pa.array([], pa.int64()),
        "ts": pa.array([], pa.int64()),
        "op": pa.array([], pa.string()),
        "v": pa.array([], pa.string()),
    }
    out = scd2_build(_ds(log), key_col="k", ts_col="ts")
    assert out.count() == 0


def _duck_scd2(df: pd.DataFrame) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("log", df)
    return con.sql(
        """
WITH prevs AS (
  SELECT k, ts, op, v, n,
         LAG(op) OVER w AS p_op,
         LAG(v)  OVER w AS p_v,
         LAG(n)  OVER w AS p_n
  FROM log WINDOW w AS (PARTITION BY k ORDER BY ts)
),
kept AS (
  SELECT * FROM prevs
  WHERE NOT (op = 'upsert' AND COALESCE(p_op, '') = 'upsert'
             AND v IS NOT DISTINCT FROM p_v
             AND n IS NOT DISTINCT FROM p_n)
),
vers AS (
  SELECT k, ts, op, v, n,
         LEAD(ts) OVER (PARTITION BY k ORDER BY ts) AS valid_to
  FROM kept
)
SELECT k, v, n, ts AS valid_from, valid_to,
       (valid_to IS NULL) AS is_current
FROM vers WHERE op = 'upsert'
ORDER BY k, valid_from
"""
    ).df()


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_differential_random(ray_session, seed):
    rng = np.random.default_rng(seed)
    n = 400
    k = rng.integers(0, 40, n)
    ts = rng.permutation(n * 3)[:n]  # unique timestamps globally
    op = np.where(rng.random(n) < 0.25, "delete", "upsert")
    v = np.where(rng.random(n) < 0.3, None, rng.integers(0, 3, n).astype(str))
    nn = rng.integers(0, 4, n)
    n_null = rng.random(n) < 0.2
    df = pd.DataFrame(
        {
            "k": k.astype(np.int64),
            "ts": ts.astype(np.int64),
            "op": op,
            "v": v,
            "n": pd.array(
                np.where(n_null, pd.NA, nn), dtype="Int64"
            ),
        }
    )
    tbl = pa.table(
        {
            "k": pa.array(df["k"], pa.int64()),
            "ts": pa.array(df["ts"], pa.int64()),
            "op": pa.array(df["op"], pa.string()),
            "v": pa.array(df["v"].tolist(), pa.string()),
            "n": pa.array(
                [None if x is pd.NA else int(x) for x in df["n"]], pa.int64()
            ),
        }
    )
    got = (
        scd2_build(
            ray.data.from_arrow(tbl).repartition(7), key_col="k", ts_col="ts"
        )
        .to_pandas()
        .sort_values(["k", "valid_from"])
        .reset_index(drop=True)
    )
    want = _duck_scd2(df)
    assert len(got) == len(want)
    for col in ["k", "valid_from"]:
        assert got[col].tolist() == want[col].tolist()
    for col in ["v", "n", "valid_to", "is_current"]:
        g = [None if pd.isna(x) else x for x in got[col]]
        w = [None if pd.isna(x) else x for x in want[col]]
        assert g == w, col


def test_asof_snapshot_semantics(ray_session):
    """AS OF T over the fixture: versions whose interval covers T."""
    got = scd2_build(_ds(LOG), key_col="k", ts_col="ts")
    tbl = pa.concat_tables(
        ray.get(got.to_arrow_refs()), promote_options="default"
    ).to_pandas()

    def asof(T):
        live = tbl[
            (tbl["valid_from"] <= T)
            & (tbl["valid_to"].isna() | (tbl["valid_to"] > T))
        ]
        return sorted(zip(live["k"], live["v"].where(live["v"].notna(), None)))

    # T=15: first versions only
    assert asof(15) == [
        (1, "a"), (2, "x"), (3, "s"), (5, None), (6, "z"),
    ]
    # T=25: k1 upserted to b, k4 inserted, k6 deleted
    assert asof(25) == [
        (1, "b"), (2, "x"), (3, "s"), (4, "y"), (5, None),
    ]
    # T=45: final state (open rows only)
    assert asof(45) == sorted(
        (k, v) for k, v, _f, vt, cur in EXPECT if cur
    )
