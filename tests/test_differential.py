"""Differential fuzzing vs DuckDB: random tables through the engine's
join planner and aggregate family must match SQL semantics exactly —
every join type × every strategy, seeded and deterministic."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from deepseek_ocr_ray.cluster import equi_join
from deepseek_ocr_ray.stages.agg import bucket_groupby_agg, latest_by_key


def _tables(seed: int):
    """Left/right tables with overlapping skewed keys, string + int
    payloads, duplicate keys on both sides (join-multiplicity stress)."""
    rng = np.random.RandomState(seed)
    nl, nr = int(rng.randint(50, 400)), int(rng.randint(20, 300))
    left = pa.table(
        {
            "k": pa.array(
                (rng.zipf(1.5, nl) % 40).astype(np.int64), pa.int64()
            ),
            "lv": pa.array(rng.randint(-99, 99, nl).tolist(), pa.int64()),
            "ls": pa.array(
                [f"L{v}" for v in rng.randint(0, 7, nl)], pa.string()
            ),
        }
    )
    right = pa.table(
        {
            "k": pa.array(
                (rng.zipf(1.5, nr) % 55).astype(np.int64), pa.int64()
            ),
            "rv": pa.array(rng.randint(0, 999, nr).tolist(), pa.int64()),
        }
    )
    return left, right


def _duck(left, right, join_type):
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    if join_type == "inner":
        sql = "SELECT l.k, l.lv, l.ls, r.rv FROM l JOIN r USING (k)"
    elif join_type == "left_outer":
        sql = "SELECT l.k, l.lv, l.ls, r.rv FROM l LEFT JOIN r USING (k)"
    elif join_type == "left_semi":
        sql = ("SELECT l.k, l.lv, l.ls FROM l "
               "WHERE EXISTS (SELECT 1 FROM r WHERE r.k = l.k)")
    else:
        sql = ("SELECT l.k, l.lv, l.ls FROM l "
               "WHERE NOT EXISTS (SELECT 1 FROM r WHERE r.k = l.k)")
    return con.execute(sql).arrow()


def _sorted_rows(tab: pa.Table):
    cols = sorted(tab.column_names)
    return sorted(
        tuple(r[c] for c in cols) for r in tab.select(cols).to_pylist()
    )


@pytest.mark.parametrize("strategy", ["hash", "bucket", "broadcast"])
@pytest.mark.parametrize(
    "join_type", ["inner", "left_outer", "left_semi", "left_anti"]
)
def test_equi_join_differential_vs_duckdb(ray_session, strategy, join_type):
    import ray.data

    for seed in (3, 17, 91):
        left, right = _tables(seed)
        want = _duck(left, right, join_type)
        rows = equi_join(
            ray.data.from_arrow(left).repartition(5),
            ray.data.from_arrow(right).repartition(3),
            on="k",
            join_type=join_type,
            strategy=strategy,
        ).take_all()
        cols = sorted(want.column_names)
        got = sorted(tuple(r[c] for c in cols) for r in rows)
        assert got == _sorted_rows(want), (seed, strategy, join_type)


def test_bucket_groupby_agg_differential_vs_duckdb(ray_session):
    import ray.data

    for seed in (5, 23, 77):
        left, _ = _tables(seed)
        con = duckdb.connect()
        con.register("l", left)
        want = con.execute(
            "SELECT k, ls, CAST(count(*) AS BIGINT) AS n, "
            "CAST(sum(lv) AS BIGINT) AS sv, "
            "CAST(min(lv) AS BIGINT) AS mn, "
            "CAST(max(lv) AS BIGINT) AS mx, avg(lv) AS av "
            "FROM l GROUP BY 1, 2"
        ).arrow()
        got_rows = bucket_groupby_agg(
            ray.data.from_arrow(left).repartition(4),
            ["k", "ls"],
            [
                (None, "count", "n"),
                ("lv", "sum", "sv"),
                ("lv", "min", "mn"),
                ("lv", "max", "mx"),
                ("lv", "mean", "av"),
            ],
        ).take_all()
        got = {(r["k"], r["ls"]): (r["n"], r["sv"], r["mn"], r["mx"], r["av"])
               for r in got_rows}
        wt = want.to_pylist()
        assert len(got) == len(wt)
        for r in wt:
            assert got[(r["k"], r["ls"])] == (
                r["n"], r["sv"], r["mn"], r["mx"], r["av"]
            ), seed


def test_latest_by_key_differential_vs_duckdb(ray_session):
    import ray.data

    for seed in (9, 41):
        rng = np.random.RandomState(seed)
        n = int(rng.randint(100, 600))
        tab = pa.table(
            {
                "k": pa.array(rng.randint(0, 30, n).tolist(), pa.int64()),
                "t": pa.array(rng.randint(0, 40, n).tolist(), pa.int64()),
                "id": pa.array(rng.permutation(n).tolist(), pa.int64()),
                "p": pa.array(
                    [f"x{v}" for v in rng.randint(0, 5, n)], pa.string()
                ),
            }
        )
        con = duckdb.connect()
        con.register("e", tab)
        want = con.execute(
            "SELECT k, t, id, p FROM (SELECT *, row_number() OVER "
            "(PARTITION BY k ORDER BY t DESC, id DESC) AS rn FROM e) "
            "WHERE rn = 1"
        ).arrow()
        got = latest_by_key(
            ray.data.from_arrow(tab).repartition(6),
            ["k"],
            order_col="t",
            tiebreak_col="id",
        ).take_all()
        got_t = pa.Table.from_pylist(got, schema=want.schema)
        assert _sorted_rows(got_t) == _sorted_rows(want), seed
