"""Unit tests for sessionization and grouped top-k (stages/windows)."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pyarrow as pa
import pytest

from deepseek_ocr_ray.stages import windows


def _events() -> pa.Table:
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: two sessions (gap of 1h between event 2 and 3)
        (1, t0),
        (1, t0 + dt.timedelta(minutes=10)),
        (1, t0 + dt.timedelta(minutes=80)),
        # user 2: one session, includes a tied timestamp
        (2, t0),
        (2, t0),
        (2, t0 + dt.timedelta(minutes=29)),
    ]
    return pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        }
    )


def test_sessionize_basic(ray_session):
    import ray.data

    out = (
        windows.sessionize(ray.data.from_arrow(_events()), gap_sec=1800.0)
        .to_pandas()
        .sort_values(["user_id", "session_no"])
        .reset_index(drop=True)
    )
    assert out.user_id.tolist() == [1, 1, 2]
    assert out.session_no.tolist() == [1, 2, 1]
    assert out.n_events.tolist() == [2, 1, 3]
    assert out.session_start.iloc[0] == "2024-01-01 00:00:00"
    assert out.session_end.iloc[0] == "2024-01-01 00:10:00"


def test_sessionize_block_order_invariant(ray_session):
    import ray.data

    tbl = _events()
    a = (
        windows.sessionize(ray.data.from_arrow(tbl).repartition(1))
        .to_pandas().sort_values(["user_id", "session_no"]).reset_index(drop=True)
    )
    b = (
        windows.sessionize(ray.data.from_arrow(tbl.take(pa.array([5, 3, 1, 0, 4, 2]))).repartition(3))
        .to_pandas().sort_values(["user_id", "session_no"]).reset_index(drop=True)
    )
    assert a.equals(b)


def test_grouped_topk(ray_session):
    import ray.data

    tbl = pa.table(
        {
            "grp": pa.array(["a"] * 4 + ["b"] * 2),
            "val": pa.array([5.0, 9.0, 9.0, 1.0, 3.0, 3.0]),
            "id": pa.array([10, 11, 12, 13, 20, 21], pa.int64()),
        }
    )
    out = (
        windows.grouped_topk(
            ray.data.from_arrow(tbl).repartition(2),
            group_col="grp", value_col="val", id_col="id", k=2,
        )
        .to_pandas().sort_values(["grp", "rank"]).reset_index(drop=True)
    )
    # group a: 9.0 tie → smaller id (11) first; group b: tie → 20 then 21
    assert out[out.grp == "a"].id.tolist() == [11, 12]
    assert out[out.grp == "b"].id.tolist() == [20, 21]
    assert out["rank"].tolist() == [1, 2, 1, 2]


def test_deterministic_sample_properties(ray_session):
    """Sampling is reproducible, parallelism-invariant, and NESTED across
    growing fractions with the same salt."""
    import ray.data

    from deepseek_ocr_ray.pipelines.analytics import deterministic_sample

    tbl = pa.table({"id": pa.array(range(2000), pa.int64())})

    def ids(fraction, blocks, salt="s42"):
        ds = ray.data.from_arrow(tbl).repartition(blocks)
        out = deterministic_sample(ds, id_col="id", fraction=fraction, salt=salt)
        return set(out.to_pandas()["id"])

    a = ids(0.2, 2)
    assert a == ids(0.2, 7)          # parallelism-invariant
    assert a == ids(0.2, 2)          # reproducible
    assert a <= ids(0.5, 2)          # nested: 20% ⊂ 50% (same salt)
    assert 0.15 < len(a) / 2000 < 0.25  # near the requested fraction
    b = ids(0.2, 2, salt="other")
    assert a != b                    # different salt → different sample


def test_pack_dataset_parallelism_invariant(ray_session):
    """Distributed prefix-sum packing must not depend on block layout."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from deepseek_ocr_ray.pipelines.analytics import pack_dataset

    rng = np.random.RandomState(11)
    n = 200
    tbl = pa.table(
        {
            "doc_id": pa.array(rng.permutation(n).tolist(), pa.int64()),
            "n_chars": pa.array(rng.randint(1, 500, n).tolist(), pa.int64()),
        }
    )
    outs = []
    for blocks in (1, 4, 9):
        ds = ray.data.from_arrow(tbl).repartition(blocks)
        df = pack_dataset(ds, budget=777).to_pandas().sort_values("doc_id")
        outs.append(df.reset_index(drop=True))
    assert outs[0].equals(outs[1]) and outs[1].equals(outs[2])
    # oracle: serial prefix sum in doc_id order
    order = np.argsort(tbl["doc_id"].to_numpy())
    sizes = tbl["n_chars"].to_numpy()[order]
    before = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    want = (before // 777).tolist()
    assert outs[0]["pack_id"].tolist() == want


def test_pack_dataset_duplicate_ids_reject_or_correct(ray_session):
    """Duplicate ids must never SILENTLY corrupt pack assignment: if the
    sorted layout puts equal ids across a block boundary the guard raises;
    otherwise (equal keys coalesce into one block, the usual sort outcome)
    the serial prefix-sum result must hold."""
    import pyarrow as pa
    import ray.data

    from deepseek_ocr_ray.pipelines.analytics import pack_dataset

    tbl = pa.table(
        {
            "doc_id": pa.array([5] * 40, pa.int64()),
            "n_chars": pa.array([10] * 40, pa.int64()),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(4)
    try:
        df = pack_dataset(ds, budget=100).to_pandas()
    except Exception as ei:
        assert "unique ids" in str(ei)
        return
    want = sorted(i * 10 // 100 for i in range(40))
    assert sorted(df.pack_id.tolist()) == want


# ---------------------------------------------------------------------------
# hopping windows
# ---------------------------------------------------------------------------


def _hop_events():
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = []
    for h, typ, v in [
        (0, "a", 1.0), (1, "a", 2.0), (3, "b", 3.0),
        (5, "a", 4.0), (8, "b", 5.0),
    ]:
        rows.append((base + dt.timedelta(hours=h), typ, v))
    return pa.table(
        {
            "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
            "event_type": pa.array([r[1] for r in rows], pa.string()),
            "value": pa.array([r[2] for r in rows], pa.float64()),
        }
    )


def _naive_hopping(tab, size_s, hop_s):
    out = {}
    for i in range(tab.num_rows):
        t = tab["ts"][i].value // 1_000_000
        typ = tab["event_type"][i].as_py()
        cents = int(np.floor(tab["value"][i].as_py() * 100 + 0.5))
        start = (t // hop_s) * hop_s
        while start > t - size_s:
            key = (start, typ)
            n, c = out.get(key, (0, 0))
            out[key] = (n + 1, c + cents)
            start -= hop_s
    return {
        k: v for k, v in out.items()
    }


def test_hopping_window_vs_naive(ray_session):
    import ray.data

    tab = _hop_events()
    got = windows.hopping_window(
        ray.data.from_arrow(tab).repartition(3), size_s=21600, hop_s=7200
    ).take_all()
    want = _naive_hopping(tab, 21600, 7200)
    got_map = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["value_cents"])
        for r in got
    }
    assert got_map == want


def test_hopping_window_tumbling_special_case(ray_session):
    import ray.data

    tab = _hop_events()
    got = windows.hopping_window(
        ray.data.from_arrow(tab), size_s=7200, hop_s=7200
    ).take_all()
    want = _naive_hopping(tab, 7200, 7200)
    got_map = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["value_cents"])
        for r in got
    }
    assert got_map == want
    # tumbling: every event in exactly one window
    assert sum(n for n, _ in got_map.values()) == tab.num_rows


def test_hopping_window_rejects_non_multiple(ray_session):
    import ray.data

    with pytest.raises(ValueError, match="multiple"):
        windows.hopping_window(
            ray.data.from_arrow(_hop_events()), size_s=7000, hop_s=3000
        )


def test_funnel_conversions_vs_naive(ray_session):
    import ray.data

    from deepseek_ocr_ray.stages.windows import funnel_conversions

    rng = np.random.RandomState(23)
    n = 4000
    base = np.datetime64("2024-01-01T00:00:00", "us")
    ts = base + rng.randint(0, 3 * 86400, n).astype("timedelta64[s]").astype(
        "timedelta64[us]"
    )
    users = rng.randint(0, 60, n).astype(np.int64)
    types = rng.choice(["view", "purchase", "click"], n)
    tab = pa.table(
        {
            "user_id": pa.array(users, pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "event_type": pa.array(types, pa.string()),
        }
    )
    W = np.timedelta64(3600 * 1000000, "us")
    want = {}
    for u in np.unique(users):
        vm = (users == u) & (types == "view")
        pm = (users == u) & (types == "purchase")
        pts = ts[pm]
        n_a = int(vm.sum())
        if n_a == 0:
            continue
        n_conv = sum(
            1 for t in ts[vm] if np.any((pts > t) & (pts <= t + W))
        )
        want[int(u)] = (n_a, n_conv)

    for parts in (1, 9):
        got = {
            r["user_id"]: (r["n_a"], r["n_conv"])
            for r in funnel_conversions(
                ray.data.from_arrow(tab).repartition(parts)
            ).take_all()
        }
        assert got == want


def test_funnel_window_boundaries_are_strict_open_closed(ray_session):
    import ray.data

    from deepseek_ocr_ray.stages.windows import funnel_conversions

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    H = np.timedelta64(3600 * 1000000, "us")
    US = np.timedelta64(1, "us")
    rows = [
        # purchase AT the view instant -> no conversion (strict >)
        (1, t0, "view"), (1, t0, "purchase"),
        # purchase exactly at t+window -> conversion (closed right edge)
        (2, t0, "view"), (2, t0 + H, "purchase"),
        # purchase one microsecond past the window -> no conversion
        (3, t0, "view"), (3, t0 + H + US, "purchase"),
    ]
    tab = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    got = {
        r["user_id"]: r["n_conv"]
        for r in funnel_conversions(ray.data.from_arrow(tab)).take_all()
    }
    assert got == {1: 0, 2: 1, 3: 0}


def test_group_rank_vs_duckdb(ray_session):
    import duckdb
    import ray.data

    from deepseek_ocr_ray.stages.windows import group_rank

    rng = np.random.RandomState(19)
    n = 2500
    tab = pa.table(
        {
            "g": pa.array([f"g{v}" for v in rng.randint(0, 12, n)], pa.string()),
            "v": pa.array(rng.randint(0, 30, n).tolist(), pa.int64()),  # many ties
            "id": pa.array(rng.permutation(n).tolist(), pa.int64()),
        }
    )
    # plus a single-row group (percent_rank edge: (1-1)/max(n-1,1) = 0)
    tab = pa.concat_tables(
        [tab, pa.table({"g": ["solo"], "v": [7], "id": [999999]})]
    )
    con = duckdb.connect()
    con.register("t", tab)
    want = {
        (r["g"], r["id"]): (r["rnk"], r["pct"])
        for r in con.execute(
            "SELECT g, id, CAST(rank() OVER w AS BIGINT) AS rnk, "
            "percent_rank() OVER w AS pct FROM t "
            "WINDOW w AS (PARTITION BY g ORDER BY v DESC, id)"
        ).arrow().to_pylist()
    }
    got_rows = group_rank(
        ray.data.from_arrow(tab).repartition(6),
        keys=["g"],
        order_cols=[("v", "descending"), ("id", "ascending")],
    ).take_all()
    assert len(got_rows) == len(want)
    for r in got_rows:
        assert (r["rnk"], r["pct"]) == want[(r["g"], r["id"])], r


def test_debounce_vs_duckdb_lag(ray_session):
    import duckdb
    import ray.data

    from deepseek_ocr_ray.stages.windows import debounce

    rng = np.random.RandomState(33)
    n = 3000
    base = np.datetime64("2024-01-01", "us")
    tab = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "u": pa.array(rng.randint(0, 40, n).astype(np.int64), pa.int64()),
            "t": pa.array(
                base + rng.randint(0, 86400, n).astype("timedelta64[s]").astype(
                    "timedelta64[us]"
                ),
                pa.timestamp("us"),
            ),
        }
    )
    con = duckdb.connect()
    con.register("e", tab)
    want = sorted(
        r["event_id"]
        for r in con.execute(
            "SELECT event_id FROM (SELECT event_id, t, "
            "lag(t) OVER (PARTITION BY u ORDER BY t, event_id) AS p FROM e) "
            "WHERE p IS NULL OR t - p > INTERVAL 17 MINUTE"
        ).arrow().to_pylist()
    )
    for parts in (1, 8):
        got = sorted(
            r["event_id"]
            for r in debounce(
                ray.data.from_arrow(tab).repartition(parts),
                keys=["u"],
                ts_col="t",
                window_sec=17 * 60,
            ).take_all()
        )
        assert got == want


# --- shuffle_shards (training export) ---


def _docs_tab(n=600):
    import numpy as np
    rng = np.random.RandomState(9)
    return pa.table({
        "doc_id": pa.array(list(range(n)), pa.int64()),
        "lang": pa.array([f"l{v}" for v in rng.randint(0, 4, n)], pa.string()),
    })


def test_shuffle_shards_partition_and_positions(ray_session):
    import ray.data

    from deepseek_ocr_ray.pipelines.analytics import shuffle_shards

    tab = _docs_tab()
    out = shuffle_shards(
        ray.data.from_arrow(tab).repartition(5),
        id_col="doc_id", n_shards=7,
    ).take_all()
    assert len(out) == tab.num_rows
    assert {r["doc_id"] for r in out} == set(range(tab.num_rows))
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) <= set(range(7))
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(len(poss)))  # contiguous 0..n-1


def test_shuffle_shards_parallelism_invariant(ray_session):
    import ray.data

    from deepseek_ocr_ray.pipelines.analytics import shuffle_shards

    tab = _docs_tab()
    outs = []
    for nb in (1, 8):
        rows = shuffle_shards(
            ray.data.from_arrow(tab).repartition(nb),
            id_col="doc_id", n_shards=4,
        ).take_all()
        outs.append(sorted((r["doc_id"], r["shard"], r["pos"]) for r in rows))
    assert outs[0] == outs[1]


def test_shuffle_shards_salts_give_different_orders(ray_session):
    import ray.data

    from deepseek_ocr_ray.pipelines.analytics import shuffle_shards

    tab = _docs_tab()
    orders = []
    for salt in ("e1", "e2"):
        rows = shuffle_shards(
            ray.data.from_arrow(tab), id_col="doc_id", n_shards=1, salt=salt,
        ).take_all()
        orders.append([r["doc_id"] for r in sorted(rows, key=lambda r: r["pos"])])
    assert orders[0] != orders[1]          # epochs see different orders
    assert sorted(orders[0]) == sorted(orders[1])


def test_shuffle_shards_md5_vs_duckdb(ray_session):
    import duckdb
    import ray.data

    from deepseek_ocr_ray.pipelines.analytics import shuffle_shards

    tab = _docs_tab(300)
    got = sorted(
        (r["doc_id"], r["shard"], r["pos"])
        for r in shuffle_shards(
            ray.data.from_arrow(tab).repartition(3),
            id_col="doc_id", n_shards=8, method="md5",
        ).take_all()
    )
    con = duckdb.connect()
    con.register("t", tab)
    want = sorted(
        tuple(r) for r in con.execute("""
        WITH h AS (
          SELECT doc_id,
                 CAST(('0x' || substr(md5('sh42:' || CAST(doc_id AS VARCHAR)), 1, 8))
                      AS UBIGINT) AS hv
          FROM t
        )
        SELECT doc_id, CAST(hv % 8 AS BIGINT) AS shard,
               CAST(row_number() OVER (PARTITION BY hv % 8 ORDER BY hv, doc_id) - 1
                    AS BIGINT) AS pos
        FROM h
        """).fetchall()
    )
    assert got == want


# --- group_ntile ---


@pytest.mark.parametrize("k", [1, 3, 4, 7, 50])
def test_group_ntile_vs_duckdb(ray_session, k):
    import duckdb
    import numpy as np
    import ray.data

    from deepseek_ocr_ray.stages.windows import group_ntile

    rng = np.random.RandomState(31)
    n = 2000
    tab = pa.table({
        "g": pa.array([f"g{v}" for v in rng.randint(0, 8, n)], pa.string()),
        "v": pa.array(rng.randint(0, 100, n).tolist(), pa.int64()),
        "id": pa.array(list(range(n)), pa.int64()),
    })
    got = sorted(
        (r["id"], r["tile"])
        for r in group_ntile(
            ray.data.from_arrow(tab).repartition(5),
            keys=["g"],
            order_cols=[("v", "descending"), ("id", "ascending")],
            n_tiles=k,
        ).take_all()
    )
    con = duckdb.connect()
    con.register("t", tab)
    want = sorted(
        tuple(r) for r in con.execute(
            "SELECT id, CAST(ntile(?) OVER (PARTITION BY g "
            "ORDER BY v DESC, id) AS BIGINT) FROM t", [k]
        ).fetchall()
    )
    assert got == want


def test_group_ntile_fewer_rows_than_tiles(ray_session):
    import ray.data

    from deepseek_ocr_ray.stages.windows import group_ntile

    tab = pa.table({
        "g": pa.array(["a", "a", "b"]),
        "id": pa.array([1, 2, 3], pa.int64()),
    })
    rows = {
        r["id"]: r["tile"]
        for r in group_ntile(
            ray.data.from_arrow(tab), keys=["g"],
            order_cols=[("id", "ascending")], n_tiles=5,
        ).take_all()
    }
    assert rows == {1: 1, 2: 2, 3: 1}


# --- gap_stats ---


def test_gap_stats_vs_duckdb(ray_session):
    import datetime as dt

    import duckdb
    import numpy as np
    import ray.data

    from deepseek_ocr_ray.stages.windows import gap_stats

    rng = np.random.RandomState(41)
    n = 3000
    base = dt.datetime(2025, 1, 1)
    tab = pa.table({
        "user_id": pa.array(rng.randint(0, 80, n).tolist(), pa.int64()),
        "ts": pa.array(
            [base + dt.timedelta(seconds=int(s))
             for s in rng.randint(0, 10_000_000, n)],
            pa.timestamp("us"),
        ),
        "event_id": pa.array(list(range(n)), pa.int64()),
    })
    got = sorted(
        (r["user_id"], r["n_gaps"], r["avg_gap_us"], r["max_gap_us"])
        for r in gap_stats(
            ray.data.from_arrow(tab).repartition(6), keys=["user_id"]
        ).take_all()
    )
    con = duckdb.connect()
    con.register("t", tab)
    want = sorted(
        tuple(r) for r in con.execute("""
        WITH d AS (
          SELECT user_id,
                 epoch_us(ts - lag(ts) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id)) AS g
          FROM t
        )
        SELECT user_id, CAST(count(*) AS BIGINT), avg(g),
               CAST(max(g) AS BIGINT)
        FROM d WHERE g IS NOT NULL GROUP BY 1
        """).fetchall()
    )
    assert got == want  # bit-exact incl. the float64 avg


def test_gap_stats_drops_single_event_keys(ray_session):
    import datetime as dt

    import ray.data

    from deepseek_ocr_ray.stages.windows import gap_stats

    base = dt.datetime(2025, 1, 1)
    tab = pa.table({
        "user_id": pa.array([1, 2, 2], pa.int64()),
        "ts": pa.array(
            [base, base, base + dt.timedelta(seconds=5)], pa.timestamp("us")
        ),
        "event_id": pa.array([1, 2, 3], pa.int64()),
    })
    rows = gap_stats(ray.data.from_arrow(tab), keys=["user_id"]).take_all()
    assert [(r["user_id"], r["n_gaps"], r["max_gap_us"]) for r in rows] == [
        (2, 1, 5_000_000)
    ]


# --- cume_dist + with_lag ---


def test_group_rank_cume_dist_vs_duckdb(ray_session):
    import duckdb
    import numpy as np
    import ray.data

    from deepseek_ocr_ray.stages.windows import group_rank

    rng = np.random.RandomState(61)
    n = 2000
    tab = pa.table({
        "g": pa.array([f"g{v}" for v in rng.randint(0, 7, n)], pa.string()),
        "v": pa.array(rng.randint(0, 30, n).tolist(), pa.int64()),  # many ties
        "id": pa.array(list(range(n)), pa.int64()),
    })
    got = sorted(
        (r["id"], r["rnk"], r["cume"])
        for r in group_rank(
            ray.data.from_arrow(tab).repartition(4),
            keys=["g"], order_cols=[("v", "descending")], cume_col="cume",
        ).take_all()
    )
    con = duckdb.connect()
    con.register("t", tab)
    want = sorted(tuple(r) for r in con.execute("""
        SELECT id, CAST(rank() OVER w AS BIGINT), cume_dist() OVER w
        FROM t WINDOW w AS (PARTITION BY g ORDER BY v DESC)
    """).fetchall())
    assert got == want  # bit-exact float64


@pytest.mark.parametrize("lead,offset", [(False, 1), (False, 2), (True, 1), (True, 3)])
def test_with_lag_vs_duckdb(ray_session, lead, offset):
    import duckdb
    import numpy as np
    import ray.data

    from deepseek_ocr_ray.stages.windows import with_lag

    rng = np.random.RandomState(67)
    n = 1500
    tab = pa.table({
        "g": pa.array(rng.randint(0, 40, n).tolist(), pa.int64()),
        "o": pa.array(rng.randint(0, 10**6, n).tolist(), pa.int64()),
        "v": pa.array(rng.randint(0, 100, n).tolist(), pa.int64()),
        "id": pa.array(list(range(n)), pa.int64()),
    })
    fn = "lead" if lead else "lag"
    got = sorted(
        (r["id"], r["prev"])
        for r in with_lag(
            ray.data.from_arrow(tab).repartition(5),
            keys=["g"], order_cols=[("o", "ascending"), ("id", "ascending")],
            col="v", out_col="prev", offset=offset, lead=lead,
        ).take_all()
    )
    con = duckdb.connect()
    con.register("t", tab)
    want = sorted(tuple(r) for r in con.execute(f"""
        SELECT id, {fn}(v, {offset}) OVER (PARTITION BY g ORDER BY o, id)
        FROM t
    """).fetchall())
    assert got == want


def test_group_rank_dense_vs_duckdb(ray_session):
    import duckdb
    import numpy as np
    import ray.data

    from deepseek_ocr_ray.stages.windows import group_rank

    rng = np.random.RandomState(71)
    n = 1500
    tab = pa.table({
        "g": pa.array([f"g{v}" for v in rng.randint(0, 6, n)], pa.string()),
        "v": pa.array(rng.randint(0, 20, n).tolist(), pa.int64()),
        "id": pa.array(list(range(n)), pa.int64()),
    })
    got = sorted(
        (r["id"], r["drnk"])
        for r in group_rank(
            ray.data.from_arrow(tab).repartition(4),
            keys=["g"], order_cols=[("v", "descending")], dense_col="drnk",
        ).take_all()
    )
    con = duckdb.connect()
    con.register("t", tab)
    want = sorted(tuple(r) for r in con.execute("""
        SELECT id, CAST(dense_rank() OVER (PARTITION BY g ORDER BY v DESC)
                        AS BIGINT) FROM t
    """).fetchall())
    assert got == want


# --- funnel3 ---


def test_funnel3_vs_duckdb(ray_session):
    import datetime as dt

    import duckdb
    import numpy as np
    import ray.data

    from deepseek_ocr_ray.stages.windows import funnel3_conversions

    rng = np.random.RandomState(79)
    n = 4000
    base = dt.datetime(2025, 3, 1)
    tab = pa.table({
        "user_id": pa.array(rng.randint(0, 60, n).tolist(), pa.int64()),
        "ts": pa.array(
            [base + dt.timedelta(seconds=int(s))
             for s in rng.randint(0, 2_000_000, n)],
            pa.timestamp("us"),
        ),
        "event_type": pa.array(
            [["view", "click", "purchase", "other"][i]
             for i in rng.randint(0, 4, n)],
            pa.string(),
        ),
    })
    got = sorted(
        (r["user_id"], r["n_a"], r["n_conv"])
        for r in funnel3_conversions(
            ray.data.from_arrow(tab).repartition(5),
            window_ab_sec=1800.0, window_bc_sec=900.0,
        ).take_all()
    )
    con = duckdb.connect()
    con.register("t", tab)
    want = sorted(tuple(r) for r in con.execute("""
        WITH v AS (SELECT user_id, ts FROM t WHERE event_type='view'),
        b AS (SELECT user_id, ts FROM t WHERE event_type='click'),
        c AS (SELECT user_id, ts FROM t WHERE event_type='purchase'),
        vb AS (
          SELECT v.user_id, v.ts AS vts,
                 (SELECT min(b.ts) FROM b
                  WHERE b.user_id = v.user_id AND b.ts > v.ts
                    AND b.ts <= v.ts + INTERVAL 30 MINUTE) AS bts
          FROM v
        )
        SELECT user_id, CAST(count(*) AS BIGINT),
               CAST(sum(CASE WHEN bts IS NOT NULL AND EXISTS (
                 SELECT 1 FROM c WHERE c.user_id = vb.user_id
                   AND c.ts > vb.bts AND c.ts <= vb.bts + INTERVAL 15 MINUTE
               ) THEN 1 ELSE 0 END) AS BIGINT)
        FROM vb GROUP BY 1
    """).fetchall())
    assert got == want


def test_funnel3_chain_anchors_on_earliest_b(ray_session):
    import datetime as dt

    import ray.data

    from deepseek_ocr_ray.stages.windows import funnel3_conversions

    base = dt.datetime(2025, 1, 1)
    sec = lambda s: base + dt.timedelta(seconds=s)
    # A at 0; Bs at 10 and 50; C at 70.  W1=60, W2=30.
    # Earliest B is 10 → C window (10, 40] misses C@70 → NOT converted,
    # even though the LATER B@50 would have caught it (chain semantics).
    tab = pa.table({
        "user_id": pa.array([1, 1, 1, 1], pa.int64()),
        "ts": pa.array([sec(0), sec(10), sec(50), sec(70)], pa.timestamp("us")),
        "event_type": pa.array(["view", "click", "click", "purchase"]),
    })
    out = funnel3_conversions(
        ray.data.from_arrow(tab), window_ab_sec=60.0, window_bc_sec=30.0,
    ).take_all()
    assert [(r["user_id"], r["n_a"], r["n_conv"]) for r in out] == [(1, 1, 0)]


# ---------------------------------------------------------------------------
# rolling DISTINCT cardinality
# ---------------------------------------------------------------------------


def test_rolling_distinct_daily_brute(ray_session):
    """Exact trailing-7-day distinct ids vs a brute per-day set union,
    including gaps (absent days emit no row but are looked through) and
    users active on several days of one window (counted once)."""
    import pandas as pd
    import ray.data

    from deepseek_ocr_ray.stages.windows import rolling_distinct_daily

    rows = [  # (user, day-offset)
        (1, 0), (1, 1), (1, 2), (2, 0), (3, 2),
        (2, 9), (4, 9), (1, 10), (4, 15), (4, 15),
    ]
    base = pd.Timestamp("2024-03-01")
    tab = pa.table(
        {
            "user_id": pa.array([u for u, _ in rows], pa.int64()),
            "ts": pa.array(
                [base + pd.Timedelta(days=d, hours=u % 3) for u, d in rows],
                pa.timestamp("us"),
            ),
        }
    )
    got = [
        tuple(r)
        for r in rolling_distinct_daily(ray.data.from_arrow(tab))
        .to_pandas()
        .itertuples(index=False)
    ]
    days = sorted({d for _, d in rows})
    want = []
    for d in days:
        active = {u for u, dd in rows if d - 6 <= dd <= d}
        want.append(
            ((base + pd.Timedelta(days=d)).strftime("%Y-%m-%d"), len(active))
        )
    assert got == want
    # spot semantics: day 9 window [3..9] sees users 2 and 4 only
    assert dict(got)[
        (base + pd.Timedelta(days=9)).strftime("%Y-%m-%d")
    ] == 2


def test_ccnet_buckets_order_property(ray_session):
    """Within a language, every head doc is at least as corpus-probable
    as every middle doc, which outranks every tail doc."""
    from deepseek_ocr_ray.pipelines.analytics import ccnet_buckets

    out = ccnet_buckets("/root/testdata/sf0.001").to_pandas()
    assert set(out.bucket) == {"head", "middle", "tail"}
    for _, g in out.groupby("lang"):
        h = g[g.bucket == "head"].mean_cond_ppm
        m = g[g.bucket == "middle"].mean_cond_ppm
        t = g[g.bucket == "tail"].mean_cond_ppm
        if len(h) and len(m):
            assert h.min() >= m.max()
        if len(m) and len(t):
            assert m.min() >= t.max()


def test_prior_window_counts_boundaries(ray_session):
    import datetime as dt

    import ray.data

    from deepseek_ocr_ray.stages.windows import prior_window_counts

    d = dt.datetime
    t0 = d(2000, 1, 1, 12, 0, 0)
    rows = [
        # user 1: purchase at 12:00; views at 11:00:00 (exactly t-W,
        # EXCLUDED by the strict lower edge), 11:00:01 (in), 12:00:00
        # (tie at t, INCLUDED), 12:00:01 (after, out)
        (1, 1, d(2000, 1, 1, 11, 0, 0), "view"),
        (2, 1, d(2000, 1, 1, 11, 0, 1), "view"),
        (3, 1, t0, "view"),
        (4, 1, d(2000, 1, 1, 12, 0, 1), "view"),
        (5, 1, t0, "purchase"),
        # user 2: same timestamps must not leak across users
        (6, 2, d(2000, 1, 1, 11, 30, 0), "view"),
        (7, 2, d(2000, 1, 2, 12, 0, 0), "purchase"),  # a day later: 0
        # user 3: purchase with no views at all
        (8, 3, d(2000, 1, 1, 9, 0, 0), "purchase"),
        # clicks never counted
        (9, 1, d(2000, 1, 1, 11, 45, 0), "click"),
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
        }
    )
    out = (
        prior_window_counts(
            ray.data.from_arrow(t).repartition(3),
            anchor_type="purchase",
            count_type="view",
            window_sec=3600.0,
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert out.values.tolist() == [[5, 1, 2], [7, 2, 0], [8, 3, 0]]


# ------------------------------------------------------- running sum


def test_group_running_sum_fixture(ray_session):
    import ray

    tbl = pa.table(
        {
            "k": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
            "t": pa.array([1, 2, 3, 1, 2, 1], pa.int64()),
            "v": pa.array([10, None, 5, None, 7, None], pa.int64()),
        }
    )
    got = (
        windows.group_running_sum(
            ray.data.from_arrow(tbl).repartition(3),
            keys=["k"],
            order_cols=[("t", "ascending")],
            col="v",
            out_col="rs",
        )
        .to_pandas()
        .sort_values(["k", "t"])
    )
    import pandas as pd

    vals = [None if pd.isna(x) else int(x) for x in got["rs"]]
    # k=1: 10, 10 (null adds nothing), 15; k=2: NULL (all-null prefix), 7;
    # k=3: NULL
    assert vals == [10, 10, 15, None, 7, None]


@pytest.mark.parametrize("seed", [0, 1])
def test_group_running_sum_differential(ray_session, seed):
    import duckdb
    import pandas as pd
    import ray

    rng = np.random.default_rng(seed)
    n = 400
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 25, n).astype(np.int64),
            "t": rng.permutation(n).astype(np.int64),
            "v": pd.array(
                np.where(rng.random(n) < 0.15, pd.NA, rng.integers(-50, 100, n)),
                dtype="Int64",
            ),
        }
    )
    con = duckdb.connect()
    con.register("t", df)
    want = con.sql(
        """
SELECT k, t, CAST(SUM(v) OVER (PARTITION BY k ORDER BY t
     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS rs
FROM t ORDER BY k, t
"""
    ).df()
    tbl = pa.table(
        {
            "k": pa.array(df["k"], pa.int64()),
            "t": pa.array(df["t"], pa.int64()),
            "v": pa.array(
                [None if x is pd.NA else int(x) for x in df["v"]], pa.int64()
            ),
        }
    )
    got = (
        windows.group_running_sum(
            ray.data.from_arrow(tbl).repartition(6),
            keys=["k"],
            order_cols=[("t", "ascending")],
            col="v",
            out_col="rs",
        )
        .to_pandas()
        .sort_values(["k", "t"])
        .reset_index(drop=True)
    )
    import pandas as pd

    g = [None if pd.isna(x) else int(x) for x in got["rs"]]
    w = [None if pd.isna(x) else int(x) for x in want["rs"]]
    assert g == w


def test_group_running_sum_validation_and_horizon(ray_session):
    import ray

    f = pa.table({"k": pa.array([1], pa.int64()), "t": pa.array([1], pa.int64()),
                  "v": pa.array([1.5], pa.float64())})
    with pytest.raises(ValueError, match="must be integer"):
        windows.group_running_sum(
            ray.data.from_arrow(f), keys=["k"],
            order_cols=[("t", "ascending")], col="v", out_col="rs",
        )
    big = pa.table(
        {
            "k": pa.array([1, 1, 1], pa.int64()),
            "t": pa.array([1, 2, 3], pa.int64()),
            "v": pa.array([2**62, 2**62, 2**62], pa.int64()),
        }
    )
    with pytest.raises(Exception, match="horizon"):
        windows.group_running_sum(
            ray.data.from_arrow(big), keys=["k"],
            order_cols=[("t", "ascending")], col="v", out_col="rs",
        ).materialize()


def test_group_rolling_sum_fixture(ray_session):
    import pandas as pd
    import ray

    tbl = pa.table(
        {
            "k": pa.array([1, 1, 1, 1, 2], pa.int64()),
            "t": pa.array([1, 2, 3, 4, 1], pa.int64()),
            "v": pa.array([10, 20, None, 40, 7], pa.int64()),
        }
    )
    got = (
        windows.group_rolling_sum(
            ray.data.from_arrow(tbl).repartition(2),
            keys=["k"],
            order_cols=[("t", "ascending")],
            col="v",
            out_col="rs",
            window=2,
        )
        .to_pandas()
        .sort_values(["k", "t"])
    )
    vals = [None if pd.isna(x) else int(x) for x in got["rs"]]
    # k=1 window 2: [10], [10,20]=30, [20,null]=20, [null,40]=40; k=2: 7
    assert vals == [10, 30, 20, 40, 7]


@pytest.mark.parametrize("window", [1, 3, 5])
def test_group_rolling_sum_differential(ray_session, window):
    import duckdb
    import pandas as pd
    import ray

    rng = np.random.default_rng(window)
    n = 300
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 12, n).astype(np.int64),
            "t": rng.permutation(n).astype(np.int64),
            "v": pd.array(
                np.where(rng.random(n) < 0.2, pd.NA, rng.integers(-30, 60, n)),
                dtype="Int64",
            ),
        }
    )
    con = duckdb.connect()
    con.register("t", df)
    want = con.sql(
        f"""
SELECT k, t, CAST(SUM(v) OVER (PARTITION BY k ORDER BY t
     ROWS BETWEEN {window - 1} PRECEDING AND CURRENT ROW) AS BIGINT) AS rs
FROM t ORDER BY k, t
"""
    ).df()
    tbl = pa.table(
        {
            "k": pa.array(df["k"], pa.int64()),
            "t": pa.array(df["t"], pa.int64()),
            "v": pa.array(
                [None if x is pd.NA else int(x) for x in df["v"]], pa.int64()
            ),
        }
    )
    got = (
        windows.group_rolling_sum(
            ray.data.from_arrow(tbl).repartition(5),
            keys=["k"],
            order_cols=[("t", "ascending")],
            col="v",
            out_col="rs",
            window=window,
        )
        .to_pandas()
        .sort_values(["k", "t"])
        .reset_index(drop=True)
    )
    g = [None if pd.isna(x) else int(x) for x in got["rs"]]
    w = [None if pd.isna(x) else int(x) for x in want["rs"]]
    assert g == w


def test_group_rolling_sum_validation(ray_session):
    import ray

    tbl = pa.table(
        {
            "k": pa.array([1], pa.int64()),
            "t": pa.array([1], pa.int64()),
            "v": pa.array([1], pa.int64()),
        }
    )
    with pytest.raises(ValueError, match="window"):
        windows.group_rolling_sum(
            ray.data.from_arrow(tbl), keys=["k"],
            order_cols=[("t", "ascending")], col="v", out_col="rs", window=0,
        )


# ---------------------------------------------------------------------------
# group_ewma


def test_group_ewma_recurrence_fixture(ray_session):
    """Hand-walked recurrence: s_0 = v_0, s_i = 0.75·s_{i−1} + 0.25·v_i,
    per key, in order — out-of-order input and a second group."""
    import ray.data

    from deepseek_ocr_ray.stages.windows import group_ewma

    t = pa.table(
        {
            "k": pa.array([1, 1, 1, 2, 2], pa.int64()),
            "o": pa.array([2, 0, 1, 1, 0], pa.int64()),
            "v": pa.array([8.0, 4.0, 2.0, 10.0, 6.0], pa.float64()),
        }
    )
    rows = group_ewma(
        ray.data.from_arrow(t).repartition(2),
        keys=["k"],
        order_cols=[("o", "ascending")],
        col="v",
        out_col="ewma",
        alpha=0.25,
    ).take_all()
    got = {(r["k"], r["o"]): r["ewma"] for r in rows}
    # key 1 in o-order: v = 4, 2, 8
    s1 = 4.0
    s2 = 0.75 * s1 + 0.25 * 2.0
    s3 = 0.75 * s2 + 0.25 * 8.0
    assert got[(1, 0)] == s1 and got[(1, 1)] == s2 and got[(1, 2)] == s3
    # key 2 in o-order: v = 6, 10
    assert got[(2, 0)] == 6.0 and got[(2, 1)] == 0.75 * 6.0 + 0.25 * 10.0


def test_group_ewma_block_invariance(ray_session):
    import random

    import ray.data

    from deepseek_ocr_ray.stages.windows import group_ewma

    rng = random.Random(3)
    n = 400
    t = pa.table(
        {
            "k": pa.array([rng.randrange(7) for _ in range(n)], pa.int64()),
            "o": pa.array(list(range(n)), pa.int64()),
            "v": pa.array([rng.uniform(-5, 5) for _ in range(n)], pa.float64()),
        }
    )
    outs = []
    for nblocks in (1, 5):
        rows = group_ewma(
            ray.data.from_arrow(t).repartition(nblocks),
            keys=["k"],
            order_cols=[("o", "ascending")],
            col="v",
            out_col="ewma",
            alpha=0.5,
        ).take_all()
        outs.append(sorted((r["k"], r["o"], r["ewma"]) for r in rows))
    assert outs[0] == outs[1]
    # sequential reference with the same op order
    import numpy as np

    ref = {}
    by_k = {}
    for k, o, v in sorted(zip(t["k"].to_pylist(), t["o"].to_pylist(), t["v"].to_pylist())):
        if k not in by_k:
            by_k[k] = np.float64(v)
        else:
            by_k[k] = np.float64(0.5) * by_k[k] + np.float64(0.5) * np.float64(v)
        ref[(k, o)] = float(by_k[k])
    got = {(k, o): e for k, o, e in outs[0]}
    assert got == ref


def test_group_ewma_validation(ray_session):
    import ray.data

    from deepseek_ocr_ray.stages.windows import group_ewma

    t = pa.table(
        {
            "k": pa.array([1, 1], pa.int64()),
            "o": pa.array([0, 1], pa.int64()),
            "v": pa.array([1.0, None], pa.float64()),
        }
    )
    with pytest.raises(Exception, match="NULL"):
        group_ewma(
            ray.data.from_arrow(t),
            keys=["k"],
            order_cols=[("o", "ascending")],
            col="v",
            out_col="e",
            alpha=0.25,
        ).take_all()
    with pytest.raises(ValueError, match="alpha"):
        group_ewma(
            ray.data.from_arrow(t),
            keys=["k"],
            order_cols=[("o", "ascending")],
            col="v",
            out_col="e",
            alpha=0.0,
        )
    ti = pa.table(
        {
            "k": pa.array([1], pa.int64()),
            "o": pa.array([0], pa.int64()),
            "v": pa.array([1], pa.int64()),
        }
    )
    with pytest.raises(Exception, match="float64"):
        group_ewma(
            ray.data.from_arrow(ti),
            keys=["k"],
            order_cols=[("o", "ascending")],
            col="v",
            out_col="e",
            alpha=0.25,
        ).take_all()


# ---------------------------------------------------------------------------
# group_rolling_extremes


def _roll_ref(vals, w, fn):
    """Per-run scalar reference with SQL null semantics."""
    out = []
    for i in range(len(vals)):
        frame = [v for v in vals[max(0, i - w + 1) : i + 1] if v is not None]
        out.append(fn(frame) if frame else None)
    return out


@pytest.mark.parametrize("window", [1, 2, 3, 7, 50])
def test_rolling_extremes_differential(ray_session, window):
    """Random multi-group values incl. NULLs vs a scalar reference —
    exercises full frames, truncated run starts, the partial last van
    Herk block, and all-NULL frames."""
    import random

    import ray.data

    from deepseek_ocr_ray.stages.windows import group_rolling_extremes

    rng = random.Random(window)
    n = 300
    ks = [rng.randrange(5) for _ in range(n)]
    vs = [rng.randrange(-50, 50) if rng.random() > 0.15 else None for _ in range(n)]
    t = pa.table(
        {
            "k": pa.array(ks, pa.int64()),
            "o": pa.array(list(range(n)), pa.int64()),
            "v": pa.array(vs, pa.int64()),
        }
    )
    rows = group_rolling_extremes(
        ray.data.from_arrow(t).repartition(4),
        keys=["k"],
        order_cols=[("o", "ascending")],
        col="v",
        window=window,
    ).take_all()
    got = {(r["k"], r["o"]): (r["roll_min"], r["roll_max"]) for r in rows}
    for k in set(ks):
        seq = [(o, v) for o, (kk, v) in enumerate(zip(ks, vs)) if kk == k]
        vals = [v for _, v in seq]
        mins = _roll_ref(vals, window, min)
        maxs = _roll_ref(vals, window, max)
        for (o, _), mn, mx in zip(seq, mins, maxs):
            assert got[(k, o)] == (mn, mx), (k, o, window)


def test_rolling_extremes_single_output_and_validation(ray_session):
    import ray.data

    from deepseek_ocr_ray.stages.windows import group_rolling_extremes

    t = pa.table(
        {
            "k": pa.array([1, 1, 1], pa.int64()),
            "o": pa.array([0, 1, 2], pa.int64()),
            "v": pa.array([3, 1, 2], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t)
    rows = group_rolling_extremes(
        ds,
        keys=["k"],
        order_cols=[("o", "ascending")],
        col="v",
        window=2,
        out_max=None,
    ).take_all()
    assert [r["roll_min"] for r in sorted(rows, key=lambda r: r["o"])] == [3, 1, 1]
    assert "roll_max" not in rows[0]
    with pytest.raises(ValueError, match="at least one"):
        group_rolling_extremes(
            ds,
            keys=["k"],
            order_cols=[("o", "ascending")],
            col="v",
            window=2,
            out_min=None,
            out_max=None,
        )
    with pytest.raises(ValueError, match="window"):
        group_rolling_extremes(
            ds,
            keys=["k"],
            order_cols=[("o", "ascending")],
            col="v",
            window=0,
        )
    tf = pa.table({"k": [1], "o": [0], "v": [1.5]})
    with pytest.raises(ValueError, match="integer"):
        group_rolling_extremes(
            ray.data.from_arrow(tf),
            keys=["k"],
            order_cols=[("o", "ascending")],
            col="v",
            window=2,
        )


# ---------------------------------------------------------------------------
# group_last_match


def test_last_match_fixture(ray_session):
    """Hand-walked: strictly-preceding semantics (a flagged row never
    attributes to itself), cross-run isolation, no-match NULLs."""
    import ray.data

    from deepseek_ocr_ray.stages.windows import group_last_match

    t = pa.table(
        {
            "k": pa.array([1, 1, 1, 1, 2, 2], pa.int64()),
            "o": pa.array([0, 1, 2, 3, 0, 1], pa.int64()),
            "f": pa.array([True, False, True, False, False, True], pa.bool_()),
            "p": pa.array([10, 11, 12, 13, 20, 21], pa.int64()),
        }
    )
    rows = group_last_match(
        ray.data.from_arrow(t).repartition(3),
        keys=["k"],
        order_cols=[("o", "ascending")],
        flag_col="f",
        payload_cols={"p": "last_p"},
    ).take_all()
    got = {(r["k"], r["o"]): r["last_p"] for r in rows}
    assert got == {
        (1, 0): None,   # nothing precedes
        (1, 1): 10,     # the o=0 flag
        (1, 2): 10,     # STRICTLY preceding — not itself
        (1, 3): 12,
        (2, 0): None,   # key 1's flags never leak into key 2
        (2, 1): None,   # the only flag in key 2 is this row itself
    }


def test_last_match_null_flags_and_empty_payload_validation(ray_session):
    import ray.data

    from deepseek_ocr_ray.stages.windows import group_last_match

    t = pa.table(
        {
            "k": pa.array([1, 1, 1], pa.int64()),
            "o": pa.array([0, 1, 2], pa.int64()),
            "f": pa.array([True, None, False], pa.bool_()),
            "p": pa.array(["a", "b", "c"], pa.string()),
        }
    )
    rows = group_last_match(
        ray.data.from_arrow(t),
        keys=["k"],
        order_cols=[("o", "ascending")],
        flag_col="f",
        payload_cols={"p": "lp"},
    ).take_all()
    got = {r["o"]: r["lp"] for r in rows}
    assert got == {0: None, 1: "a", 2: "a"}  # NULL flag is not a match
    with pytest.raises(ValueError, match="payload_cols"):
        group_last_match(
            ray.data.from_arrow(t),
            keys=["k"],
            order_cols=[("o", "ascending")],
            flag_col="f",
            payload_cols={},
        )


# ---------------------------------------------------------------------------
# group_holt


def test_group_holt_recurrence_fixture(ray_session):
    """Hand-walked level+trend with the exact pinned op order."""
    import ray.data

    from deepseek_ocr_ray.stages.windows import group_holt

    t = pa.table(
        {
            "k": pa.array([1, 1, 1], pa.int64()),
            "o": pa.array([0, 1, 2], pa.int64()),
            "v": pa.array([4.0, 8.0, 2.0], pa.float64()),
        }
    )
    rows = group_holt(
        ray.data.from_arrow(t),
        keys=["k"],
        order_cols=[("o", "ascending")],
        col="v",
        alpha=0.5,
        beta=0.25,
    ).take_all()
    got = {r["o"]: (r["level"], r["trend"]) for r in rows}
    l0, b0 = np.float64(4.0), np.float64(0.0)
    s = l0 + b0
    l1 = np.float64(0.5) * np.float64(8.0) + np.float64(0.5) * s
    b1 = np.float64(0.25) * (l1 - l0) + np.float64(0.75) * b0
    s2 = l1 + b1
    l2 = np.float64(0.5) * np.float64(2.0) + np.float64(0.5) * s2
    b2 = np.float64(0.25) * (l2 - l1) + np.float64(0.75) * b1
    assert got[0] == (4.0, 0.0)
    assert got[1] == (float(l1), float(b1))
    assert got[2] == (float(l2), float(b2))


def test_group_holt_validation(ray_session):
    import ray.data

    from deepseek_ocr_ray.stages.windows import group_holt

    t = pa.table(
        {
            "k": pa.array([1], pa.int64()),
            "o": pa.array([0], pa.int64()),
            "v": pa.array([1.0], pa.float64()),
        }
    )
    with pytest.raises(ValueError, match="beta"):
        group_holt(
            ray.data.from_arrow(t),
            keys=["k"],
            order_cols=[("o", "ascending")],
            col="v",
            alpha=0.5,
            beta=0.0,
        )
