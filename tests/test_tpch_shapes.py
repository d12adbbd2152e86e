"""Engineered hand-computed fixtures for the ten round-4 TPC-H shapes
(Q4 / Q6 / Q10 / Q12 / Q13 / Q14 / Q15 / Q17 / Q19 / Q22) — every
boundary the predicates own: band edges inclusive, date upper bounds
exclusive, the strict cross-multiplied Q17 threshold, Q15 max ties,
Q13's zero-order customers, Q19's per-branch quantity ranges, Q4's
EXISTS semantics, Q22's integer threshold + recency anti-join.  The sf0.001/0.01 DuckDB differentials
live in the auto oracle gate (test_queries_oracle.py)."""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq

from deepseek_ocr_ray.pipelines import analytics


def _write(tmp_path, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(str(tmp_path), f"{name}.parquet"))


def _lineitem(
    tmp_path,
    rows: list[tuple],
    cols: tuple[str, ...],
) -> None:
    """rows are tuples matching ``cols``; writes lineitem.parquet with the
    benchmark types (qty/price/discount double, shipdate timestamp[us])."""
    types = {
        "l_orderkey": pa.int64(),
        "l_returnflag": pa.string(),
        "l_linestatus": pa.string(),
        "l_partkey": pa.int64(),
        "l_suppkey": pa.int64(),
        "l_quantity": pa.float64(),
        "l_extendedprice": pa.float64(),
        "l_discount": pa.float64(),
        "l_shipdate": pa.timestamp("us"),
    }
    arrays = {
        c: pa.array([r[i] for r in rows], types[c])
        for i, c in enumerate(cols)
    }
    _write(tmp_path, "lineitem", pa.table(arrays))


def test_q6_band_and_date_boundaries(ray_session, tmp_path):
    # in: disc exactly 0.05 / 0.07 (inclusive), qty 23 (< 24),
    #     shipdate 1996-01-01 (inclusive lower)
    # out: 1995-12-31, 1997-01-01 (exclusive upper), disc 0.04, qty 24
    d = dt.datetime
    _lineitem(
        tmp_path,
        [
            (d(1996, 6, 1), 0.05, 23.0, 100.0),
            (d(1996, 1, 1), 0.07, 1.0, 200.0),
            (d(1995, 12, 31), 0.06, 5.0, 100.0),
            (d(1997, 1, 1), 0.06, 5.0, 100.0),
            (d(1996, 6, 1), 0.04, 5.0, 100.0),
            (d(1996, 6, 1), 0.06, 24.0, 100.0),
        ],
        ("l_shipdate", "l_discount", "l_quantity", "l_extendedprice"),
    )
    out = analytics.q6_revenue_delta(str(tmp_path))
    # 100·0.05·100 = 500 cents, 200·0.07·100 = 1400 cents
    assert out["revenue_cents"][0].as_py() == 1900
    assert out["n_items"][0].as_py() == 2


def test_q13_zero_bucket_and_excluded_priority(ray_session, tmp_path):
    _write(
        tmp_path,
        "customer",
        pa.table({"c_custkey": pa.array([1, 2, 3, 4, 5], pa.int64())}),
    )
    # cust1: 2 qualifying; cust2: only an excluded-priority order → 0;
    # cust3: 1; cust4: no orders at all → 0; cust5: 3.
    ck = [1, 1, 2, 3, 5, 5, 5]
    pr = ["5-LOW", "2-HIGH", "1-URGENT", "3-MEDIUM",
          "5-LOW", "5-LOW", "4-NOT SPECIFIED"]
    _write(
        tmp_path,
        "orders",
        pa.table(
            {
                "o_custkey": pa.array(ck, pa.int64()),
                "o_orderpriority": pa.array(pr, pa.string()),
            }
        ),
    )
    out = analytics.q13_custdist(str(tmp_path))
    got = list(
        zip(out["c_count"].to_pylist(), out["custdist"].to_pylist())
    )
    # custdist desc, c_count desc: two customers at 0 (cust2 + cust4)
    assert got == [(0, 2), (3, 1), (2, 1), (1, 1)]


def test_q14_promo_share_month_boundary(ray_session, tmp_path):
    _write(
        tmp_path,
        "part",
        pa.table(
            {
                "p_partkey": pa.array([1, 2], pa.int64()),
                "p_type": pa.array(["PROMO", "STANDARD"], pa.string()),
            }
        ),
    )
    d = dt.datetime
    _lineitem(
        tmp_path,
        [
            (1, d(1997, 9, 15), 100.0, 0.0),   # promo, 10000 cents
            (2, d(1997, 9, 30), 50.0, 0.5),    # plain, 2500 cents
            (1, d(1997, 10, 1), 999.0, 0.0),   # out: upper bound exclusive
            (2, d(1997, 8, 31), 999.0, 0.0),   # out: before the month
        ],
        ("l_partkey", "l_shipdate", "l_extendedprice", "l_discount"),
    )
    out = analytics.q14_promo_ratio(str(tmp_path))
    assert out["promo_cents"][0].as_py() == 10000
    assert out["total_cents"][0].as_py() == 12500
    assert out["promo_ppm"][0].as_py() == (1_000_000 * 10000) // 12500


def test_q15_ties_all_returned(ray_session, tmp_path):
    _write(
        tmp_path,
        "supplier",
        pa.table(
            {
                "s_suppkey": pa.array([1, 2, 3], pa.int64()),
                "s_name": pa.array(["S1", "S2", "S3"], pa.string()),
            }
        ),
    )
    d = dt.datetime
    _lineitem(
        tmp_path,
        [
            (1, d(1997, 1, 5), 60.0, 0.0),
            (1, d(1997, 3, 31), 40.0, 0.0),   # s1 total 10000
            (2, d(1997, 2, 1), 100.0, 0.0),   # s2 total 10000 (tie)
            (3, d(1997, 1, 1), 50.0, 0.0),    # s3 total 5000
            (1, d(1997, 4, 1), 999.0, 0.0),   # out: next quarter
        ],
        ("l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"),
    )
    out = analytics.q15_top_supplier(str(tmp_path)).to_pandas()
    assert list(out["s_suppkey"]) == [1, 2]
    assert list(out["s_name"]) == ["S1", "S2"]
    assert list(out["total_rev"]) == [10000, 10000]


def test_q15_empty_quarter(ray_session, tmp_path):
    _write(
        tmp_path,
        "supplier",
        pa.table(
            {
                "s_suppkey": pa.array([1], pa.int64()),
                "s_name": pa.array(["S1"], pa.string()),
            }
        ),
    )
    d = dt.datetime
    _lineitem(
        tmp_path,
        [(1, d(1998, 1, 5), 60.0, 0.0)],
        ("l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"),
    )
    out = analytics.q15_top_supplier(str(tmp_path))
    # Ray's to_pandas() drops columns for a zero-block dataset; the
    # dataset-level schema is the contract here.
    assert out.count() == 0
    assert out.schema().names == ["s_suppkey", "s_name", "total_rev"]


def test_q17_strict_threshold_cross_multiplied(ray_session, tmp_path):
    _write(
        tmp_path,
        "part",
        pa.table(
            {
                "p_partkey": pa.array([1, 2, 3], pa.int64()),
                "p_brand": pa.array(
                    ["Brand#23", "Brand#23", "Brand#99"], pa.string()
                ),
            }
        ),
    )
    d = dt.datetime
    # part 1: qty [1, 9, 10, 10, 10] → s=40, n=5; keep iff 25·q < 40 ⟺ q=1
    #   (q=1 gives 25 < 40; q=9 gives 225 ≥ 40 — strictness exercised by
    #    part 2 where equality occurs)
    # part 2: qty [2, 2, 2] → s=6, n=3; 15·2=30 ≥ 6 → none kept; and a
    #   degenerate check: qty such that 5·n·q == s must be EXCLUDED —
    #   with qty [1,1,1] s=3,n=3: 15·1=15 ≥ 3 → excluded anyway.
    # part 3: other brand, ignored entirely.
    rows = [
        (1, 1.0, 7.0), (1, 9.0, 100.0), (1, 10.0, 100.0),
        (1, 10.0, 100.0), (1, 10.0, 100.0),
        (2, 2.0, 100.0), (2, 2.0, 100.0), (2, 2.0, 100.0),
        (3, 1.0, 100.0),
    ]
    _lineitem(
        tmp_path,
        [(p, d(1997, 1, 1), q, pr) for p, q, pr in rows],
        ("l_partkey", "l_shipdate", "l_quantity", "l_extendedprice"),
    )
    out = analytics.q17_small_qty_revenue(str(tmp_path))
    assert out["sum_cents"][0].as_py() == 700
    assert out["avg_yearly_cents"][0].as_py() == 100


def test_q19_branch_masks_and_quantity_ranges(ray_session, tmp_path):
    _write(
        tmp_path,
        "part",
        pa.table(
            {
                "p_partkey": pa.array([1, 2, 3, 4], pa.int64()),
                "p_brand": pa.array(
                    ["Brand#12", "Brand#23", "Brand#34", "Brand#12"],
                    pa.string(),
                ),
                "p_size": pa.array([5, 10, 16, 6], pa.int32()),
            }
        ),
    )
    d = dt.datetime
    # p1 branch0 (qty 1..11): qty 11 in, 12 out
    # p2 branch1 (qty 10..20): qty 10 in (disc 0.1), 9 out
    # p3: size 16 > 15 → no branch, qty irrelevant
    # p4: Brand#12 size 6 > 5 → no branch
    _lineitem(
        tmp_path,
        [
            (1, d(1997, 1, 1), 11.0, 10.0, 0.0),
            (1, d(1997, 1, 1), 12.0, 999.0, 0.0),
            (2, d(1997, 1, 1), 10.0, 20.0, 0.1),
            (2, d(1997, 1, 1), 9.0, 999.0, 0.0),
            (3, d(1997, 1, 1), 25.0, 999.0, 0.0),
            (4, d(1997, 1, 1), 5.0, 999.0, 0.0),
        ],
        (
            "l_partkey", "l_shipdate", "l_quantity",
            "l_extendedprice", "l_discount",
        ),
    )
    out = analytics.q19_disjunctive_revenue(str(tmp_path))
    # 10·100 = 1000 cents; floor(20·0.9·100 + 0.5) = 1800 cents
    assert out["revenue_cents"][0].as_py() == 2800
    assert out["n_items"][0].as_py() == 2


def test_q4_exists_semi_and_quarter_bounds(ray_session, tmp_path):
    d = dt.datetime
    _write(
        tmp_path,
        "orders",
        pa.table(
            {
                "o_orderkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "o_orderdate": pa.array(
                    [d(1996, 7, 1), d(1996, 8, 15), d(1996, 9, 30),
                     d(1996, 10, 1), d(1996, 6, 30)],
                    pa.timestamp("us"),
                ),
                "o_orderpriority": pa.array(
                    ["5-LOW", "5-LOW", "1-URGENT", "1-URGENT", "2-HIGH"],
                    pa.string(),
                ),
            }
        ),
    )
    # o1 has a returned line (counted), o2 only 'N' lines, o3 returned
    # (counted), o4/o5 returned but outside the quarter
    _write(
        tmp_path,
        "lineitem",
        pa.table(
            {
                "l_orderkey": pa.array([1, 1, 2, 3, 4, 5], pa.int64()),
                "l_returnflag": pa.array(
                    ["R", "N", "N", "R", "R", "R"], pa.string()
                ),
            }
        ),
    )
    out = analytics.q4_order_priority(str(tmp_path))
    got = list(zip(out["o_orderpriority"].to_pylist(),
                   out["order_count"].to_pylist()))
    assert got == [("1-URGENT", 1), ("5-LOW", 1)]


def test_q10_returned_revenue_topk(ray_session, tmp_path):
    d = dt.datetime
    _write(
        tmp_path,
        "nation",
        pa.table(
            {
                "n_nationkey": pa.array([0, 1], pa.int32()),
                "n_name": pa.array(["NATION_0", "NATION_1"], pa.string()),
            }
        ),
    )
    _write(
        tmp_path,
        "customer",
        pa.table(
            {
                "c_custkey": pa.array([1, 2], pa.int64()),
                "c_name": pa.array(["C1", "C2"], pa.string()),
                "c_nationkey": pa.array([0, 1], pa.int32()),
            }
        ),
    )
    _write(
        tmp_path,
        "orders",
        pa.table(
            {
                "o_orderkey": pa.array([10, 20, 30], pa.int64()),
                "o_custkey": pa.array([1, 2, 1], pa.int64()),
                "o_orderdate": pa.array(
                    [d(1996, 11, 1), d(1996, 12, 31), d(1997, 1, 1)],
                    pa.timestamp("us"),
                ),
            }
        ),
    )
    _lineitem(
        tmp_path,
        [
            (10, "R", 100.0, 0.0),   # c1: 10000 cents
            (10, "N", 999.0, 0.0),   # not returned
            (20, "R", 50.0, 0.5),    # c2: 2500 cents
            (30, "R", 999.0, 0.0),   # order outside the quarter
        ],
        ("l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"),
    )
    out = analytics.q10_returned_revenue(str(tmp_path)).to_pandas()
    assert out.values.tolist() == [
        [1, "C1", "NATION_0", 10000],
        [2, "C2", "NATION_1", 2500],
    ]


def test_q12_conditional_counts(ray_session, tmp_path):
    d = dt.datetime
    _write(
        tmp_path,
        "orders",
        pa.table(
            {
                "o_orderkey": pa.array([1, 2, 3], pa.int64()),
                "o_orderpriority": pa.array(
                    ["1-URGENT", "3-MEDIUM", "2-HIGH"], pa.string()
                ),
            }
        ),
    )
    _write(
        tmp_path,
        "lineitem",
        pa.table(
            {
                "l_orderkey": pa.array([1, 2, 1, 3], pa.int64()),
                "l_linestatus": pa.array(["O", "F", "O", "F"], pa.string()),
                "l_shipdate": pa.array(
                    [d(1997, 5, 1), d(1997, 6, 1), d(1998, 1, 1),
                     d(1997, 1, 1)],
                    pa.timestamp("us"),
                ),
            }
        ),
    )
    out = analytics.q12_priority_by_status(str(tmp_path))
    got = list(zip(out["l_linestatus"].to_pylist(),
                   out["high_line_count"].to_pylist(),
                   out["low_line_count"].to_pylist()))
    # F: one high (o3 2-HIGH) + one low (o2 3-MEDIUM); O: one high in
    # 1997 (the 1998 line is out of range)
    assert got == [("F", 1, 1), ("O", 1, 0)]


def test_q22_threshold_and_recency_anti_join(ray_session, tmp_path):
    d = dt.datetime
    # positive balances: 100.00, 50.00, 200.00, 10.00 → sum 36000 cents,
    # n=4 → keep iff cents·4 > 36000 ⟺ cents > 9000: c1 (10000) and
    # c3 (20000).  c2 is above threshold? 5000·4 = 20000 < 36000 → no —
    # and it has a post-cutoff order anyway; c4 negative; c5 below.
    _write(
        tmp_path,
        "customer",
        pa.table(
            {
                "c_custkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "c_acctbal": pa.array(
                    [100.0, 50.0, 200.0, -5.0, 10.0], pa.float64()
                ),
                "c_mktsegment": pa.array(
                    ["A", "A", "B", "B", "A"], pa.string()
                ),
            }
        ),
    )
    _write(
        tmp_path,
        "orders",
        pa.table(
            {
                "o_custkey": pa.array([1, 2], pa.int64()),
                "o_orderdate": pa.array(
                    [d(1999, 5, 1), d(2000, 3, 1)], pa.timestamp("us")
                ),
            }
        ),
    )
    out = analytics.q22_idle_customers(str(tmp_path))
    got = list(zip(out["c_mktsegment"].to_pylist(),
                   out["numcust"].to_pylist(),
                   out["totacctbal_cents"].to_pylist()))
    assert got == [("A", 1, 10000), ("B", 1, 20000)]


def test_q8_market_share_boundaries(ray_session, tmp_path):
    # region membership (c2 in EUROPE drops), part-type filter (PROMO
    # line drops), date window [1995-01-01, 1997-01-01) with both edges
    # exercised, target-nation tagging, floor-division ppm, and a year
    # whose target share is zero but still emitted.
    d = dt.datetime
    _write(
        tmp_path,
        "region",
        pa.table(
            {
                "r_regionkey": pa.array([1, 3], pa.int32()),
                "r_name": pa.array(["AMERICA", "EUROPE"], pa.string()),
            }
        ),
    )
    _write(
        tmp_path,
        "nation",
        pa.table(
            {
                "n_nationkey": pa.array([0, 1, 2], pa.int32()),
                "n_name": pa.array(
                    ["NATION_0", "NATION_1", "NATION_2"], pa.string()
                ),
                "n_regionkey": pa.array([1, 3, 1], pa.int32()),
            }
        ),
    )
    _write(
        tmp_path,
        "customer",
        pa.table(
            {
                "c_custkey": pa.array([1, 2], pa.int64()),
                "c_nationkey": pa.array([0, 1], pa.int32()),
            }
        ),
    )
    _write(
        tmp_path,
        "supplier",
        pa.table(
            {
                "s_suppkey": pa.array([1, 2], pa.int64()),
                "s_nationkey": pa.array([2, 0], pa.int32()),
            }
        ),
    )
    _write(
        tmp_path,
        "part",
        pa.table(
            {
                "p_partkey": pa.array([1, 2], pa.int64()),
                "p_type": pa.array(["ECONOMY", "PROMO"], pa.string()),
            }
        ),
    )
    _write(
        tmp_path,
        "orders",
        pa.table(
            {
                "o_orderkey": pa.array([10, 20, 30, 40, 50], pa.int64()),
                "o_custkey": pa.array([1, 1, 1, 2, 1], pa.int64()),
                "o_orderdate": pa.array(
                    [
                        d(1995, 1, 1),    # inclusive lower edge
                        d(1996, 12, 31),  # last day in window
                        d(1997, 1, 1),    # exclusive upper edge — out
                        d(1995, 6, 1),    # cust 2: EUROPE — out
                        d(1994, 12, 31),  # below lower edge — out
                    ],
                    pa.timestamp("us"),
                ),
            }
        ),
    )
    _lineitem(
        tmp_path,
        [
            (10, 1, 1, 100.0, 0.0),  # target, 1995: 10000 cents
            (10, 1, 2, 50.0, 0.5),   # non-target, 1995: 2500 cents
            (10, 2, 1, 999.0, 0.0),  # PROMO part — dropped
            (20, 1, 2, 80.0, 0.25),  # non-target, 1996: 6000 cents
            (30, 1, 1, 777.0, 0.0),  # order at exclusive upper — dropped
            (40, 1, 1, 555.0, 0.0),  # out-of-region customer — dropped
            (50, 1, 1, 444.0, 0.0),  # order below window — dropped
        ],
        (
            "l_orderkey",
            "l_partkey",
            "l_suppkey",
            "l_extendedprice",
            "l_discount",
        ),
    )
    out = analytics.q8_market_share(
        str(tmp_path),
        region="AMERICA",
        nation="NATION_2",
        p_type="ECONOMY",
        year_lo=1995,
        year_hi=1996,
    )
    got = list(
        zip(
            out["o_year"].to_pylist(),
            out["nation_cents"].to_pylist(),
            out["total_cents"].to_pylist(),
            out["share_ppm"].to_pylist(),
        )
    )
    assert got == [(1995, 10000, 12500, 800000), (1996, 0, 6000, 0)]


def test_q9_profit_name_filter_and_negative_profit(ray_session, tmp_path):
    # p1 matches the name word; p2 must not.  Line 3's cost exceeds its
    # revenue → a negative per-(nation, year) profit must survive.
    d = dt.datetime
    _write(
        tmp_path,
        "nation",
        pa.table(
            {
                "n_nationkey": pa.array([0, 1], pa.int32()),
                "n_name": pa.array(["N_A", "N_B"], pa.string()),
            }
        ),
    )
    _write(
        tmp_path,
        "supplier",
        pa.table(
            {
                "s_suppkey": pa.array([1, 2], pa.int64()),
                "s_nationkey": pa.array([0, 1], pa.int32()),
            }
        ),
    )
    _write(
        tmp_path,
        "part",
        pa.table(
            {
                "p_partkey": pa.array([1, 2], pa.int64()),
                "p_name": pa.array(["green widget", "red bolt"], pa.string()),
                "p_retailprice": pa.array([10.0, 5.0], pa.float64()),
            }
        ),
    )
    _write(
        tmp_path,
        "orders",
        pa.table(
            {
                "o_orderkey": pa.array([1, 2], pa.int64()),
                "o_orderdate": pa.array(
                    [d(1995, 3, 1), d(1996, 7, 1)], pa.timestamp("us")
                ),
            }
        ),
    )
    _lineitem(
        tmp_path,
        [
            # rev 9000c − cost 1000c×2 → +7000 (N_A, 1995)
            (1, 1, 1, 2.0, 100.0, 0.1),
            # name-filtered out
            (1, 2, 1, 1.0, 999.0, 0.0),
            # rev 1000c − 1000c×3 → −2000 (N_B, 1996)
            (2, 1, 2, 3.0, 10.0, 0.0),
            # rev 2500c − 1000c → +1500 (N_A, 1996)
            (2, 1, 1, 1.0, 50.0, 0.5),
        ],
        ("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
         "l_extendedprice", "l_discount"),
    )
    out = analytics.q9_profit_by_nation(str(tmp_path))
    got = list(
        zip(
            out["nation"].to_pylist(),
            out["o_year"].to_pylist(),
            out["profit_cents"].to_pylist(),
        )
    )
    assert got == [("N_A", 1995, 7000), ("N_A", 1996, 1500),
                   ("N_B", 1996, -2000)]


def test_q21_exists_notexists_and_row_counting(ray_session, tmp_path):
    # o1: lone failing supplier 1 among two → counts 1.
    # o2: BOTH suppliers fail → NOT-EXISTS kills it.
    # o3: single-supplier order → EXISTS kills it.
    # o4: status 'O' → excluded.
    # o5: supplier 3 fails TWICE (two l1 rows) beside a clean supplier
    #     → counts 2 (Q21's count(*) is over qualifying lineitem ROWS).
    # o6: supplier 1 fails twice beside a clean supplier → +2 → S1 = 3.
    _write(
        tmp_path,
        "supplier",
        pa.table(
            {
                "s_suppkey": pa.array([1, 2, 3, 4], pa.int64()),
                "s_name": pa.array(["S1", "S2", "S3", "S4"], pa.string()),
            }
        ),
    )
    _write(
        tmp_path,
        "orders",
        pa.table(
            {
                "o_orderkey": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
                "o_orderstatus": pa.array(
                    ["F", "F", "F", "O", "F", "F"], pa.string()
                ),
            }
        ),
    )
    _lineitem(
        tmp_path,
        [
            (1, 1, "R"), (1, 2, "N"),
            (2, 1, "R"), (2, 2, "R"),
            (3, 1, "R"),
            (4, 1, "R"), (4, 2, "N"),
            (5, 3, "R"), (5, 3, "R"), (5, 4, "A"),
            (6, 1, "R"), (6, 1, "R"), (6, 4, "N"),
        ],
        ("l_orderkey", "l_suppkey", "l_returnflag"),
    )
    out = analytics.q21_waiting_suppliers(str(tmp_path)).to_pandas()
    got = list(zip(out["s_name"], out["numwait"]))
    assert got == [("S1", 3), ("S3", 2)]


def test_q9_no_matching_parts_returns_typed_empty(ray_session, tmp_path):
    # A name_word matching NOTHING empties the computed lineitem⋈part
    # side before the orders join — the declared left_types must carry
    # the schema through to a typed 3-column empty result.
    d = dt.datetime
    _write(
        tmp_path,
        "nation",
        pa.table(
            {
                "n_nationkey": pa.array([0], pa.int32()),
                "n_name": pa.array(["N_A"], pa.string()),
            }
        ),
    )
    _write(
        tmp_path,
        "supplier",
        pa.table(
            {
                "s_suppkey": pa.array([1], pa.int64()),
                "s_nationkey": pa.array([0], pa.int32()),
            }
        ),
    )
    _write(
        tmp_path,
        "part",
        pa.table(
            {
                "p_partkey": pa.array([1], pa.int64()),
                "p_name": pa.array(["red bolt"], pa.string()),
                "p_retailprice": pa.array([5.0], pa.float64()),
            }
        ),
    )
    _write(
        tmp_path,
        "orders",
        pa.table(
            {
                "o_orderkey": pa.array([1], pa.int64()),
                "o_orderdate": pa.array([d(1995, 3, 1)], pa.timestamp("us")),
            }
        ),
    )
    _lineitem(
        tmp_path,
        [(1, 1, 1, 2.0, 100.0, 0.1)],
        ("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
         "l_extendedprice", "l_discount"),
    )
    out = analytics.q9_profit_by_nation(str(tmp_path), name_word="widget")
    assert out.num_rows == 0
    assert out.column_names == ["nation", "o_year", "profit_cents"]


# ---------------------------------------------------------------------------
# Q2 / Q11 / Q16 / Q20 — the partsupp-family shapes (adapted: part↔supplier
# facts derive from lineitem)
# ---------------------------------------------------------------------------


def _write_region_nation(tmp_path) -> None:
    _write(
        tmp_path,
        "region",
        pa.table(
            {
                "r_regionkey": pa.array(range(5), pa.int32()),
                "r_name": pa.array(
                    ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
                    pa.string(),
                ),
            }
        ),
    )
    _write(
        tmp_path,
        "nation",
        pa.table(
            {
                "n_nationkey": pa.array(range(5), pa.int32()),
                "n_name": pa.array(
                    [f"NATION_{k}" for k in range(5)], pa.string()
                ),
                "n_regionkey": pa.array([k % 5 for k in range(5)], pa.int32()),
            }
        ),
    )


def _write_supplier(tmp_path, rows: list[tuple]) -> None:
    """rows: (s_suppkey, s_name, s_nationkey, s_acctbal)."""
    _write(
        tmp_path,
        "supplier",
        pa.table(
            {
                "s_suppkey": pa.array([r[0] for r in rows], pa.int64()),
                "s_name": pa.array([r[1] for r in rows], pa.string()),
                "s_nationkey": pa.array([r[2] for r in rows], pa.int32()),
                "s_acctbal": pa.array([r[3] for r in rows], pa.float64()),
            }
        ),
    )


def test_q2_regional_min_ties_and_out_of_region(ray_session, tmp_path):
    # EUROPE = regionkey 3 = NATION_3 (the k%5 layout).  s1/s2 in-region,
    # s3 out-of-region with a CHEAPER offer that must be ignored.
    _write_region_nation(tmp_path)
    _write_supplier(
        tmp_path,
        [(1, "SA", 3, 100.0), (2, "SB", 3, 200.0), (3, "SC", 0, 999.0)],
    )
    _write(
        tmp_path,
        "part",
        pa.table(
            {
                "p_partkey": pa.array([1, 2, 3], pa.int64()),
                "p_name": pa.array(
                    ["cold widget", "large widget", "blue rod"], pa.string()
                ),
                "p_size": pa.array([3, 10, 2], pa.int32()),
            }
        ),
    )
    _lineitem(
        tmp_path,
        [
            (1, 1, 10.0),   # pair (p1,s1) cost 1000
            (1, 1, 12.0),   # min stays 1000
            (1, 2, 10.0),   # pair (p1,s2) cost 1000 — exact tie, both kept
            (1, 3, 1.0),    # out-of-region supplier: ignored entirely
            (2, 1, 5.0),    # part filtered out (size 10)
            (3, 2, 5.0),    # part filtered out (suffix "rod")
        ],
        ("l_partkey", "l_suppkey", "l_extendedprice"),
    )
    out = analytics.q2_min_cost_supplier(str(tmp_path)).to_pandas()
    got = list(
        zip(
            out["s_acctbal_cents"],
            out["s_name"],
            out["n_name"],
            out["p_partkey"],
            out["p_name"],
            out["cost_cents"],
        )
    )
    # acctbal desc: SB (20000) before SA (10000); both at the tied min
    assert got == [
        (20000, "SB", "NATION_3", 1, "cold widget", 1000),
        (10000, "SA", "NATION_3", 1, "cold widget", 1000),
    ]


def test_q11_threshold_strict_and_boundary(ray_session, tmp_path):
    # multiplier=2: keep parts with value·n > 2·total
    _write_region_nation(tmp_path)
    _write_supplier(
        tmp_path, [(1, "SA", 3, 100.0), (2, "SB", 0, 100.0)]
    )
    # values: p1=10000, p2=p3=p4=2000 from s1 (NATION_3); s2's rows ignored
    _lineitem(
        tmp_path,
        [
            (1, 1, 100.0),
            (2, 1, 20.0),
            (3, 1, 20.0),
            (4, 1, 20.0),
            (1, 2, 999.0),  # other-nation supplier: excluded
        ],
        ("l_partkey", "l_suppkey", "l_extendedprice"),
    )
    out = analytics.q11_important_parts(str(tmp_path)).to_pandas()
    # tot=16000, n=4 → keep v·4 > 32000 → only p1 (40000)
    assert list(zip(out["p_partkey"], out["value_cents"])) == [(1, 10000)]

    # exact boundary: every part at exactly 2×mean → v·n == 2·tot for the
    # top part → strict predicate excludes EVERYTHING
    import shutil

    d2 = os.path.join(str(tmp_path), "boundary")
    os.makedirs(d2)
    for f in ("region", "nation", "supplier"):
        shutil.copy(
            os.path.join(str(tmp_path), f + ".parquet"),
            os.path.join(d2, f + ".parquet"),
        )
    pq.write_table(
        pa.table(
            {
                "l_partkey": pa.array([1, 2, 3, 4], pa.int64()),
                "l_suppkey": pa.array([1, 1, 1, 1], pa.int64()),
                "l_extendedprice": pa.array(
                    [50.0, 20.0, 20.0, 10.0], pa.float64()
                ),
            }
        ),
        os.path.join(d2, "lineitem.parquet"),
    )
    # tot=10000, n=4: p1 5000·4 == 2·10000 exactly → excluded (strict >)
    out2 = analytics.q11_important_parts(d2).to_pandas()
    assert len(out2) == 0
    assert list(out2.columns) == ["p_partkey", "value_cents"]


def test_q16_exclusions_and_distinct_count(ray_session, tmp_path):
    _write_supplier(
        tmp_path,
        [(1, "SA", 0, 5000.0), (2, "SB", 0, 500.0), (3, "SC", 0, 2000.0)],
    )
    _write(
        tmp_path,
        "part",
        pa.table(
            {
                "p_partkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "p_brand": pa.array(
                    ["Brand#1", "Brand#23", "Brand#2", "Brand#2", "Brand#3"],
                    pa.string(),
                ),
                "p_type": pa.array(
                    ["STANDARD", "STANDARD", "PROMO", "STANDARD", "STANDARD"],
                    pa.string(),
                ),
                "p_size": pa.array([5, 5, 5, 7, 5], pa.int32()),
            }
        ),
    )
    _lineitem(
        tmp_path,
        [
            (1, 1), (1, 1),  # duplicate pair → counts once
            (1, 2),          # at-risk supplier (bal 500 < 1000) → excluded
            (1, 3),
            (5, 1),
            (2, 1),          # excluded brand
            (3, 1),          # excluded type
            (4, 1),          # excluded size
        ],
        ("l_partkey", "l_suppkey"),
    )
    out = analytics.q16_part_supplier_counts(str(tmp_path)).to_pandas()
    got = list(
        zip(out["p_brand"], out["p_type"], out["p_size"], out["supplier_cnt"])
    )
    assert got == [
        ("Brand#1", "STANDARD", 5, 2),
        ("Brand#3", "STANDARD", 5, 1),
    ]


def test_q20_dominance_strict_year_and_prefix(ray_session, tmp_path):
    d = dt.datetime
    _write_supplier(
        tmp_path,
        [(1, "SA", 0, 0.0), (2, "SB", 0, 0.0), (3, "SC", 0, 0.0)],
    )
    _write(
        tmp_path,
        "part",
        pa.table(
            {
                "p_partkey": pa.array([1, 2, 3], pa.int64()),
                "p_name": pa.array(
                    ["blue rod", "blue bolt", "cold widget"], pa.string()
                ),
            }
        ),
    )
    _lineitem(
        tmp_path,
        [
            (1, 1, 6.0, d(1997, 5, 1)),    # p1 tot 10: s1 has 6 → 12>10 ✓
            (1, 2, 4.0, d(1997, 6, 1)),    # s2 has 4 → 8<10 ✗
            (2, 1, 5.0, d(1997, 2, 1)),    # p2 tot 10: exactly half each
            (2, 2, 5.0, d(1997, 3, 1)),    # → 10==10, strict > excludes both
            (1, 2, 100.0, d(1996, 7, 1)),  # wrong year: ignored
            (3, 3, 50.0, d(1997, 8, 1)),   # non-"blue" part: ignored
        ],
        ("l_partkey", "l_suppkey", "l_quantity", "l_shipdate"),
    )
    out = analytics.q20_dominant_suppliers(str(tmp_path)).to_pandas()
    assert list(zip(out["s_suppkey"], out["s_name"])) == [(1, "SA")]


def test_micro_dim_cap_is_loud(tmp_path, monkeypatch):
    """Past the micro-dim bound the driver-side read REFUSES instead of
    silently building an unbounded driver table."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from deepseek_ocr_ray.pipelines import analytics

    d = str(tmp_path)
    n = 50
    pq.write_table(
        pa.table({
            "n_nationkey": pa.array(list(range(n)), pa.int64()),
            "n_name": pa.array([f"N{i}" for i in range(n)], pa.string()),
            "n_regionkey": pa.array([0] * n, pa.int64()),
        }),
        os.path.join(d, "nation.parquet"),
    )
    pq.write_table(
        pa.table({
            "r_regionkey": pa.array([0], pa.int64()),
            "r_name": pa.array(["R"], pa.string()),
        }),
        os.path.join(d, "region.parquet"),
    )
    monkeypatch.setattr(analytics, "MICRO_DIM_MAX_ROWS", 25)
    with pytest.raises(ValueError, match="micro-dim bound"):
        analytics._nation_region_dims(d)
