"""cluster.py helpers: join partition sizing and join-input anchoring."""

from __future__ import annotations

import pyarrow as pa

from deepseek_ocr_ray import cluster


def test_join_partitions_scales_with_cluster(ray_session):
    # 4-CPU test fixture → cpus//2 = 2
    assert cluster.join_partitions() == 2
    assert cluster.join_partitions(cap=1) == 2  # floor of 2 wins over cap
    # cap binds on big clusters (simulate via the formula bounds)
    assert 2 <= cluster.join_partitions(cap=8) <= 8


def test_sentinels_are_distinct_and_out_of_domain():
    assert cluster.JOIN_SENTINEL_L != cluster.JOIN_SENTINEL_R
    assert cluster.JOIN_SENTINEL_L < 0 and cluster.JOIN_SENTINEL_R < 0


def test_anchor_join_input_prepends_schema_block(ray_session):
    import ray.data

    empty = pa.table({"k": pa.array([], pa.int64())})
    anchored = cluster.anchor_join_input(
        ray.data.from_arrow(empty),
        pa.table({"k": pa.array([cluster.JOIN_SENTINEL_L], pa.int64())}),
    )
    rows = anchored.take_all()
    assert rows == [{"k": cluster.JOIN_SENTINEL_L}]


def test_anchored_join_survives_fully_empty_computed_side(ray_session):
    """The Ray 2.49 failure mode this exists for: a join whose computed
    side is entirely empty must not crash the aggregators."""
    import ray.data

    left = cluster.anchor_join_input(
        ray.data.from_arrow(pa.table({"k": pa.array([], pa.int64())})),
        pa.table({"k": pa.array([cluster.JOIN_SENTINEL_L], pa.int64())}),
    )
    right = cluster.anchor_join_input(
        ray.data.from_arrow(
            pa.table(
                {"k2": pa.array([], pa.int64()), "v": pa.array([], pa.int64())}
            )
        ),
        pa.table(
            {
                "k2": pa.array([cluster.JOIN_SENTINEL_R], pa.int64()),
                "v": pa.array([0], pa.int64()),
            }
        ),
    )
    out = left.join(
        right,
        join_type="inner",
        num_partitions=2,
        partition_size_hint=cluster.JOIN_PARTITION_SIZE_HINT,
        on=("k",),
        right_on=("k2",),
    )
    assert out.count() == 0  # L/R sentinels never match; no crash


# ---------------------------------------------------------------------------
# equi_join planner
# ---------------------------------------------------------------------------

import numpy as np
import pytest


def _planner_inputs():
    import ray.data

    rng = np.random.RandomState(9)
    left = pa.table(
        {
            "k": pa.array(rng.randint(0, 25, 90).tolist(), pa.int64()),
            "lv": pa.array(range(90), pa.int64()),
        }
    )
    right = pa.table(
        {
            "rk": pa.array(rng.randint(0, 35, 30).tolist(), pa.int64()),
            "rv": pa.array(range(500, 530), pa.int64()),
        }
    )
    return (
        left,
        right,
        ray.data.from_arrow(left).repartition(4),
        ray.data.from_arrow(right).repartition(3),
    )


def _naive(lrows, rrows, how):
    out = []
    for l in lrows:
        matches = [r for r in rrows if r["rk"] == l["k"]]
        if how == "inner":
            out += [(l["lv"], r["rv"]) for r in matches]
        elif how == "left_outer":
            out += (
                [(l["lv"], r["rv"]) for r in matches]
                if matches
                else [(l["lv"], None)]
            )
        elif how == "left_semi" and matches:
            out.append((l["lv"],))
        elif how == "left_anti" and not matches:
            out.append((l["lv"],))
    return sorted(out)


@pytest.mark.parametrize("how", ["inner", "left_outer", "left_semi", "left_anti"])
@pytest.mark.parametrize("strategy", ["hash", "bucket", "auto", "broadcast"])
def test_equi_join_all_strategies_vs_naive(ray_session, how, strategy):
    ltab, rtab, l, r = _planner_inputs()
    got = cluster.equi_join(
        l, r, on="k", right_on="rk", join_type=how,
        left_cols=["k", "lv"],
        right_cols=["rv"] if how in ("inner", "left_outer") else None,
        strategy=strategy, n_buckets=8, num_partitions=2,
    ).to_pandas()
    want = _naive(ltab.to_pylist(), rtab.to_pylist(), how)
    if how in ("left_semi", "left_anti"):
        assert list(got.columns) == ["k", "lv"]
        assert sorted((v,) for v in got.lv.tolist()) == want
    else:
        assert list(got.columns) == ["k", "lv", "rv"]
        gset = sorted(
            (int(t.lv), None if t.rv != t.rv else int(t.rv))
            for t in got.itertuples()
        )
        assert gset == want


def test_equi_join_auto_falls_back_on_forced_schema_race(ray_session, caplog):
    """Deterministic fault injection: with anchors dropped and one side's
    blocks ALL empty, Ray's hash join loses its one-shot schema broadcast
    every time (ArrowInvalid at finalize).  The auto planner must catch it
    and complete through bucket_join with the correct answer."""
    import logging

    import ray.data

    ltab, _rtab, l, _r = _planner_inputs()
    empty_right = ray.data.from_arrow(
        pa.table({"rk": pa.array([], pa.int64()), "rv": pa.array([], pa.int64())})
    )

    # the hash plan on these inputs genuinely dies without the fallback
    with pytest.raises(Exception, match="No match|no match"):
        cluster.equi_join(
            l, empty_right, on="k", right_on="rk", join_type="left_anti",
            strategy="hash", num_partitions=2, _drop_anchor=True,
        ).materialize()

    with caplog.at_level(logging.WARNING, logger="deepseek_ocr_ray.cluster"):
        got = cluster.equi_join(
            l, empty_right, on="k", right_on="rk", join_type="left_anti",
            strategy="auto", num_partitions=2, _drop_anchor=True,
        ).to_pandas()
    # anti vs an empty right side keeps every left row
    assert sorted(got.lv.tolist()) == list(range(90))
    assert any("re-planning through bucket_join" in r.message for r in caplog.records)


def test_equi_join_string_keys(ray_session):
    import ray.data

    l = ray.data.from_arrow(
        pa.table(
            {
                "name": pa.array(["a", "b", "c", "a"], pa.string()),
                "lv": pa.array([1, 2, 3, 4], pa.int64()),
            }
        )
    )
    r = ray.data.from_arrow(
        pa.table(
            {
                "name": pa.array(["a", "z"], pa.string()),
                "rv": pa.array([10, 20], pa.int64()),
            }
        )
    )
    for strategy in ("hash", "bucket"):
        got = cluster.equi_join(
            l, r, on="name", join_type="left_outer",
            strategy=strategy, num_partitions=2, n_buckets=4,
        ).to_pandas()
        got = got.sort_values("lv")
        assert got.lv.tolist() == [1, 2, 3, 4]
        assert [None if v != v else int(v) for v in got.rv] == [10, None, None, 10]


def test_join_partitions_for_bytes_grows_with_volume(ray_session):
    small = cluster.join_partitions_for_bytes(1 << 20)
    big = cluster.join_partitions_for_bytes(100 << 30)
    assert small == 2
    assert big >= small
    # clamped to the CPU cap (4-CPU fixture → 2), never exceeds it
    assert big <= cluster.join_partitions()
    # no estimate → CPU sizing
    assert cluster.join_partitions_for_bytes(None) == cluster.join_partitions()


# --------------------------------------------------------------------------
# equi_join_multi: composite keys through the single-key planner
# --------------------------------------------------------------------------


def _multi_inputs():
    l = pa.table(
        {
            "uid": pa.array([1, 1, 2, 2, 3], pa.int64()),
            "day": pa.array(["a", "b", "a", "b", "a"], pa.string()),
            "lv": pa.array([10, 11, 12, 13, 14], pa.int64()),
        }
    )
    r = pa.table(
        {
            "r_uid": pa.array([1, 2, 2, 4], pa.int64()),
            "r_day": pa.array(["a", "b", "b", "a"], pa.string()),
            "rv": pa.array([100, 200, 201, 400], pa.int64()),
        }
    )
    return l, r


def _naive_multi(l: pa.Table, r: pa.Table):
    out = []
    for i in range(l.num_rows):
        for j in range(r.num_rows):
            if (
                l["uid"][i].as_py() == r["r_uid"][j].as_py()
                and l["day"][i].as_py() == r["r_day"][j].as_py()
            ):
                out.append(
                    (
                        l["uid"][i].as_py(),
                        l["day"][i].as_py(),
                        l["lv"][i].as_py(),
                        r["rv"][j].as_py(),
                    )
                )
    return sorted(out)


def test_equi_join_multi_vs_naive(ray_session):
    import ray.data

    ltab, rtab = _multi_inputs()
    got = cluster.equi_join_multi(
        ray.data.from_arrow(ltab),
        ray.data.from_arrow(rtab),
        on=["uid", "day"],
        right_on=["r_uid", "r_day"],
        left_cols=["lv"],
        right_cols=["rv"],
        num_partitions=2,
    ).to_pandas()
    assert list(got.columns) == ["uid", "day", "lv", "rv"]
    rows = sorted(map(tuple, got.itertuples(index=False)))
    assert rows == _naive_multi(ltab, rtab)


def test_equi_join_multi_drops_hash_collisions(ray_session, monkeypatch):
    """With the mixer forced constant EVERY row shares one combined key, so
    the underlying single-key join degenerates to a full cross product — the
    exact-equality verify must cut it back to the true composite-key result.
    This is the 10^12-row collision story exercised at test scale."""
    import ray.data

    monkeypatch.setattr(
        "deepseek_ocr_ray.hashing.mix64", lambda h: np.zeros_like(h)
    )
    ltab, rtab = _multi_inputs()
    got = cluster.equi_join_multi(
        ray.data.from_arrow(ltab),
        ray.data.from_arrow(rtab),
        on=["uid", "day"],
        right_on=["r_uid", "r_day"],
        left_cols=["lv"],
        right_cols=["rv"],
        num_partitions=2,
    ).to_pandas()
    rows = sorted(map(tuple, got.itertuples(index=False)))
    assert rows == _naive_multi(ltab, rtab)


def test_equi_join_multi_validation(ray_session):
    import ray.data

    ltab, rtab = _multi_inputs()
    l = ray.data.from_arrow(ltab)
    r = ray.data.from_arrow(rtab)
    with pytest.raises(NotImplementedError, match="inner joins only"):
        cluster.equi_join_multi(
            l, r, on=["uid", "day"], right_on=["r_uid", "r_day"],
            join_type="left_outer",
        )
    with pytest.raises(ValueError, match="equal-length"):
        cluster.equi_join_multi(l, r, on=["uid"], right_on=["r_uid"])
    with pytest.raises(ValueError, match="equal-length"):
        cluster.equi_join_multi(l, r, on=["uid", "day"], right_on=["r_uid"])


def test_equi_join_broadcast_guards(ray_session):
    _ltab, _rtab, l, r = _planner_inputs()
    with pytest.raises(ValueError, match="right key is coalesced"):
        cluster.equi_join(
            l, r, on="k", right_on="rk", join_type="inner",
            right_cols=["rk", "rv"], strategy="broadcast",
        )
    with pytest.raises(ValueError, match="MiB cap"):
        cluster.equi_join(
            l, r, on="k", right_on="rk", join_type="inner",
            strategy="broadcast", broadcast_max_bytes=8,
        )


def test_equi_join_broadcast_empty_right(ray_session):
    import ray.data

    _ltab, _rtab, l, _r = _planner_inputs()
    empty_right = ray.data.from_arrow(
        pa.table({"rk": pa.array([], pa.int64()), "rv": pa.array([], pa.int64())})
    )
    got = cluster.equi_join(
        l, empty_right, on="k", right_on="rk", join_type="left_anti",
        strategy="broadcast",
    ).to_pandas()
    assert sorted(got.lv.tolist()) == list(range(90))


def test_detect_hot_keys_finds_the_zipf_head(ray_session):
    import ray.data

    from deepseek_ocr_ray.cluster import detect_hot_keys

    rng = np.random.RandomState(4)
    keys = np.where(rng.rand(5000) < 0.4, 7, rng.randint(100, 2000, 5000))
    tab = pa.table({"k": pa.array(keys.astype(np.int64), pa.int64()),
                    "v": pa.array(np.arange(5000), pa.int64())})
    hot, total = detect_hot_keys(ray.data.from_arrow(tab).repartition(6), "k")
    assert total == 5000
    assert 7 in hot
    assert len(hot) < 10


def test_salted_inner_join_equals_plain_join_under_skew(ray_session):
    import ray.data

    from deepseek_ocr_ray.cluster import equi_join, salted_inner_join

    rng = np.random.RandomState(12)
    n = 4000
    # one key is ~half of all left rows; right has duplicate keys too
    lk = np.where(rng.rand(n) < 0.5, 3, rng.randint(0, 50, n)).astype(np.int64)
    left = pa.table({"k": pa.array(lk, pa.int64()),
                     "lv": pa.array(rng.randint(0, 9, n).tolist(), pa.int64())})
    rk = rng.randint(0, 50, 200).astype(np.int64)
    right = pa.table({"k": pa.array(rk, pa.int64()),
                      "rv": pa.array(rng.randint(0, 999, 200).tolist(), pa.int64())})

    def rows(res):
        return sorted((r["k"], r["lv"], r["rv"]) for r in res.take_all())

    plain = rows(equi_join(
        ray.data.from_arrow(left).repartition(5),
        ray.data.from_arrow(right).repartition(3),
        on="k", join_type="inner", left_cols=["k", "lv"], right_cols=["rv"],
    ))
    for hot in (None, [3], []):
        salted = rows(salted_inner_join(
            ray.data.from_arrow(left).repartition(5),
            ray.data.from_arrow(right).repartition(3),
            on="k", left_cols=["k", "lv"], right_cols=["rv"],
            salts=4, hot_keys=hot,
        ))
        assert salted == plain, hot


def test_salted_join_spreads_hot_key_across_salts(ray_session):
    import ray.data

    from deepseek_ocr_ray.cluster import salted_inner_join

    n = 2000
    left = pa.table({"k": pa.array(np.full(n, 1, np.int64), pa.int64()),
                     "lv": pa.array(np.arange(n), pa.int64())})
    right = pa.table({"k": pa.array([1], pa.int64()),
                      "rv": pa.array([5], pa.int64())})
    out = salted_inner_join(
        ray.data.from_arrow(left).repartition(4),
        ray.data.from_arrow(right),
        on="k", left_cols=["k", "lv"], right_cols=["rv"],
        salts=4, hot_keys=[1],
    )
    assert out.count() == n  # replication did not duplicate matches


def test_assembly_buckets_grow_with_volume(ray_session):
    """Assembly exchange sizing: the group count must GROW with input bytes
    (a fixed count is a per-task memory cliff at 100x scale) and never drop
    below the cluster floor for small inputs."""
    floor = cluster.assembly_buckets_for_bytes(None)
    assert floor >= 64  # small inputs still spread across the cluster
    small = cluster.assembly_buckets_for_bytes(1 << 20)
    big = cluster.assembly_buckets_for_bytes(1 << 40)  # 1 TiB
    huge = cluster.assembly_buckets_for_bytes(100 << 40)  # 100 TiB
    assert small == floor
    assert big > small
    assert huge > big
    # 64 MiB per group at 1 TiB -> 16384 groups
    assert big == (1 << 40) // cluster.ASSEMBLY_TARGET_GROUP_BYTES


def test_extract_resolves_buckets_from_metadata(ray_session):
    """extract_dataset with assembly_buckets=None sizes the exchange from
    the dataset's metadata estimate without executing the plan."""
    import ray.data

    from deepseek_ocr_ray.pipelines.extract import _resolve_assembly_buckets

    ds = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet")
    n = _resolve_assembly_buckets(ds, None)
    assert n >= 64
    # explicit count always wins
    assert _resolve_assembly_buckets(ds, 5) == 5


def test_collect_table_executes_plan_exactly_once(ray_session, tmp_path):
    """Ray 2.49's lazy ``to_arrow_refs`` follows execution with a
    ``schema(fetch_if_missing=True)`` limit-1 probe — a SECOND run of
    the whole plan (side effects included; the round-4 export_shards
    resume flake).  ``collect_table``/``arrow_block_refs`` must execute
    the plan exactly once."""
    import os
    import uuid

    import pyarrow as pa
    import ray.data

    from deepseek_ocr_ray.cluster import collect_table

    marker_dir = str(tmp_path / "runs")
    os.makedirs(marker_dir)

    def touch(batch: pa.Table) -> pa.Table:
        with open(os.path.join(marker_dir, uuid.uuid4().hex), "w"):
            pass
        return batch

    ds = ray.data.from_arrow(
        pa.table({"x": pa.array(list(range(100)), pa.int64())})
    )  # one block -> one task per plan execution
    out = collect_table(ds.map_batches(touch, batch_format="pyarrow"))
    assert out.num_rows == 100
    assert len(os.listdir(marker_dir)) == 1  # 2 = the schema-probe re-run
