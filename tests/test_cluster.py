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
