"""Cluster-shape helpers shared by pipelines and stages."""

from __future__ import annotations

import pyarrow as pa
import ray
import ray.data


# impossible key values for join anchors over non-negative id domains; use
# the L value on the left side and R on the right so anchor rows can never
# match each other and fall out of inner joins automatically (left-outer
# joins must still filter the left anchor from their output)
JOIN_SENTINEL_L = -(1 << 62)
JOIN_SENTINEL_R = -(1 << 62) + 1


def anchor_join_input(ds: "ray.data.Dataset", sentinel: pa.Table) -> "ray.data.Dataset":
    """Prepend a one-row sentinel block to a ``Dataset.join`` input.

    Ray 2.49's hash-shuffle join broadcasts a side's schema to all
    aggregator partitions only while shuffling the FIRST block of that side
    — and consumes the one-shot flag even when that block has zero rows.
    ``map_batches`` never invokes its UDF on empty blocks, so they cannot be
    normalized away; if an empty block (from a selective filter, an empty
    groupby partition, or a no-match join) arrives first, schema-less
    aggregator partitions crash at finalize with ArrowInvalid "No match or
    multiple matches for key field".

    The sentinel lives in an ``InputDataBuffer`` that is ready at execution
    start, so it is shuffled (and broadcasts the schema) before any computed
    block can arrive.  Callers pick sentinel key values outside the real key
    domain (e.g. ``-(1 << 62)`` for non-negative ids) and filter them from
    the join output.

    NOTE this is a probabilistic mitigation, not an ordering guarantee —
    Ray does not promise cross-operator bundle arrival order.  In practice
    the input buffer wins by the milliseconds the computed branch needs for
    its first task, and a loss fails FAST (ArrowInvalid at finalize, no
    wrong results) on a resumable job.  If Ray ever changes scheduling such
    that this fires, the fallback is the engine's groupby+map_groups join
    skeleton (stages/joins.py), which has no such sensitivity.
    """
    return ray.data.from_arrow(sentinel).union(ds)


def join_partitions(cap: int = 16) -> int:
    """Hash-join partition count sized to the cluster.

    Each ``Dataset.join`` spawns ``num_partitions`` HashShuffleAggregator
    actors that reserve a slice of the CPU budget; a fixed 16 stalls the
    streaming executor on small clusters when a pipeline contains two or
    more joins (measured: 2×16 aggregators on 4 CPUs → deadlock).  On a
    real multi-node cluster CPU count is large, so this caps at ``cap`` —
    raise the cap on very large clusters where shuffle-output parallelism
    should exceed 16.
    """
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(2, min(cap, cpus // 2))


# partition_size_hint for Dataset.join: without a hint Ray reserves
# ~0.88 GiB of memory budget PER AGGREGATOR (shuffle+joining+output
# defaults), which the streaming executor cannot admit late in a long
# shared session on a small machine — joins then sit "backpressured:tasks"
# forever with zero running tasks.  The repo's join partitions are sized to
# cluster CPUs, so per-partition volumes are modest; 64 MiB keeps the
# reservation honest.  Callers moving truly large partitions should pass
# their own estimate.
JOIN_PARTITION_SIZE_HINT = 64 << 20
