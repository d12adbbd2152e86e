"""Cluster-shape helpers shared by pipelines and stages.

The centerpiece is :func:`equi_join` — the engine's join PLANNER.  Every
equi-join in the repo routes through it so the Ray 2.49 ``Dataset.join``
fragilities (one-shot schema broadcast lost to an empty first block;
per-aggregator memory admission) are handled in exactly one place, with a
tested fallback to the engine-owned ``bucket_join`` instead of a
probabilistic mitigation replicated per call site."""

from __future__ import annotations

import logging
import math
import os

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

logger = logging.getLogger(__name__)


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

# target bytes of join input per hash partition when the caller supplies a
# volume estimate — one aggregator comfortably handles this much
JOIN_TARGET_PARTITION_BYTES = 128 << 20

# ceiling on the materialized right side of a broadcast join — one copy
# lands in each node's plasma store and is read zero-copy by every task, so
# the bound is per-node object-store headroom, not per-task heap
BROADCAST_MAX_BYTES = 256 << 20


def join_partitions_for_bytes(
    approx_bytes: int | None = None, cap: int = 16
) -> int:
    """Hash-join partition count sized to BOTH the cluster and the input.

    Each partition is a standing HashShuffleAggregator actor with a fixed
    startup + memory-reservation cost; at sf0.1 that fixed cost dominates a
    16-way join (measured: q3_shipping 10.6 s, mostly aggregator startup).
    With a volume estimate the count grows with the data —
    ``ceil(bytes / 128 MiB)`` — and is clamped to the CPU-derived cap, so
    tiny inputs get 2 aggregators and large inputs saturate the cluster.
    Without an estimate this falls back to the CPU-only sizing
    (:func:`join_partitions`).
    """
    cpu_cap = join_partitions(cap)
    if approx_bytes is None:
        return cpu_cap
    need = max(2, math.ceil(approx_bytes / JOIN_TARGET_PARTITION_BYTES))
    return min(cpu_cap, need)


# target bytes of exploded-unit payload per assembly shuffle group — one
# map_groups task comfortably assembles this much in heap (the group holds
# the units' text payload plus the assembled output)
ASSEMBLY_TARGET_GROUP_BYTES = 64 << 20


def assembly_buckets_for_bytes(
    approx_bytes: int | None = None, floor: int = 64
) -> int:
    """Assembly-exchange group count sized to BOTH the cluster and input.

    Unlike joins (standing aggregator actors, so MORE partitions cost
    memory), the assembly groupby is a sort exchange — group count is free,
    and too FEW groups is the failure mode: each ``map_groups`` task
    receives corpus/n_buckets bytes, so a fixed count is a per-task memory
    cliff and a parallelism cap at 100× scale.  The count grows with input
    volume (``ceil(bytes / 64 MiB)``) and never drops below
    ``max(floor, 4 × cluster CPUs)`` so small inputs still spread across
    the cluster.
    """
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    lo = max(floor, 4 * cpus)
    if approx_bytes is None:
        return lo
    return max(lo, math.ceil(approx_bytes / ASSEMBLY_TARGET_GROUP_BYTES))


def dataset_size_estimate(ds: ray.data.Dataset) -> int | None:
    """Cheap (metadata-only) byte estimate of a lazy Dataset, or None.

    ``Dataset.size_bytes()`` EXECUTES the plan when metadata is missing —
    never acceptable mid-pipeline-build — so this consults the logical
    plan's inferred metadata only and returns None when unknown."""
    try:
        return ds._logical_plan.dag.infer_metadata().size_bytes
    except Exception:
        return None


def table_file_bytes(sf_dir: str, *names: str) -> int:
    """On-disk bytes of benchmark parquet tables — the cheap (metadata-only)
    volume estimate call sites feed to :func:`join_partitions_for_bytes`."""
    total = 0
    for name in names:
        p = os.path.join(sf_dir, f"{name}.parquet")
        try:
            if os.path.isdir(p):
                for root, _dirs, files in os.walk(p):
                    total += sum(
                        os.path.getsize(os.path.join(root, f)) for f in files
                    )
            else:
                total += os.path.getsize(p)
        except OSError:
            pass
    return total


# --------------------------------------------------------------------------
# the join planner
# --------------------------------------------------------------------------

# string-key sentinels: NUL-prefixed so no natural key collides; the int
# sentinels reuse JOIN_SENTINEL_L/R
_STR_SENTINEL_L = "\x00\x00dsor-anchor-l"
_STR_SENTINEL_R = "\x00\x00dsor-anchor-r"

_SCHEMA_RACE_MARKERS = (
    "No match or multiple matches for key field",
    "no match for key field",
)


def _is_schema_race_error(err: BaseException) -> bool:
    return any(m in str(err) for m in _SCHEMA_RACE_MARKERS)


def _sentinel_value(t: pa.DataType, side: str):
    if pa.types.is_integer(t):
        return JOIN_SENTINEL_L if side == "l" else JOIN_SENTINEL_R
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return _STR_SENTINEL_L if side == "l" else _STR_SENTINEL_R
    raise TypeError(
        f"equi_join: unsupported key type {t} — int and string keys only"
    )


def _sentinel_table(schema: dict[str, pa.DataType], key: str, side: str) -> pa.Table:
    cols = {}
    for name, t in schema.items():
        if name == key:
            cols[name] = pa.array([_sentinel_value(t, side)], t)
        else:
            cols[name] = pa.nulls(1, t)
    return pa.table(cols)


def equi_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    *,
    on: str,
    right_on: str | None = None,
    join_type: str = "inner",
    left_cols: list[str] | None = None,
    right_cols: list[str] | None = None,
    num_partitions: int | None = None,
    approx_bytes: int | None = None,
    strategy: str | None = None,
    n_buckets: int = 64,
    left_types: dict[str, pa.DataType] | None = None,
    right_types: dict[str, pa.DataType] | None = None,
    broadcast_max_bytes: int = BROADCAST_MAX_BYTES,
    key_out: str | None = None,
    _drop_anchor: bool = False,
) -> "ray.data.Dataset":
    """Engine-owned equi-join planner — ALL repo equi-joins go through here.

    Output columns are exactly ``left_cols + right_cols`` in that order
    (defaults: all left columns; all right columns except the key).  For
    ``left_semi`` / ``left_anti`` only ``left_cols`` are returned.  For
    ``left_outer`` unmatched left rows carry nulls in ``right_cols``.
    Right-side key uniqueness follows SQL semantics (matches replicate).

    Strategies (``strategy`` arg > ``DSOR_JOIN_STRATEGY`` env > ``auto``):

    - ``hash``  — Ray's hash-shuffle ``Dataset.join`` with schema-anchor
      sentinel rows prepended to both inputs (see ``anchor_join_input``) and
      sentinels filtered from the output.  Fastest exchange; fully lazy; the
      anchor is a probabilistic race mitigation, not a guarantee.
    - ``bucket`` — the engine-owned ``stages.joins.bucket_join`` (groupby +
      per-bucket C++ acero joins).  No schema-broadcast race, no standing
      aggregator actors; lazy; sort-based exchange (slower at equal scale).
      The right choice when robustness beats peak throughput or the join
      output is too large to materialize.
    - ``broadcast`` — NO exchange at all: the right side is materialized
      once, shipped to the object store via ``ray.put`` (one plasma copy per
      node, zero-copy reads in every task), and each left batch joins
      against it locally with a C++ acero join.  The only join whose cost
      is O(left scan) — the correct plan whenever the right side is a
      lookup table (dims, distinct-key sets, configs).  Guarded by
      ``broadcast_max_bytes`` (default 256 MiB): a larger right side raises
      with guidance rather than silently flooding worker heaps.  Supports
      all four join types (the right side is complete in every task, so
      per-batch outer/semi/anti are exact).  Requires the right key NOT be
      listed in ``right_cols`` (acero coalesces keys; the planner's other
      strategies share this contract).
    - ``auto`` (default) — run the ``hash`` plan EAGERLY (materialized so a
      schema-broadcast loss surfaces here, not in the consumer) and fall
      back to the ``bucket`` plan transparently if Ray's join dies with the
      ArrowInvalid schema-race signature.  Robust by construction: the race
      is retried through an operator that cannot lose it.  The eager
      materialization holds the JOIN OUTPUT (post-exchange, usually reduced/
      projected) in the object store; callers whose join output is corpus-
      sized should pass ``strategy='bucket'`` to stay lazy AND robust.

    ``approx_bytes``: optional estimate of total join input volume (e.g.
    ``table_file_bytes(...)``) used to size the hash plan's partition count
    (``join_partitions_for_bytes``) so tiny inputs don't pay 16 aggregator
    startups and large inputs don't underpartition.

    ``_drop_anchor`` is a fault-injection hook for tests: it omits the
    schema anchors so an empty-first-block arrival is guaranteed, proving
    the ``auto`` fallback end-to-end.
    """
    assert join_type in (
        "inner", "left_outer", "right_outer", "full_outer",
        "left_semi", "left_anti",
    ), join_type
    r_on = right_on if right_on is not None else on
    strategy = strategy or os.environ.get("DSOR_JOIN_STRATEGY", "auto")
    assert strategy in ("auto", "hash", "bucket", "broadcast"), strategy
    if join_type in ("right_outer", "full_outer") and strategy != "bucket":
        # only the keyed-exchange plan keeps right-only rows exact (each
        # key is complete in ONE bucket); the hash plan's anchor sentinels
        # would surface as output rows and broadcast would replicate
        # right-only rows per left batch — route outer variants here.
        strategy = "bucket"

    def _side_schema(
        ds: "ray.data.Dataset", override: dict | None, side: str
    ) -> dict[str, pa.DataType]:
        """Column→type map for one input.  ``Dataset.schema()`` is None for
        a computed dataset that turns out empty (e.g. a no-duplicates
        candidate stream) — callers joining such inputs pass the types
        explicitly via ``left_types`` / ``right_types``."""
        if override is not None:
            return dict(override)
        sch = ds.schema()
        if sch is None:
            raise ValueError(
                f"equi_join: {side} input has no derivable schema (empty "
                f"computed dataset?) — pass {side}_types={{col: pa.DataType}}"
            )
        base = sch.base_schema
        return {c: base.field(c).type for c in base.names}

    l_schema = _side_schema(left, left_types, "left")
    r_schema = _side_schema(right, right_types, "right")
    l_names = list(l_schema)
    r_names = list(r_schema)
    lcols = left_cols if left_cols is not None else l_names
    rcols = (
        right_cols
        if right_cols is not None
        else [c for c in r_names if c != r_on]
    )
    if join_type in ("left_semi", "left_anti"):
        rcols = []
    clash = sorted(set(lcols) & set(rcols))
    if clash:
        raise ValueError(
            f"equi_join: output column collision {clash} between left_cols "
            "and right_cols — rename one side first"
        )

    def bucket_plan() -> "ray.data.Dataset":
        from .stages.joins import bucket_join

        return bucket_join(
            left,
            right,
            left_on=on,
            right_on=r_on,
            how=join_type,
            left_cols=lcols,
            right_cols=rcols,
            n_buckets=n_buckets,
            left_types=l_schema,
            right_types=r_schema,
            key_out=key_out,
        )

    if key_out is not None and strategy != "bucket":
        raise ValueError(
            "equi_join: key_out (the COALESCE'd join key column) is only "
            "produced by the bucket plan — pass strategy='bucket' or use a "
            "full/right outer join_type (auto-routed there)"
        )
    if strategy == "bucket":
        return bucket_plan()

    if strategy == "broadcast":
        if r_on in rcols:
            raise ValueError(
                "equi_join(broadcast): the right key is coalesced into the "
                f"left key by the local join — drop {r_on!r} from right_cols"
            )
        rtab = pa.concat_tables(
            [
                t.select(list(dict.fromkeys([r_on] + rcols)))
                for t in ray.get(arrow_block_refs(right))
                if t.num_rows
            ]
            or [
                pa.table(
                    {
                        c: pa.array([], r_schema[c])
                        for c in dict.fromkeys([r_on] + rcols)
                    }
                )
            ],
            promote_options="default",
        ).combine_chunks()
        if rtab.nbytes > broadcast_max_bytes:
            raise ValueError(
                f"equi_join(broadcast): right side is {rtab.nbytes >> 20} "
                f"MiB (> {broadcast_max_bytes >> 20} MiB cap) — a side that "
                "large must move through an exchange; use strategy='auto' "
                "or 'bucket'"
            )
        rref = ray.put(rtab)
        how_arrow = {
            "inner": "inner",
            "left_outer": "left outer",
            "left_semi": "left semi",
            "left_anti": "left anti",
        }[join_type]
        lsel = list(dict.fromkeys(lcols + [on]))
        out_cols = lcols + rcols
        cast_schema = pa.schema(
            [(c, l_schema[c]) for c in lcols]
            + [(c, r_schema[c]) for c in rcols]
        )

        def bcast_join(batch: pa.Table) -> pa.Table:
            r = ray.get(rref)
            joined = batch.select(lsel).join(
                r,
                keys=[on],
                right_keys=[r_on],
                join_type=how_arrow,
            )
            return joined.select(out_cols).cast(cast_schema)

        return left.map_batches(bcast_join, batch_format="pyarrow")

    def hash_plan() -> "ray.data.Dataset":
        nparts = (
            num_partitions
            if num_partitions is not None
            else join_partitions_for_bytes(approx_bytes)
        )
        if approx_bytes is not None:
            hint = min(max(approx_bytes // nparts, 16 << 20), 1 << 30)
        else:
            hint = JOIN_PARTITION_SIZE_HINT
        l_in, r_in = left, right
        if not _drop_anchor:
            l_in = anchor_join_input(l_in, _sentinel_table(l_schema, on, "l"))
            r_in = anchor_join_input(r_in, _sentinel_table(r_schema, r_on, "r"))
        joined = l_in.join(
            r_in,
            join_type=join_type,
            num_partitions=nparts,
            partition_size_hint=hint,
            on=(on,),
            right_on=(r_on,) if r_on != on else None,
        )
        # sentinel post-filter: inner joins drop the never-matching anchors
        # on their own and left_semi keeps only matched left rows — only
        # plans where an UNMATCHED left row survives need the filter
        out_fields = [(c, l_schema[c]) for c in lcols] + [
            (c, r_schema[c]) for c in rcols
        ]
        out_cols = lcols + rcols
        key_t = l_schema[on]
        sent_l = _sentinel_value(key_t, "l")
        needs_filter = join_type in ("left_outer", "left_anti")

        def strip(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0 or on not in batch.column_names:
                return pa.table(
                    {name: pa.array([], t) for name, t in out_fields}
                )
            if needs_filter:
                batch = batch.filter(
                    pc.not_equal(batch[on], pa.scalar(sent_l, key_t))
                )
            return batch.select(out_cols)

        return joined.map_batches(strip, batch_format="pyarrow")

    if strategy == "hash":
        return hash_plan()

    # auto: eager hash with tested bucket fallback
    try:
        return hash_plan().materialize()
    except Exception as err:  # noqa: BLE001 — filtered to the race signature
        if not _is_schema_race_error(err):
            raise
        logger.warning(
            "equi_join: Dataset.join lost its schema broadcast (%s); "
            "re-planning through bucket_join",
            type(err).__name__,
        )
        return bucket_plan()


def equi_join_multi(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    *,
    on: list[str],
    right_on: list[str] | None = None,
    join_type: str = "inner",
    left_cols: list[str] | None = None,
    right_cols: list[str] | None = None,
    **kw,
) -> "ray.data.Dataset":
    """Composite-key equi-join through the single-key planner.

    Each side folds its key columns into one 64-bit combined key
    (vectorized ``hash64_array`` per column, mixed with per-position
    rotations), joins on that single column, then VERIFIES true key
    equality on every joined row and drops hash collisions — one
    vectorized compare per row, so the plan stays correct at any scale
    (at 10^12 joined rows a 64-bit combined key WILL collide; the verify
    makes that a no-op instead of a wrong row).  The right-side key
    columns ride through the join under reserved names for the verify and
    are dropped from the output.

    ``inner`` only: outer/semi/anti under collisions need collision-aware
    unmatched tracking — route those through a single-key join on a
    concatenated exact key instead (raises with that guidance).
    """
    import numpy as np

    from .hashing import hash64_columns

    if join_type != "inner":
        raise NotImplementedError(
            "equi_join_multi supports inner joins only; for outer/semi/"
            "anti build one exact composite key column (e.g. string "
            "concat with a separator) and use equi_join"
        )
    r_on = right_on if right_on is not None else on
    if len(on) != len(r_on) or len(on) < 2:
        raise ValueError("on/right_on must be equal-length lists of ≥2 keys")

    def add_ck(keys: list[str]):
        def fn(batch: pa.Table) -> pa.Table:
            h = hash64_columns(batch, keys)
            return batch.append_column(
                "__ck", pa.array(h.view(np.int64))
            )

        return fn

    l_schema = left.schema().base_schema
    lcols = left_cols if left_cols is not None else list(l_schema.names)
    r_schema = right.schema().base_schema
    rcols = (
        right_cols
        if right_cols is not None
        else [c for c in r_schema.names if c not in r_on]
    )
    rk_alias = {k: f"__rk{i}" for i, k in enumerate(r_on)}

    def alias_right(batch: pa.Table) -> pa.Table:
        cols = {rk_alias.get(c, c): batch[c] for c in batch.column_names}
        return pa.table(cols)

    lt = left.map_batches(add_ck(on), batch_format="pyarrow")
    rt = right.map_batches(add_ck(r_on), batch_format="pyarrow").map_batches(
        alias_right, batch_format="pyarrow"
    )
    joined = equi_join(
        lt,
        rt,
        on="__ck",
        join_type="inner",
        left_cols=list(dict.fromkeys(list(on) + lcols)),
        right_cols=list(rk_alias.values()) + rcols,
        **kw,
    )

    def verify(batch: pa.Table) -> pa.Table:
        if batch.num_rows:
            ok = None
            for lk, rk in zip(on, rk_alias.values()):
                eq = pc.equal(batch[lk], batch[rk])
                ok = eq if ok is None else pc.and_(ok, eq)
            batch = batch.filter(pc.fill_null(ok, False))
        return batch.select(list(dict.fromkeys(list(on) + lcols)) + rcols)

    return joined.map_batches(verify, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# skew-aware (salted) inner join
# ---------------------------------------------------------------------------


def detect_hot_keys(
    ds: "ray.data.Dataset",
    key: str,
    *,
    top_per_block: int = 8,
    threshold_rows: int | None = None,
) -> tuple[list, int]:
    """Deterministic HOT-KEY candidates of one column: each block
    contributes its ``top_per_block`` most frequent keys (C++ group count
    + one vectorized argpartition), candidates are summed across blocks
    (an under-count — keys missing from a block's top-k lose that block's
    contribution, which only makes the filter CONSERVATIVE), and keys
    whose summed count exceeds the threshold come back.  A superset or
    subset of the true hot set is safe for salting: extra salting costs a
    little replication, a missed warm key just stays on the normal path.

    Returns ``(hot_keys, total_rows)``; default threshold = 2% of rows.
    """
    import numpy as np

    from ray.data.aggregate import Sum

    def block_top(batch: pa.Table) -> pa.Table:
        g = batch.group_by([key]).aggregate([([], "count_all")])
        cnt = g["count_all"].to_numpy(zero_copy_only=False)
        k = min(top_per_block, len(cnt))
        if k == 0:
            return pa.table(
                {key: g[key], "n": g["count_all"].cast(pa.int64()),
                 "rows": pa.array([], pa.int64())}
            )
        top = np.argpartition(cnt, -k)[-k:]
        t = g.take(pa.array(np.sort(top)))
        return pa.table(
            {
                key: t[key],
                "n": t["count_all"].cast(pa.int64()),
                # block row count rides along so total is exact
                "rows": pa.array(
                    [batch.num_rows] + [0] * (len(t) - 1), pa.int64()
                ),
            }
        )

    rows = (
        ds.select_columns([key])
        .map_batches(block_top, batch_format="pyarrow")
        .groupby(key)
        .aggregate(Sum("n"), Sum("rows"))
        .take_all()
    )  # bounded: ≤ top_per_block × blocks candidates
    total = sum(r["sum(rows)"] for r in rows)
    thr = (
        threshold_rows
        if threshold_rows is not None
        else max(1, total // 50)
    )
    hot = sorted(r[key] for r in rows if r["sum(n)"] > thr)
    return hot, total


def salted_inner_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    *,
    on: str,
    right_on: str | None = None,
    left_cols: list[str],
    right_cols: list[str],
    salts: int = 8,
    hot_keys: list | None = None,
    salt_source: str | None = None,
    **kw,
) -> "ray.data.Dataset":
    """Inner equi-join that defuses KEY SKEW by salting: rows of the few
    hot keys get a salt in [0, salts) on the left (derived from
    ``salt_source``, another column, so it is deterministic AND spreads),
    the right side replicates ONLY its hot-key rows ×salts, and the join
    runs on the composite (key, salt) through ``equi_join_multi`` — a hot
    key's rows now land on ``salts`` partitions instead of one.  Cold keys
    ride salt 0 unreplicated, so the extra exchange volume is
    ``salts × |right hot rows|`` (usually a handful of rows).

    Inner only: replication breaks outer/semi/anti multiplicity.  Pass
    ``hot_keys`` explicitly or let :func:`detect_hot_keys` find them on
    the left (one cheap candidate pass).  ``salt_source`` defaults to the
    first left column that isn't the key.
    """
    import numpy as np

    from .hashing import hash64_array

    r_on = right_on if right_on is not None else on
    if hot_keys is None:
        hot_keys, _ = detect_hot_keys(left, on)
    if salt_source is None:
        salt_source = next(c for c in left_cols if c != on)
    if not hot_keys:
        return equi_join(
            left, right, on=on, right_on=r_on, join_type="inner",
            left_cols=left_cols, right_cols=right_cols, **kw,
        )
    key_type = left.schema().base_schema.field(on).type
    hot_arr = pa.array(hot_keys, key_type)
    hot_ref = ray.put(hot_arr)
    n_salts = int(salts)

    def salt_left(batch: pa.Table) -> pa.Table:
        hot = ray.get(hot_ref)
        is_hot = pa.compute.is_in(batch[on], value_set=hot).to_numpy(
            zero_copy_only=False
        )
        salt = np.zeros(batch.num_rows, np.int64)
        if is_hot.any():
            spread = hash64_array(batch[salt_source]) % np.uint64(n_salts)
            salt[is_hot] = spread.astype(np.int64)[is_hot]
        return batch.append_column("__salt", pa.array(salt, pa.int64()))

    def salt_right(batch: pa.Table) -> pa.Table:
        hot = ray.get(hot_ref)
        is_hot = pa.compute.is_in(batch[r_on], value_set=hot).to_numpy(
            zero_copy_only=False
        )
        cold = batch.filter(pa.array(~is_hot)).append_column(
            "__salt", pa.array(np.zeros(int((~is_hot).sum()), np.int64))
        )
        hot_rows = batch.filter(pa.array(is_hot))
        if hot_rows.num_rows == 0:
            return cold
        reps = [
            hot_rows.append_column(
                "__salt",
                pa.array(np.full(hot_rows.num_rows, s, np.int64)),
            )
            for s in range(n_salts)
        ]
        return pa.concat_tables([cold] + reps)

    lsalted = left.map_batches(salt_left, batch_format="pyarrow")
    rsalted = right.map_batches(salt_right, batch_format="pyarrow")
    return equi_join_multi(
        lsalted,
        rsalted,
        on=[on, "__salt"],
        right_on=[r_on, "__salt"],
        left_cols=left_cols,
        right_cols=right_cols,
        **kw,
    )


def arrow_block_refs(ds: "ray.data.Dataset") -> list:
    """Arrow block refs of ``ds`` with EXACTLY ONE plan execution.

    Ray 2.49's ``Dataset.to_arrow_refs()`` on a LAZY dataset follows the
    full execution with ``schema(fetch_if_missing=True)``, which launches
    a SECOND limit-1 execution of the entire upstream plan — a silent
    double-run of the pipeline's first block for every collect, and a
    correctness hazard for side-effecting sinks (``export_shards``'s
    skipped-flags saw files the probe run had already written).
    Materializing first makes the trailing schema call a cached lookup,
    so the plan runs exactly once.  Only for results the caller KNOWS
    are bounded."""
    return ds.materialize().to_arrow_refs()


def collect_table(ds: "ray.data.Dataset") -> pa.Table | None:
    """Materialize a (small, bounded) Dataset into ONE pa.Table robustly:
    zero-row blocks are dropped BEFORE concatenation (a computed empty
    block can be schema-less or schema-divergent — ``pa.concat_tables``
    over raw block refs crashes on it, a bug this helper exists to
    prevent), and survivors are cast to the first block's schema.
    Returns None when every block is empty.  Only for results the caller
    KNOWS are bounded (thresholded edge lists, per-block summaries)."""
    tabs = [t for t in ray.get(arrow_block_refs(ds)) if t.num_rows]
    if not tabs:
        return None
    target = tabs[0].schema
    return pa.concat_tables(
        [t if t.schema == target else t.cast(target) for t in tabs]
    )
