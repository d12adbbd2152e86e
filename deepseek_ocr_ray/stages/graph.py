"""Distributed connected components over an edge Dataset.

The missing piece between pairwise near-dup detection (LSH candidate pairs,
``stages/dedup.py``) and cluster-level curation decisions ("keep one doc per
duplicate CLUSTER", transitive closure of pairs): label propagation where
each node's label converges to the minimum node id reachable from it.

Ray-Data-first shape: labels live in a ``(id, label)`` Dataset; one
iteration is

    candidates = edges ⋈ labels on (u = id)      # each neighbor offers its label
    labels'    = (candidates ∪ labels).groupby(id).min(label)

Labels only ever decrease, so ``sum(label)`` is a strictly decreasing
monotone — convergence is detected by one scalar aggregate per round, no
driver-side diffing of the label table.  Each round is one shuffle join plus
one hash aggregate; the loop runs O(component diameter) rounds.  Duplicate
clusters in web corpora are shallow (near-dup components are dense, small-
diameter), so in practice this converges in a handful of rounds; for
adversarial long-chain graphs the large-star/small-star doubling variant
(Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14)
halves the round count — noted as the upgrade path, not needed for dedup
clustering.

Each round ``materialize()``s the (two-int-column) label table: without it
the lazy lineage re-executes every prior join per round (exponential).  The
materialized state is O(nodes) — at 10^12 nodes labels are ~16 TB spread
across the cluster's object store, the same order as any groupby state on
that corpus.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from ..cluster import equi_join


# At or below this many (edge + node) rows the edge list is collected to
# the driver and clustered with the vectorized numpy pass — thresholded
# near-dup pair lists are O(nodes), so two int64 columns at 5M rows are
# ~80 MB: trivially collectable, and the distributed rounds' fixed
# per-shuffle cost would dominate by 10× at that size.  Above it, the
# distributed label-propagation rounds run.  Same auto-select convention
# as ``incremental_exact_dedup`` / the join planner.
LOCAL_CC_THRESHOLD = 5_000_000


def _local_cc(
    u: "np.ndarray", v: "np.ndarray", node_ids: "np.ndarray"
) -> "np.ndarray":
    """Vectorized min-label + pointer-compression components over compact
    indices; returns the min node id per component aligned to node_ids."""
    import numpy as np

    n = len(node_ids)
    allids = np.concatenate([node_ids, u, v])
    ids, inv = np.unique(allids, return_inverse=True)
    ui = inv[n : n + len(u)]
    vi = inv[n + len(u) :]
    lab = np.arange(len(ids), dtype=np.int64)

    def compress(lab):
        while True:
            l2 = lab[lab]
            if np.array_equal(l2, lab):
                return lab
            lab = l2

    while True:
        new = lab.copy()
        np.minimum.at(new, ui, lab[vi])
        np.minimum.at(new, vi, lab[ui])
        new = compress(new)
        if np.array_equal(new, lab):
            break
        lab = new
    # np.unique sorts ascending, so the min compact index IS the min id
    return ids[lab[inv[:n]]]


def connected_components(
    edges: ray.data.Dataset,
    nodes: ray.data.Dataset,
    *,
    id_col: str = "id",
    u_col: str = "u",
    v_col: str = "v",
    max_iters: int = 50,
    strategy: str = "auto",
    local_threshold: int = LOCAL_CC_THRESHOLD,
) -> ray.data.Dataset:
    """Min-label propagation: returns ``(id_col, cluster_id)`` where
    ``cluster_id`` is the smallest node id in the node's component.

    ``edges`` may list each undirected edge once in either orientation —
    both directions are derived internally.  Isolated nodes keep their own
    id as ``cluster_id``.  Raises ``RuntimeError`` if not converged after
    ``max_iters`` rounds (fail loud, never a silently-partial clustering).

    ``strategy``: ``"auto"`` (default) collects the edge list to the driver
    below ``local_threshold`` total rows and runs the vectorized numpy pass
    (``_local_cc``); ``"distributed"`` / ``"local"`` force a plan.  Both
    plans are property-tested equal (tests/test_curation.py)."""
    if strategy not in ("auto", "distributed", "local"):
        raise ValueError(f"unknown strategy {strategy!r}")

    def bidir(batch: pa.Table) -> pa.Table:
        u = batch[u_col].cast(pa.int64())
        v = batch[v_col].cast(pa.int64())
        return pa.concat_tables(
            [pa.table({"eu": u, "ev": v}), pa.table({"eu": v, "ev": u})]
        ).combine_chunks()

    edges2 = edges.map_batches(bidir, batch_format="pyarrow").materialize()

    if strategy != "distributed":
        import ray as _ray

        n_rows = edges2.count() // 2 + nodes.count()
        if strategy == "local" or n_rows <= local_threshold:
            import numpy as np

            etbl = pa.concat_tables(_ray.get(edges2.to_arrow_refs()))
            u = etbl["eu"].to_numpy(zero_copy_only=False)
            v = etbl["ev"].to_numpy(zero_copy_only=False)
            # solve components ONCE over the edge endpoints; the broadcast
            # is the sorted endpoint→cluster map, and the per-block pass is
            # a vectorized searchsorted lookup (nodes without edges keep
            # their own id)
            endpoints = np.unique(np.concatenate([u, v]))
            clusters = _local_cc(u, v, endpoints)
            map_ref = _ray.put((endpoints, clusters))

            def label_block(batch: pa.Table) -> pa.Table:
                ep, cl = _ray.get(map_ref)
                node_ids = (
                    batch[id_col]
                    .cast(pa.int64())
                    .to_numpy(zero_copy_only=False)
                )
                pos = np.searchsorted(ep, node_ids)
                pos = np.clip(pos, 0, max(len(ep) - 1, 0))
                out = node_ids.copy()
                if len(ep):
                    hit = ep[pos] == node_ids
                    out[hit] = cl[pos[hit]]
                return pa.table(
                    {
                        id_col: batch[id_col].cast(pa.int64()),
                        "cluster_id": pa.array(out),
                    }
                )

            return nodes.map_batches(label_block, batch_format="pyarrow")

    def init_labels(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].cast(pa.int64())
        return pa.table({"id": ids, "label": ids})

    labels = nodes.map_batches(init_labels, batch_format="pyarrow").materialize()
    prev_sum = labels.sum("label")

    for _ in range(max_iters):
        # neighbors offer their labels across each directed edge
        offers = equi_join(
            edges2,
            labels,
            on="eu",
            right_on="id",
            left_cols=["ev"],
            right_cols=["label"],
        ).map_batches(
            lambda b: pa.table({"id": b["ev"], "label": b["label"]}),
            batch_format="pyarrow",
        )
        labels = (
            labels.union(offers)
            .groupby("id")
            .min("label")
            .map_batches(
                lambda b: pa.table(
                    {"id": b["id"], "label": b["min(label)"]}
                ),
                batch_format="pyarrow",
            )
            .materialize()
        )
        cur_sum = labels.sum("label")
        if cur_sum == prev_sum:  # labels only decrease: fixpoint reached
            return labels.map_batches(
                lambda b: pa.table({id_col: b["id"], "cluster_id": b["label"]}),
                batch_format="pyarrow",
            )
        prev_sum = cur_sum
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} rounds "
        "(component diameter exceeds the bound — raise max_iters or use a "
        "star-contraction variant)"
    )
