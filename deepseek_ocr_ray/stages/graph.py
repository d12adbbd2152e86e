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


def connected_components(
    edges: ray.data.Dataset,
    nodes: ray.data.Dataset,
    *,
    id_col: str = "id",
    u_col: str = "u",
    v_col: str = "v",
    max_iters: int = 50,
) -> ray.data.Dataset:
    """Min-label propagation: returns ``(id_col, cluster_id)`` where
    ``cluster_id`` is the smallest node id in the node's component.

    ``edges`` may list each undirected edge once in either orientation —
    both directions are derived internally.  Isolated nodes keep their own
    id as ``cluster_id``.  Raises ``RuntimeError`` if not converged after
    ``max_iters`` rounds (fail loud, never a silently-partial clustering).
    """

    def bidir(batch: pa.Table) -> pa.Table:
        u = batch[u_col].cast(pa.int64())
        v = batch[v_col].cast(pa.int64())
        return pa.concat_tables(
            [pa.table({"eu": u, "ev": v}), pa.table({"eu": v, "ev": u})]
        ).combine_chunks()

    edges2 = edges.map_batches(bidir, batch_format="pyarrow").materialize()

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
