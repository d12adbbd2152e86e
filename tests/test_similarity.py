"""Similarity-search tests: brute-force top-k vs a numpy reference, IVF
recall, and parallelism invariance."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from deepseek_ocr_ray.stages import similarity as sim


def _emb_table(n: int = 100, d: int = 16, seed: int = 11) -> pa.Table:
    rng = np.random.RandomState(seed)
    vecs = rng.randn(n, d).astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(vecs.tolist(), pa.list_(pa.float32())),
        }
    )


def _ds(tbl: pa.Table, blocks: int = 3):
    import ray.data

    return ray.data.from_arrow(tbl).repartition(blocks)


def _numpy_topk(tbl: pa.Table, qids: list[int], k: int) -> dict[int, list[int]]:
    vecs = np.asarray(tbl["embedding"].to_pylist(), dtype=np.float64)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    out = {}
    for qid in qids:
        sims = vecs @ vecs[qid]
        sims[qid] = -np.inf
        order = np.lexsort((np.arange(len(sims)), -sims))[:k]
        out[qid] = order.tolist()
    return out


def test_brute_force_topk_exact(ray_session):
    tbl = _emb_table()
    qids = [0, 3, 7]
    q = np.asarray(tbl["embedding"].to_pylist(), dtype=np.float64)[qids]
    got = sim.brute_force_topk(
        _ds(tbl), q, np.asarray(qids), k=5, dtype=np.float64
    ).to_pandas()
    want = _numpy_topk(tbl, qids, 5)
    for qid in qids:
        rows = got[got.query_id == qid].sort_values("rank")
        assert rows.neighbor_id.tolist() == want[qid]
        assert rows["rank"].tolist() == [1, 2, 3, 4, 5]


@pytest.mark.parametrize("blocks", [1, 6])
def test_brute_force_parallelism_invariant(ray_session, blocks):
    tbl = _emb_table()
    q = np.asarray(tbl["embedding"].to_pylist(), dtype=np.float64)[[1, 2]]
    a = sim.brute_force_topk(
        _ds(tbl, blocks), q, np.asarray([1, 2]), k=7, dtype=np.float64
    ).to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    b = sim.brute_force_topk(
        _ds(tbl, 3), q, np.asarray([1, 2]), k=7, dtype=np.float64
    ).to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert a.equals(b)


def test_deterministic_kmeans_stable():
    x = np.random.RandomState(0).randn(200, 8)
    c1 = sim.deterministic_kmeans(x, 8, seed=5)
    c2 = sim.deterministic_kmeans(x, 8, seed=5)
    assert np.array_equal(c1, c2)
    assert c1.shape == (8, 8)


def test_ivf_search_recall(ray_session):
    tbl = _emb_table(n=300)
    qids = [0, 10, 20, 30]
    q = np.asarray(tbl["embedding"].to_pylist(), dtype=np.float64)[qids]
    idx = sim.IVFIndex(n_cells=8, seed=5).build(_ds(tbl))
    got = idx.search(q, np.asarray(qids), k=10, nprobe=4).to_pandas()
    want = _numpy_topk(tbl, qids, 10)
    recalls = []
    for qid in qids:
        found = set(got[got.query_id == qid].neighbor_id)
        recalls.append(len(found & set(want[qid])) / 10)
    # nprobe=4 of 8 cells → expect decent-but-approximate recall
    assert np.mean(recalls) >= 0.5
    # results must never include the query itself
    assert not ((got.query_id == got.neighbor_id).any())


def test_ivf_more_probes_more_recall(ray_session):
    tbl = _emb_table(n=300)
    qids = [5, 15]
    q = np.asarray(tbl["embedding"].to_pylist(), dtype=np.float64)[qids]
    idx = sim.IVFIndex(n_cells=8, seed=5).build(_ds(tbl))
    full = idx.search(q, np.asarray(qids), k=10, nprobe=8).to_pandas()
    want = _numpy_topk(tbl, qids, 10)
    # probing every cell = exact search
    for qid in qids:
        rows = full[full.query_id == qid].sort_values("rank")
        assert rows.neighbor_id.tolist() == want[qid]


def test_ivf_persist_and_prune(ray_session, tmp_path):
    """write → load → search_persisted reads only probed cells and returns
    the same results as the in-memory index."""
    tbl = _emb_table(n=200)
    qids = [1, 7]
    q = np.asarray(tbl["embedding"].to_pylist(), dtype=np.float64)[qids]

    idx = sim.IVFIndex(n_cells=8, seed=5).build(_ds(tbl))
    want = idx.search(q, np.asarray(qids), k=5, nprobe=3).to_pandas()
    idx.write(str(tmp_path / "ivf"))

    idx2 = sim.IVFIndex.load(str(tmp_path / "ivf"))
    assert np.array_equal(idx2.centroids, idx.centroids)
    got = idx2.search_persisted(q, np.asarray(qids), k=5, nprobe=3).to_pandas()

    key = ["query_id", "rank"]
    a = want.sort_values(key).reset_index(drop=True)
    b = got.sort_values(key).reset_index(drop=True)
    assert a.neighbor_id.tolist() == b.neighbor_id.tolist()
    # the persisted layout has one dir per cell → pruning is real
    import os

    cells = [d for d in os.listdir(tmp_path / "ivf") if d.startswith("cell=")]
    assert len(cells) == 8


def test_ivf_default_search_prunes_after_write(ray_session, tmp_path, monkeypatch):
    """After write() (or load()), plain search() must take the pruned path:
    only the probed cells' parquet files are handed to read_parquet."""
    tbl = _emb_table(n=200)
    qids = [1, 7]
    q = np.asarray(tbl["embedding"].to_pylist(), dtype=np.float64)[qids]

    idx = sim.IVFIndex(n_cells=8, seed=5).build(_ds(tbl))
    want = idx._search_assigned(q, np.asarray(qids), k=5, nprobe=3).to_pandas()
    idx.write(str(tmp_path / "ivf"))

    import ray.data as rd

    captured = {}
    real_read = rd.read_parquet

    def spy(paths, *a, **kw):
        captured["paths"] = paths
        return real_read(paths, *a, **kw)

    monkeypatch.setattr(rd, "read_parquet", spy)
    got = idx.search(q, np.asarray(qids), k=5, nprobe=3).to_pandas()

    assert "paths" in captured, "default search() did not take the file-pruned path"
    probed_cells = {p.split("cell=")[1].split("/")[0] for p in captured["paths"]}
    assert 0 < len(probed_cells) < 8  # strictly fewer than all cells read
    key = ["query_id", "rank"]
    a = want.sort_values(key).reset_index(drop=True)
    b = got.sort_values(key).reset_index(drop=True)
    assert a.neighbor_id.tolist() == b.neighbor_id.tolist()


def test_ivf_sample_membership_deterministic_above_cap(ray_session):
    """With more rows than sample_size, the k-means sample must be a
    deterministic function of the corpus (hash-selected membership + id
    order), not of block arrival order."""
    tbl = _emb_table(n=200)
    cents = []
    for blocks in (2, 7):
        idx = sim.IVFIndex(n_cells=4, seed=5, sample_size=50).build(
            _ds(tbl, blocks)
        )
        cents.append(idx.centroids.copy())
    assert np.array_equal(cents[0], cents[1])


def test_ivf_prefer_persisted_false_serves_live_assignment(
    ray_session, tmp_path
):
    """write() freezes the index; prefer_persisted=False must opt back into
    the live in-memory assignment (and True without a path must raise)."""
    tbl = _emb_table(n=120)
    qids = [3]
    q = np.asarray(tbl["embedding"].to_pylist(), dtype=np.float64)[qids]

    idx = sim.IVFIndex(n_cells=4, seed=5).build(_ds(tbl))
    with pytest.raises(ValueError, match="never written"):
        idx.search(q, np.asarray(qids), k=5, prefer_persisted=True)

    live = idx.search(q, np.asarray(qids), k=5, nprobe=2).to_pandas()
    idx.write(str(tmp_path / "ivf"))
    # frozen default reads the files; the explicit flag serves the live plan
    explicit = idx.search(
        q, np.asarray(qids), k=5, nprobe=2, prefer_persisted=False
    ).to_pandas()
    assert (
        live.sort_values(["query_id", "rank"]).neighbor_id.tolist()
        == explicit.sort_values(["query_id", "rank"]).neighbor_id.tolist()
    )


def test_pq_recall_and_rerank(ray_session):
    import ray.data

    from deepseek_ocr_ray.stages.similarity import PQIndex, brute_force_topk

    rng = np.random.RandomState(6)
    n, d = 600, 64
    vecs = rng.normal(0, 1, (n, d))
    tab = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [v.astype(np.float32).tolist() for v in vecs]
            ),
        }
    )
    ds = ray.data.from_arrow(tab).repartition(5)
    q = vecs[:5]
    qids = np.arange(5)
    brute = brute_force_topk(ds, q, qids, k=10, dtype=np.float64).take_all()
    bm = {}
    for r in brute:
        bm.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    idx = PQIndex(m=16, ks=32).build(ds)

    def recall(rows):
        pm = {}
        for r in rows:
            pm.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return np.mean([len(bm[k] & pm[k]) / 10 for k in bm])

    adc = recall(idx.search(q, qids, k=10).take_all())
    rr = recall(idx.search(q, qids, k=10, rerank=4).take_all())
    assert adc >= 0.4
    assert rr >= 0.85
    assert rr >= adc


def test_pq_deterministic_and_parallelism_invariant(ray_session):
    import ray.data

    from deepseek_ocr_ray.stages.similarity import PQIndex

    rng = np.random.RandomState(9)
    n, d = 300, 32
    tab = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in rng.normal(0, 1, (n, d)).astype(np.float32)]
            ),
        }
    )
    q = rng.normal(0, 1, (3, d))
    outs = []
    for parts in (1, 7):
        ds = ray.data.from_arrow(tab).repartition(parts)
        idx = PQIndex(m=8, ks=16).build(ds)
        rows = idx.search(q, np.arange(3) + 1000, k=5, rerank=2).take_all()
        outs.append(
            sorted((r["query_id"], r["rank"], r["neighbor_id"], r["cosine"])
                   for r in rows)
        )
    assert outs[0] == outs[1]


def test_pq_codes_are_m_bytes(ray_session):
    import ray.data

    from deepseek_ocr_ray.stages.similarity import PQIndex

    rng = np.random.RandomState(1)
    tab = pa.table(
        {
            "vec_id": pa.array(range(50), pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in rng.normal(0, 1, (50, 64)).astype(np.float32)]
            ),
        }
    )
    idx = PQIndex(m=16, ks=32).build(ray.data.from_arrow(tab))
    enc = idx.encoded.take_all()
    assert all(len(r["code"]) == 16 for r in enc)
    with pytest.raises(ValueError, match="not divisible"):
        PQIndex(m=7).build(ray.data.from_arrow(tab))


def test_label_consistency_flags_mislabels(ray_session):
    """Two tight clusters of 8, one vector in cluster A carries cluster
    B's label → its neighbors all disagree (suspect), everyone else's
    neighbors all agree (k=5 < cluster size)."""
    import ray.data

    from deepseek_ocr_ray.stages.similarity import label_consistency

    rng = np.random.RandomState(5)
    a = rng.randn(16).astype(np.float32)
    b = rng.randn(16).astype(np.float32)
    vecs = np.r_[
        [a + 0.01 * rng.randn(16) for _ in range(8)],
        [b + 0.01 * rng.randn(16) for _ in range(8)],
    ].astype(np.float32)
    labels = np.array([0] * 8 + [1] * 8, np.int32)
    labels[3] = 1  # mislabeled: sits in cluster A, tagged B
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(16), pa.int64()),
                "embedding": pa.array(vecs.tolist(), pa.list_(pa.float32())),
                "label": pa.array(labels, pa.int32()),
            }
        )
    ).repartition(3)
    out = label_consistency(ds, k=5).to_pandas().set_index("vec_id")
    assert out.loc[3].suspect == 1 and out.loc[3].n_agree == 0
    clean = out.drop(index=3)
    # cluster A's members see one disagreeing neighbor at most (the
    # mislabeled row sits among their 5-NN); cluster B's see none
    assert (clean.suspect == 0).all()
    assert (clean.loc[8:].n_agree == 5).all()


def test_label_consistency_parallelism_invariant(ray_session):
    import pandas as pd
    import ray.data

    from deepseek_ocr_ray.stages.similarity import label_consistency

    rng = np.random.RandomState(9)
    vecs = rng.randn(30, 8).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(30), pa.int64()),
            "embedding": pa.array(vecs.tolist(), pa.list_(pa.float32())),
            "label": pa.array(rng.randint(0, 3, 30), pa.int32()),
        }
    )
    outs = [
        label_consistency(
            ray.data.from_arrow(tbl).repartition(n), k=7
        ).to_pandas()
        for n in (1, 6)
    ]
    pd.testing.assert_frame_equal(outs[0], outs[1])
