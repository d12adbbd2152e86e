"""hybrid_search_rrf: fusion invariants + determinism at sf0.001."""

from __future__ import annotations

import pyarrow as pa

from deepseek_ocr_ray.pipelines.curation import hybrid_search_rrf

SF = "/root/testdata/sf0.001"


def test_rrf_fusion_invariants():
    t = hybrid_search_rrf(SF)
    assert isinstance(t, pa.Table)
    assert t.column_names == ["doc_id", "bm25_rank", "ann_rank", "rrf_ppm"]
    bm = t["bm25_rank"].to_pylist()
    an = t["ann_rank"].to_pylist()
    rrf = t["rrf_ppm"].to_pylist()
    # every row comes from at least one leg, and each leg's present ranks
    # are a prefix-permutation 1..m of its top list
    assert all(b > 0 or a > 0 for b, a in zip(bm, an))
    for leg in (bm, an):
        present = sorted(r for r in leg if r)
        assert present == list(range(1, len(present) + 1))
    # the fused score is exactly the integer RRF of the two ranks
    for b, a, s in zip(bm, an, rrf):
        want = (1_000_000 // (60 + b) if b else 0) + (
            1_000_000 // (60 + a) if a else 0
        )
        assert s == want
    # both legs contribute ≤ k = 10 rows, union bounded by 20
    assert sum(1 for b in bm if b) <= 10
    assert sum(1 for a in an if a) <= 10
    assert t.num_rows <= 20


def test_rrf_deterministic_rerun():
    a = hybrid_search_rrf(SF)
    b = hybrid_search_rrf(SF)
    assert a.equals(b)
