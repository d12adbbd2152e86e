"""TF-IDF search (pipelines/curation.search_tfidf)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from deepseek_ocr_ray.pipelines.curation import search_tfidf


def _write_docs(tmp_path, texts):
    import pyarrow.parquet as pq

    tab = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(tab, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _naive(texts, terms, k, scale=1_000_000):
    n = len(texts)
    toks = [t.lower().split() for t in texts]
    df = {q: sum(1 for d in toks if q in d) for q in terms}
    idf = {q: (n * scale) // df[q] if df[q] else 0 for q in terms}
    scores = []
    for i, d in enumerate(toks):
        s = sum(d.count(q) * idf[q] for q in terms)
        if s > 0:
            scores.append((i, s))
    scores.sort(key=lambda r: (-r[1], r[0]))
    return scores[:k]


def test_search_tfidf_vs_naive(ray_session, tmp_path):
    texts = [
        "alpha beta gamma",
        "beta beta delta",
        "gamma gamma gamma beta",
        "delta epsilon",
        "zeta eta",
    ]
    sf = _write_docs(tmp_path, texts)
    got = search_tfidf(sf, terms=["beta", "gamma"], k=3).take_all()
    want = _naive(texts, ["beta", "gamma"], 3)
    assert [(r["doc_id"], r["score"]) for r in got] == want


def test_search_tfidf_rare_term_outranks_common(ray_session, tmp_path):
    # 'rare' appears once; 'common' in every doc — one 'rare' hit must
    # outrank any number of 'common' hits (IDF of an everywhere-term is
    # the SCALE floor)
    texts = ["common rare", "common common common common", "common"]
    sf = _write_docs(tmp_path, texts)
    got = search_tfidf(sf, terms=["common", "rare"], k=1).take_all()
    assert got[0]["doc_id"] == 0


def test_search_tfidf_absent_term_and_k_overrun(ray_session, tmp_path):
    texts = ["a b", "c d"]
    sf = _write_docs(tmp_path, texts)
    got = search_tfidf(sf, terms=["zzz"], k=5).take_all()
    assert got == []
    got = search_tfidf(sf, terms=["a"], k=50).take_all()
    assert [r["doc_id"] for r in got] == [0]


def test_search_tfidf_block_invariance(ray_session, tmp_path):
    rng = np.random.RandomState(7)
    vocab = ["w%d" % i for i in range(30)]
    texts = [
        " ".join(rng.choice(vocab, rng.randint(3, 25)))
        for _ in range(200)
    ]
    sf = _write_docs(tmp_path, texts)
    want = _naive(texts, ["w1", "w2", "w7"], 10)
    got = search_tfidf(sf, terms=["w1", "w2", "w7"], k=10).take_all()
    assert [(r["doc_id"], r["score"]) for r in got] == want
