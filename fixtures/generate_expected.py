"""Regenerate the committed expected-output fixtures for the driver oracles.

The LSH dedup family, IVF ANN search, and language-ID have no reasonable
ANSI-SQL equivalent, but they ARE deterministic functions of (corpus, seed):
signatures are seeded, bucket walks sort by id, k-means samples are sorted by
id before init, and kept-set invariance across parallelism levels is tested
in tests/test_dedup.py.  This script runs each such query over the benchmark
SF dirs and commits the results as parquet that the driver's DuckDB oracle
reads back (keyed by a corpus tag computable in SQL: ``sum(n_chars)`` of the
documents table, which uniquely identifies the SF dir).

These fixtures are REGRESSION PINS, not independent derivations: semantic
correctness of the operators is established in the pytest suites against
hand-built corpora (known dup structures, brute-force Jaccard/cosine
oracles, recall bounds); the fixtures extend the driver's hash-equality gate
to the operators whose semantics SQL cannot express.

Run:  python fixtures/generate_expected.py
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
OUT_DIR = os.path.dirname(os.path.abspath(__file__))


def corpus_tag(sf_dir: str) -> int:
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["n_chars"])
    import pyarrow.compute as pc

    return int(pc.sum(t["n_chars"]).as_py())


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(OUT_DIR))
    import __ray_entry__ as e

    q = e.queries()

    kept_rows = {"query": [], "corpus_tag": [], "id": []}
    lang_rows = {"corpus_tag": [], "doc_id": [], "lang_pred": []}
    ivf_rows = []
    pq_rows = []

    for sf_dir in SF_DIRS:
        tag = corpus_tag(sf_dir)

        for name, id_col in [
            ("dedup_minhash", "doc_id"),
            ("dedup_simhash", "doc_id"),
            ("dedup_ngram", "doc_id"),
            ("dedup_embedding", "vec_id"),
            ("dedup_semantic", "vec_id"),
            ("dedup_minhash_incremental", "doc_id"),
            # vectorized-hash sampling paths: kept-id pins for the
            # non-SQL-expressible engine hash
            ("documents_sample_fast", "doc_id"),
            ("documents_sample_by_lang_fast", "doc_id"),
            ("documents_sample_weighted_fast", "doc_id"),
        ]:
            ids = sorted(r[id_col] for r in q[name](sf_dir).take_all())
            kept_rows["query"].extend([name] * len(ids))
            kept_rows["corpus_tag"].extend([tag] * len(ids))
            kept_rows["id"].extend(int(i) for i in ids)
            print(f"{sf_dir} {name}: {len(ids)} kept")

        for r in sorted(
            q["doc_lang_quality"](sf_dir).take_all(), key=lambda r: r["doc_id"]
        ):
            lang_rows["corpus_tag"].append(tag)
            lang_rows["doc_id"].append(int(r["doc_id"]))
            lang_rows["lang_pred"].append(r["lang_pred"])
        print(f"{sf_dir} doc_lang: {len(lang_rows['doc_id'])} total rows")

        ivf = q["ann_ivf"](sf_dir).to_pandas().sort_values(
            ["query_id", "rank"]
        ).reset_index(drop=True)
        ivf.insert(0, "corpus_tag", tag)
        ivf_rows.append(pa.Table.from_pandas(ivf, preserve_index=False))
        print(f"{sf_dir} ann_ivf: {len(ivf)} rows")

        pqr = q["ann_pq"](sf_dir).to_pandas().sort_values(
            ["query_id", "rank"]
        ).reset_index(drop=True)
        pqr.insert(0, "corpus_tag", tag)
        pq_rows.append(pa.Table.from_pandas(pqr, preserve_index=False))
        print(f"{sf_dir} ann_pq: {len(pqr)} rows")

    pq.write_table(
        pa.table(
            {
                "query": pa.array(kept_rows["query"], pa.string()),
                "corpus_tag": pa.array(kept_rows["corpus_tag"], pa.int64()),
                "id": pa.array(kept_rows["id"], pa.int64()),
            }
        ),
        os.path.join(OUT_DIR, "expected_dedup_kept.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "corpus_tag": pa.array(lang_rows["corpus_tag"], pa.int64()),
                "doc_id": pa.array(lang_rows["doc_id"], pa.int64()),
                "lang_pred": pa.array(lang_rows["lang_pred"], pa.string()),
            }
        ),
        os.path.join(OUT_DIR, "expected_doc_lang.parquet"),
    )
    pq.write_table(
        pa.concat_tables(ivf_rows),
        os.path.join(OUT_DIR, "expected_ann_ivf.parquet"),
    )
    pq.write_table(
        pa.concat_tables(pq_rows),
        os.path.join(OUT_DIR, "expected_ann_pq.parquet"),
    )

    # sf-INDEPENDENT deterministic queries (synthetic interleaved corpus /
    # seeded fake codecs): one parquet each, consumed verbatim by the
    # oracle.  extract_summary and extract_spans_flat pin the FLAGSHIP
    # extraction output — the north rule's span-sequence-equality surface —
    # into the driver's hash gate.
    import pandas as pd

    def _to_df(res):
        if hasattr(res, "to_arrow_refs"):
            tables = ray.get(res.to_arrow_refs())
            return pa.concat_tables(tables, promote_options="default")
        if isinstance(res, pa.Table):
            return res
        return pa.Table.from_pandas(res, preserve_index=False)

    static_dir = os.path.join(OUT_DIR, "expected_q")
    os.makedirs(static_dir, exist_ok=True)
    for name in [
        "extract_summary",
        "extract_interleave_stats",
        "extract_spans_flat",
        "extract_then_dedup",
        "multimodal_decode",
        "frame_sample",
        "image_phash",
        "image_phash_dedup",
    ]:
        tbl = _to_df(q[name]("/root/testdata/sf0.001"))
        df = tbl.to_pandas()
        df = df.sort_values(sorted(df.columns)).reset_index(drop=True)
        pq.write_table(
            pa.Table.from_pandas(df, preserve_index=False).cast(tbl.schema),
            os.path.join(static_dir, f"{name}.parquet"),
        )
        print(f"static {name}: {len(df)} rows")

    # sf-DEPENDENT deterministic query with no SQL equivalent
    hll_rows = []
    for sf_dir in SF_DIRS:
        tag = corpus_tag(sf_dir)
        t = _to_df(q["distinct_users_hll"](sf_dir))
        hll_rows.append(
            pa.table(
                {
                    "corpus_tag": pa.array([tag] * t.num_rows, pa.int64()),
                    "approx_distinct": t["approx_distinct"],
                }
            )
        )
        print(f"{sf_dir} distinct_users_hll: {t.to_pydict()}")
    pq.write_table(
        pa.concat_tables(hll_rows),
        os.path.join(OUT_DIR, "expected_distinct_hll.parquet"),
    )

    # per-group HLL (same invariance argument, one row per group)
    ghll_rows = []
    for sf_dir in SF_DIRS:
        tag = corpus_tag(sf_dir)
        t = _to_df(q["users_by_type_hll"](sf_dir))
        ghll_rows.append(
            pa.table(
                {
                    "corpus_tag": pa.array([tag] * t.num_rows, pa.int64()),
                    "event_type": t["event_type"],
                    "approx_distinct": t["approx_distinct"],
                }
            )
        )
        print(f"{sf_dir} users_by_type_hll: {t.num_rows} groups")
    pq.write_table(
        pa.concat_tables(ghll_rows),
        os.path.join(OUT_DIR, "expected_group_hll.parquet"),
    )

    # BPE trainer + encoder (deterministic functions of the corpus word
    # counts; iterative re-segmentation has no ANSI-SQL equivalent —
    # semantics established against a brute-force reference in
    # tests/test_bpe.py)
    bm_rows, be_rows = [], []
    for sf_dir in SF_DIRS:
        tag = corpus_tag(sf_dir)
        t = _to_df(q["bpe_train_merges"](sf_dir))
        bm_rows.append(
            pa.table(
                {
                    "corpus_tag": pa.array([tag] * t.num_rows, pa.int64()),
                    "rank": t["rank"],
                    "left": t["left"],
                    "right": t["right"],
                    "merged": t["merged"],
                    "pair_count": t["pair_count"],
                }
            )
        )
        te = _to_df(q["bpe_encode_stats"](sf_dir))
        be_rows.append(
            pa.table(
                {
                    "corpus_tag": pa.array([tag] * te.num_rows, pa.int64()),
                    "doc_id": te["doc_id"],
                    "n_words": te["n_words"],
                    "n_char_tokens": te["n_char_tokens"],
                    "n_bpe_tokens": te["n_bpe_tokens"],
                }
            )
        )
        print(f"{sf_dir} bpe: {t.num_rows} merges, {te.num_rows} docs")
    pq.write_table(
        pa.concat_tables(bm_rows),
        os.path.join(OUT_DIR, "expected_bpe_merges.parquet"),
    )
    pq.write_table(
        pa.concat_tables(be_rows),
        os.path.join(OUT_DIR, "expected_bpe_encode.parquet"),
    )

    # k-means cluster membership (deterministic build — seeded, sorted
    # sample; membership pinned per cell by count/min/sum of ids)
    ec_rows = []
    for sf_dir in SF_DIRS:
        tag = corpus_tag(sf_dir)
        t = _to_df(q["embedding_clusters"](sf_dir))
        ec_rows.append(
            pa.table(
                {
                    "corpus_tag": pa.array([tag] * t.num_rows, pa.int64()),
                    "cell": t["cell"],
                    "n_vecs": t["n_vecs"],
                    "min_vec_id": t["min_vec_id"],
                    "sum_vec_id": t["sum_vec_id"],
                }
            )
        )
        print(f"{sf_dir} embedding_clusters: {t.num_rows} cells")
    pq.write_table(
        pa.concat_tables(ec_rows),
        os.path.join(OUT_DIR, "expected_embedding_clusters.parquet"),
    )

    # mergeable-sketch queries (DDSketch quantiles, count-min frequencies):
    # deterministic + parallelism-invariant (counter-addition merges), so
    # their outputs pin like the HLL estimate; the error BOUNDS are
    # established in tests/test_sketches.py against exact answers
    qs_rows, cms_rows, gqs_rows = [], [], []
    for sf_dir in SF_DIRS:
        tag = corpus_tag(sf_dir)
        t = _to_df(q["price_quantiles_sketch"](sf_dir))
        qs_rows.append(
            pa.table(
                {
                    "corpus_tag": pa.array([tag] * t.num_rows, pa.int64()),
                    "q": t["q"],
                    "est": t["est"],
                }
            )
        )
        print(f"{sf_dir} price_quantiles_sketch: {t.to_pydict()}")
        t = _to_df(q["value_quantiles_by_type"](sf_dir))
        gqs_rows.append(
            pa.table(
                {
                    "corpus_tag": pa.array([tag] * t.num_rows, pa.int64()),
                    "event_type": t["event_type"],
                    "q": t["q"],
                    "est": t["est"],
                }
            )
        )
        print(f"{sf_dir} value_quantiles_by_type: {t.num_rows} rows")
        t = _to_df(q["token_freq_cms"](sf_dir))
        cms_rows.append(
            pa.table(
                {
                    "corpus_tag": pa.array([tag] * t.num_rows, pa.int64()),
                    "token": t["token"],
                    "n_exact": t["n_exact"],
                    "est_n": t["est_n"],
                }
            )
        )
        print(f"{sf_dir} token_freq_cms: {t.num_rows} probes")
    pq.write_table(
        pa.concat_tables(qs_rows),
        os.path.join(OUT_DIR, "expected_quantile_sketch.parquet"),
    )
    pq.write_table(
        pa.concat_tables(cms_rows),
        os.path.join(OUT_DIR, "expected_token_cms.parquet"),
    )
    pq.write_table(
        pa.concat_tables(gqs_rows),
        os.path.join(OUT_DIR, "expected_group_quantile_sketch.parquet"),
    )

    print("fixtures written to", OUT_DIR)
    ray.shutdown()


if __name__ == "__main__":
    main()
