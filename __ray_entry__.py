"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship extraction pipeline over the deterministic
synthetic interleaved corpus (BASELINE.json ``input_hint`` schema).
``queries()`` exposes one callable per implemented operator family from
SURVEY.md §2 plus the training-data-curation operators (dedup, similarity
search, text analysis, multimodal plumbing); ``oracle_sql()`` carries the
DuckDB-equivalent SQL for every SQL-expressible entry (column names match
exactly; measures are integerized — cents / basis points — so sums compare
bit-exactly).  Non-SQL-expressible ops (the stub-OCR extraction pipeline,
LSH dedup decisions, language ID, multimodal decode) are rows-only checks;
their semantics are covered by the pytest oracle-equality suite instead.

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa

from deepseek_ocr_ray.functions.html_extract import extract_main_content
from deepseek_ocr_ray.functions.text_stats import BPE_PATTERN, stopword_sql_list
from deepseek_ocr_ray.pipelines import analytics
from deepseek_ocr_ray.pipelines.extract import extract_dataset
from deepseek_ocr_ray.sources.interleaved import synthetic_dataset
from deepseek_ocr_ray.stages import dedup, multimodal, similarity, windows

# corpus size for the synthetic interleaved extraction queries (the input
# table of the north rule; sf-independent because the driver tables carry no
# interleaved corpus — see deepseek_ocr_ray/schema.py)
N_EXTRACT_DOCS = 400


def entry() -> Any:
    """Flagship: synthetic interleaved corpus → full extraction pipeline."""
    ds = synthetic_dataset(200, seed=42)
    out = extract_dataset(ds)
    return out.select_columns(
        ["doc_id", "n_spans", "truncated", "partition_id", "error"]
    )


# ---------------------------------------------------------------------------
# query callables
# ---------------------------------------------------------------------------


def _extract_summary(sf_dir: str) -> Any:
    out = extract_dataset(synthetic_dataset(N_EXTRACT_DOCS, seed=42))

    def summarize(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_spans": batch["n_spans"],
                "truncated": batch["truncated"].cast(pa.int32()),
                "md_chars": pc.utf8_length(batch["markdown"]).cast(pa.int64()),
                "has_error": pc.is_valid(batch["error"]).cast(pa.int32()),
            }
        )

    return out.map_batches(summarize, batch_format="pyarrow")


def _extract_spans_flat(sf_dir: str) -> Any:
    """Flattened span sequences — the per-row invariant surface
    (kind, text, media_ref, order) of the north rule."""
    out = extract_dataset(synthetic_dataset(N_EXTRACT_DOCS, seed=42))

    def flatten(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        spans = batch["spans"]
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        parent = pc.list_parent_indices(spans)
        flat = pc.list_flatten(spans)
        doc_ids = batch["doc_id"]
        if isinstance(doc_ids, pa.ChunkedArray):
            doc_ids = doc_ids.combine_chunks()
        return pa.table(
            {
                "doc_id": doc_ids.take(parent),
                "offset": flat.field("offset"),
                "kind": flat.field("kind"),
                "text": flat.field("text").cast(pa.string()),
                "media_ref": flat.field("media_ref"),
            }
        )

    return out.map_batches(flatten, batch_format="pyarrow")


_HTML_TMPL = (
    "<html><head><title>x</title></head><body>"
    "<nav><ul><li><a href='/a'>home</a></li><li><a href='/b'>about</a></li></ul></nav>"
    "<div class='sidebar'><ul><li>related links</li></ul></div>"
    "<div class='ad'>buy now click here</div>"
    "<article><p>{text}</p></article>"
    "<footer>copyright 2026 privacy terms</footer>"
    "</body></html>"
)


def _html_main_text(sf_dir: str) -> Any:
    """Wrap each document text in boilerplate HTML; the extractor must
    recover exactly the article text (SQL oracle: the raw text column)."""
    ds = analytics.read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        main = []
        for t in texts:
            spans = extract_main_content(_HTML_TMPL.format(text=t))
            main.append(" ".join(s.text for s in spans if s.kind == "text"))
        return pa.table({"doc_id": batch["doc_id"], "main_text": pa.array(main, pa.string())})

    return ds.map_batches(fn, batch_format="pyarrow")


def _dedup_exact(sf_dir: str) -> Any:
    ds = analytics.read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return dedup.exact_dedup(ds)


def _dedup_minhash(sf_dir: str) -> Any:
    ds = analytics.read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return dedup.minhash_dedup(ds, threshold=0.8)


def _dedup_simhash(sf_dir: str) -> Any:
    ds = analytics.read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return dedup.simhash_dedup(ds, max_hamming=3)


def _dedup_ngram(sf_dir: str) -> Any:
    ds = analytics.read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return dedup.ngram_jaccard_dedup(ds, ngram=3, threshold=0.8)


def _dedup_incremental(sf_dir: str) -> Any:
    """Incremental ingest filter: split documents at the id midpoint —
    the lower half is the 'existing' corpus, the upper half the 'new'
    crawl — and keep only new docs whose exact text is unseen."""
    ds = analytics.read_table(sf_dir, "documents", columns=["doc_id", "text"])
    cut = (ds.max("doc_id") + 1) // 2
    existing = ds.filter(expr=f"doc_id < {cut}")
    new = ds.filter(expr=f"doc_id >= {cut}")
    return dedup.incremental_exact_dedup(new, existing)


DEDUP_INCREMENTAL_SQL = """
WITH cut AS (
  SELECT CAST(floor((max(doc_id)+1)/2.0) AS BIGINT) AS c FROM documents
)
SELECT d.doc_id
FROM documents d, cut
WHERE d.doc_id >= cut.c
  AND NOT EXISTS (
    SELECT 1 FROM documents e, cut WHERE e.doc_id < cut.c AND e.text = d.text
  )
ORDER BY doc_id
"""


def _dedup_ngram_join(sf_dir: str) -> Any:
    """The 10^12-row plan (candidate pairs → text join → anti-join); must
    keep exactly the same ids as the carry-text plan, so it shares the
    dedup_ngram fixture oracle."""
    ds = analytics.read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return dedup.ngram_jaccard_dedup(ds, ngram=3, threshold=0.8, verify="join")


def _dedup_embedding(sf_dir: str) -> Any:
    ds = analytics.read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return dedup.embedding_dedup(ds, threshold=0.3)


def _embedding_dup_pairs(sf_dir: str) -> Any:
    ds = analytics.read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return dedup.embedding_dup_pairs_brute(ds, threshold=0.3)


def _load_queries(sf_dir: str, n: int = 8) -> tuple[np.ndarray, np.ndarray]:
    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    mask = np.asarray(t["vec_id"].to_pylist()) < n
    vecs = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)[mask]
    ids = np.asarray(t["vec_id"].to_pylist())[mask]
    return vecs, ids


def _ann_topk(sf_dir: str) -> Any:
    ds = analytics.read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    q, qids = _load_queries(sf_dir)
    return similarity.brute_force_topk(ds, q, qids, k=10, dtype=np.float64)


def _ann_ivf(sf_dir: str) -> Any:
    ds = analytics.read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    q, qids = _load_queries(sf_dir)
    idx = similarity.IVFIndex(n_cells=16).build(ds)
    return idx.search(q, qids, k=10, nprobe=4)


def _multimodal_decode(sf_dir: str) -> Any:
    import ray.data

    tbl = multimodal.synthesize_media_table(256, seed=42)
    ds = ray.data.from_arrow(tbl)
    decoded = ds.map_batches(
        multimodal.DecodeImageStage, batch_format="pyarrow",
        batch_size=32, concurrency=2,
    )
    resized = decoded.map_batches(
        multimodal.ResizeStage, fn_constructor_kwargs={"target": 1024},
        batch_format="pyarrow", concurrency=2,
    )
    return resized.select_columns(
        ["media_id", "width", "height", "resized_w", "resized_h"]
    )


def _frame_sample(sf_dir: str) -> Any:
    import ray.data

    tbl = multimodal.synthesize_media_table(128, seed=7).select(
        ["media_id", "media_ref"]
    )
    ds = ray.data.from_arrow(tbl)
    frames = ds.map_batches(
        multimodal.FrameSampleStage,
        fn_constructor_kwargs={"stride": 10, "max_frames": 32},
        batch_format="pyarrow", concurrency=2,
    )
    return frames


def _extract_then_dedup(sf_dir: str) -> Any:
    """Composition: extraction feeding curation — near-dedup the EXTRACTED
    markdown of the interleaved corpus (the end-to-end training-data shape:
    raw docs → extract → dedup)."""
    # two actor pools share one pipeline here: cap both so their combined
    # MINIMUM reservation leaves CPUs for the task stages — otherwise the
    # streaming executor deadlocks on a small cluster (each pool holding
    # actors, task operators starved of slots)
    from deepseek_ocr_ray.config import PipelineConfig

    cfg = PipelineConfig(ocr_concurrency=2)
    out = extract_dataset(synthetic_dataset(N_EXTRACT_DOCS, seed=42), cfg)
    docs = out.select_columns(["doc_id", "markdown"])
    return dedup.minhash_dedup(
        docs, text_col="markdown", id_col="doc_id", threshold=0.9,
        concurrency=(1, 4),
    )


def _events_asof_orders(sf_dir: str) -> Any:
    """As-of join: each event picks the user's latest order at-or-before the
    event time; ties within a (custkey, date) resolve to max orderkey via
    the join's ``right_tiebreak`` (same semantics as pre-deduping the right
    side with groupby+Max, without that aggregate's extra all-to-all)."""
    from deepseek_ocr_ray.stages.joins import asof_join

    events = analytics.read_table(
        sf_dir, "events", columns=["event_id", "user_id", "ts"]
    )
    orders = analytics.read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )
    joined = asof_join(
        events,
        orders,
        left_key="user_id",
        right_key="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        left_cols=["event_id", "user_id"],
        right_cols=["o_orderkey"],
        right_tiebreak="o_orderkey",
    )
    return joined


def _distinct_users_exact(sf_dir: str) -> Any:
    from deepseek_ocr_ray.stages.sketches import exact_distinct

    ds = analytics.read_table(sf_dir, "events", columns=["user_id"])
    return exact_distinct(ds, "user_id")


def _distinct_users_hll(sf_dir: str) -> Any:
    """HyperLogLog approximate distinct (rows-only check: the estimate is
    deterministic and parallelism-invariant — register merges are exact —
    but approximate by construction; error bound tested in
    tests/test_sketches.py)."""
    from deepseek_ocr_ray.stages.sketches import hll_distinct

    ds = analytics.read_table(sf_dir, "events", columns=["user_id"])
    return hll_distinct(ds, "user_id")


def _events_value_bands(sf_dir: str) -> Any:
    """Range join: events (value × 20) against per-brand retail-price bands
    [min, max] — one-to-many interval matching via band-partitioning."""
    from ray.data.aggregate import Max as RMax, Min as RMin

    from deepseek_ocr_ray.stages.joins import range_join

    events = analytics.read_table(sf_dir, "events", columns=["event_id", "value"])

    def scale(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False) * 20.0
        return pa.table(
            {"event_id": batch["event_id"], "value20": pa.array(v, pa.float64())}
        )

    left = events.map_batches(scale, batch_format="pyarrow")
    bands = (
        analytics.read_table(sf_dir, "part", columns=["p_brand", "p_retailprice"])
        .groupby("p_brand")
        .aggregate(RMin("p_retailprice"), RMax("p_retailprice"))
        .rename_columns(
            {"min(p_retailprice)": "lo", "max(p_retailprice)": "hi"}
        )
    )
    # domain of the scaled left values: events.value ∈ (0, 500] → ×20
    return range_join(
        left,
        bands,
        left_val="value20",
        right_lo="lo",
        right_hi="hi",
        left_cols=["event_id"],
        right_cols=["p_brand"],
        domain=(0.0, 10000.0),
    )


def _sessionize(sf_dir: str) -> Any:
    ds = analytics.read_table(sf_dir, "events", columns=["user_id", "ts"])
    return windows.sessionize(ds, gap_sec=1800.0)


def _events_rolling7(sf_dir: str) -> Any:
    """Sliding-window aggregate: trailing-7-day event count + value sum per
    (event_type, day)."""
    ds = analytics.read_table(sf_dir, "events", columns=["event_type", "ts", "value"])
    return windows.sliding_window_daily(ds, window_days=7)


def _events_topk(sf_dir: str) -> Any:
    ds = analytics.read_table(
        sf_dir, "events", columns=["event_type", "value", "event_id"]
    )
    return windows.grouped_topk(
        ds, group_col="event_type", value_col="value", id_col="event_id", k=3
    )


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # --- extraction (north rule; verified by pytest span equality) ---
        "extract_summary": _extract_summary,
        "extract_spans_flat": _extract_spans_flat,
        "html_main_text": _html_main_text,
        # --- text analysis ---
        "doc_token_stats": analytics.doc_token_stats,
        "doc_fingerprint": analytics.doc_fingerprints,
        "doc_lang_quality": analytics.doc_lang_quality,
        "chunk_documents": analytics.chunk_documents,
        "documents_sample_by_lang": analytics.documents_sample_by_lang,
        "pack_documents": analytics.pack_documents,
        "token_vocab": analytics.token_vocab,
        "lang_source_stats": analytics.lang_source_stats,
        # --- dedup family ---
        "dedup_exact": _dedup_exact,
        "dedup_minhash": _dedup_minhash,
        "dedup_simhash": _dedup_simhash,
        "dedup_ngram": _dedup_ngram,
        "dedup_ngram_join": _dedup_ngram_join,
        "dedup_incremental": _dedup_incremental,
        "dedup_embedding": _dedup_embedding,
        "embedding_dup_pairs": _embedding_dup_pairs,
        "extract_then_dedup": _extract_then_dedup,
        # --- similarity search ---
        "ann_topk": _ann_topk,
        "ann_ivf": _ann_ivf,
        # --- relational / wide ops ---
        "q1_pricing": analytics.q1_pricing,
        "top_orders": analytics.top_orders,
        "events_daily": analytics.events_daily,
        "cust_nation_counts": analytics.cust_nation_counts,
        "orders_by_segment": analytics.orders_by_segment,
        "q3_shipping": analytics.q3_shipping,
        "part_type_stats": analytics.part_type_stats,
        "customers_without_orders": analytics.customers_without_orders,
        "suppliers_with_lineitems": analytics.suppliers_with_lineitems,
        "priority_price_quantiles": analytics.priority_price_quantiles,
        "documents_sample": analytics.documents_sample,
        # --- event-stream windows / temporal joins ---
        "sessionize": _sessionize,
        "events_topk": _events_topk,
        "events_rolling7": _events_rolling7,
        "events_asof_orders": _events_asof_orders,
        "events_value_bands": _events_value_bands,
        "distinct_users_exact": _distinct_users_exact,
        "distinct_users_hll": _distinct_users_hll,
        # --- multimodal plumbing (fake codecs, real dataflow) ---
        "multimodal_decode": _multimodal_decode,
        "frame_sample": _frame_sample,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles (keys must match queries(); omitted keys → rows-only check)
# ---------------------------------------------------------------------------

_SW = stopword_sql_list()
# BPE pattern with SQL-escaped quotes
_BPE_SQL = BPE_PATTERN.replace("'", "''")

DOC_TOKEN_STATS_SQL = f"""
WITH t AS (
  SELECT doc_id,
         length(text) AS n_chars,
         len(regexp_extract_all(text, '\\S+')) AS n_tokens,
         len(regexp_extract_all(text, '{_BPE_SQL}')) AS n_tokens_bpe,
         len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct,
         len(list_filter(string_split_regex(lower(text), '\\s+'),
                         w -> list_contains({_SW}, w))) AS n_stopwords
  FROM documents
)
SELECT doc_id, n_chars, n_tokens, n_tokens_bpe, n_punct, n_stopwords,
  CASE WHEN n_tokens BETWEEN 5 AND 100000 THEN 1 ELSE 0 END AS flag_len,
  CASE WHEN n_tokens > 0
         AND (n_chars - GREATEST(n_tokens - 1, 0))::DOUBLE / GREATEST(n_tokens, 1)
             BETWEEN 2.0 AND 12.0
       THEN 1 ELSE 0 END AS flag_word_len,
  CASE WHEN n_chars > 0 AND n_punct::DOUBLE / n_chars <= 0.2
       THEN 1 ELSE 0 END AS flag_punct,
  CASE WHEN n_stopwords >= 1 THEN 1 ELSE 0 END AS flag_stop,
  (CASE WHEN n_tokens BETWEEN 5 AND 100000 THEN 1 ELSE 0 END
   + CASE WHEN n_tokens > 0
            AND (n_chars - GREATEST(n_tokens - 1, 0))::DOUBLE / GREATEST(n_tokens, 1)
                BETWEEN 2.0 AND 12.0
          THEN 1 ELSE 0 END
   + CASE WHEN n_chars > 0 AND n_punct::DOUBLE / n_chars <= 0.2
          THEN 1 ELSE 0 END
   + CASE WHEN n_stopwords >= 1 THEN 1 ELSE 0 END) AS quality_passes
FROM t ORDER BY doc_id
"""

# ---------------------------------------------------------------------------
# fixture oracles (regression pins)
#
# The LSH dedup family, IVF search, and language-ID are deterministic
# functions of (corpus, seed) but have no ANSI-SQL equivalent.  Their
# expected outputs are generated by fixtures/generate_expected.py, committed
# as parquet keyed by a corpus tag computable in SQL (sum(n_chars) of the
# documents table uniquely identifies the SF dir), and read back by the
# oracle.  These pin exact outputs so regressions surface in the driver's
# hash gate; SEMANTIC correctness of the operators is established in the
# pytest suites (hand-built dup corpora, brute-force Jaccard/cosine oracles,
# parallelism invariance, recall bounds).
# ---------------------------------------------------------------------------

_FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
_CORPUS_TAG_SQL = "(SELECT CAST(sum(n_chars) AS BIGINT) FROM documents)"


def _kept_fixture_sql(name: str, out_col: str) -> str:
    return f"""
SELECT k.id AS {out_col}
FROM read_parquet('{_FIXTURES}/expected_dedup_kept.parquet') k
WHERE k.query = '{name}' AND k.corpus_tag = {_CORPUS_TAG_SQL}
ORDER BY {out_col}
"""


def _static_fixture_sql(name: str) -> str:
    """sf-independent deterministic queries (synthetic corpus / seeded fake
    codecs): the oracle reads the committed expected table verbatim.  For
    extract_summary / extract_spans_flat this puts the FLAGSHIP extraction
    output — the north rule's span-sequence-equality surface — under the
    driver's hash gate."""
    return f"SELECT * FROM read_parquet('{_FIXTURES}/expected_q/{name}.parquet')"


DISTINCT_HLL_FIXTURE_SQL = f"""
SELECT CAST(approx_distinct AS BIGINT) AS approx_distinct
FROM read_parquet('{_FIXTURES}/expected_distinct_hll.parquet')
WHERE corpus_tag = {_CORPUS_TAG_SQL}
"""


ANN_IVF_FIXTURE_SQL = f"""
SELECT query_id, neighbor_id, "rank", cosine
FROM read_parquet('{_FIXTURES}/expected_ann_ivf.parquet')
WHERE corpus_tag = {_CORPUS_TAG_SQL}
ORDER BY query_id, "rank"
"""

DOC_LANG_QUALITY_SQL = f"""
WITH t AS (
  SELECT doc_id, lang,
         length(text) AS n_chars,
         len(regexp_extract_all(text, '\\S+')) AS n_tokens,
         len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct,
         len(list_filter(string_split_regex(lower(text), '\\s+'),
                         w -> list_contains({_SW}, w))) AS n_stopwords
  FROM documents
)
SELECT t.doc_id, k.lang_pred,
  (CASE WHEN n_tokens BETWEEN 5 AND 100000 THEN 1 ELSE 0 END
   + CASE WHEN n_tokens > 0
            AND (n_chars - GREATEST(n_tokens - 1, 0))::DOUBLE / GREATEST(n_tokens, 1)
                BETWEEN 2.0 AND 12.0
          THEN 1 ELSE 0 END
   + CASE WHEN n_chars > 0 AND n_punct::DOUBLE / n_chars <= 0.2
          THEN 1 ELSE 0 END
   + CASE WHEN n_stopwords >= 1 THEN 1 ELSE 0 END) AS quality_passes,
  t.lang AS lang_declared
FROM t
JOIN read_parquet('{_FIXTURES}/expected_doc_lang.parquet') k
  ON t.doc_id = k.doc_id AND k.corpus_tag = {_CORPUS_TAG_SQL}
ORDER BY t.doc_id
"""


ANN_TOPK_SQL = """
WITH q AS (
  SELECT vec_id AS qid, embedding::DOUBLE[] AS qe
  FROM embeddings WHERE vec_id < 8
), s AS (
  SELECT q.qid, e.vec_id AS nid,
         list_cosine_similarity(q.qe, e.embedding::DOUBLE[]) AS c
  FROM q, embeddings e WHERE e.vec_id <> q.qid
)
SELECT qid AS query_id, nid AS neighbor_id,
       CAST(row_number() OVER (PARTITION BY qid ORDER BY c DESC, nid) AS INTEGER) AS rank,
       ROUND(c, 6) AS cosine
FROM s QUALIFY rank <= 10 ORDER BY query_id, rank
"""

EMBEDDING_PAIRS_SQL = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
FROM embeddings a JOIN embeddings b ON b.vec_id > a.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.3
ORDER BY 1, 2
"""


SESSIONIZE_SQL = """
WITH o AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts - lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS brk
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), s AS (
  SELECT user_id, ts,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS session_no
  FROM o
)
SELECT user_id, CAST(session_no AS BIGINT) AS session_no, count(*) AS n_events,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end
FROM s GROUP BY 1, 2 ORDER BY 1, 2
"""

EVENTS_TOPK_SQL = """
SELECT event_type, value, event_id,
       CAST(row_number() OVER (PARTITION BY event_type
                               ORDER BY value DESC, event_id) AS INTEGER) AS rank
FROM events QUALIFY rank <= 3 ORDER BY event_type, rank
"""


EVENTS_ASOF_SQL = """
WITH r AS (
  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
  FROM orders GROUP BY 1, 2
)
SELECT e.event_id, e.user_id, r.o_orderkey
FROM events e ASOF JOIN r
  ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate
ORDER BY e.event_id
"""


def oracle_sql() -> dict[str, str]:
    return {
        "sessionize": SESSIONIZE_SQL,
        "events_topk": EVENTS_TOPK_SQL,
        "events_rolling7": """
WITH d AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, count(*) AS n,
         sum(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) AS cents
  FROM events GROUP BY 1, 2
)
SELECT event_type, day,
       CAST(sum(n) OVER w AS BIGINT) AS w_events,
       CAST(sum(cents) OVER w AS BIGINT) AS w_value_cents
FROM d
WINDOW w AS (PARTITION BY event_type ORDER BY CAST(day AS DATE)
             RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
ORDER BY 1, 2
""",
        "events_asof_orders": EVENTS_ASOF_SQL,
        "distinct_users_exact": (
            "SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct "
            "FROM events"
        ),
        "extract_summary": _static_fixture_sql("extract_summary"),
        "extract_spans_flat": _static_fixture_sql("extract_spans_flat"),
        "extract_then_dedup": _static_fixture_sql("extract_then_dedup"),
        "multimodal_decode": _static_fixture_sql("multimodal_decode"),
        "frame_sample": _static_fixture_sql("frame_sample"),
        "distinct_users_hll": DISTINCT_HLL_FIXTURE_SQL,
        "dedup_minhash": _kept_fixture_sql("dedup_minhash", "doc_id"),
        "dedup_simhash": _kept_fixture_sql("dedup_simhash", "doc_id"),
        "dedup_ngram": _kept_fixture_sql("dedup_ngram", "doc_id"),
        "dedup_ngram_join": _kept_fixture_sql("dedup_ngram", "doc_id"),
        "dedup_incremental": DEDUP_INCREMENTAL_SQL,
        "dedup_embedding": _kept_fixture_sql("dedup_embedding", "vec_id"),
        "ann_ivf": ANN_IVF_FIXTURE_SQL,
        "doc_lang_quality": DOC_LANG_QUALITY_SQL,
        "chunk_documents": analytics.CHUNK_DOCUMENTS_SQL,
        "documents_sample_by_lang": analytics.DOCUMENTS_SAMPLE_BY_LANG_SQL,
        "pack_documents": analytics.PACK_DOCUMENTS_SQL,
        "token_vocab": analytics.TOKEN_VOCAB_SQL,
        "events_value_bands": (
            "WITH bands AS (SELECT p_brand, min(p_retailprice) AS lo, "
            "max(p_retailprice) AS hi FROM part GROUP BY 1) "
            "SELECT e.event_id, b.p_brand FROM events e JOIN bands b "
            "ON e.value*20 BETWEEN b.lo AND b.hi ORDER BY 1, 2"
        ),
        "html_main_text": (
            "SELECT doc_id, trim(regexp_replace(text, '\\s+', ' ', 'g')) AS main_text "
            "FROM documents ORDER BY doc_id"
        ),
        "doc_token_stats": DOC_TOKEN_STATS_SQL,
        "doc_fingerprint": (
            "SELECT doc_id, md5(text) AS fingerprint_md5 FROM documents ORDER BY doc_id"
        ),
        "lang_source_stats": (
            "SELECT lang, source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars "
            "FROM documents GROUP BY 1, 2 ORDER BY 1, 2"
        ),
        "dedup_exact": (
            "SELECT md5(text) AS text_hash, min(doc_id) AS doc_id, "
            "count(*) AS dup_count FROM documents GROUP BY 1 ORDER BY 1"
        ),
        "embedding_dup_pairs": EMBEDDING_PAIRS_SQL,
        "ann_topk": ANN_TOPK_SQL,
        "q1_pricing": analytics.Q1_SQL,
        "top_orders": analytics.TOP_ORDERS_SQL,
        "events_daily": analytics.EVENTS_DAILY_SQL,
        "cust_nation_counts": analytics.CUST_NATION_SQL,
        "orders_by_segment": analytics.ORDERS_BY_SEGMENT_SQL,
        "q3_shipping": analytics.Q3_SQL,
        "part_type_stats": analytics.PART_TYPE_SQL,
        "customers_without_orders": analytics.CUSTOMERS_WITHOUT_ORDERS_SQL,
        "suppliers_with_lineitems": analytics.SUPPLIERS_WITH_LINEITEMS_SQL,
        "priority_price_quantiles": analytics.PRIORITY_QUANTILES_SQL,
        "documents_sample": analytics.DOCUMENTS_SAMPLE_SQL,
    }
