"""Arrow schemas of the engine + deterministic synthetic interleaved corpus.

The input table shape is the BASELINE.json ``input_hint``:

    doc_id: string
    spans:  list<struct<kind:string, text:large_string,
                        media_ref:string, offset:int32>>

The output table adds the extracted span sequence (reading order), the
rendered markdown, and bookkeeping columns.  The reference has no schema
system at all (SURVEY.md §1) — Python lists of PIL images and dicts — so
these schemas are original to this engine.

The synthetic generator stands in for the 10^12-row production corpus: it is
seed-deterministic *per document* (``doc_id`` alone determines content), so any
partitioning / parallelism / resume order produces byte-identical documents.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.large_string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)

IN_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_STRUCT)),
    ]
)

OUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_STRUCT)),
        ("markdown", pa.large_string()),
        ("n_spans", pa.int32()),
        ("truncated", pa.bool_()),
        ("partition_id", pa.int32()),
        ("error", pa.string()),
    ]
)

# word soup vocabulary for synthetic text content (mirrors the style of the
# driver-generated documents table so text-analysis ops see similar input)
_VOCAB = (
    "the quick data engine span table figure title page image layout text "
    "document markdown header footer nav aside article section column row "
    "formula grounding reference batch stream arrow block shuffle actor"
).split()

TEXTUAL_KINDS = ("text", "title", "table", "figure")
MEDIA_KINDS = ("pdf_page", "image")


def doc_seed(doc_id: str, seed: int) -> int:
    """Stable 32-bit seed from (doc_id, corpus seed) — md5, not hash()."""
    h = hashlib.md5(f"{seed}:{doc_id}".encode()).digest()
    return int.from_bytes(h[:4], "little")


def _words(rng: np.random.RandomState, n: int) -> str:
    return " ".join(_VOCAB[i] for i in rng.randint(0, len(_VOCAB), n))


def _make_html(rng: np.random.RandomState, doc_id: str, offset: int) -> str:
    """A small DOM page: main article + boilerplate (nav/footer/ads/sidebar)."""
    n_paras = int(rng.randint(1, 5))
    paras = "".join(
        f"<p>{_words(rng, int(rng.randint(20, 60)))}</p>" for _ in range(n_paras)
    )
    img = (
        f'<p><img src="blob://{doc_id}/{offset}/inline{int(rng.randint(0, 9))}"/></p>'
        if rng.rand() < 0.3
        else ""
    )
    title = _words(rng, int(rng.randint(2, 6)))
    nav = "".join(f"<li><a href='/x{i}'>nav {i}</a></li>" for i in range(5))
    ads = "<div class='ad'>buy now click here subscribe</div>" * int(rng.randint(0, 3))
    return (
        "<html><head><title>t</title></head><body>"
        f"<nav><ul>{nav}</ul></nav>"
        f"<div id='sidebar'><ul><li>related</li><li>links</li></ul></div>{ads}"
        f"<article><h1>{title}</h1>{paras}{img}</article>"
        "<footer>copyright 2026 · privacy · terms</footer>"
        "</body></html>"
    )


def gen_doc(i: int, seed: int = 42) -> dict:
    """One synthetic interleaved document; pure function of (i, seed).

    Distribution per FIXTURES.md F1: span counts 1-64 with a heavy tail of
    media-heavy docs (50-200 media spans, ~2% of docs) to exercise skew
    handling; ~1% zero-span docs; ~1% malformed media_ref.
    """
    doc_id = f"doc-{i:08d}"
    rng = np.random.RandomState(doc_seed(doc_id, seed))
    r = rng.rand()
    if r < 0.01:
        n_spans = 0
    elif r < 0.03:  # media-heavy tail
        n_spans = int(rng.randint(50, 201))
    else:
        n_spans = int(rng.randint(1, 65))

    spans = []
    for off in range(n_spans):
        kr = rng.rand()
        # media-heavy docs are mostly pages
        if n_spans >= 50:
            kind = "pdf_page" if kr < 0.8 else ("image" if kr < 0.9 else "text")
        elif kr < 0.45:
            kind = "text"
        elif kr < 0.60:
            kind = "html"
        elif kr < 0.75:
            kind = "pdf_page"
        elif kr < 0.85:
            kind = "image"
        elif kr < 0.90:
            kind = "title"
        elif kr < 0.95:
            kind = "table"
        else:
            kind = "figure"

        if kind in MEDIA_KINDS:
            ref = f"blob://{doc_id}/{off}"
            if rng.rand() < 0.01:  # malformed media_ref
                ref = f"blob:/broken/{off}"
            spans.append(
                {"kind": kind, "text": "", "media_ref": ref, "offset": off}
            )
        elif kind == "html":
            spans.append(
                {
                    "kind": "html",
                    "text": _make_html(rng, doc_id, off),
                    "media_ref": "",
                    "offset": off,
                }
            )
        else:
            spans.append(
                {
                    "kind": kind,
                    "text": _words(rng, int(rng.randint(4, 40))),
                    "media_ref": "",
                    "offset": off,
                }
            )
    return {"doc_id": doc_id, "spans": spans}


def synthesize_interleaved(n_docs: int, seed: int = 42, start: int = 0) -> pa.Table:
    """Deterministic interleaved corpus slice [start, start+n_docs) as Arrow."""
    rows = [gen_doc(i, seed) for i in range(start, start + n_docs)]
    return pa.Table.from_pylist(rows, schema=IN_SCHEMA)


def write_interleaved(
    out_dir: str, n_docs: int, seed: int = 42, num_partitions: int = 8
) -> list[str]:
    """Write the corpus as one parquet dir per hash partition (resumable layout).

    ``part={pid}/data.parquet`` where pid = i % num_partitions over doc index —
    a stand-in for Lance fragment layout (lance is not installed in this
    sandbox; the reader falls back to parquet transparently).
    """
    import os

    import pyarrow.parquet as pq

    paths = []
    for pid in range(num_partitions):
        ids = range(pid, n_docs, num_partitions)
        rows = [gen_doc(i, seed) for i in ids]
        tbl = pa.Table.from_pylist(rows, schema=IN_SCHEMA)
        d = os.path.join(out_dir, f"part={pid}")
        os.makedirs(d, exist_ok=True)
        p = os.path.join(d, "data.parquet")
        pq.write_table(tbl, p)
        paths.append(p)
    return paths
