"""Document reassembly — the pipeline's one wide (shuffle) step.

The reference reassembles pages by positional zip in submission order
(DSV/run_dpsk_ocr_pdf.py:292); a distributed pipeline cannot rely on order,
so units carry ``(doc_id, unit_id)`` and are reassembled by key.

Scale design: instead of ``groupby("doc_id")`` (one Python call per document,
10^12 tiny groups), units are grouped by a **stable hash bucket** of doc_id
(``assembly_bucket``), so the shuffle has a bounded number of groups and each
group assembles many documents in one vectorized pass.  A document's units
always land in the same bucket, so no second-level merge is needed; the
bucket count is the knob that trades shuffle-group size vs parallelism.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

from ..config import PipelineConfig
from ..schema import OUT_SCHEMA
from .transforms import MEDIA_KINDS, SENTINEL_KIND


def stable_bucket(doc_ids: list[str], n_buckets: int) -> list[int]:
    """md5-based bucket — stable across processes/parallelism (Python's
    ``hash`` is salted per process and must never partition data)."""
    return [
        int.from_bytes(hashlib.md5(d.encode()).digest()[:4], "little") % n_buckets
        for d in doc_ids
    ]


def add_bucket(batch: pa.Table, *, n_buckets: int) -> pa.Table:
    return batch.append_column(
        "assembly_bucket",
        pa.array(stable_bucket(batch["doc_id"].to_pylist(), n_buckets), pa.int32()),
    )


def assemble_bucket(group: pa.Table, *, config: PipelineConfig) -> pa.Table:
    """Assemble every document in one bucket: sort by (doc_id, unit_id),
    walk group boundaries, emit one output row per doc.

    Markdown convention: an OCR'd page contributes its cleaned markdown plus
    the page split marker (appended after *each* page, reference
    run_dpsk_ocr_pdf.py:302-304); skipped (no-EOS) pages and quarantined
    units contribute nothing — not even a split; textual/html units
    contribute their fragment + a blank line.
    """
    g = group.sort_by([("doc_id", "ascending"), ("unit_id", "ascending")])
    doc_ids = g["doc_id"].to_pylist()
    n_units = (
        g["n_units"].to_pylist() if "n_units" in g.column_names else None
    )
    kinds = g["kind"].to_pylist()
    sub_kinds = g["sub_kinds"].to_pylist()
    sub_texts = g["sub_texts"].to_pylist()
    sub_refs = g["sub_refs"].to_pylist()
    fragments = g["fragment"].to_pylist()
    truncs = g["truncated"].to_pylist()
    is_page = g["is_page"].to_pylist()
    errs = g["unit_error"].to_pylist()
    n = len(doc_ids)

    out_rows: list[dict] = []
    i = 0
    split = config.page_split
    n_parts = config.num_partitions
    while i < n:
        j = i
        doc = doc_ids[i]
        spans: list[dict] = []
        md_parts: list[str] = []
        truncated = False
        doc_errs: list[str] = []
        off = 0
        while j < n and doc_ids[j] == doc:
            if errs[j] is not None:
                doc_errs.append(errs[j])
            elif kinds[j] != SENTINEL_KIND:
                for k, t, r in zip(sub_kinds[j], sub_texts[j], sub_refs[j]):
                    spans.append({"kind": k, "text": t, "media_ref": r, "offset": off})
                    off += 1
                if is_page[j]:
                    md_parts.append(fragments[j] + split)
                elif kinds[j] in MEDIA_KINDS:
                    pass  # skipped page: contributes nothing
                elif fragments[j]:
                    md_parts.append(fragments[j] + "\n\n")
            truncated = truncated or truncs[j]
            j += 1
        if n_units is not None and (j - i) != n_units[i]:
            # a doc's units straddled a block boundary (possible only in
            # exchange="none" when Ray splits an oversized output block) —
            # fail loudly instead of silently emitting partial documents
            raise ValueError(
                f"assembly saw {j - i}/{n_units[i]} units of doc {doc!r}: "
                "a document split across blocks; rerun with "
                "exchange='salted' (or 'groupby'), or raise "
                "DataContext.target_max_block_size / shrink input blocks"
            )
        pid = (
            int.from_bytes(hashlib.md5(doc.encode()).digest()[:4], "little") % n_parts
        )
        out_rows.append(
            {
                "doc_id": doc,
                "spans": spans,
                "markdown": "".join(md_parts),
                "n_spans": off,
                "truncated": truncated,
                "partition_id": pid,
                "error": "; ".join(doc_errs) if doc_errs else None,
            }
        )
        i = j
    return pa.Table.from_pylist(out_rows, schema=OUT_SCHEMA)


# ---------------------------------------------------------------------------
# salted two-level assembly (media-heavy skew)
# ---------------------------------------------------------------------------


def add_salted_bucket(
    batch: pa.Table, *, n_buckets: int, salt_span: int
) -> pa.Table:
    """Bucket by (doc_id, salt) where salt = unit_id // salt_span.

    An oversized document's units spread across ceil(n_units/salt_span)
    buckets, so no single assembly group is ever larger than ~salt_span
    units per doc — the skew defusal of SURVEY.md §4.  Order survives
    because salt is monotone in unit_id.
    """
    doc_ids = batch["doc_id"].to_pylist()
    unit_ids = batch["unit_id"].to_pylist()
    salts = [u // salt_span for u in unit_ids]
    buckets = [
        int.from_bytes(
            hashlib.md5(f"{d}#{s}".encode()).digest()[:4], "little"
        )
        % n_buckets
        for d, s in zip(doc_ids, salts)
    ]
    return batch.append_column(
        "salt", pa.array(salts, pa.int32())
    ).append_column("assembly_bucket", pa.array(buckets, pa.int32()))


def assemble_salted_partials(group: pa.Table, *, config: PipelineConfig) -> pa.Table:
    """Level 1: assemble each (doc_id, salt) slice into one partial row.

    Same unit-contribution rules as ``assemble_bucket`` but emits parallel
    list columns + the markdown slice, keyed (doc_id, salt), with NO offsets
    yet (assigned at merge, level 2).
    """
    g = group.sort_by(
        [("doc_id", "ascending"), ("salt", "ascending"), ("unit_id", "ascending")]
    )
    doc_ids = g["doc_id"].to_pylist()
    salts = g["salt"].to_pylist()
    kinds = g["kind"].to_pylist()
    sub_kinds = g["sub_kinds"].to_pylist()
    sub_texts = g["sub_texts"].to_pylist()
    sub_refs = g["sub_refs"].to_pylist()
    fragments = g["fragment"].to_pylist()
    truncs = g["truncated"].to_pylist()
    is_page = g["is_page"].to_pylist()
    errs = g["unit_error"].to_pylist()
    n = len(doc_ids)
    split = config.page_split

    out: list[dict] = []
    i = 0
    while i < n:
        j = i
        doc, salt = doc_ids[i], salts[i]
        ks: list[str] = []
        ts: list[str] = []
        rs: list[str] = []
        md_parts: list[str] = []
        truncated = False
        doc_errs: list[str] = []
        while j < n and doc_ids[j] == doc and salts[j] == salt:
            if errs[j] is not None:
                doc_errs.append(errs[j])
            elif kinds[j] != SENTINEL_KIND:
                ks.extend(sub_kinds[j])
                ts.extend(sub_texts[j])
                rs.extend(sub_refs[j])
                if is_page[j]:
                    md_parts.append(fragments[j] + split)
                elif kinds[j] in MEDIA_KINDS:
                    pass
                elif fragments[j]:
                    md_parts.append(fragments[j] + "\n\n")
            truncated = truncated or truncs[j]
            j += 1
        out.append(
            {
                "doc_id": doc,
                "salt": salt,
                "p_kinds": ks,
                "p_texts": ts,
                "p_refs": rs,
                "p_markdown": "".join(md_parts),
                "p_truncated": truncated,
                "p_errors": doc_errs,
            }
        )
        i = j
    return pa.Table.from_pylist(out, schema=_PARTIAL_SCHEMA)


_PARTIAL_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("salt", pa.int32()),
        ("p_kinds", pa.list_(pa.string())),
        ("p_texts", pa.list_(pa.large_string())),
        ("p_refs", pa.list_(pa.string())),
        ("p_markdown", pa.large_string()),
        ("p_truncated", pa.bool_()),
        ("p_errors", pa.list_(pa.string())),
    ]
)


def add_doc_bucket(batch: pa.Table, *, n_buckets: int) -> pa.Table:
    return batch.append_column(
        "merge_bucket",
        pa.array(stable_bucket(batch["doc_id"].to_pylist(), n_buckets), pa.int32()),
    )


def merge_salted_partials(group: pa.Table, *, config: PipelineConfig) -> pa.Table:
    """Level 2: merge a doc's partials (sorted by salt) into the final row —
    identical output to the unsalted paths.  The shuffle here carries one
    small row per (doc, salt), not per unit."""
    g = group.sort_by([("doc_id", "ascending"), ("salt", "ascending")])
    doc_ids = g["doc_id"].to_pylist()
    ks = g["p_kinds"].to_pylist()
    ts = g["p_texts"].to_pylist()
    rs = g["p_refs"].to_pylist()
    mds = g["p_markdown"].to_pylist()
    truncs = g["p_truncated"].to_pylist()
    errls = g["p_errors"].to_pylist()
    n = len(doc_ids)
    n_parts = config.num_partitions

    out_rows: list[dict] = []
    i = 0
    while i < n:
        j = i
        doc = doc_ids[i]
        spans: list[dict] = []
        md_parts: list[str] = []
        truncated = False
        doc_errs: list[str] = []
        off = 0
        while j < n and doc_ids[j] == doc:
            for k, t, r in zip(ks[j], ts[j], rs[j]):
                spans.append({"kind": k, "text": t, "media_ref": r, "offset": off})
                off += 1
            md_parts.append(mds[j])
            truncated = truncated or truncs[j]
            doc_errs.extend(errls[j])
            j += 1
        pid = (
            int.from_bytes(hashlib.md5(doc.encode()).digest()[:4], "little") % n_parts
        )
        out_rows.append(
            {
                "doc_id": doc,
                "spans": spans,
                "markdown": "".join(md_parts),
                "n_spans": off,
                "truncated": truncated,
                "partition_id": pid,
                "error": "; ".join(doc_errs) if doc_errs else None,
            }
        )
        i = j
    return pa.Table.from_pylist(out_rows, schema=OUT_SCHEMA)
