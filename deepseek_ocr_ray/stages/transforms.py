"""Stateless batch transforms of the extract pipeline.

- ``explode_docs``: document rows → one row per input span ("unit"), the
  fan-out that equalizes work units before the OCR stage (the reference fans
  a PDF out to pages up front, DSV/run_dpsk_ocr_pdf.py:247; here it is a
  vectorized Arrow list-flatten so a 200-page doc and 200 one-page docs cost
  the same downstream).  Zero-span docs keep a sentinel row so every doc_id
  reaches the output.
- ``parse_units``: per-unit extraction — grounded-markup span parse + cleaners
  for OCR'd media units (reference P1-P10 semantics, see functions/grounding),
  DOM text-density extraction for html units, passthrough for textual units.
  Emits parallel list columns (sub_kinds/sub_texts/sub_refs) plus the unit's
  markdown fragment, so reassembly is pure column concatenation.

Ordering is carried by keys ``(doc_id, unit_id)``, never by block order
(the reference relies on submission-order zip, run_dpsk_ocr_pdf.py:292 —
see SURVEY.md §2.5).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..config import PipelineConfig
from ..functions import html_extract
from ..functions.grounding import Span, page_spans, render_page_markdown, strip_eos
from ..schema import MEDIA_KINDS  # single source of truth for media kinds
TEXTUAL_MD = {"title": "## {t}", "text": "{t}", "table": "{t}", "figure": "{t}"}
SENTINEL_KIND = "__empty__"

UNIT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("unit_id", pa.int32()),
        ("kind", pa.string()),
        ("text", pa.large_string()),
        ("media_ref", pa.string()),
        # total units of this doc (sentinel counts as 1) — lets per-block
        # assembly DETECT a document split across blocks instead of silently
        # emitting partial rows (exchange="none" safety check)
        ("n_units", pa.int32()),
    ]
)


def explode_docs(batch: pa.Table) -> pa.Table:
    """doc rows → unit rows, vectorized via Arrow list flatten."""
    spans = batch["spans"]
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    doc_ids = batch["doc_id"]
    if isinstance(doc_ids, pa.ChunkedArray):
        doc_ids = doc_ids.combine_chunks()

    parent = pc.list_parent_indices(spans)
    flat = pc.list_flatten(spans)
    unit_doc = doc_ids.take(parent)
    lengths = pc.fill_null(pc.list_value_length(spans), 0)
    out = pa.table(
        {
            "doc_id": unit_doc,
            "unit_id": flat.field("offset"),
            "kind": flat.field("kind"),
            "text": flat.field("text").cast(pa.large_string()),
            "media_ref": flat.field("media_ref"),
            "n_units": lengths.take(parent),
        }
    )

    empty_mask = pc.equal(lengths, 0)
    if pc.any(empty_mask).as_py():
        empty_ids = pc.filter(doc_ids, empty_mask)
        n = len(empty_ids)
        sentinel = pa.table(
            {
                "doc_id": empty_ids,
                "unit_id": pa.array([0] * n, pa.int32()),
                "kind": pa.array([SENTINEL_KIND] * n),
                "text": pa.array([""] * n, pa.large_string()),
                "media_ref": pa.array([""] * n),
                "n_units": pa.array([1] * n, pa.int32()),
            }
        )
        out = pa.concat_tables([out.cast(UNIT_SCHEMA), sentinel.cast(UNIT_SCHEMA)])
    else:
        out = out.cast(UNIT_SCHEMA)
    return out


def parse_media_unit(
    raw_text: str, doc_id: str, unit_id: int, skip_repeat: bool,
    has_grounding: bool = True,
) -> tuple[list, str, bool, bool]:
    """One OCR'd page → (spans, markdown fragment, truncated, skipped).

    EOS present: strip it, parse spans in scan order, render the page
    markdown with deterministic crop keys ``crop://{doc_id}/{unit_id}/{i}``
    (the parallelism- and resume-stable analog of the reference's
    ``images/{jdx}_{idx}.jpg`` crop naming, run_dpsk_ocr_pdf.py:316).
    EOS absent (repetition ran to max_tokens): with skip_repeat the page
    contributes nothing — not even a page split — exactly like the
    reference's ``continue`` (run_dpsk_ocr_pdf.py:295-299); without it the
    page is processed as-is but flagged truncated.
    """
    content, had_eos = strip_eos(raw_text)
    if not had_eos and skip_repeat:
        return [], "", True, True
    if not has_grounding:
        # non-grounding prompt modes (Free OCR / Describe / Parse Figure)
        # emit plain text: the page is one text span, markdown is the text
        text = content.strip()
        spans = [Span("text", text, "")] if text else []
        return spans, text, not had_eos, False
    spans = page_spans(content, f"crop://{doc_id}/{unit_id}")
    fragment = render_page_markdown(content, str(unit_id))
    return spans, fragment, not had_eos, False


def parse_units(batch: pa.Table, *, config: PipelineConfig | None = None) -> pa.Table:
    """Per-unit extraction for every kind; adds sub-span list columns."""
    cfg = config or PipelineConfig()
    kinds = batch["kind"].to_pylist()
    texts = batch["text"].to_pylist()
    refs = batch["media_ref"].to_pylist()
    raws = batch["raw_text"].to_pylist() if "raw_text" in batch.column_names else [None] * len(kinds)
    errs = (
        batch["unit_error"].to_pylist()
        if "unit_error" in batch.column_names
        else [None] * len(kinds)
    )
    doc_ids = batch["doc_id"].to_pylist()
    unit_ids = batch["unit_id"].to_pylist()

    sub_kinds: list[list[str]] = []
    sub_texts: list[list[str]] = []
    sub_refs: list[list[str]] = []
    fragments: list[str] = []
    truncated: list[bool] = []
    is_page: list[bool] = []

    skip_repeat = cfg.skip_repeat
    has_grounding = cfg.has_grounding  # property: resolve once, not per row
    for i, kind in enumerate(kinds):
        trunc = False
        page = False
        if errs[i] is not None or kind == SENTINEL_KIND:
            ks, ts, rs, frag = [], [], [], ""
        elif kind in MEDIA_KINDS:
            spans, frag, trunc, skipped = parse_media_unit(
                raws[i] or "", doc_ids[i], unit_ids[i], skip_repeat,
                has_grounding,
            )
            page = not skipped
            ks = [s.kind for s in spans]
            ts = [s.text for s in spans]
            rs = [s.media_ref for s in spans]
        elif kind == "html":
            spans = html_extract.extract_main_content(texts[i])
            ks = [s.kind for s in spans]
            ts = [s.text for s in spans]
            rs = [s.media_ref for s in spans]
            frag = html_extract.render_blocks_markdown(spans)
        else:  # textual passthrough: text / title / table / figure
            ks, ts, rs = [kind], [texts[i]], [refs[i]]
            frag = TEXTUAL_MD.get(kind, "{t}").format(t=texts[i])
        sub_kinds.append(ks)
        sub_texts.append(ts)
        sub_refs.append(rs)
        fragments.append(frag)
        truncated.append(trunc)
        is_page.append(page)

    keep = ["doc_id", "unit_id", "kind", "n_units"]
    if "vision_tokens" in batch.column_names:
        keep.append("vision_tokens")
    out = batch.select([c for c in keep if c in batch.column_names])
    return (
        out.append_column("sub_kinds", pa.array(sub_kinds, pa.list_(pa.string())))
        .append_column("sub_texts", pa.array(sub_texts, pa.list_(pa.large_string())))
        .append_column("sub_refs", pa.array(sub_refs, pa.list_(pa.string())))
        .append_column("fragment", pa.array(fragments, pa.large_string()))
        .append_column("truncated", pa.array(truncated, pa.bool_()))
        .append_column("is_page", pa.array(is_page, pa.bool_()))
        .append_column(
            "unit_error",
            pa.array(errs, pa.string()),
        )
    )
