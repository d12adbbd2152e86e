"""Sequential reference-semantics oracle for the extract pipeline.

An *independent*, deliberately naive single-threaded implementation of the
per-document semantics — plain loops and string accumulation, the way the
reference's ``__main__`` blocks work (DSV/run_dpsk_ocr_pdf.py:288-325) — used
by the e2e tests to check that the distributed pipeline's output matches
under the invariant **span-sequence equality (kind, text, media_ref, order)**
at any parallelism level, block order, or resume point.

It shares only the leaf pure functions (regex/cleaners/stub generator) with
the pipeline; all orchestration (fan-out, ordering, bucketing, assembly) is
re-derived here from first principles.
"""

from __future__ import annotations

import hashlib

from deepseek_ocr_ray.config import PipelineConfig
from deepseek_ocr_ray.functions import html_extract
from deepseek_ocr_ray.functions.grounding import (
    GROUNDING_PATTERN,
    IMAGE_REF_MARK,
    page_spans,
    render_page_markdown,
    strip_eos,
)
from deepseek_ocr_ray.stages.model_stub import (
    generate_page_locate,
    generate_page_markdown,
    generate_page_plain,
)


def _stub_generate(ref: str, cfg: PipelineConfig) -> str:
    """Mirror of StubOcrModel._one's mode dispatch (kept independent here)."""
    if cfg.prompt_mode == "locate":
        return generate_page_locate(ref, cfg.prompt_text.strip())
    if cfg.has_grounding:
        return generate_page_markdown(ref)
    return generate_page_plain(ref)


def extract_doc_oracle(doc: dict, cfg: PipelineConfig | None = None) -> dict:
    """One interleaved document → expected output row, sequentially."""
    cfg = cfg or PipelineConfig()
    spans_out: list[dict] = []
    md = ""
    truncated = False
    errors: list[str] = []

    for span in sorted(doc["spans"], key=lambda s: s["offset"]):
        kind = span["kind"]
        if kind in ("pdf_page", "image"):
            ref = span["media_ref"]
            if not ref.startswith("blob://"):
                errors.append(f"bad media_ref: {ref!r}")
                continue
            raw = _stub_generate(ref, cfg)
            content, had_eos = strip_eos(raw)
            if not had_eos:
                truncated = True
                if cfg.skip_repeat:
                    continue
            if not cfg.has_grounding:
                text = content.strip()
                if text:
                    spans_out.append({"kind": "text", "text": text, "media_ref": ""})
                md += text + cfg.page_split
                continue
            for s in page_spans(content, f"crop://{doc['doc_id']}/{span['offset']}"):
                spans_out.append(
                    {"kind": s.kind, "text": s.text, "media_ref": s.media_ref}
                )
            md += render_page_markdown(content, str(span["offset"])) + cfg.page_split
        elif kind == "html":
            blocks = html_extract.extract_main_content(span["text"])
            for s in blocks:
                spans_out.append(
                    {"kind": s.kind, "text": s.text, "media_ref": s.media_ref}
                )
            frag = html_extract.render_blocks_markdown(blocks)
            if frag:
                md += frag + "\n\n"
        else:
            spans_out.append(
                {"kind": kind, "text": span["text"], "media_ref": span["media_ref"]}
            )
            frag = (
                f"## {span['text']}" if kind == "title" else span["text"]
            )
            if frag:
                md += frag + "\n\n"

    for i, s in enumerate(spans_out):
        s["offset"] = i
    pid = (
        int.from_bytes(hashlib.md5(doc["doc_id"].encode()).digest()[:4], "little")
        % cfg.num_partitions
    )
    return {
        "doc_id": doc["doc_id"],
        "spans": spans_out,
        "markdown": md,
        "n_spans": len(spans_out),
        "truncated": truncated,
        "partition_id": pid,
        "error": "; ".join(errors) if errors else None,
    }
