"""Grounded-markup parsing and text cleaning — the invariant-bearing code.

The DeepSeek-OCR model emits markdown interleaved with grounding markup::

    <|ref|>LABEL<|/ref|><|det|>[[x1,y1,x2,y2],...]<|/det|>content text ...

with coordinates on a 0-999 virtual grid.  Everything here reimplements the
*semantics* of the reference's post-processing chain (studied, not copied):

- span regex / image-vs-other split:  reference ``re_match`` at
  /root/reference/DeepSeek-OCR-master/DeepSeek-OCR-vllm/run_dpsk_ocr_image.py:57-69
- coordinate parse: reference uses ``eval()`` (run_dpsk_ocr_image.py:77), a
  safety hazard — we use ``ast.literal_eval`` with strict shape validation.
- coordinate denormalization: ``int(x/999*width)`` (run_dpsk_ocr_image.py:111-115)
- page markdown cleaning: the loop body of
  /root/reference/DeepSeek-OCR-master/DeepSeek-OCR-vllm/run_dpsk_ocr_pdf.py:292-325
  including its quirks (latex/newline replaces only run when a non-image match
  exists, because they are chained onto the per-match ``str.replace``).
- ``clean_formula``: /root/reference/app/utils.py:85-95
- ``clean_output_text``: /root/reference/app/utils.py:98-127 (first-occurrence
  ``replace(x, y, 1)`` semantics are load-bearing).
- batch-eval extra strips: run_dpsk_ocr_eval_batch.py:168-169
- EOS / SKIP_REPEAT: run_dpsk_ocr_pdf.py:295-299

All functions are pure and operate on plain Python strings; the Ray stages
call them per batch, the test oracle calls them sequentially.
"""

from __future__ import annotations

import ast
import re
from dataclasses import dataclass

GROUNDING_PATTERN = re.compile(
    r"(<\|ref\|>(.*?)<\|/ref\|><\|det\|>(.*?)<\|/det\|>)", re.DOTALL
)
IMAGE_REF_MARK = "<|ref|>image<|/ref|>"
EOS_MARKER = "<｜end▁of▁sentence｜>"


def extract_grounding_references(text: str) -> list[tuple[str, str, str]]:
    """Ordered (full_match, label, coords_str) triples, scan order = reading order."""
    return GROUNDING_PATTERN.findall(text)


def split_refs(text: str) -> tuple[list[tuple[str, str, str]], list[str], list[str]]:
    """(all matches, image full-matches, non-image full-matches)."""
    matches = GROUNDING_PATTERN.findall(text)
    images, others = [], []
    for m in matches:
        (images if IMAGE_REF_MARK in m[0] else others).append(m[0])
    return matches, images, others


def parse_coords(coords_str: str) -> list[list[int]] | None:
    """Parse ``[[x1,y1,x2,y2],...]`` strictly; None on malformed input.

    The reference ``eval()``s the string and silently skips on any exception;
    we match the skip behavior without executing arbitrary code.
    """
    try:
        val = ast.literal_eval(coords_str.strip())
    except (ValueError, SyntaxError, MemoryError, RecursionError):
        return None
    if not isinstance(val, (list, tuple)):
        return None
    out = []
    for box in val:
        if not isinstance(box, (list, tuple)) or len(box) != 4:
            return None
        try:
            out.append([int(v) for v in box])
        except (TypeError, ValueError):
            return None
    return out


def scale_box(box: list[int], width: int, height: int) -> tuple[int, int, int, int]:
    """0-999 virtual grid → pixel box (reference run_dpsk_ocr_image.py:111-115)."""
    x1, y1, x2, y2 = box
    return (
        int(x1 / 999 * width),
        int(y1 / 999 * height),
        int(x2 / 999 * width),
        int(y2 / 999 * height),
    )


def strip_eos(text: str) -> tuple[str, bool]:
    """Remove the EOS marker; second value True iff it was present.

    A missing marker means generation ran to max_tokens repeating
    (reference run_dpsk_ocr_pdf.py:295-299: page dropped when SKIP_REPEAT).
    """
    if EOS_MARKER in text:
        return text.replace(EOS_MARKER, ""), True
    return text, False


def _latex_newline_chain(s: str) -> str:
    """The replace chain the reference appends after every non-image removal."""
    return (
        s.replace("\\coloneqq", ":=")
        .replace("\\eqqcolon", "=:")
        .replace("\n\n\n\n", "\n\n")
        .replace("\n\n\n", "\n\n")
    )


def render_page_markdown(content: str, page_idx_name: str) -> str:
    """Clean one page's raw output into markdown, reference-pdf semantics.

    ``content`` must already have EOS stripped.  Image markups become
    ``![](images/{page_idx_name}_{idx}.jpg)\\n`` (idx = image order on page);
    other markups are removed; the latex/newline chain is applied once per
    removed non-image markup (reference quirk: zero non-image matches ⇒ no
    normalization at all).  Mirrors run_dpsk_ocr_pdf.py:316-320.
    """
    _, images, others = split_refs(content)
    for idx, m in enumerate(images):
        content = content.replace(m, f"![](images/{page_idx_name}_{idx}.jpg)\n")
    for m in others:
        content = _latex_newline_chain(content.replace(m, ""))
    return content


@dataclass
class Span:
    kind: str
    text: str
    media_ref: str
    offset: int = -1

    def as_dict(self) -> dict:
        return {
            "kind": self.kind,
            "text": self.text,
            "media_ref": self.media_ref,
            "offset": self.offset,
        }


def page_spans(content: str, crop_key_prefix: str) -> list[Span]:
    """Extract the ordered span sequence from one page's raw output.

    ``content`` must already have EOS stripped.  For each grounding markup in
    scan order: an image ref becomes ``Span('image', '', crop_key)`` where
    crop_key = f"{crop_key_prefix}/{img_idx}" (img_idx counts image refs on
    this page — the deterministic analog of the reference's crop filenames
    images/{page}_{idx}.jpg, run_dpsk_ocr_pdf.py:189-196); any other ref
    becomes ``Span(label, segment, '')`` where segment is the text between
    this markup and the next (or end of page), passed through the latex
    replacements, newline collapse and ``.strip()``.  Text before the first
    markup belongs to no span (the model's grammar opens with a ref).
    Offsets are assigned later, over the whole document.
    """
    spans: list[Span] = []
    matches = list(GROUNDING_PATTERN.finditer(content))
    img_idx = 0
    for i, m in enumerate(matches):
        seg_end = matches[i + 1].start() if i + 1 < len(matches) else len(content)
        if IMAGE_REF_MARK in m.group(1):
            spans.append(Span("image", "", f"{crop_key_prefix}/{img_idx}"))
            img_idx += 1
        else:
            segment = content[m.end(): seg_end]
            spans.append(Span(m.group(2), _latex_newline_chain(segment).strip(), ""))
    return spans


def clean_formula(text: str) -> str:
    """Drop ``\\quad (tag)`` equation tags inside display formulas.

    Semantics of /root/reference/app/utils.py:85-95.
    """
    def _one(m: re.Match) -> str:
        formula = re.sub(r"\\quad\s*\([^)]*\)", "", m.group(1))
        return r"\[" + formula.strip() + r"\]"

    return re.sub(r"\\\[(.*?)\\\]", _one, text, flags=re.DOTALL)


def clean_output_text(
    text: str, include_images: bool = False, remove_labels: bool = False
) -> str:
    """Three-way markup rewrite for UI text display.

    Semantics of /root/reference/app/utils.py:98-127: image refs become a
    numbered placeholder (or are dropped); non-image refs keep their label
    text or are dropped; each replacement is first-occurrence-only; trailing
    EOS marker removed; result stripped.
    """
    if not text:
        return ""
    matches = GROUNDING_PATTERN.findall(text)
    img_num = 0
    for m in matches:
        if IMAGE_REF_MARK in m[0]:
            if include_images:
                text = text.replace(m[0], f"\n\n**[图片 {img_num + 1}]**\n\n", 1)
                img_num += 1
            else:
                text = text.replace(m[0], "", 1)
        else:
            text = text.replace(m[0], "" if remove_labels else m[1], 1)
    return text.replace(EOS_MARKER, "").strip()


def clean_batch_eval_text(content: str) -> str:
    """Batch-eval mode page clean: clean_formula, strip markup, literal
    ``\\n`` collapse and ``<center>`` removal.

    Semantics of run_dpsk_ocr_eval_batch.py:160-169 (note: the reference
    collapses the two-character literal backslash-n sequences, not newlines).
    """
    content = clean_formula(content)
    matches = GROUNDING_PATTERN.findall(content)
    for m in matches:
        content = (
            content.replace(m[0], "")
            .replace("\\n\\n\\n\\n", "\\n\\n")
            .replace("\\n\\n\\n", "\\n\\n")
            .replace("<center>", "")
            .replace("</center>", "")
        )
    return content
