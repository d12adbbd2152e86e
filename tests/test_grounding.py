"""Unit tests for grounded-markup parsing and cleaners (SURVEY.md §2.4 P1-P10).

Fixtures are hand-written strings in the reference output grammar
(FIXTURES.md F2); expected values derived by reading the reference's
post-processing code, not by running it.
"""

import pytest

from deepseek_ocr_ray.functions.grounding import (
    EOS_MARKER,
    clean_batch_eval_text,
    clean_formula,
    clean_output_text,
    extract_grounding_references,
    page_spans,
    parse_coords,
    render_page_markdown,
    scale_box,
    split_refs,
    strip_eos,
)

T = "<|ref|>title<|/ref|><|det|>[[100, 50, 900, 120]]<|/det|># Heading\n\n"
X = "<|ref|>text<|/ref|><|det|>[[100, 150, 900, 400]]<|/det|>body words here\n\n"
I = "<|ref|>image<|/ref|><|det|>[[50, 430, 500, 800]]<|/det|>\n"
MULTI = "<|ref|>text<|/ref|><|det|>[[1, 2, 3, 4], [5, 6, 7, 8]]<|/det|>two boxes\n\n"


def test_extract_refs_order_and_groups():
    refs = extract_grounding_references(T + X + I)
    assert [r[1] for r in refs] == ["title", "text", "image"]
    assert refs[0][2] == "[[100, 50, 900, 120]]"
    # full match is group 1 (used for str.replace)
    assert refs[2][0].startswith("<|ref|>image<|/ref|>")


def test_split_refs_image_vs_other():
    matches, images, others = split_refs(T + I + X)
    assert len(matches) == 3
    assert len(images) == 1 and "image" in images[0]
    assert len(others) == 2


def test_dotall_multiline_coords():
    s = "<|ref|>text<|/ref|><|det|>[[1, 2,\n 3, 4]]<|/det|>x"
    refs = extract_grounding_references(s)
    assert len(refs) == 1
    assert parse_coords(refs[0][2]) == [[1, 2, 3, 4]]


@pytest.mark.parametrize(
    "s,expected",
    [
        ("[[1, 2, 3, 4]]", [[1, 2, 3, 4]]),
        ("[[1, 2, 3, 4], [5, 6, 7, 8]]", [[1, 2, 3, 4], [5, 6, 7, 8]]),
        ("[[12, 34, 56]]", None),  # truncated box
        ("[[a, b, c, d]]", None),  # non-numeric
        ("not coords", None),
        ("[]", []),
        ("[[1,2,3,4],]", [[1, 2, 3, 4]]),
    ],
)
def test_parse_coords_safe(s, expected):
    assert parse_coords(s) == expected


def test_parse_coords_never_executes():
    assert parse_coords("__import__('os').system('true')") is None


def test_scale_box_matches_reference_math():
    # int(x/999*w) semantics from run_dpsk_ocr_image.py:111-115
    assert scale_box([0, 0, 999, 999], 640, 480) == (0, 0, 640, 480)
    assert scale_box([500, 500, 999, 999], 999, 999) == (500, 500, 999, 999)
    assert scale_box([333, 100, 666, 200], 100, 50) == (33, 5, 66, 10)


def test_strip_eos_and_flag():
    assert strip_eos("abc" + EOS_MARKER) == ("abc", True)
    assert strip_eos("abc") == ("abc", False)


def test_render_page_markdown_image_substitution():
    md = render_page_markdown(T + I + X, "7")
    assert "![](images/7_0.jpg)\n" in md
    assert "<|ref|>" not in md
    assert "# Heading" in md and "body words here" in md


def test_render_page_markdown_newline_quirk():
    # latex/newline chain only runs when a non-image match exists (run_dpsk_ocr_pdf.py:319)
    only_image = I + "\n\n\n\ntail"
    assert "\n\n\n\n" in render_page_markdown(only_image, "0")
    with_text = X + "\n\n\n\ntail \\coloneqq x"
    out = render_page_markdown(with_text, "0")
    assert "\n\n\n\n" not in out and ":=" in out and "\\coloneqq" not in out


def test_page_spans_sequence():
    spans = page_spans(T + X + I + MULTI, "crop://d/3")
    assert [(s.kind, s.media_ref) for s in spans] == [
        ("title", ""),
        ("text", ""),
        ("image", "crop://d/3/0"),
        ("text", ""),
    ]
    assert spans[0].text == "# Heading"
    assert spans[1].text == "body words here"
    assert spans[3].text == "two boxes"


def test_page_spans_image_indexing():
    spans = page_spans(I + X + I, "crop://d/0")
    imgs = [s for s in spans if s.kind == "image"]
    assert [s.media_ref for s in imgs] == ["crop://d/0/0", "crop://d/0/1"]


def test_page_spans_cleaning():
    s = "<|ref|>text<|/ref|><|det|>[[1,2,3,4]]<|/det|>a \\coloneqq b\n\n\n\nc"
    spans = page_spans(s, "p")
    assert spans[0].text == "a := b\n\nc"


def test_clean_formula():
    s = r"pre \[ E = mc^2 \quad (3) \] post"
    assert clean_formula(s) == r"pre \[E = mc^2\] post"
    assert clean_formula(r"\[ x + y \]") == r"\[x + y\]"
    assert clean_formula("no formula") == "no formula"


def test_clean_output_text_modes():
    s = T + I + X + EOS_MARKER
    # default: images dropped, labels replaced by label text
    out = clean_output_text(s)
    assert "image" not in out and "# Heading" in out
    assert out.startswith("title")  # label kept in place of markup
    # include_images: numbered placeholder
    out2 = clean_output_text(s, include_images=True)
    assert "**[图片 1]**" in out2
    # remove_labels: all markup gone
    out3 = clean_output_text(s, remove_labels=True)
    assert "title" not in out3 and "# Heading" in out3
    assert EOS_MARKER not in out3


def test_clean_output_text_first_occurrence_only():
    dup = X + X  # identical markup twice — each replace consumes one
    out = clean_output_text(dup, remove_labels=True)
    assert "<|ref|>" not in out


def test_clean_batch_eval_text():
    s = (
        "<center>mid</center>"
        + X
        + r"\[ f \quad (1) \]"
        + "a\\n\\n\\n\\nb"
    )
    out = clean_batch_eval_text(s)
    assert "<center>" not in out and "</center>" not in out
    assert "\\quad" not in out
    assert "\\n\\n\\n\\n" not in out and "a\\n\\nb" in out
    assert "<|ref|>" not in out
