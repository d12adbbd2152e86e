"""Tests for the n-gram no-repeat processor (T3), artifact renderers
(P11-P13, W3/W5) and file sources (S4-S6)."""

from __future__ import annotations

import zipfile
import io

import pytest

from deepseek_ocr_ray.functions import artifacts as art
from deepseek_ocr_ray.functions.ngram_norepeat import (
    DEFAULT_WHITELIST,
    NoRepeatNGramProcessor,
    PDF_PRESET,
)


# --- ngram no-repeat -------------------------------------------------------


def test_ngram_bans_repeat_completion():
    p = NoRepeatNGramProcessor(ngram_size=3, window_size=10)
    # sequence contains 3-gram (1,2,3); current tail (1,2) → 3 banned
    assert p.banned_tokens([1, 2, 3, 9, 1, 2]) == {3}
    # no prior occurrence of the tail → nothing banned
    assert p.banned_tokens([1, 2, 3, 4, 5, 6]) == set()


def test_ngram_whitelist_never_banned():
    td = next(iter(DEFAULT_WHITELIST))
    p = NoRepeatNGramProcessor(ngram_size=2, window_size=10)
    assert p.banned_tokens([5, td, 7, 5]) == set()  # td whitelisted
    assert p.banned_tokens([5, 6, 7, 5]) == {6}


def test_ngram_window_limits_scan():
    p = NoRepeatNGramProcessor(ngram_size=2, window_size=4)
    # the (1,2) occurrence fell out of the 4-token window
    assert p.banned_tokens([1, 2, 9, 8, 7, 1]) == set()
    p2 = NoRepeatNGramProcessor(ngram_size=2, window_size=10)
    assert p2.banned_tokens([1, 2, 9, 8, 7, 1]) == {2}


def test_ngram_would_loop():
    p = NoRepeatNGramProcessor(**PDF_PRESET)
    loop = list(range(20)) * 3
    assert p.would_loop(loop)
    assert not p.would_loop(list(range(60)))


def test_ngram_validation():
    with pytest.raises(ValueError):
        NoRepeatNGramProcessor(0, 10)
    with pytest.raises(ValueError):
        NoRepeatNGramProcessor(5, 3)


# --- artifacts -------------------------------------------------------------

RAW = (
    "<|ref|>title<|/ref|><|det|>[[10, 10, 500, 60]]<|/det|># Heading\n"
    "<|ref|>text<|/ref|><|det|>[[10, 80, 500, 400], [10, 420, 500, 600]]<|/det|>body\n"
    "<|ref|>image<|/ref|><|det|>[[bad]]<|/det|>\n"
)


def test_render_layout_svg():
    svg = art.render_layout_svg(RAW, 1000, 1000)
    assert svg.startswith("<svg") and svg.endswith("</svg>")
    assert svg.count("<rect") == 3  # 1 title + 2 text boxes; malformed skipped
    assert ">title</text>" in svg and ">text</text>" in svg
    assert art.render_layout_svg(RAW, 1000, 1000) == svg  # deterministic


def test_geometry_parse_and_render():
    txt = "noise {'line_type': 'seg', 'line': [[0, 0, 100, 100]], 'circle': [[50, 50, 10]]} tail"
    g = art.parse_geometry_dict(txt)
    assert g is not None and g["line_type"] == "seg"
    svg = art.render_geometry_svg(g)
    assert "<line" in svg and svg.count("<circle") == 3  # 2 endpoints + 1 circle
    assert art.parse_geometry_dict("no dict here") is None
    assert art.parse_geometry_dict("{'x': __import__}") is None


def test_embed_images_in_markdown():
    md = "before **[图片 1]** mid **[图片 2]** after"
    out = art.embed_images_in_markdown(md, [b"aaa"])
    assert "data:image/png;base64," in out
    assert "**[图片 2]**" in out  # missing image left untouched
    assert "**[图片 1]**" not in out


def test_bundle_zip_deterministic():
    entries = {"b.md": "text", "a/c.svg": b"<svg/>"}
    z1 = art.bundle_zip(entries)
    z2 = art.bundle_zip(dict(reversed(entries.items())))
    assert z1 == z2  # order- and time-independent
    names = zipfile.ZipFile(io.BytesIO(z1)).namelist()
    assert names == ["a/c.svg", "b.md"]


# --- file sources ----------------------------------------------------------


def test_list_images_sorted(tmp_path):
    from deepseek_ocr_ray.sources import files

    for name in ("b.jpg", "a.PNG", "doc.txt", "c.webp"):
        (tmp_path / name).write_bytes(b"x")
    got = [p.rsplit("/", 1)[-1] for p in files.list_images_in_dir(str(tmp_path))]
    assert got == ["a.PNG", "b.jpg", "c.webp"]
    assert files.is_image_file("x.TIFF") and not files.is_image_file("x.pdf")


def test_read_image_dir(ray_session, tmp_path):
    from deepseek_ocr_ray.sources import files

    for i, name in enumerate(("p1.jpg", "p0.jpg")):
        (tmp_path / name).write_bytes(bytes([i]) * 4)
    out = files.read_image_dir(str(tmp_path)).to_pandas().sort_values("doc_id")
    assert out.doc_id.tolist() == ["img-00000000", "img-00000001"]
    assert out.path.iloc[0].endswith("p0.jpg")  # sorted-name order


def test_select_page_range(ray_session):
    import ray.data

    ds = ray.data.from_items([{"unit_id": i} for i in range(10)])
    from deepseek_ocr_ray.sources.files import select_page_range

    got = sorted(
        r["unit_id"]
        for r in select_page_range(ds, 2, 5, n_pages=10).take_all()
    )
    assert got == [1, 2, 3, 4]  # 1-based [2,5] → 0-based [1,4]
    assert select_page_range(ds, 8, 3, n_pages=10).count() == 0


RAW_GROUNDED = (
    "head<|ref|>title<|/ref|><|det|>[[100, 100, 500, 300]]<|/det|>"
    "<|ref|>fig(1)<|/ref|><|det|>[[50, 400, 900, 800]]<|/det|>tail"
)


def test_layouts_pdf_structure():
    from deepseek_ocr_ray.functions.artifacts import render_layouts_pdf

    pdf = render_layouts_pdf([(RAW_GROUNDED, 1024, 768), (RAW_GROUNDED, 800, 600)])
    assert pdf.startswith(b"%PDF-1.4")
    assert pdf.rstrip().endswith(b"%%EOF")
    assert pdf.count(b"/Type /Page ") == 2
    assert b"/MediaBox [0 0 1024 768]" in pdf
    assert b"/MediaBox [0 0 800 600]" in pdf
    # every xref offset must point at its "N 0 obj" header
    tail = pdf[pdf.rindex(b"\nxref\n") + 1 :].decode()
    lines = tail.splitlines()
    n_objs = int(lines[1].split()[1]) - 1
    for i in range(1, n_objs + 1):
        off = int(lines[2 + i].split()[0])
        assert pdf[off:].startswith(f"{i} 0 obj".encode()), f"bad xref for obj {i}"


def test_layouts_pdf_deterministic_and_escaped():
    from deepseek_ocr_ray.functions.artifacts import render_layouts_pdf

    raw = "x<|ref|>we(ird) \\label<|/ref|><|det|>[[0, 0, 100, 100]]<|/det|>"
    a = render_layouts_pdf([(raw, 640, 480)])
    b = render_layouts_pdf([(raw, 640, 480)])
    assert a == b
    assert rb"(we\(ird\) \\label)" in a  # parens/backslash escaped in text op


def test_layouts_pdf_empty_and_malformed():
    from deepseek_ocr_ray.functions.artifacts import render_layouts_pdf

    pdf = render_layouts_pdf([])
    assert pdf.startswith(b"%PDF-1.4") and b"/Count 0" in pdf
    bad = "x<|ref|>l<|/ref|><|det|>not coords<|/det|>"
    pdf2 = render_layouts_pdf([(bad, 100, 100)])
    assert pdf2.count(b"/Type /Page ") == 1  # malformed boxes skipped, page kept
