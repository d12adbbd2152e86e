"""HTML boilerplate stripping fixtures (FIXTURES.md F3, north-rule addition)."""

from deepseek_ocr_ray.functions.html_extract import (
    extract_main_content,
    render_blocks_markdown,
)

PAGE = """
<html><head><title>site</title><style>.x{}</style></head><body>
<nav><ul><li><a href="/">home</a></li><li><a href="/b">blog</a></li></ul></nav>
<div id="sidebar"><ul><li><a href="/x">related one</a></li></ul></div>
<div class="ad">BUY NOW amazing deal click here subscribe today</div>
<article>
  <h1>The Real Title</h1>
  <p>First paragraph of the actual article content with enough words to
     dominate the text density scoring of the page overall.</p>
  <p>Second paragraph continues the main content here with yet more
     meaningful prose so density wins decisively.</p>
  <p><img src="blob://d/1/pic"/></p>
  <table><tr><th>a</th><th>b</th></tr><tr><td>1</td><td>2</td></tr></table>
  <h2>Subsection</h2>
  <p>Closing paragraph.</p>
</article>
<div class="comments"><p>first!!! great post</p><p>spam spam</p></div>
<footer>copyright 2026 · privacy · terms</footer>
</body></html>
"""


def test_main_content_order_and_kinds():
    spans = extract_main_content(PAGE)
    kinds = [s.kind for s in spans]
    assert kinds == ["title", "text", "text", "image", "table", "title", "text"]
    assert spans[0].text == "The Real Title"
    assert spans[3].media_ref == "blob://d/1/pic"
    assert spans[4].text == "a | b\n1 | 2"
    assert spans[5].text == "Subsection"


def test_boilerplate_dropped():
    text = " ".join(s.text for s in extract_main_content(PAGE))
    for bad in ("BUY NOW", "first!!!", "copyright", "home", "related one"):
        assert bad not in text


def test_empty_and_degenerate_pages():
    assert extract_main_content("") == []
    assert extract_main_content("<html><body></body></html>") == []
    spans = extract_main_content("just plain text, no markup")
    assert len(spans) == 1 and spans[0].kind == "text"


def test_malformed_html_recovers():
    spans = extract_main_content("<body><p>unclosed para <b>bold<p>next</body>")
    texts = [s.text for s in spans]
    assert any("unclosed para" in t for t in texts)
    assert any("next" in t for t in texts)


def test_no_article_falls_back_to_densest_div():
    page = (
        "<body><div class='x'><p>short</p></div>"
        "<div class='y'><p>this longer division clearly carries the real "
        "payload of the page with many words</p><p>and a second paragraph "
        "too</p></div></body>"
    )
    spans = extract_main_content(page)
    assert any("real payload" in s.text for s in spans)
    assert not any(s.text == "short" for s in spans)


def test_link_density_penalizes_link_farms():
    page = (
        "<body><div><a href='/1'>one two three four five six seven</a>"
        "<a href='/2'>eight nine ten eleven twelve thirteen</a></div>"
        "<div><p>modest but genuine prose content here</p></div></body>"
    )
    spans = extract_main_content(page)
    assert any("genuine prose" in s.text for s in spans)


def test_markdown_render():
    spans = extract_main_content(PAGE)
    md = render_blocks_markdown(spans)
    assert "## The Real Title" in md
    assert "![](blob://d/1/pic)" in md
