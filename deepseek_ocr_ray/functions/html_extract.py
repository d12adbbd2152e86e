"""HTML main-content extraction via DOM text-density scoring.

North-rule addition (BASELINE.json): the reference pipeline has no HTML path;
this implements Readability/trafilatura-style boilerplate stripping — build a
DOM, drop boilerplate subtrees, score block candidates by (text length minus
link text, with tag bonuses), then emit the winning container's blocks in DOM
order as spans ``(kind, text, media_ref)``.

stdlib-only (``html.parser``); pure functions, deterministic, no network.
Runs inside a stateless ``map_batches`` stage (HTML parsing is inherently
per-document Python — the batch dimension provides the parallelism).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

from .grounding import Span

_VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)
_DROP_TAGS = frozenset(
    "script style noscript nav footer header aside form iframe button svg "
    "select option label".split()
)
_DROP_HINT = re.compile(
    r"(?:^|[\s_-])(ad|ads|advert\w*|sidebar|comment\w*|footer|header|nav|menu|"
    r"breadcrumb\w*|related|share|social|promo\w*|subscribe|banner|widget|"
    r"cookie|popup)(?:$|[\s_-])",
    re.IGNORECASE,
)
_CANDIDATE_TAGS = frozenset("article main body div section td".split())
_BLOCK_TAGS = frozenset("p li blockquote pre h1 h2 h3 h4 h5 h6 table".split())
_HEADING_TAGS = frozenset("h1 h2 h3 h4 h5 h6".split())
_TAG_BONUS = {"article": 1.5, "main": 1.5, "section": 1.2}
_WS = re.compile(r"\s+")


class _Node:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: dict, parent: "_Node | None"):
        self.tag = tag
        self.attrs = attrs
        self.children: list = []  # _Node or str
        self.parent = parent


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = _Node("#root", {}, None)
        self.cur = self.root

    def handle_starttag(self, tag: str, attrs) -> None:
        node = _Node(tag, dict(attrs), self.cur)
        self.cur.children.append(node)
        if tag not in _VOID_TAGS:
            self.cur = node

    def handle_startendtag(self, tag: str, attrs) -> None:
        self.cur.children.append(_Node(tag, dict(attrs), self.cur))

    def handle_endtag(self, tag: str) -> None:
        # close the nearest open ancestor with this tag (lenient recovery)
        n = self.cur
        while n is not self.root and n.tag != tag:
            n = n.parent
        if n is not self.root:
            self.cur = n.parent

    def handle_data(self, data: str) -> None:
        if data:
            self.cur.children.append(data)


def parse_html(html: str) -> _Node:
    b = _TreeBuilder()
    b.feed(html)
    b.close()
    return b.root


def _is_boilerplate(node: _Node) -> bool:
    if node.tag in _DROP_TAGS:
        return True
    hint = f"{node.attrs.get('class', '')} {node.attrs.get('id', '')}".strip()
    return bool(hint) and bool(_DROP_HINT.search(hint))


def _prune(node: _Node) -> None:
    node.children = [
        c for c in node.children if isinstance(c, str) or not _is_boilerplate(c)
    ]
    for c in node.children:
        if isinstance(c, _Node):
            _prune(c)


def _text_stats(node: _Node) -> tuple[int, int]:
    """(total text chars, chars under <a>) in the subtree."""
    total = linked = 0
    for c in node.children:
        if isinstance(c, str):
            total += len(c.strip())
        else:
            t, l = _text_stats(c)
            total += t
            linked += t if c.tag == "a" else l
    return total, linked


def _inline_text(node: _Node) -> str:
    parts: list[str] = []

    def walk(n: _Node) -> None:
        for c in n.children:
            if isinstance(c, str):
                parts.append(c)
            else:
                walk(c)

    walk(node)
    return _WS.sub(" ", " ".join(parts)).strip()


def _table_text(node: _Node) -> str:
    rows: list[str] = []

    def walk(n: _Node) -> None:
        for c in n.children:
            if isinstance(c, _Node):
                if c.tag == "tr":
                    cells = [
                        _inline_text(x)
                        for x in c.children
                        if isinstance(x, _Node) and x.tag in ("td", "th")
                    ]
                    cells = [x for x in cells if x]
                    if cells:
                        rows.append(" | ".join(cells))
                else:
                    walk(c)

    walk(node)
    return "\n".join(rows)


def _score_candidates(root: _Node) -> _Node:
    """Best content container, Readability-style: each block element (p, h*,
    li, ...) credits its non-link text length to its parent and half to its
    grandparent; the candidate with the highest tag-weighted credit wins
    (first in document order on ties).  Crediting parents — not summing whole
    subtrees — is what lets a tight content div beat ``<body>``."""
    scores: dict[int, float] = {}
    nodes: dict[int, _Node] = {}
    order: dict[int, int] = {}
    counter = 0

    def credit(n: _Node | None, amount: float) -> None:
        nonlocal counter
        while n is not None and n.tag not in _CANDIDATE_TAGS:
            n = n.parent
        if n is None:
            return
        key = id(n)
        if key not in scores:
            scores[key] = 0.0
            nodes[key] = n
            order[key] = counter
            counter += 1
        scores[key] += amount

    def walk(n: _Node) -> None:
        for c in n.children:
            if not isinstance(c, _Node):
                continue
            if c.tag in _BLOCK_TAGS and c.tag != "table":
                total, linked = _text_stats(c)
                amount = max(0, total - linked)
                if amount:
                    credit(n, float(amount))
                    credit(n.parent, amount / 2.0)
            else:
                walk(c)

    walk(root)
    if not scores:
        return root
    best_key = max(
        scores,
        key=lambda k: (scores[k] * _TAG_BONUS.get(nodes[k].tag, 1.0), -order[k]),
    )
    return nodes[best_key]


def _emit_blocks(node: _Node, out: list[Span]) -> None:
    for c in node.children:
        if isinstance(c, str):
            continue
        if c.tag == "img":
            src = c.attrs.get("src", "")
            if src:
                out.append(Span("image", "", src))
        elif c.tag in _HEADING_TAGS:
            t = _inline_text(c)
            if t:
                out.append(Span("title", t, ""))
            _emit_images_only(c, out)
        elif c.tag == "table":
            t = _table_text(c)
            if t:
                out.append(Span("table", t, ""))
            _emit_images_only(c, out)
        elif c.tag in _BLOCK_TAGS:
            t = _inline_text(c)
            if t:
                out.append(Span("text", t, ""))
            _emit_images_only(c, out)
        else:
            _emit_blocks(c, out)


def _emit_images_only(node: _Node, out: list[Span]) -> None:
    for c in node.children:
        if isinstance(c, _Node):
            if c.tag == "img":
                src = c.attrs.get("src", "")
                if src:
                    out.append(Span("image", "", src))
            else:
                _emit_images_only(c, out)


def extract_main_content(html: str) -> list[Span]:
    """HTML → ordered main-content spans (kind ∈ {title, text, table, image}).

    Boilerplate subtrees (nav/footer/aside/ads/... by tag or class/id hint)
    are dropped, the highest text-density container wins, its block elements
    are emitted in DOM order.  Empty or text-free pages yield [].
    """
    if not html or "<" not in html:
        txt = _WS.sub(" ", html or "").strip()
        return [Span("text", txt, "")] if txt else []
    root = parse_html(html)
    _prune(root)
    best = _score_candidates(root)
    out: list[Span] = []
    _emit_blocks(best, out)
    return out


def render_blocks_markdown(spans: list[Span]) -> str:
    """Markdown rendering of extracted HTML blocks (engine convention:
    titles as ``##``, images as markdown image links)."""
    parts = []
    for s in spans:
        if s.kind == "title":
            parts.append(f"## {s.text}")
        elif s.kind == "image":
            parts.append(f"![]({s.media_ref})")
        else:
            parts.append(s.text)
    return "\n\n".join(parts)
