"""HTML main-content extraction: DOM tree + text-density boilerplate strip.

The HTML path of the per-turn router. Design carries over the reference's XML
extraction discipline (``OCRResultParser._parse_xml_file``, app.py:1911-2013):

- **one-granularity rule** (app.py:1965-2007): pick exactly ONE node
  granularity from a priority list and extract only at that level, so a parent
  and its child are never both emitted (the double-extraction bug the
  reference's v62 history documents). Priority here:
  ``p > li > h1-h6 > td/th > pre/blockquote > div > body``.
- **attribute-carried text** (app.py:1952, 1991: ``STRING=``/``CONTENT=``):
  a selected node with no child text contributes its ``content``/``alt``/
  ``title`` attribute instead.
- **whole-document fallback** (app.py:2009-2012): no candidate granularity
  with text → the full stripped-tree text as a single block.
- per-string normalization on insertion (``add_text``, app.py:1845-1851).

Boilerplate removal (the Readability-style part; no reference analog because
the reference never sees HTML):

- container subtrees that never hold main content are dropped outright:
  ``script style noscript template nav footer header aside form iframe svg
  button select option``;
- a selected block whose **link density** (characters inside ``<a>`` /
  total characters) is ≥ 0.65 is dropped as a link farm.

stdlib ``html.parser`` only (lxml is not available in this environment); the
parser instance is rebuilt per call — cheap — while the regex kernel state
lives at module level (compiled once per worker process).
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Optional

from ..functions.textnorm import normalize_text

DROP_TAGS = frozenset(
    "script style noscript template nav footer header aside form iframe svg "
    "button select option".split()
)

# One-granularity priority: first family present-with-text wins.
GRANULARITY_PRIORITY: list[frozenset[str]] = [
    frozenset({"p"}),
    frozenset({"li"}),
    frozenset({"h1", "h2", "h3", "h4", "h5", "h6"}),
    frozenset({"td", "th"}),
    frozenset({"pre", "blockquote"}),
    frozenset({"div"}),
    frozenset({"body"}),
]

_TEXT_ATTRS = ("content", "alt", "title")
_LINK_DENSITY_MAX = 0.65

_VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


class _Node:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: dict[str, str], parent: Optional["_Node"]):
        self.tag = tag
        self.attrs = attrs
        self.children: list[object] = []  # _Node | str
        self.parent = parent


class _TreeBuilder(HTMLParser):
    """Forgiving DOM builder; dropped subtrees are pruned during the build."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = _Node("#root", {}, None)
        self._cursor = self.root
        self._drop_depth = 0

    def handle_starttag(self, tag, attrs):
        if self._drop_depth:
            if tag not in _VOID_TAGS:
                self._drop_depth += 1
            return
        if tag in DROP_TAGS:
            self._drop_depth = 1
            return
        node = _Node(tag, dict(attrs), self._cursor)
        self._cursor.children.append(node)
        if tag not in _VOID_TAGS:
            self._cursor = node

    def handle_startendtag(self, tag, attrs):
        if self._drop_depth:
            return
        if tag in DROP_TAGS:
            return
        self._cursor.children.append(_Node(tag, dict(attrs), self._cursor))

    def handle_endtag(self, tag):
        if self._drop_depth:
            self._drop_depth -= 1
            return
        # close the nearest matching open element (forgiving recovery)
        node = self._cursor
        while node is not None and node.tag != tag:
            node = node.parent
        if node is not None and node.parent is not None:
            self._cursor = node.parent

    def handle_data(self, data):
        if self._drop_depth or not data:
            return
        self._cursor.children.append(data)


def _iter_text(node: _Node, out: list[str]) -> None:
    for child in node.children:
        if isinstance(child, str):
            out.append(child)
        else:
            _iter_text(child, out)


def _node_text(node: _Node) -> str:
    parts: list[str] = []
    _iter_text(node, parts)
    return " ".join(parts)


def _link_text_len(node: _Node, inside_link: bool = False) -> int:
    total = 0
    for child in node.children:
        if isinstance(child, str):
            if inside_link:
                total += len(normalize_text(child))
        else:
            total += _link_text_len(child, inside_link or child.tag == "a")
    return total


def _collect_nodes(node: _Node, tags: frozenset[str], out: list[_Node]) -> None:
    """Collect matching nodes; never descend into an already-selected node
    (the one-granularity no-double-count guarantee for nestable tags)."""
    for child in node.children:
        if isinstance(child, _Node):
            if child.tag in tags:
                out.append(child)
            else:
                _collect_nodes(child, tags, out)


def _is_link_farm(node: _Node, text: str) -> bool:
    if not text:
        return False
    link_len = _link_text_len(node)
    return link_len / max(1, len(text)) >= _LINK_DENSITY_MAX


def extract_html_main_content(html: str) -> tuple[list[str], bool]:
    """Extract main-content paragraphs from an HTML fragment.

    Returns ``(paragraphs, used_fallback)`` where paragraphs are normalized
    non-empty strings at exactly one node granularity, in document order, and
    ``used_fallback`` marks the whole-document path (no granularity had text).
    """
    builder = _TreeBuilder()
    builder.feed(html or "")
    builder.close()
    root = builder.root

    for tags in GRANULARITY_PRIORITY:
        nodes: list[_Node] = []
        _collect_nodes(root, tags, nodes)
        if not nodes:
            continue
        paragraphs: list[str] = []
        for node in nodes:
            text = normalize_text(_node_text(node))
            if not text:
                for attr in _TEXT_ATTRS:
                    value = node.attrs.get(attr)
                    if value and value.strip():
                        text = normalize_text(value)
                        break
            if not text:
                continue
            if _is_link_farm(node, text):
                continue
            paragraphs.append(text)
        if paragraphs:
            return paragraphs, False

    whole = normalize_text(_node_text(root))
    if whole:
        return [whole], True
    return [], True
