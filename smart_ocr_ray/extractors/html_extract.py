"""DOM main-content extractor ("dom") — the light extractor (A1 analog).

Readability/trafilatura-style boilerplate stripping on a stdlib
``html.parser`` tree (lxml is not available in this environment; the
parse is still a single pass and the per-batch cost is amortized by the
actor pool):

  1. hard-drop non-content subtrees (script/style/head/nav/footer/...)
     and elements whose class/id matches the boilerplate regex,
  2. prune containers by link density (>0.5 of their text inside <a>),
  3. walk the remaining tree in document order emitting typed blocks:
     headings → ``#`` markdown, paragraphs, list items, blockquotes,
     pre/code, tables → GitHub-markdown tables (the semantics of the
     reference's ``_table_to_markdown``,
     /root/reference/src/socr/core/born_digital.py:593-642), images →
     figure spans, display-math → equation blocks.

Units: ``<hr class="unit-sep">`` splits a document into units (the
analog of PDF pages); most web pages are a single unit.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

from .base import (
    Block,
    EQUATION,
    FIGURE,
    HEADING,
    LIST,
    PROSE,
    QUOTE,
    CODE,
    TABLE,
    UnitResult,
)

# Subtrees that never contain main content.
_DROP_TAGS = frozenset(
    "script style noscript template head title meta link svg iframe form button input select option nav footer aside".split()
)
# Readability-style boilerplate class/id hints (public-knowledge regex).
_BOILERPLATE_RE = re.compile(
    r"combine|comment|community|disqus|extra|foot|header|menu|related|remark"
    r"|rss|share|shoutbox|sidebar|skyscraper|sponsor|ad-break|agegate"
    r"|pagination|pager|popup|banner|breadcrumb|masthead|navbar|nav-|social",
    re.IGNORECASE,
)
_BLOCK_TAGS = frozenset(
    "p div section article main body h1 h2 h3 h4 h5 h6 li ul ol table blockquote pre hr br img td th tr".split()
)
_HEADING_LEVEL = {f"h{i}": i for i in range(1, 7)}
_VOID_TAGS = frozenset("br hr img input meta link area base col embed source track wbr".split())

# Link-density pruning (trafilatura-style): a container more than half
# of whose text sits inside anchors is navigation, not content.
MAX_LINK_DENSITY = 0.5
_CONTAINER_TAGS = frozenset("div section ul ol aside span".split())

_DISPLAY_MATH_RE = re.compile(r"^\s*(\$\$.+?\$\$|\\\[.+?\\\])\s*$", re.DOTALL)


class _Node:
    __slots__ = ("tag", "hint", "children")

    def __init__(self, tag: str, hint: str = ""):
        self.tag = tag
        self.hint = hint  # class + id attribute values
        self.children: list = []  # _Node | str


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _Node("#root")
        self.stack = [self.root]
        self._tags_seen = 0

    def handle_starttag(self, tag, attrs):
        self._tags_seen += 1
        if not self._tags_seen % 4096:
            from ..functions import deadline

            deadline.check()  # cooperative deadline poll (X4)
        if attrs:
            if tag == "img":
                src = next((v or "" for k, v in attrs if k == "src"), "")
                alt = next((v or "" for k, v in attrs if k == "alt"), "")
                hint = f"{src}|{alt}"
            else:
                hint = " ".join(v or "" for k, v in attrs if k in ("class", "id"))
        else:
            hint = ""
        node = _Node(tag, hint)
        self.stack[-1].children.append(node)
        if tag not in _VOID_TAGS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self.handle_starttag(tag, attrs)
        if tag not in _VOID_TAGS:
            self.stack.pop()

    def handle_endtag(self, tag):
        # Pop to the nearest matching open tag (tolerant of malformed HTML).
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                break

    def handle_data(self, data):
        if data:
            # Merge adjacent text nodes: the parser splits character data
            # at arbitrary internal boundaries ('<', entities) and the
            # block emitter joins separate text children with a space —
            # contiguous markup text must stay one node.
            children = self.stack[-1].children
            if children and isinstance(children[-1], str):
                children[-1] += data
            else:
                children.append(data)


def _text_and_link_len(node: _Node) -> tuple[int, int]:
    """Total descendant text length and the part inside <a> subtrees."""
    total = 0
    linked = 0
    stack = [(node, node.tag == "a")]
    while stack:
        n, in_a = stack.pop()
        for child in n.children:
            if isinstance(child, str):
                length = len(child.strip())
                total += length
                if in_a:
                    linked += length
            else:
                stack.append((child, in_a or child.tag == "a"))
    return total, linked


def _is_dropped(node: _Node) -> bool:
    if node.tag in _DROP_TAGS:
        return True
    if node.hint and node.tag != "img" and _BOILERPLATE_RE.search(node.hint):
        return True
    if node.tag in _CONTAINER_TAGS:
        total, linked = _text_and_link_len(node)
        if total > 0 and linked / total > MAX_LINK_DENSITY:
            return True
    return False


def _inline_text(node: _Node) -> str:
    """Whitespace-collapsed text of a node's inline content."""
    parts: list[str] = []
    stack = list(reversed(node.children))
    while stack:
        child = stack.pop()
        if isinstance(child, str):
            parts.append(child)
        elif child.tag == "br":
            parts.append("\n")
        elif child.tag == "img":
            continue
        elif not _is_dropped(child):
            stack.extend(reversed(child.children))
    text = "".join(parts)
    # HTML whitespace collapse, preserving explicit <br> newlines.
    lines = [" ".join(line.split()) for line in text.split("\n")]
    return "\n".join(l for l in lines if l).strip()


def _table_to_markdown(table: _Node) -> str:
    """GitHub-markdown table: first row = header, rows padded to the max
    column count (born_digital.py:593-642 semantics)."""
    rows: list[list[str]] = []
    stack = [table]
    while stack:
        n = stack.pop(0)
        for child in n.children:
            if isinstance(child, str):
                continue
            if child.tag == "tr":
                cells = [
                    " ".join(_inline_text(c).split())
                    for c in child.children
                    if not isinstance(c, str) and c.tag in ("td", "th")
                ]
                rows.append(cells)
            elif child.tag in ("thead", "tbody", "tfoot", "table"):
                stack.append(child)
    rows = [r for r in rows if r]
    if not rows:
        return ""
    col_count = max(len(r) for r in rows)
    for r in rows:
        r.extend("" for _ in range(col_count - len(r)))
    lines = ["| " + " | ".join(rows[0]) + " |"]
    lines.append("| " + " | ".join("---" for _ in range(col_count)) + " |")
    for r in rows[1:]:
        lines.append("| " + " | ".join(r) + " |")
    return "\n".join(lines)


_END = object()  # container-exhausted sentinel for the explicit walk


def _emit_blocks(node: _Node, blocks: list[Block]) -> None:
    """Document-order walk emitting typed blocks (M5 semantics).

    Explicit-stack traversal (no Python recursion): adversarially deep
    nesting (thousands of unclosed <div>s occur in real crawls) must
    degrade to normal extraction, not a RecursionError. Equivalent to
    the recursive form because the recursive version flushed pending
    text both before descending into a container and at each call's
    end — so pending text never crossed a container boundary and one
    shared buffer with a flush at container exit reproduces the exact
    emission order."""
    pending_text: list[str] = []

    def _flush():
        if pending_text:
            text = " ".join(" ".join(pending_text).split())
            if text:
                _append_prose(blocks, text)
            pending_text.clear()

    walk = [iter(node.children)]
    while walk:
        child = next(walk[-1], _END)
        if child is _END:
            walk.pop()
            _flush()  # the recursive form's end-of-call flush
            continue
        if isinstance(child, str):
            if child.strip():
                pending_text.append(child)
            continue
        if _is_dropped(child):
            continue
        tag = child.tag
        if tag in _HEADING_LEVEL:
            _flush()
            text = _inline_text(child)
            if text:
                blocks.append(Block(HEADING, "#" * _HEADING_LEVEL[tag] + " " + text))
        elif tag == "p":
            _flush()
            text = _inline_text(child)
            if text:
                _append_prose(blocks, text)
        elif tag in ("ul", "ol"):
            _flush()
            items = [
                _inline_text(li)
                for li in child.children
                if not isinstance(li, str) and li.tag == "li" and not _is_dropped(li)
            ]
            items = [i for i in items if i]
            if items:
                ordered = tag == "ol"
                lines = [
                    (f"{idx}. {item}" if ordered else f"- {item}")
                    for idx, item in enumerate(items, 1)
                ]
                blocks.append(Block(LIST, "\n".join(lines)))
        elif tag == "table":
            _flush()
            md = _table_to_markdown(child)
            if md:
                blocks.append(Block(TABLE, md))
        elif tag == "blockquote":
            _flush()
            text = _inline_text(child)
            if text:
                blocks.append(Block(QUOTE, "\n".join("> " + l for l in text.split("\n"))))
        elif tag == "pre":
            _flush()
            raw = _raw_text(child)
            if raw.strip():
                blocks.append(Block(CODE, raw.strip("\n")))
        elif tag == "img":
            _flush()
            blocks.append(Block(FIGURE, "", meta=child.hint))
        elif tag in ("a", "b", "i", "em", "strong", "span", "code", "sub", "sup", "u", "small"):
            text = _inline_text(child)
            if text:
                pending_text.append(text)
        else:
            # Generic container: descend in document order.
            _flush()
            walk.append(iter(child.children))


def _append_prose(blocks: list[Block], text: str) -> None:
    """Prose block, or an equation block when the text is display math."""
    if _DISPLAY_MATH_RE.match(text):
        blocks.append(Block(EQUATION, text))
    else:
        blocks.append(Block(PROSE, text))


def _raw_text(node: _Node) -> str:
    parts = []
    stack = list(reversed(node.children))
    while stack:
        child = stack.pop()
        if isinstance(child, str):
            parts.append(child)
        else:
            stack.extend(reversed(child.children))
    return "".join(parts)


# ---------------------------------------------------------------- fast tokenizer

# Regex tokenizer for the common case: standard tags with (possibly
# quoted) attributes, comments, doctypes. Quoted attribute values may
# contain '>' safely. Anything the regex does not recognize stays text
# data — the same stance the stdlib parser takes toward stray '<'.
_TOKEN_RE = re.compile(
    r"<!--.*?(?:-->|$)"                                    # comments
    r"|<!\[CDATA\[.*?(?:\]\]>|$)"                          # CDATA
    r"|<![^>]*>"                                           # doctype & decls
    r"|<\?[^>]*>"                                          # processing instr.
    r"|</\s*([a-zA-Z][a-zA-Z0-9:-]*)\s*>"                  # end tag (g1)
    r"|<([a-zA-Z][a-zA-Z0-9:-]*)"                          # start tag (g2)
    r"((?:\"[^\"]*\"|'[^']*'|[^>\"'])*)"                   # attrs (g3, '<' allowed like stdlib)
    r"(/?)>",                                              # self-close (g4)
    re.DOTALL,
)
_ATTR_RE = re.compile(
    r"([a-zA-Z-]+)\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s>]+))"
)
_RAWTEXT_CLOSE = {
    "script": re.compile(r"</script\s*>", re.IGNORECASE),
    "style": re.compile(r"</style\s*>", re.IGNORECASE),
}


def _append_data(children: list, data: str) -> None:
    if children and isinstance(children[-1], str):
        children[-1] += data
    else:
        children.append(data)


def _fast_build(markup: str) -> _Node:
    """Tokenize standard HTML into the same tree `_TreeBuilder` builds.

    Byte-level behavior matches the stdlib builder on well-formed input
    (differential-tested in tests/test_extractors.py); semantics for
    pathological markup may differ in whitespace placement only — both
    parsers are heuristics there, and pipeline/oracle share this code so
    the byte-identity contract is unaffected.
    """
    import html as html_mod

    from ..functions import deadline

    root = _Node("#root")
    stack = [root]
    pos = 0
    n = len(markup)
    tokens = 0
    while pos < n:
        tokens += 1
        if not tokens % 4096:
            # Cooperative deadline poll (X4): bounds a pathological
            # document's stall mid-tokenize, ~every 4k tokens.
            deadline.check()
        match = _TOKEN_RE.search(markup, pos)
        if match is None:
            data = markup[pos:]
            if data:
                _append_data(stack[-1].children,
                             html_mod.unescape(data) if "&" in data else data)
            break
        if match.start() > pos:
            data = markup[pos : match.start()]
            _append_data(stack[-1].children,
                         html_mod.unescape(data) if "&" in data else data)
        pos = match.end()
        end_tag, start_tag, attr_str, self_close = match.group(1, 2, 3, 4)
        if end_tag is not None:
            tag = end_tag.lower()
            for i in range(len(stack) - 1, 0, -1):
                if stack[i].tag == tag:
                    del stack[i:]
                    break
            continue
        if start_tag is None:
            continue  # comment/doctype/PI
        tag = start_tag.lower()
        hint = ""
        if attr_str and ("=" in attr_str):
            if tag == "img":
                # findall yields '' (not None) for non-matching groups.
                attrs = {
                    k.lower(): (v1 or v2 or v3)
                    for k, v1, v2, v3 in _ATTR_RE.findall(attr_str)
                }
                hint = f"{attrs.get('src', '')}|{attrs.get('alt', '')}"
            elif "class" in attr_str or "id" in attr_str:
                vals = [
                    (v1 or v2 or v3)
                    for k, v1, v2, v3 in _ATTR_RE.findall(attr_str)
                    if k.lower() in ("class", "id")
                ]
                hint = " ".join(vals)
            if hint and "&" in hint:
                hint = html_mod.unescape(hint)
        node = _Node(tag, hint)
        stack[-1].children.append(node)
        if tag in _RAWTEXT_CLOSE and not self_close:
            # raw-text elements: consume verbatim to the closing tag.
            close = _RAWTEXT_CLOSE[tag].search(markup, pos)
            raw_end = close.start() if close else n
            node.children.append(markup[pos:raw_end])
            pos = close.end() if close else n
        elif not self_close and tag not in _VOID_TAGS:
            stack.append(node)
    return root


def _stdlib_build(markup: str) -> _Node:
    builder = _TreeBuilder()
    builder.feed(markup)
    builder.close()
    return builder.root


def extract_html(html: bytes, text_layer: str = "") -> list[UnitResult]:
    """Parse an HTML payload into units of typed blocks.

    ``<hr class="unit-sep">`` elements split units; everything else is a
    single unit. Decoding is utf-8 with replacement (lossy bytes never
    crash the pipeline — they surface in the audit's garbage ratio).
    The regex tokenizer handles the common case ~2× faster than the
    stdlib parser; any tokenizer exception falls back to the stdlib
    builder (both produce the same `_Node` tree shape).
    """
    from ..functions.deadline import DeadlineExceeded

    try:
        markup = html.decode("utf-8", "replace")
        try:
            builder_root = _fast_build(markup)
        except DeadlineExceeded:
            raise  # aborting, not falling back — re-parsing would stall longer
        except Exception:
            builder_root = _stdlib_build(markup)
    except DeadlineExceeded:
        raise
    except Exception as exc:  # pragma: no cover - parser is tolerant
        return [UnitResult(unit_id=1, error=f"parse_error: {exc}")]

    # Split the top-level walk into units at hr.unit-sep markers.
    unit_nodes: list[_Node] = [_Node("#unit")]

    def _split_units(node: _Node) -> None:
        for child in node.children:
            if not isinstance(child, str) and child.tag == "hr" and "unit-sep" in child.hint:
                unit_nodes.append(_Node("#unit"))
            elif not isinstance(child, str) and child.tag in ("html", "body"):
                _split_units(child)
            else:
                unit_nodes[-1].children.append(child)

    _split_units(builder_root)

    units: list[UnitResult] = []
    for idx, unit_node in enumerate(unit_nodes, 1):
        blocks: list[Block] = []
        _emit_blocks(unit_node, blocks)
        units.append(UnitResult(unit_id=idx, blocks=blocks))
    return units
