"""Extractor behavior: DOM main-content strip, layout parse geometry,
payload container round-trip, span offsets."""

import json

from smart_ocr_ray.extractors import extract_html, extract_layout, extract_native
from smart_ocr_ray.extractors.base import render_unit
from smart_ocr_ray.extractors.layout import build_payload, peek_npages, slice_pages
from smart_ocr_ray.document import oracle_extract


def _text_of(html: bytes) -> str:
    units = extract_html(html)
    assert len(units) == 1
    text, _ = render_unit(units[0])
    return text


def test_dom_strips_boilerplate():
    html = (
        b'<html><body><nav class="navbar"><a href="/a">Home</a><a href="/b">About</a></nav>'
        b"<article><p>The actual article content lives here in this paragraph.</p></article>"
        b'<footer><p>Copyright fine print</p></footer></body></html>'
    )
    text = _text_of(html)
    assert "actual article content" in text
    assert "Home" not in text and "Copyright" not in text


def test_dom_link_density_pruning():
    html = (
        b'<html><body><div><a href="/1">link one</a> <a href="/2">link two</a> '
        b'<a href="/3">link three</a></div>'
        b"<p>Real prose with no links at all in this sentence.</p></body></html>"
    )
    text = _text_of(html)
    assert "Real prose" in text and "link one" not in text


def test_dom_boilerplate_class_hints():
    html = (
        b'<html><body><div class="sidebar"><p>Related stories teaser</p></div>'
        b"<p>Main body text of the page.</p></body></html>"
    )
    text = _text_of(html)
    assert "Main body" in text and "Related stories" not in text


def test_dom_table_to_markdown():
    html = (
        b"<html><body><p>Before table.</p>"
        b"<table><tr><td>H1</td><td>H2</td></tr><tr><td>a</td><td>b</td></tr></table>"
        b"</body></html>"
    )
    text = _text_of(html)
    assert "| H1 | H2 |" in text
    assert "| --- | --- |" in text
    assert "| a | b |" in text
    assert text.index("Before table.") < text.index("| H1")


def test_dom_table_ragged_rows_padded():
    html = b"<table><tr><td>a</td><td>b</td><td>c</td></tr><tr><td>x</td></tr></table>"
    text = _text_of(html)
    assert "| x |  |  |" in text


def test_dom_headings_and_lists():
    html = (
        b"<html><body><h2>Section</h2><ul><li>first</li><li>second</li></ul>"
        b"<ol><li>one</li><li>two</li></ol></body></html>"
    )
    text = _text_of(html)
    assert "## Section" in text
    assert "- first\n- second" in text
    assert "1. one\n2. two" in text


def test_dom_figure_span_and_equation():
    html = (
        b'<html><body><p>Intro text.</p><img src="f.png" alt="chart">'
        b"<p>$$x^2 + y^2 = r^2$$</p></body></html>"
    )
    units = extract_html(html)
    text, spans = render_unit(units[0])
    kinds = [s["kind"] for s in spans]
    assert "figure" in kinds and "equation" in kinds
    fig = next(s for s in spans if s["kind"] == "figure")
    assert fig["start"] == fig["end"]  # zero-length placeholder
    assert "f.png|chart" == fig["meta"]


def test_dom_span_offsets_are_exact():
    html = b"<html><body><h1>Title</h1><p>Paragraph one here.</p><p>Second one.</p></body></html>"
    units = extract_html(html)
    text, spans = render_unit(units[0])
    for s in spans:
        if s["start"] < s["end"]:
            assert text[s["start"] : s["end"]] == text[s["start"] : s["end"]].strip()
    heading = next(s for s in spans if s["kind"] == "heading")
    assert text[heading["start"] : heading["end"]] == "# Title"


def test_dom_unit_split():
    html = b'<html><body><p>unit one text</p><hr class="unit-sep"><p>unit two text</p></body></html>'
    units = extract_html(html)
    assert len(units) == 2
    assert units[0].unit_id == 1 and units[1].unit_id == 2


def test_dom_malformed_html_tolerated():
    html = b"<html><body><p>unclosed para<div>nested <b>bold</div><p>after</body>"
    text = _text_of(html)
    assert "unclosed para" in text and "after" in text


# ---------------------------------------------------------------- layout


def _page(blocks, width=612.0):
    return {"width": width, "height": 792.0, "blocks": blocks}


def test_layout_payload_roundtrip_and_slice():
    pages = [
        _page([{"bbox": [72, 100, 540, 140], "kind": "text", "size": 10.0, "lines": [f"page {i}"]}])
        for i in range(5)
    ]
    payload = build_payload(pages)
    assert peek_npages(payload) == 5
    sliced = slice_pages(payload, 2, 4)
    assert peek_npages(sliced) == 2
    units = extract_layout(sliced, unit_base=2)
    assert [u.unit_id for u in units] == [3, 4]
    assert render_unit(units[0])[0] == "page 2"


def test_layout_reading_order_two_columns():
    blocks = [
        {"bbox": [330, 100, 540, 140], "kind": "text", "size": 10.0, "lines": ["right top"]},
        {"bbox": [72, 100, 280, 140], "kind": "text", "size": 10.0, "lines": ["left top"]},
        {"bbox": [72, 200, 280, 240], "kind": "text", "size": 10.0, "lines": ["left bottom"]},
        {"bbox": [330, 200, 540, 240], "kind": "text", "size": 10.0, "lines": ["right bottom"]},
    ]
    units = extract_layout(build_payload([_page(blocks)]))
    text, _ = render_unit(units[0])
    order = [text.index(x) for x in ("left top", "left bottom", "right top", "right bottom")]
    assert order == sorted(order)  # column-major reading order


def test_layout_hyphenation_merge():
    blocks = [
        {"bbox": [72, 100, 540, 160], "kind": "text", "size": 10.0,
         "lines": ["the experi-", "ment succeeded"]},
    ]
    text, _ = render_unit(extract_layout(build_payload([_page(blocks)]))[0])
    assert "experiment succeeded" in text


def test_layout_heading_by_font_size():
    blocks = [
        {"bbox": [72, 60, 540, 90], "kind": "text", "size": 20.0, "lines": ["Big Title"]},
        {"bbox": [72, 110, 540, 140], "kind": "text", "size": 10.0, "lines": ["body text one"]},
        {"bbox": [72, 150, 540, 180], "kind": "text", "size": 10.0, "lines": ["body text two"]},
        {"bbox": [72, 190, 540, 220], "kind": "text", "size": 10.0, "lines": ["body text three"]},
    ]
    text, spans = render_unit(extract_layout(build_payload([_page(blocks)]))[0])
    assert text.startswith("# Big Title")
    assert [s["kind"] for s in spans][0] == "heading"


def test_layout_table_and_figure():
    blocks = [
        {"bbox": [72, 100, 540, 200], "kind": "table",
         "cells": [["h1", "h2"], ["1", "2"]]},
        {"bbox": [100, 300, 400, 500], "kind": "image"},
    ]
    text, spans = render_unit(extract_layout(build_payload([_page(blocks)]))[0])
    assert "| h1 | h2 |" in text
    assert any(s["kind"] == "figure" and s["meta"].startswith("image@") for s in spans)


def test_layout_corrupt_payload_typed_error():
    bad = b"%FIX-LAYOUT v1 npages=2 offsets=0,10\n\x00garbage"
    units = extract_layout(bad)
    assert len(units) == 1 and units[0].error.startswith("parse_error")


def test_native_extractor_paragraphs():
    units = extract_native(b"", "para one text\n\npara two text")
    text, spans = render_unit(units[0])
    assert text == "para one text\n\npara two text"
    assert len(spans) == 2


def test_oracle_spans_parse_and_cover():
    html = (
        b"<html><body><h1>T</h1><p>"
        + b"Meaningful prose content for the audit to accept. " * 10
        + b"</p></body></html>"
    )
    doc = oracle_extract(html, "")
    spans = json.loads(doc["spans_json"])
    assert spans and all(s["end"] <= len(doc["extracted_text"]) for s in spans)


# ---------------------------------------------------------------- tokenizer parity


def test_fast_tokenizer_matches_stdlib_on_fixture_corpus():
    """The regex fast path and the stdlib builder must extract
    identically over every html fixture row."""
    from smart_ocr_ray.extractors import html_extract as he
    from smart_ocr_ray.fixtures import generate_pages

    table = generate_pages(110, oversized_bytes=30_000)
    checked = 0
    for i in range(table.num_rows):
        payload = table["html"][i].as_py()
        if not payload or payload.startswith(b"%FIX-LAYOUT"):
            continue
        markup = payload.decode("utf-8", "replace")
        assert _render_tree(he._fast_build(markup)) == _render_tree(
            he._stdlib_build(markup)
        ), table["url"][i].as_py()
        checked += 1
    assert checked > 50


def _render_tree(root):
    from smart_ocr_ray.extractors import html_extract as he
    from smart_ocr_ray.extractors.base import UnitResult, render_unit

    units = [he._Node("#unit")]

    def _split(node):
        for child in node.children:
            if not isinstance(child, str) and child.tag == "hr" and "unit-sep" in child.hint:
                units.append(he._Node("#unit"))
            elif not isinstance(child, str) and child.tag in ("html", "body"):
                _split(child)
            else:
                units[-1].children.append(child)

    _split(root)
    out = []
    for idx, unit in enumerate(units, 1):
        blocks = []
        he._emit_blocks(unit, blocks)
        out.append(render_unit(UnitResult(idx, blocks)))
    return out


from hypothesis import given, settings
from hypothesis import strategies as st

_TAGS = ["p", "div", "b", "ul", "li", "table", "tr", "td", "img", "br", "h2", "a"]


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.sampled_from([f"<{t}>" for t in _TAGS] + [f"</{t}>" for t in _TAGS]),
            st.sampled_from(
                ['<p class="sidebar">', "<!-- c -->", "<img src='x.png' alt='y'>",
                 "<td a='>'>", "&amp;", "plain words here ", "< loose ", "$$x$$",
                 "<script>a<b</script>", "<P ID=up>", "</notopen>"]
            ),
            # Free text may contain entities/semicolons/spaces but not
            # raw '<'/quotes: truly malformed TAG SYNTAX (like "<a'<p>")
            # segments differently between CPython's tolerant tag regex
            # and the fast tokenizer — both deterministic, and the
            # pipeline always uses the fast path, so only structurally
            # plausible markup carries a cross-parser guarantee.
            st.text(alphabet="abc &;/!=. ", max_size=12),
        ),
        max_size=25,
    )
)
def test_fast_tokenizer_fuzz_vs_stdlib(parts):
    from smart_ocr_ray.extractors import html_extract as he

    markup = "".join(parts)
    assert _render_tree(he._fast_build(markup)) == _render_tree(
        he._stdlib_build(markup)
    )
