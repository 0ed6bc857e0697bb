"""Vector-figure clustering (X1) and figure caps (O6).

Behavior pinned to the reference's figure pass
(/root/reference/src/socr/figures/extractor.py:60-78,108-258,351-413;
ref tests tests/test_figure_pass.py): union-find drawing clusters with
30pt gap, area/aspect/page-ratio/margin filters, landscape relaxation,
presentation fallback, max 3 figures/page and 25/document.
"""

import json

from smart_ocr_ray.extractors.layout import (
    MAX_FIGURES_PER_PAGE,
    _cluster_drawings,
    build_payload,
    parse_page,
)


def _spans_of(page: dict) -> list:
    from smart_ocr_ray.extractors.base import render_unit

    unit = parse_page(page, 1)
    _, spans = render_unit(unit)
    return [s for s in spans if s["kind"] == "figure"]


def _chart(x0=90.0, y0=430.0, n_bars=6):
    from smart_ocr_ray.fixtures import _vector_chart_blocks

    return _vector_chart_blocks(x0, y0, n_bars)


def _page(blocks, width=612.0, height=792.0):
    return {"width": width, "height": height, "blocks": blocks}


# ---------------------------------------------------------------- clustering


def test_cluster_adjacent_boxes_unite():
    boxes = [[0, 0, 100, 100], [120, 0, 200, 100]]  # h_gap 20 <= 30
    clusters = _cluster_drawings(boxes)
    assert len(clusters) == 1
    assert clusters[0] == (2, (0, 0, 200, 100))


def test_cluster_distant_boxes_stay_separate():
    boxes = [[0, 0, 100, 100], [200, 0, 300, 100]]  # h_gap 100 > 30
    clusters = _cluster_drawings(boxes)
    assert len(clusters) == 2


def test_cluster_transitive_chain():
    # A-B and B-C are within gap; A-C are not — still one component.
    boxes = [[0, 0, 50, 50], [70, 0, 120, 50], [140, 0, 190, 50]]
    clusters = _cluster_drawings(boxes)
    assert len(clusters) == 1
    assert clusters[0][0] == 3


def test_cluster_sorted_by_position():
    boxes = [[0, 500, 100, 600], [0, 0, 100, 100]]
    clusters = _cluster_drawings(boxes)
    assert [c[1][1] for c in clusters] == [0, 500]


# ---------------------------------------------------------------- vector pass


def test_vector_chart_becomes_figure_span():
    spans = _spans_of(_page(_chart()))
    assert len(spans) == 1
    meta = spans[0]["meta"]
    assert meta.startswith("vector@")
    assert "n=8" in meta  # 2 axes + 6 bars


def test_scattered_strokes_are_not_figures():
    # 6 tiny strokes far apart: passes the >=5 gate but every cluster
    # fails min area / min drawings.
    blocks = [
        {"bbox": [x, y, x + 10.0, y + 10.0], "kind": "drawing"}
        for x, y in [(50, 50), (300, 120), (550, 200), (60, 400), (300, 500), (550, 700)]
    ]
    assert _spans_of(_page(blocks)) == []


def test_too_few_drawings_skips_vector_pass():
    # 4 drawings < MIN_DRAWINGS_FOR_VECTOR on portrait.
    blocks = _chart(n_bars=2)  # 2 axes + 2 bars = 4
    assert _spans_of(_page(blocks)) == []


def test_landscape_relaxation_allows_three_drawings():
    # Landscape: min_drawings drops to 3, area ratio floor halves.
    blocks = _chart(n_bars=1)  # 3 drawings
    assert len(_spans_of(_page(blocks, width=792.0, height=612.0))) == 1


def test_header_footer_margin_skip():
    # Chart centered in the top margin (cy < 10% of height) with < 20
    # drawings is skipped on portrait pages...
    high = _chart(y0=-90.0)  # spans y -90..70, cy ~ -10 < 79.2
    assert _spans_of(_page(high)) == []
    # ...but a landscape page has no margin rule.
    assert len(_spans_of(_page(high, width=900.0, height=700.0))) == 1


def test_presentation_fallback_landscape():
    # Landscape with >=10 drawings but no filter-passing cluster → the
    # slide region itself becomes the figure.
    blocks = [
        {"bbox": [x, y, x + 10.0, y + 10.0], "kind": "drawing"}
        for x, y in [
            (50, 50), (300, 120), (700, 200), (60, 400), (300, 500),
            (700, 550), (150, 250), (450, 350), (600, 100), (200, 450),
        ]
    ]
    spans = _spans_of(_page(blocks, width=792.0, height=612.0))
    assert len(spans) == 1
    assert spans[0]["meta"].startswith("vector@")
    assert "n=10" in spans[0]["meta"]


def test_image_aspect_filter():
    # A 600x20 banner (aspect 30 > 8) is not a figure; the square one is.
    blocks = [
        {"bbox": [0.0, 100.0, 600.0, 120.0], "kind": "image"},
        {"bbox": [100.0, 200.0, 300.0, 400.0], "kind": "image"},
    ]
    spans = _spans_of(_page(blocks))
    assert len(spans) == 1
    assert spans[0]["meta"] == "image@100,200,300,400"


# ---------------------------------------------------------------- caps (O6)


def test_per_page_cap_vector_priority():
    # Two passing vector charts + three passing images: cap keeps 3
    # figures with vector clusters consuming the budget first.
    blocks = _chart(90.0, 110.0) + _chart(350.0, 110.0)
    for k in range(3):
        x0 = 80.0 + k * 180.0
        blocks.append({"bbox": [x0, 600.0, x0 + 120.0, 700.0], "kind": "image"})
    spans = _spans_of(_page(blocks))
    assert len(spans) == MAX_FIGURES_PER_PAGE == 3
    metas = [s["meta"] for s in spans]
    assert sum(m.startswith("vector@") for m in metas) == 2
    assert sum(m.startswith("image@") for m in metas) == 1


def test_doc_cap_25_figures():
    from smart_ocr_ray.document import oracle_extract

    # Figure bomb: 30 pages x 2 images = 60 candidate figures.
    pages = []
    for p in range(30):
        blocks = [
            {"bbox": [72.0, 60.0, 540.0, 90.0], "kind": "text", "size": 10.0,
             "lines": ["Prose content line for page number %d with enough words "
                       "to look real." % p]},
            {"bbox": [100.0, 200.0, 300.0, 400.0], "kind": "image"},
            {"bbox": [320.0, 200.0, 520.0, 400.0], "kind": "image"},
        ]
        pages.append({"width": 612.0, "height": 792.0, "blocks": blocks})
    doc = oracle_extract(build_payload(pages), "")
    figure_spans = [s for s in json.loads(doc["spans_json"]) if s["kind"] == "figure"]
    assert len(figure_spans) == 25
    # The kept 25 are the first in reading order: pages 1..12 full, page 13 first.
    assert max(s["unit_id"] for s in figure_spans) == 13


def test_doc_cap_chunked_equals_unchunked(ray_session):
    """The doc cap must be chunk-invariant: a >30-page figure-heavy doc
    (explode path) produces identical spans to the whole-doc oracle."""
    import pyarrow as pa

    from smart_ocr_ray.document import oracle_extract
    from smart_ocr_ray.pipelines.extract_pipeline import extract_pipeline
    import ray.data

    pages = []
    for p in range(35):
        blocks = [
            {"bbox": [72.0, 60.0, 540.0, 90.0], "kind": "text", "size": 10.0,
             "lines": ["Chunked figure cap parity page %d has sufficient prose." % p]},
            {"bbox": [100.0, 200.0, 300.0, 400.0], "kind": "image"},
        ]
        pages.append({"width": 612.0, "height": 792.0, "blocks": blocks})
    payload = build_payload(pages)
    row = {"url": "https://fixture.test/figbomb/000001", "warc_ts": 0,
           "html": payload, "text": "", "lang": "en"}
    ds = ray.data.from_arrow(pa.Table.from_pylist([row]))
    out = extract_pipeline(ds, max_html_bytes=16 * 1024).take_all()
    assert len(out) == 1
    oracle = oracle_extract(payload, "")
    assert out[0]["extracted_text"] == oracle["extracted_text"]
    assert out[0]["spans_json"] == oracle["spans_json"]
    figs = [s for s in json.loads(out[0]["spans_json"]) if s["kind"] == "figure"]
    assert len(figs) == 25
