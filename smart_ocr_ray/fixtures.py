"""Deterministic synthetic pages-table generator (FIXTURES.md).

Builds the canonical input table (``url, warc_ts, html, text, lang`` —
BASELINE.json input_hint) with row classes mirroring the reference's
synthetic test PDFs (``/root/reference/tests/test_born_digital.py:21-106``,
``tests/test_chunker.py``): born-digital prose, boilerplate-wrapped
pages, tables, equations, figures, scanned layout payloads, garbage /
CID text layers, sparse pages, mixed multi-unit documents, oversized
skew rows, repetition loops, unicode edge cases, empty rows.

Everything is a pure function of (row index, seed): generation is
order-independent and parallelizable, timestamps derive from the row
index (never wall clock).

Two entry points:
  * ``generate_pages(n_rows)`` — literal-prose corpus for tests/golden.
  * ``pages_from_documents(sf_dir)`` — same row-class mix but sourcing
    prose from the driver's ``documents.parquet`` so the corpus scales
    with sf and bench/queries run over sf-dependent input.
"""

from __future__ import annotations

import random

import pyarrow as pa
import pyarrow.parquet as pq

from .extractors.layout import build_payload

# Bump whenever generated content changes: cache keys (e.g. the driver
# pages-corpus cache under /tmp) include this so stale corpora are
# never served after a fixtures change.
FIXTURES_VERSION = 3

# Own econ-flavored prose (authored for this repo; plays the role of the
# reference's 8-sentence block — not copied from it).
ECON_SENTENCES = [
    "The central bank raised its policy rate by twenty five basis points this quarter.",
    "Inflation expectations remained anchored despite persistent supply chain disruptions worldwide.",
    "Household consumption growth slowed as real disposable income declined across most regions.",
    "The yield curve inverted briefly before recovering on stronger employment figures.",
    "Credit spreads widened for speculative grade issuers during the review period.",
    "Exchange rate pass through to consumer prices stayed muted in open economies.",
    "Fiscal consolidation efforts continued even as output gaps narrowed considerably.",
    "Survey measures of business sentiment improved modestly in the final month.",
]

# Row-class mix (FIXTURES.md §2): cumulative shares over 100.
_CLASS_CUTS = [
    ("prose", 40),
    ("boilerplate", 55),
    ("table", 65),
    ("equation", 70),
    ("figure", 75),
    ("scanned", 85),
    ("garbage_layer", 90),
    ("cid_layer", 93),
    ("sparse", 98),
    ("mixed", 103),
    ("oversized", 105),
    ("repetition", 107),
    ("unicode", 109),
    ("empty", 110),
]
_TOTAL = 110

SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

_EPOCH_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z in microseconds


def class_of(i: int) -> str:
    slot = (i * 37) % _TOTAL  # fixed stride decorrelates class from index order
    for name, cut in _CLASS_CUTS:
        if slot < cut:
            return name
    return "prose"


def _prose_paragraphs(rng: random.Random, n_paras: int = 2, per_para: int = 4) -> list[str]:
    paras = []
    for _ in range(n_paras):
        idx = rng.sample(range(len(ECON_SENTENCES)), min(per_para, len(ECON_SENTENCES)))
        paras.append(" ".join(ECON_SENTENCES[j] for j in sorted(idx)))
    return paras


def _soup_paragraphs(words: list[str], rng: random.Random, n_paras: int = 2) -> list[str]:
    """Build ≥50-word sentence-cased paragraphs from word-soup source
    text (documents.parquet), rotating word order so no sentence repeats."""
    if not words:
        words = ["placeholder"]
    paras = []
    pos = rng.randrange(len(words))
    for _ in range(n_paras):
        sentences = []
        for _ in range(4):
            chunk = [words[(pos + k) % len(words)] for k in range(12)]
            pos += 7
            sentences.append(chunk[0].capitalize() + " " + " ".join(chunk[1:]) + ".")
        paras.append(" ".join(sentences))
    return paras


def _page_html(
    paras: list[str], extra: str = "", title: str = "Fixture Document",
    related: str = "",
) -> bytes:
    body = "\n".join(f"<p>{p}</p>" for p in paras)
    return (
        f"<html><head><title>{title}</title></head><body>\n"
        f"<h1>{title}</h1>\n{body}\n{extra}{related}</body></html>"
    ).encode("utf-8")


def related_targets(i: int) -> list[int]:
    """Deterministic cross-page link targets of page ``i`` — earlier
    pages ``i-1``, ``i//2``, ``i//3`` (deduped, never self), so every
    corpus prefix is closed under links and low-id pages are hubs
    (realistic in-degree skew for the link-graph operators)."""
    out: list[int] = []
    for j in (i - 1, i // 2, i // 3):
        if 0 <= j != i and j not in out:
            out.append(j)
    return out


def _related_links(i: int) -> str:
    """Pure-anchor related-pages block: 100% link density, so the DOM
    boilerplate stripper removes it (MAX_LINK_DENSITY) and extraction
    goldens are unchanged — the links exist only for the link-graph
    operators to harvest."""
    targets = related_targets(i)
    if not targets:
        return ""
    items = " ".join(
        f'<a href="/{class_of(j)}/{j:06d}">related page {j}</a>' for j in targets
    )
    return f'<div class="related-pages">{items}</div>'


_NAV = (
    '<nav class="navbar"><ul>'
    + "".join(f'<li><a href="/s{i}">Section {i}</a></li>' for i in range(8))
    + "</ul></nav>"
)
_SIDEBAR = (
    '<div class="sidebar"><h3>Related</h3><ul>'
    + "".join(f'<li><a href="/r{i}">Related article number {i}</a></li>' for i in range(6))
    + "</ul></div>"
)
_FOOTER = '<footer><p>Copyright 2026 Fixture Media. <a href="/terms">Terms</a> <a href="/privacy">Privacy</a></p></footer>'
_LINKFARM = (
    '<div class="links"><a href="/a">more</a> <a href="/b">links</a> <a href="/c">here</a> '
    '<a href="/d">and</a> <a href="/e">here</a></div>'
)


def _vector_chart_blocks(x0: float, y0: float, n_bars: int = 6) -> list[dict]:
    """A bar-chart built of drawing strokes: two axis lines plus bars,
    all within CLUSTER_GAP of each other so they union into one region
    (~180x160pt, comfortably over the 80x80 min area)."""
    blocks = [
        {"bbox": [x0, y0, x0 + 4.0, y0 + 160.0], "kind": "drawing"},          # y axis
        {"bbox": [x0, y0 + 156.0, x0 + 180.0, y0 + 160.0], "kind": "drawing"},  # x axis
    ]
    for k in range(n_bars):
        bx = x0 + 12.0 + k * 28.0
        bh = 30.0 + (k * 37) % 110
        blocks.append(
            {"bbox": [bx, y0 + 156.0 - bh, bx + 18.0, y0 + 156.0], "kind": "drawing"}
        )
    return blocks


def _scattered_strokes(rng: random.Random, n: int, width: float, height: float) -> list[dict]:
    """Stray decorative strokes far apart (> CLUSTER_GAP), each tiny —
    clusters of size 1 that fail the min-drawings/area filters."""
    blocks = []
    for _ in range(n):
        x = 40.0 + rng.random() * (width - 120.0)
        y = 40.0 + rng.random() * (height - 120.0)
        blocks.append({"bbox": [x, y, x + 10.0, y + 10.0], "kind": "drawing"})
    return blocks


def _layout_pages(paras: list[str], rng: random.Random, n_pages: int, two_col: bool,
                  with_figure: bool = False, with_vector: bool = False) -> bytes:
    """Deterministic %FIX-LAYOUT payload with real geometry to exercise
    column clustering, reading order, heading detection, span merging."""
    pages = []
    for p in range(n_pages):
        blocks = [
            {"bbox": [72.0, 60.0, 540.0, 90.0], "kind": "text", "size": 18.0,
             "lines": [f"Section {p + 1}"]},
        ]
        # Two paragraphs per page so every unit clears the audit's
        # 50-word floor on its own (per-unit audit, heuristics min).
        texts = paras[p % len(paras)] + " " + paras[(p + 1) % len(paras)]
        sentences = texts.split(". ")
        if two_col:
            # Two columns: left x-center ~165, right ~445 on width 612.
            for bi, s in enumerate(sentences):
                col_left = bi < (len(sentences) + 1) // 2
                x0 = 72.0 if col_left else 330.0
                y0 = 110.0 + (bi if col_left else bi - (len(sentences) + 1) // 2) * 60.0
                words = s.split()
                mid = max(1, len(words) // 2)
                first = " ".join(words[:mid])
                blocks.append(
                    {"bbox": [x0, y0, x0 + 210.0, y0 + 40.0], "kind": "text", "size": 10.0,
                     "lines": [first + "-" if False else first, " ".join(words[mid:])]}
                )
        else:
            for bi, s in enumerate(sentences):
                y0 = 110.0 + bi * 50.0
                words = s.split()
                mid = max(1, len(words) // 2)
                blocks.append(
                    {"bbox": [72.0, y0, 540.0, y0 + 36.0], "kind": "text", "size": 10.0,
                     "lines": [" ".join(words[:mid]), " ".join(words[mid:])]}
                )
        if with_figure:
            blocks.append({"bbox": [200.0, 500.0, 400.0, 640.0], "kind": "image"})
            blocks.append({"bbox": [210.0, 510.0, 390.0, 630.0], "kind": "drawing"})
        if with_vector:
            # A stroke-built bar chart (clusters into one figure region)
            # plus stray decorations that must NOT become figures.
            blocks.extend(_vector_chart_blocks(90.0, 430.0))
            blocks.extend(_scattered_strokes(rng, 3, 612.0, 792.0))
        pages.append({"width": 612.0, "height": 792.0, "blocks": blocks})
    return build_payload(pages)


def build_row(i: int, seed: int = 42, source_words: list[str] | None = None,
              oversized_bytes: int = 2_000_000, big_doc_pages: int = 45) -> dict:
    """Build one deterministic pages-table row."""
    cls = class_of(i)
    rng = random.Random((seed << 32) | i)
    rel = _related_links(i)
    if source_words:
        paras = _soup_paragraphs(source_words, rng)
    else:
        paras = _prose_paragraphs(rng)
    text_layer = "\n\n".join(paras)
    lang = "en" if i % 17 else ("de" if i % 2 else "zh")
    url = f"https://fixture.test/{cls}/{i:06d}"
    ts = _EPOCH_US + i * 1_000_000

    html: bytes
    text: str

    if cls == "prose":
        html = _page_html(paras, related=rel)
        text = text_layer
    elif cls == "boilerplate":
        article = "\n".join(f"<p>{p}</p>" for p in paras)
        html = (
            f"<html><head><title>News</title></head><body>{_NAV}"
            f'<div class="content"><article><h1>Policy Review</h1>{article}</article></div>'
            f"{_SIDEBAR}{_LINKFARM}{rel}{_FOOTER}</body></html>"
        ).encode("utf-8")
        text = ""
    elif cls == "table":
        cells = [
            ["Indicator", "Q1", "Q2"],
            ["Inflation", "2.1", "2.4"],
            ["Unemployment", "4.3", "4.1"],
        ]
        table_html = "<table>" + "".join(
            "<tr>" + "".join(f"<td>{c}</td>" for c in row) + "</tr>" for row in cells
        ) + "</table>"
        html = _page_html(paras, extra=table_html, related=rel)
        # Single-token-per-line text layer (≥15 lines, columnar heuristic).
        tokens = [c for row in cells for c in row] + text_layer.split()[:12]
        text = "\n".join(tokens[:21])
    elif cls == "equation":
        extra = "<p>$$\\frac{\\partial y}{\\partial t} = \\alpha y$$</p>"
        html = _page_html(paras, extra=extra, related=rel)
        text = text_layer + "\n\n$$\\frac{\\partial y}{\\partial t} = \\alpha y$$"
    elif cls == "figure":
        extra = '<img src="fig1.png" alt="Output gap chart"><p>Figure 1 shows the estimated output gap.</p>'
        html = _page_html(paras, extra=extra, related=rel)
        text = text_layer
    elif cls == "scanned":
        n_pages = 1 + (i % 3)
        html = _layout_pages(
            paras, rng, n_pages, two_col=(i % 3 == 0), with_figure=(i % 2 == 0),
            with_vector=(i % 4 == 1),
        )
        text = ""
    elif cls == "garbage_layer":
        html = _layout_pages(paras, rng, 1, two_col=False)
        text = "a b c d e f g h i j k l " * 20
    elif cls == "cid_layer":
        html = _layout_pages(paras, rng, 1, two_col=False)
        text = ("(cid:42) (cid:17) mapping " * 12) + text_layer[:80]
    elif cls == "sparse":
        html = b"<html><body><h1>Title Page</h1></body></html>"
        text = "Title Page"
    elif cls == "mixed":
        if i % 2 == 0:
            html = _layout_pages(paras, rng, 2, two_col=False)
            text = paras[0]
        else:
            sec1 = "\n".join(f"<p>{p}</p>" for p in paras)
            paras2 = _soup_paragraphs(source_words, rng) if source_words else _prose_paragraphs(rng)
            sec2 = "\n".join(f"<p>{p}</p>" for p in paras2)
            html = (
                f"<html><body>{sec1}<hr class=\"unit-sep\">{sec2}</body></html>"
            ).encode("utf-8")
            text = ""
    elif cls == "oversized":
        if source_words is None and big_doc_pages > 30:
            # Alternate flavor: >30-page layout payload → page-chunk path.
            if i % 2 == 0:
                html = _layout_pages(paras, rng, big_doc_pages, two_col=False)
                text = ""
                return _row(url, ts, html, text, lang)
        parts = []
        size = 0
        j = 0
        while size < oversized_bytes:
            p = f"<p>{paras[j % len(paras)]} (paragraph {j})</p>\n"
            parts.append(p)
            size += len(p)
            j += 1
        html = ("<html><body>\n" + "".join(parts) + "</body></html>").encode("utf-8")
        text = ""
    elif cls == "repetition":
        loop_sentence = (
            "This exact sentence repeats in a suspicious loop pattern. " * 4
            + "A closing remark follows the loop."
        )
        repeated_line = "Repeated navigation crumb line here<br>" * 6
        html = _page_html(paras, extra=f"<p>{repeated_line}</p><p>{loop_sentence}</p>", related=rel)
        text = ""
    elif cls == "unicode":
        uni = (
            "“Smart quotes” and ‘single’ quotes, an em—dash, "
            "an en–dash, ellipsis… and the ﬁne ﬂuent ligatures."
        )
        html = _page_html(paras, extra=f"<p>{uni}</p>", related=rel).replace(b"\n", b"\r\n")
        text = text_layer + "\n\n" + uni
    else:  # empty
        html = b""
        text = ""

    return _row(url, ts, html, text, lang)


def _row(url: str, ts: int, html: bytes, text: str, lang: str) -> dict:
    return {"url": url, "warc_ts": ts, "html": html, "text": text, "lang": lang}


def generate_pages(n_rows: int, seed: int = 42, oversized_bytes: int = 2_000_000,
                   big_doc_pages: int = 45) -> pa.Table:
    rows = [
        build_row(i, seed=seed, oversized_bytes=oversized_bytes, big_doc_pages=big_doc_pages)
        for i in range(n_rows)
    ]
    return _to_table(rows)


def _to_table(rows: list[dict]) -> pa.Table:
    return pa.Table.from_pydict(
        {
            "url": [r["url"] for r in rows],
            "warc_ts": pa.array([r["warc_ts"] for r in rows], type=pa.timestamp("us")),
            "html": [r["html"] for r in rows],
            "text": [r["text"] for r in rows],
            "lang": [r["lang"] for r in rows],
        },
        schema=SCHEMA,
    )


def pages_from_documents(sf_dir: str, seed: int = 42,
                         oversized_bytes: int = 400_000) -> pa.Table:
    """Pages corpus derived from the driver's documents table: one page
    row per document, prose sourced from the document text so corpus
    size scales with sf. Deterministic per (doc_id, seed)."""
    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    rows = []
    for doc_id, text in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
        rows.append(
            build_row(
                int(doc_id),
                seed=seed,
                source_words=(text or "").split(),
                oversized_bytes=oversized_bytes,
                big_doc_pages=45,
            )
        )
    return _to_table(rows)


def write_pages_parquet(table: pa.Table, path: str) -> str:
    pq.write_table(table, path)
    return path
