"""Rule-based figure captioner (A6 analog).

The reference describes figures with a vision model
(``/root/reference/src/socr/engines/gemini_api.py``,
``deepseek_vllm.py:159-205``) using a figure-type keyword taxonomy
(``deepseek_vllm.py:263-276``: chart / graph / table / diagram / map /
equation) and degrades gracefully when no model is available
(``orchestrator.py:1374-1408``). The deterministic rebuild keeps the
taxonomy and the output contract — (figure_type, description) per
figure span — but derives them from the span's recorded metadata
(src path / alt text / bbox) and its surrounding context text
(J7: first 500 chars of the unit's best text,
``orchestrator.py:1410-1421``).
"""

from __future__ import annotations

import re

# Type keyword taxonomy (deepseek_vllm.py:263-276 semantics).
_TYPE_KEYWORDS = [
    ("chart", ("chart", "bar", "pie", "histogram")),
    ("graph", ("graph", "plot", "curve", "trend", "scatter", "axis")),
    ("table", ("table", "grid", "matrix")),
    # "vector" matches the layout extractor's vector@bbox metadata, so a
    # drawing-cluster figure defaults to diagram unless nearby text names
    # a more specific type (chart/graph precede diagram in the taxonomy).
    ("diagram", ("diagram", "flow", "architecture", "schematic", "pipeline", "vector")),
    ("map", ("map", "geo", "region", "territory")),
    ("equation", ("equation", "formula", "math")),
]

CONTEXT_CHARS = 500  # orchestrator.py:1410-1421

_BBOX_RE = re.compile(r"(?:image|vector)@([\d.]+),([\d.]+),([\d.]+),([\d.]+)")


def classify_figure_type(meta: str, context: str = "") -> str:
    """Figure type from span metadata (``src|alt`` or ``image@bbox``)
    plus nearby text; 'figure' when nothing matches."""
    haystack = (meta + " " + context[:CONTEXT_CHARS]).lower()
    for figure_type, keywords in _TYPE_KEYWORDS:
        if any(k in haystack for k in keywords):
            return figure_type
    return "figure"


def describe_figure(meta: str, context: str = "") -> str:
    """Deterministic one-line description of a figure span."""
    figure_type = classify_figure_type(meta, context)
    bbox = _BBOX_RE.search(meta or "")
    if bbox:
        x0, y0, x1, y1 = (float(v) for v in bbox.groups())
        size = f"{x1 - x0:g}x{y1 - y0:g}pt"
        return f"{figure_type} ({size}) at ({x0:g}, {y0:g})"
    if meta and "|" in meta:
        src, alt = meta.split("|", 1)
        label = alt.strip() or src.strip() or "untitled"
        return f"{figure_type}: {label}"
    return figure_type


def caption_spans(spans: list[dict], unit_texts: dict[int, str]) -> list[dict]:
    """Attach (figure_type, description) to every figure span.

    ``unit_texts`` maps unit_id → that unit's best text (the caption
    context, J7). Returns new span dicts; non-figure spans pass through.
    """
    out = []
    for span in spans:
        if span.get("kind") != "figure":
            out.append(span)
            continue
        context = unit_texts.get(span.get("unit_id", 0), "")
        enriched = dict(span)
        enriched["figure_type"] = classify_figure_type(span.get("meta", ""), context)
        enriched["description"] = describe_figure(span.get("meta", ""), context)
        out.append(enriched)
    return out
