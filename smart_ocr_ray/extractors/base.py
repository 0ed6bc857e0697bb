"""Extractor output model: blocks, spans, units.

A document payload parses into 1..N *units* (the analog of the
reference's pages, ``result.py:65-94``); a unit is an ordered list of
*blocks* (prose, heading, table, list, figure, equation). The unit's
text is the ``"\\n\\n"`` join of its block texts, and spans are
(kind, start, end) offsets into that text — the "span offsets" required
by the north star.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..functions.normalize import normalize

# Block kinds (span taxonomy).
PROSE = "prose"
HEADING = "heading"
TABLE = "table"
LIST = "list"
FIGURE = "figure"
EQUATION = "equation"
CODE = "code"
QUOTE = "quote"

BLOCK_JOIN = "\n\n"


@dataclass
class Block:
    kind: str
    text: str  # markdown text of the block ("" for figure placeholders)
    meta: str = ""  # e.g. figure src/alt


@dataclass
class UnitResult:
    """One extracted unit (page/segment) of a document."""

    unit_id: int  # 1-based within the document (0 = whole-doc)
    blocks: list[Block] = field(default_factory=list)
    error: str = ""  # non-empty → parse failure for this unit


def render_unit(unit: UnitResult) -> tuple[str, list[dict]]:
    """Render a unit's blocks to (normalized_text, spans).

    Each block's text is normalized individually, then blocks join with
    a blank line. Because ``normalize`` is idempotent and the join
    introduces exactly one blank line between stripped block texts, the
    whole-unit text equals ``normalize`` of itself — the spans stay
    byte-accurate through the downstream normalize stage.
    Figure blocks contribute a zero-length span at their position
    (their image bytes never enter the text).
    """
    parts: list[str] = []
    spans: list[dict] = []
    offset = 0
    for block in unit.blocks:
        text = normalize(block.text) if block.text else ""
        if block.kind == FIGURE and not text:
            spans.append(
                {"unit_id": unit.unit_id, "kind": FIGURE, "start": offset, "end": offset,
                 "meta": block.meta}
            )
            continue
        if not text:
            continue
        if parts:
            offset += len(BLOCK_JOIN)
        start = offset
        offset += len(text)
        parts.append(text)
        spans.append(
            {"unit_id": unit.unit_id, "kind": block.kind, "start": start, "end": offset,
             "meta": block.meta}
        )
    return BLOCK_JOIN.join(parts), spans
