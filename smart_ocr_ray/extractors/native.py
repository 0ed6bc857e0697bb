"""Native text-layer extractor ("native") — Tier 1, the free path.

The analog of the reference's born-digital native-text pass-through
(``/root/reference/src/socr/pipeline/orchestrator.py:440-448``): when
the pre-existing ``text`` column passed the assessment cascade, the
text layer *is* the extraction. Paragraph structure is inferred from
blank lines; single-token columnar runs are kept verbatim (structured
table text belongs to the dom/layout extractors).
"""

from __future__ import annotations

from .base import Block, PROSE, UnitResult


def extract_native(html: bytes, text_layer: str = "") -> list[UnitResult]:
    text = (text_layer or "").strip()
    if not text:
        return [UnitResult(unit_id=1, error="empty text layer")]
    blocks = [
        Block(PROSE, " ".join(para.split()))
        for para in text.split("\n\n")
        if para.strip()
    ]
    return [UnitResult(unit_id=1, blocks=blocks)]
