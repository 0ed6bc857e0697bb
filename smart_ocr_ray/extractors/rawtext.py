"""Raw-text fallback extractor ("rawtext") — the last-resort repair path.

Tag-strips the payload bytes with the normalizer's HTML-strip rules and
treats whatever text survives as one prose unit. Quality is poor by
design; it exists so the repair router (C3) always has an untried
family to route hallucination/garbage failures to, mirroring how the
reference's fallback chain always terminates
(``/root/reference/src/socr/pipeline/repair.py:178-208``).
"""

from __future__ import annotations

import re

from .base import Block, PROSE, UnitResult
from .layout import MAGIC

_TAG_RE = re.compile(r"<[^>]+>")
_SCRIPT_RE = re.compile(r"<(script|style)[^>]*>.*?</\1>", re.IGNORECASE | re.DOTALL)


def extract_rawtext(html: bytes, text_layer: str = "") -> list[UnitResult]:
    if html.startswith(MAGIC) or not html:
        # Binary payloads have no strippable markup, and a text layer
        # the assessment rejected must not be resurrected here (it
        # would launder garbage layers past the audit).
        return [UnitResult(unit_id=1, error="no markup to strip")]
    else:
        markup = html.decode("utf-8", "replace")
        markup = _SCRIPT_RE.sub(" ", markup)
        text = _TAG_RE.sub(" ", markup)
    paras = [" ".join(p.split()) for p in re.split(r"\n\s*\n", text)]
    blocks = [Block(PROSE, p) for p in paras if p]
    if not blocks:
        return [UnitResult(unit_id=1, error="no text recovered")]
    return [UnitResult(unit_id=1, blocks=blocks)]
