"""Text-layer assessment, content detection, difficulty, routing (M1–M8).

The analog of the reference's born-digital detector
(``/root/reference/src/socr/core/born_digital.py:188-404``, thresholds
at ``110-131``) and difficulty classifier
(``/root/reference/src/socr/core/difficulty.py:58-165``), re-expressed
over the pages-table columns: the ``text`` column plays the PDF
text-layer role, the ``html`` binary payload plays the page-structure
role.

Routing contract (C2, 3-tier):
  * ``native``  — the text layer passes the full assessment cascade and
    the row has no complex content needing structured extraction.
  * ``html``    — UTF-8 HTML payload → DOM main-content extractor.
  * ``binary``  — layout payload → actor-pool layout parser.
  * ``empty``   — no payload and no text layer → typed failure row.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

# Assessment thresholds (born_digital.py:110-131).
MIN_CHARS_FOR_TEXT_LAYER = 50
MIN_WORDS = 15
MAX_GARBAGE_RATIO = 0.05
MAX_SPACE_RATIO = 0.60
MIN_AVG_WORD_LENGTH = 2.5
MAX_AVG_WORD_LENGTH = 20.0

_CID_RE = re.compile(r"\(cid:\d+\)")

# LaTeX math detection (born_digital.py:477-506).
_LATEX_COMMANDS_RE = re.compile(
    r"\\(?:frac|sum|int|prod|lim|infty|partial|nabla|alpha|beta|gamma"
    r"|delta|epsilon|theta|lambda|sigma|omega|begin\{(?:equation|align"
    r"|gather|math|displaymath)\})"
)
_DISPLAY_MATH_RE = re.compile(r"\$\$.+?\$\$", re.DOTALL)
_BRACKET_MATH_RE = re.compile(r"\\\[.+?\\\]", re.DOTALL)

# Cheap byte-level content sniffs over the html payload.
LAYOUT_MAGIC = b"%FIX-LAYOUT"
_TABLE_TAG_RE = re.compile(rb"<table[\s>]", re.IGNORECASE)
_IMG_TAG_RE = re.compile(rb"<img[\s>]", re.IGNORECASE)

# Difficulty thresholds (difficulty.py:50-55) — html analogs.
MAX_IMAGES_EASY = 2
MAX_BLOCKS_EASY = 30
COLUMN_GAP_FRACTION = 0.15  # difficulty.py:224
MAX_COLUMNS = 4


def strict_garbage_ratio(text: str) -> float:
    """Strict garbage ratio over the raw text layer: control chars,
    replacement char, private-use area, surrogates (born_digital.py:668-693).
    """
    if not text:
        return 0.0
    garbage = 0
    for ch in text:
        cp = ord(ch)
        if cp < 0x20 and cp not in (0x09, 0x0A, 0x0D):
            garbage += 1
        elif cp == 0xFFFD:
            garbage += 1
        elif 0xE000 <= cp <= 0xF8FF:
            garbage += 1
        elif 0xD800 <= cp <= 0xDFFF:
            garbage += 1
    return garbage / len(text)


def detect_equations_text(text: str) -> bool:
    """LaTeX markup detection in a text layer (born_digital.py:477-506)."""
    if not text:
        return False
    if _LATEX_COMMANDS_RE.search(text):
        return True
    if _DISPLAY_MATH_RE.search(text):
        return True
    return bool(_BRACKET_MATH_RE.search(text))


def detect_columnar_lines(text: str) -> bool:
    """Borderless-table heuristic: ≥15 single-token non-empty lines AND
    >50% of non-empty lines single-token (born_digital.py:429-447)."""
    lines = [l.strip() for l in text.splitlines()]
    nonempty = [l for l in lines if l]
    if not nonempty:
        return False
    single_token = sum(1 for l in nonempty if len(l.split()) == 1)
    return single_token >= 15 and single_token / len(nonempty) > 0.50


def estimate_columns(x_centers: list[float], page_width: float) -> int:
    """Column count from block x-centers: sorted-gap clustering with a
    gap threshold of 15% page width, capped at 4 (difficulty.py:200-231).
    """
    if len(x_centers) < 2 or page_width <= 0:
        return 1
    centers = sorted(x_centers)
    gap_threshold = page_width * COLUMN_GAP_FRACTION
    columns = 1
    for i in range(1, len(centers)):
        if centers[i] - centers[i - 1] > gap_threshold:
            columns += 1
    return min(columns, MAX_COLUMNS)


@dataclass
class Assessment:
    """Per-row analog of PageAssessment (born_digital.py:39-63)."""

    is_native: bool
    native_text: str
    confidence: float
    char_count: int
    word_count: int
    has_tables: bool
    has_figures: bool
    has_equations: bool
    needs_enhancement: bool
    doc_kind: str  # html | binary | empty
    difficulty: str  # easy | hard
    route: str  # native | html | binary | empty
    notes: list[str] = field(default_factory=list)


def sniff_doc_kind(html: bytes) -> str:
    """Payload sniff from magic bytes (analog of document.py:43-56)."""
    if not html:
        return "empty"
    if html.startswith(LAYOUT_MAGIC):
        return "binary"
    return "html"


def assess_text_layer(text: str) -> tuple[bool, float, list[str]]:
    """Decision cascade on the raw text layer (born_digital.py:213-348).

    Returns (is_native, confidence, notes). Order of checks and the
    confidence attached to each rejection follow the reference exactly.
    """
    notes: list[str] = []
    char_count = len(text)
    words = text.split()
    word_count = len(words)

    if char_count < MIN_CHARS_FOR_TEXT_LAYER:
        notes.append(f"insufficient text layer ({char_count} chars)")
        return False, 0.95, notes
    if word_count < MIN_WORDS:
        notes.append(f"too few words ({word_count})")
        return False, 0.85, notes
    if _CID_RE.search(text):
        notes.append("CID font mapping artifacts detected")
        return False, 0.95, notes
    g_ratio = strict_garbage_ratio(text)
    if g_ratio > MAX_GARBAGE_RATIO:
        notes.append(f"high garbage ratio ({g_ratio:.1%})")
        return False, 0.80, notes
    space_ratio = text.count(" ") / max(char_count, 1)
    if space_ratio > MAX_SPACE_RATIO:
        notes.append(f"excessive spacing ({space_ratio:.1%})")
        return False, 0.75, notes
    avg_word_len = sum(len(w) for w in words) / max(word_count, 1)
    if avg_word_len < MIN_AVG_WORD_LENGTH:
        notes.append(f"avg word length too short ({avg_word_len:.1f})")
        return False, 0.70, notes
    if avg_word_len > MAX_AVG_WORD_LENGTH:
        notes.append(f"avg word length too long ({avg_word_len:.1f})")
        return False, 0.70, notes

    confidence = _native_confidence(word_count, g_ratio, avg_word_len)
    notes.append("native: clean text layer detected")
    return True, confidence, notes


def _native_confidence(word_count: int, garbage_ratio: float, avg_word_len: float) -> float:
    """Base 0.80 + signal bonuses, capped 1.0 (born_digital.py:695-732).

    The font-count bonuses of the reference have no analog in a bare
    text layer and are omitted; the remaining bonuses match.
    """
    confidence = 0.80
    if word_count > 100:
        confidence += 0.05
    if word_count > 300:
        confidence += 0.05
    if garbage_ratio < 0.01:
        confidence += 0.03
    if 3.5 <= avg_word_len <= 7.0:
        confidence += 0.02
    return min(confidence, 1.0)


def assess_row(html: bytes, text: str) -> Assessment:
    """Full per-row analysis: kind sniff, text-layer cascade, content
    flags, difficulty, route. Pure and cheap — no payload parse."""
    doc_kind = sniff_doc_kind(html)
    is_native, confidence, notes = assess_text_layer(text or "")

    # Content flags: byte sniffs on the HTML payload + text-layer heuristics.
    if doc_kind == "html":
        has_tables = bool(_TABLE_TAG_RE.search(html)) or detect_columnar_lines(text or "")
        has_figures = bool(_IMG_TAG_RE.search(html))
        has_equations = detect_equations_text(text or "") or b"$$" in html or b"\\frac" in html
    else:
        has_tables = detect_columnar_lines(text or "")
        has_figures = False
        has_equations = detect_equations_text(text or "")

    has_complex = has_tables or has_figures or has_equations
    # Difficulty (difficulty.py:124-151): hints force HARD; the html
    # analog of the structural counts is applied by the extractors.
    difficulty = "hard" if has_complex else "easy"

    # Routing (C2). A native text layer wins only for simple content;
    # complex content goes through structured extraction (the reference
    # swaps get_text() for extract_structured / flags OCR enhancement,
    # born_digital.py:363-388).
    if doc_kind == "empty" and not (text or "").strip():
        route = "empty"
    elif doc_kind == "binary":
        # Layout payloads are always parsed: the text layer is a single
        # document-level column and cannot be trusted to cover every
        # page of a multi-page payload (the reference assesses per page;
        # here the per-page analog happens inside the layout parse). The
        # assessed text layer still serves as the consensus grounding
        # reference and the assembly fallback.
        route = "binary"
    elif is_native and not has_complex:
        route = "native"
    elif doc_kind == "html":
        route = "html"
    elif is_native:
        route = "native"  # complex flags but no payload to re-parse
    else:
        route = "empty"

    return Assessment(
        is_native=is_native,
        native_text=(text or "").strip() if is_native else "",
        confidence=confidence,
        char_count=len(text or ""),
        word_count=len((text or "").split()),
        has_tables=has_tables,
        has_figures=has_figures,
        has_equations=has_equations,
        needs_enhancement=has_complex,
        doc_kind=doc_kind,
        difficulty=difficulty,
        route=route,
        notes=notes,
    )
