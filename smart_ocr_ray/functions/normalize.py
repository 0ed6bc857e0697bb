"""Output normalizer — THE byte-identity-critical operator (M9–M11).

Reproduces the semantics of the reference normalizer
(``/root/reference/src/socr/core/normalizer.py:91-240``): an *ordered*
rule pipeline whose exact sequence must be preserved for byte-stable
output:

  1. engine/extractor-specific strips (grounding tags, bboxes, HTML
     tags, metadata headers, LaTeX pre/postamble, missing-page markers)
  2. CRLF/CR → LF
  3. whole-output markdown-fence strip (only when the fence wraps the
     entire output)
  4. repeated-line collapse (same ≥20-char line 5+× consecutively → 1)
  5. NFKC unicode normalization
  6. smart-quote / dash / ellipsis / ligature → ASCII map
  7. trailing-whitespace strip per line
  8. 3+ blank lines → 2
  9. final strip()

All regexes are compiled at module import (once per worker process).
``normalize`` is idempotent for text that does not itself begin with a
markdown fence — the pipeline relies on this to re-normalize merged
chunk texts at assembly time.
"""

from __future__ import annotations

import re
import unicodedata

# --- extractor-specific patterns (normalizer.py:27-54) ---
_RE_REF_TAG = re.compile(r"<\|ref\|>.*?<\|/ref\|>")
_RE_DET_TAG = re.compile(r"<\|det\|>\[\[.*?\]\]<\|/det\|>")
_RE_SPECIAL_TOKEN = re.compile(r"<\|[^|]+\|>")
_RE_BBOX = re.compile(r"\[\[\d+,\s*\d+,\s*\d+,\s*\d+\]\]")
_RE_LATEX_PREAMBLE = re.compile(
    r"^\\documentclass(?:\[.*?\])?\{.*?\}(?:.*?\\begin\{document\})?", re.DOTALL
)
_RE_LATEX_END = re.compile(r"\\end\{document\}\s*$")
_RE_MISSING_PAGE = re.compile(r"\[MISSING_PAGE_POST(?::[\w]+)?\]")
_RE_MISSING_PAGE_EMPTY = re.compile(r"\[MISSING_PAGE_EMPTY(?::[\w]+)?\]")
_RE_META_HEADER = re.compile(r"^#\s*OCR Results\s*\n+")
_RE_META_LINES = re.compile(
    r"^\*\*(?:Original File|Full Path|Processed|Processing Time):\*\*[^\n]*\n?",
    re.MULTILINE,
)
_RE_HTML_BR = re.compile(r"<br\s*/?>", re.IGNORECASE)
_RE_HTML_TAG = re.compile(r"<[^>]+>")

# --- generic patterns (normalizer.py:56-73) ---
_RE_TRAILING_WS = re.compile(r"[ \t]+$", re.MULTILINE)
_RE_EXCESS_BLANK = re.compile(r"\n{3,}")
_RE_MD_IMAGE = re.compile(r"!\[[^\]]*\]\([^)]+\)")
_RE_MD_FENCE = re.compile(r"^```(?:markdown|md|text|ocr)?\s*\n(.*?)```\s*$", re.DOTALL)
_RE_LINE_REPEAT = re.compile(r"^(.{20,})\n(?:\1\n){4,}", re.MULTILINE)

# Smart quotes / ligatures → ASCII (normalizer.py:76-89). Applied AFTER
# NFKC, same order as the reference (NFKC already folds the ligatures;
# the explicit map also covers the quote/dash/ellipsis chars NFKC keeps).
_UNICODE_MAP = {
    "\u2018": "'",
    "\u2019": "'",
    "\u201c": '"',
    "\u201d": '"',
    "\u2013": "-",
    "\u2014": "--",
    "\u2026": "...",
    "\ufb01": "fi",
    "\ufb02": "fl",
    "\ufb03": "ffi",
    "\ufb04": "ffl",
    "\ufb00": "ff",
}


def clean_grounded(text: str) -> str:
    """Strip grounding tags / bboxes / HTML remnants (normalizer.py:123-131)."""
    text = _RE_REF_TAG.sub("", text)
    text = _RE_DET_TAG.sub("", text)
    text = _RE_SPECIAL_TOKEN.sub("", text)
    text = _RE_BBOX.sub("", text)
    text = _RE_HTML_BR.sub("\n", text)
    text = _RE_HTML_TAG.sub("", text)
    return text


def clean_meta_header(text: str) -> str:
    """Strip ``# OCR Results`` style metadata headers (normalizer.py:133-137,
    engines/base.py:328-360)."""
    text = _RE_META_HEADER.sub("", text)
    text = _RE_META_LINES.sub("", text)
    return text


def clean_latex_wrapper(text: str) -> str:
    """Strip LaTeX document pre/postamble (normalizer.py:139-143)."""
    text = _RE_LATEX_PREAMBLE.sub("", text)
    text = _RE_LATEX_END.sub("", text)
    return text


def clean_missing_page_markers(text: str) -> str:
    """Strip ``[MISSING_PAGE_*]`` markers (normalizer.py:145-148)."""
    text = _RE_MISSING_PAGE.sub("", text)
    text = _RE_MISSING_PAGE_EMPTY.sub("", text)
    return text


# Extractor-name → specific cleaner, the analog of the reference's
# engine dispatch (normalizer.py:106-115). Our extractor names map onto
# the reference families they emulate.
_SPECIFIC_CLEANERS = {
    "grounded": clean_grounded,
    "meta": clean_meta_header,
    "latex": clean_latex_wrapper,
    "marker": clean_missing_page_markers,
}


def strip_phantom_images(text: str, live_paths: frozenset[str] = frozenset()) -> str:
    """Remove ``![alt](path)`` refs whose path is not a live span (M10).

    The reference checks filesystem existence (normalizer.py:153-205);
    columnar rebuild: a ref is "live" when its path is in *live_paths*
    (recorded figure spans).  http/https/data URIs are never stripped.
    """
    if "![" not in text:
        return text

    def _replace(match: re.Match) -> str:
        full = match.group(0)
        path_str = full[full.rfind("(") + 1 : -1].strip()
        if path_str.startswith(("http://", "https://", "data:")):
            return full
        if path_str in live_paths:
            return full
        return ""

    text = _RE_MD_IMAGE.sub(_replace, text)
    return _RE_EXCESS_BLANK.sub("\n\n", text)


def normalize(text: str, extractor: str = "") -> str:
    """Normalize extractor output text. Rule order is the contract."""
    if not text:
        return text

    if not extractor and "\n" not in text and "\r" not in text and text.isascii():
        # Single-line ASCII fast path — provably equal to the full rule
        # pipeline: CRLF/fence/line-repeat/blank-collapse all require a
        # newline; NFKC and the unicode map are identity on ASCII;
        # trailing-ws + final strip() reduce to strip(). Most block
        # texts (whitespace-collapsed inline prose) take this path.
        return text.strip()

    cleaner = _SPECIFIC_CLEANERS.get(extractor.lower()) if extractor else None
    if cleaner is not None:
        text = cleaner(text)

    # Generic normalization (normalizer.py:209-240), exact order.
    text = text.replace("\r\n", "\n").replace("\r", "\n")

    fence_match = _RE_MD_FENCE.match(text.strip())
    if fence_match:
        text = fence_match.group(1)

    text = _RE_LINE_REPEAT.sub(r"\1\n", text)
    text = unicodedata.normalize("NFKC", text)
    for src, dst in _UNICODE_MAP.items():
        text = text.replace(src, dst)
    text = _RE_TRAILING_WS.sub("", text)
    text = _RE_EXCESS_BLANK.sub("\n\n", text)
    return text.strip()


# Canonical document-assembly separator (result.py:119-127, state.py:148).
UNIT_SEPARATOR = "\n\n---\n\n"


def split_units(text: str) -> list[str]:
    """Inverse of assembly: split document text back into units (M16,
    hpc_pipeline.py:229-241)."""
    return text.split(UNIT_SEPARATOR)
