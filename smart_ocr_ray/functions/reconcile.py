"""LaTeX-aware attempt reconciliation (F8 — the HPC pipeline's merge).

Semantics from ``/root/reference/src/socr/pipeline/reconciler.py``:
one attempt supplies the text structure (the "primary"), another
supplies better-typeset LaTeX (the "latex source"); equation blocks
from the source replace matching blocks in the primary, and display
equations missing from the primary are inserted at reference phrases
("as follows:", "given by:", ...) or the first paragraph break.

Block matching (reconciler.py:252-274): same display mode, then
normalized containment or token-Jaccard > 0.6. Normalization
(185-192): whitespace collapse, ``\\ `` and ``\\,`` → space.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_DISPLAY_RE = re.compile(r"\$\$([^$]+)\$\$", re.DOTALL)
_ENV_RE = re.compile(
    r"\\begin\{(equation|align|gather|multline)\*?\}(.+?)\\end\{\1\*?\}", re.DOTALL
)
_INLINE_RE = re.compile(r"(?<!\$)\$(?!\$)([^$]+)\$(?!\$)")
_WS_RE = re.compile(r"\s+")
_TOKEN_RE = re.compile(r"\\?\w+")
_INSERTION_PATTERNS = [
    re.compile(p, re.IGNORECASE)
    for p in (
        r"equation\s*\(\d+\)",
        r"formula\s*\(\d+\)",
        r"as follows:",
        r"given by:",
        r"defined as:",
        r"where:",
    )
]


@dataclass
class LatexBlock:
    content: str
    is_display: bool
    start: int
    end: int
    normalized: str


def normalize_latex(latex: str) -> str:
    out = _WS_RE.sub(" ", latex.strip())
    return out.replace("\\ ", " ").replace("\\,", " ")


def extract_latex_blocks(text: str) -> list[LatexBlock]:
    """Display math, environments, and inline math, position-sorted."""
    blocks: list[LatexBlock] = []
    for match in _DISPLAY_RE.finditer(text):
        blocks.append(
            LatexBlock(match.group(0), True, match.start(), match.end(),
                       normalize_latex(match.group(1)))
        )
    for match in _ENV_RE.finditer(text):
        blocks.append(
            LatexBlock(match.group(0), True, match.start(), match.end(),
                       normalize_latex(match.group(2)))
        )
    for match in _INLINE_RE.finditer(text):
        blocks.append(
            LatexBlock(match.group(0), False, match.start(), match.end(),
                       normalize_latex(match.group(1)))
        )
    blocks.sort(key=lambda b: b.start)
    return blocks


def latex_blocks_match(a: LatexBlock, b: LatexBlock) -> bool:
    """Same display mode + normalized containment or token-Jaccard > 0.6."""
    if a.is_display != b.is_display:
        return False
    norm_a, norm_b = a.normalized.lower(), b.normalized.lower()
    if norm_a in norm_b or norm_b in norm_a:
        return True
    tokens_a = set(_TOKEN_RE.findall(norm_a))
    tokens_b = set(_TOKEN_RE.findall(norm_b))
    union = tokens_a | tokens_b
    return bool(union) and len(tokens_a & tokens_b) / len(union) > 0.6


def find_insertion_point(text: str) -> int:
    """Reference-phrase position, else first paragraph break, else -1."""
    for pattern in _INSERTION_PATTERNS:
        match = pattern.search(text)
        if match:
            return match.end()
    para_break = text.find("\n\n")
    return para_break if para_break > 0 else -1


def merge_latex(base_text: str, latex_source_text: str) -> tuple[str, int]:
    """Merge source equations into the base text; returns
    (merged_text, blocks_merged)."""
    base_blocks = extract_latex_blocks(base_text)
    source_blocks = extract_latex_blocks(latex_source_text)
    if not source_blocks:
        return base_text, 0

    if not base_blocks:
        merged = base_text
        merged_count = 0
        for block in source_blocks:
            if not block.is_display:
                continue
            point = find_insertion_point(merged)
            if point >= 0:
                merged = merged[:point] + "\n\n" + block.content + "\n\n" + merged[point:]
                merged_count += 1
        return merged, merged_count

    merged = base_text
    replacements = 0
    for source_block in source_blocks:
        for base_block in base_blocks:
            if latex_blocks_match(base_block, source_block):
                merged = merged.replace(base_block.content, source_block.content)
                replacements += 1
                break
    return merged, replacements


def reconcile_attempts(
    primary_text: str, latex_text: str, primary_name: str = "primary",
    latex_name: str = "latex",
) -> dict:
    """Attempt-level reconciliation record (reconciler.py:67-135 shape)."""
    merged, count = merge_latex(primary_text, latex_text)
    return {
        "text": merged,
        "primary": primary_name,
        "latex_source": latex_name if count else "",
        "conflicts_resolved": count,
    }
