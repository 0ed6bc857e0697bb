"""Quality-heuristics audit + failure-mode classification (M12–M13).

Reproduces the ordered check pipeline of the reference checker
(``/root/reference/src/socr/audit/heuristics.py:85-221``) and the
failure-mode scorer (``/root/reference/src/socr/audit/scorer.py``):

  empty → refusal (early exit) → CID artifacts → hallucination loops →
  formatting hallucination (≥2 patterns) → word count ≥50 →
  truncation (<100 words/page when pages>5) → avg word length ∈[2,15]
  (warning) → garbage ratio ≤0.15 with math-dense exemption →
  unicode issues (warning) → repeated patterns (warning) → structure.

The classifier maps failing metrics to failure modes and picks the
primary by priority (scorer.py:19-26):
hallucination 6 > refusal 5 > empty 4 > truncated 3 > garbage 2 >
low_word_count 1.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

# Failure-mode string constants (result.py:33-50). Plain strings — they
# become Arrow dictionary-encoded columns.
NONE = "none"
TIMEOUT = "timeout"
EMPTY_OUTPUT = "empty_output"
AUDIT_FAILED = "audit_failed"
HALLUCINATION = "hallucination"
REFUSAL = "refusal"
GARBAGE = "garbage"
LOW_WORD_COUNT = "low_word_count"
TRUNCATED = "truncated"
PARSE_ERROR = "parse_error"  # rebuild analog of cli_error/api_error

# Priority for primary-failure selection (scorer.py:19-26).
_PRIORITY = {
    LOW_WORD_COUNT: 1,
    GARBAGE: 2,
    TRUNCATED: 3,
    EMPTY_OUTPUT: 4,
    REFUSAL: 5,
    HALLUCINATION: 6,
}

# LLM-refusal patterns (heuristics.py:42-53), case-insensitive.
_REFUSAL_RE = re.compile(
    r"I cannot read|I am sorry|I'm sorry|As an AI|I'm unable to"
    r"|cannot process this image|I cannot assist|I can't read"
    r"|unable to extract|cannot extract text",
    re.IGNORECASE,
)

# Formatting-instruction hallucination bank (heuristics.py:57-71).
# The count needs DISTINCT patterns present; most patterns are plain
# case-insensitive literals, so they run as memchr-fast substring checks
# on a lowercased copy (13 regex scans of the full text dominated the
# audit profile). The two genuinely regex-shaped patterns keep a cheap
# literal guard before their regex runs.
_HALLUC_LITERALS = (
    ("use a standard font",),
    ("include links to other resources",),
    ("include page numbers",),
    ("include captions",),
    ("proofread your work",),
    ("double-spaced", "double spaced"),
    ("single-spaced", "single spaced"),
    ("times new roman",),
    ("formatting guidelines",),
    ("submission guidelines",),
    ("page margins",),
)
_HALLUC_PRINT_RE = re.compile(r"print on \d+\.?\d*\s*[x×]\s*\d+", re.IGNORECASE)
_HALLUC_INCLUDE_RE = re.compile(
    r"Include (?:all )?(?:figures|tables|links|references)", re.IGNORECASE
)

_CID_RE = re.compile(r"\(cid:\d+\)")
_SENTENCE_SPLIT_RE = re.compile(r"[.!?]\s+")
_GARBAGE_CHAR_RE = re.compile(r"[^\w\s.,!?;:\'\"()\[\]{}<>@#$%&*+=/\\-]")
_EXCESS_WS_RE = re.compile(r"\s{4,}")
_REPL_CHAR = "\ufffd"
_PRIVATE_USE_RE = re.compile("[\ue000-\uf8ff]")
_CONTROL_RE = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f]")
_REPEAT_CHAR_RE = re.compile(r"(.)\1{4,}")
_REPEAT_WORD_RE = re.compile(r"\b(\w+)\s+\1\s+\1\b", re.IGNORECASE)
_ALTERNATING_RE = re.compile(r"(..)\1{3,}")
_MD_HEADER_RE = re.compile(r"^#+\s+\w", re.MULTILINE)
_NUM_LIST_RE = re.compile(r"^\d+\.\s+\w", re.MULTILINE)
_BULLET_RE = re.compile(r"^[-*•]\s+\w", re.MULTILINE)

# Thresholds (heuristics.py:73-83).
MIN_WORD_COUNT = 50
MAX_GARBAGE_RATIO = 0.15
MIN_AVG_WORD_LENGTH = 2.0
MAX_AVG_WORD_LENGTH = 15.0


@dataclass
class AuditResult:
    """Flattened analog of HeuristicsResult + ScoringResult."""

    passed: bool
    failure_modes: list[str] = field(default_factory=list)
    primary_failure: str = NONE
    confidence: float = 1.0
    word_count: int = 0
    garbage_ratio: float = 0.0
    avg_word_length: float = 0.0
    has_structure: bool = False
    warnings: list[str] = field(default_factory=list)


def refusal_detected(text: str) -> bool:
    """Refusal scan: whole text when short (<200 words), else first 500
    chars (heuristics.py:236-252).

    The shortness test uses a bounded split (maxsplit=199): the result
    has <200 elements iff the full word count is <200, without
    materializing every token of a long document."""
    is_short = len(text.split(None, 199)) < 200
    search_text = text if is_short else text[:500]
    return bool(_REFUSAL_RE.search(search_text))


def cid_artifacts(text: str) -> bool:
    return bool(_CID_RE.search(text))


def hallucination_loop(text: str) -> bool:
    """Same ≥20-char sentence 3+× consecutively (heuristics.py:270-288)."""
    sentences = _SENTENCE_SPLIT_RE.split(text)
    if len(sentences) < 6:
        return False
    stripped = [s.strip() for s in sentences]
    for i in range(len(stripped) - 2):
        s = stripped[i]
        if len(s) < 20:
            continue
        if s == stripped[i + 1] == stripped[i + 2]:
            return True
    return False


def formatting_hallucination_count(text: str) -> int:
    """Number of DISTINCT bank patterns present (≥2 fails, heuristics
    223-234)."""
    low = text.lower()
    count = sum(1 for variants in _HALLUC_LITERALS if any(v in low for v in variants))
    if "print on" in low and _HALLUC_PRINT_RE.search(text):
        count += 1
    if "include " in low and _HALLUC_INCLUDE_RE.search(text):
        count += 1
    return count


def garbage_ratio(text: str) -> float:
    """Loose garbage ratio: regex char class + runs of 4+ whitespace
    (heuristics.py:290-303)."""
    if not text:
        return 0.0
    garbage_chars = len(_GARBAGE_CHAR_RE.findall(text))
    excessive_ws = len(_EXCESS_WS_RE.findall(text))
    return (garbage_chars + excessive_ws) / len(text)


def is_math_dense(text: str) -> bool:
    """>30% of chars in ``\\{}^_$`` → LaTeX, not garbage (heuristics.py:259-268)."""
    if not text:
        return False
    latex_chars = sum(text.count(c) for c in "\\{}^_$")
    return latex_chars / len(text) > 0.30


def unicode_issues(text: str) -> list[str]:
    issues = []
    if _REPL_CHAR in text:
        issues.append("replacement_chars")
    if _PRIVATE_USE_RE.search(text):
        issues.append("private_use_chars")
    if _CONTROL_RE.search(text):
        issues.append("control_chars")
    return issues


def repeated_patterns(text: str) -> list[str]:
    issues = []
    if _REPEAT_CHAR_RE.search(text):
        issues.append("repeated_chars")
    if _REPEAT_WORD_RE.search(text):
        issues.append("repeated_words")
    if _ALTERNATING_RE.search(text):
        issues.append("alternating_patterns")
    return issues


def has_structure(text: str) -> bool:
    if _MD_HEADER_RE.search(text) or _NUM_LIST_RE.search(text) or _BULLET_RE.search(text):
        return True
    return len(text.split("\n\n")) > 2


def audit(text: str, expected_units: int = 0) -> AuditResult:
    """Run the full ordered audit + failure classification on one text.

    ``expected_units`` plays the reference's ``expected_pages`` role in
    the truncation check (heuristics.py:156-165).
    """
    if not text or not text.strip():
        return AuditResult(
            passed=False,
            failure_modes=[EMPTY_OUTPUT],
            primary_failure=EMPTY_OUTPUT,
            confidence=0.75,
        )

    if refusal_detected(text):
        # Early exit, matching heuristics.py:104-111.
        return AuditResult(
            passed=False,
            failure_modes=[REFUSAL],
            primary_failure=REFUSAL,
            confidence=0.75,
        )

    modes: list[str] = []
    warnings: list[str] = []
    error_count = 0

    def _error(mode: str) -> None:
        nonlocal error_count
        error_count += 1
        if mode not in modes:
            modes.append(mode)

    if cid_artifacts(text):
        _error(GARBAGE)
    if hallucination_loop(text):
        _error(HALLUCINATION)
    if formatting_hallucination_count(text) >= 2:
        _error(HALLUCINATION)

    words = text.split()
    word_count = len(words)
    if word_count < MIN_WORD_COUNT:
        _error(LOW_WORD_COUNT)

    if expected_units > 5 and word_count > 0:
        if word_count / expected_units < 100:
            _error(TRUNCATED)

    avg_word_len = sum(map(len, words)) / len(words) if words else 0.0
    if words and not (MIN_AVG_WORD_LENGTH <= avg_word_len <= MAX_AVG_WORD_LENGTH):
        warnings.append("avg_word_length")

    math_dense = is_math_dense(text)
    g_ratio = garbage_ratio(text)
    if g_ratio > MAX_GARBAGE_RATIO and not math_dense:
        _error(GARBAGE)

    passed = error_count == 0
    if passed:
        # Warning-level scans (unicode issues, repeated patterns,
        # structure) feed only the confidence estimate of FAILED
        # diagnoses (scorer.py:132-151) — skipping them on the passing
        # fast path removes several full-text regex scans per document
        # without changing any verdict or downstream value.
        return AuditResult(
            passed=True,
            word_count=word_count,
            garbage_ratio=g_ratio,
            avg_word_length=avg_word_len,
            has_structure=False,
            warnings=warnings,
        )

    uni = unicode_issues(text)
    warnings.extend(uni)
    rep = repeated_patterns(text)
    if rep:
        warnings.append("repeated_patterns")

    primary = max(modes, key=lambda m: _PRIORITY.get(m, 0))
    confidence = _estimate_confidence(error_count, len(warnings))
    return AuditResult(
        passed=False,
        failure_modes=modes,
        primary_failure=primary,
        confidence=confidence,
        word_count=word_count,
        garbage_ratio=g_ratio,
        avg_word_length=avg_word_len,
        has_structure=has_structure(text),
        warnings=warnings,
    )


def _estimate_confidence(error_count: int, warning_count: int) -> float:
    """Diagnosis confidence from corroborating failures (scorer.py:132-151)."""
    if error_count >= 2:
        return 0.95
    if error_count == 1 and warning_count >= 1:
        return 0.85
    if error_count == 1:
        return 0.75
    return 0.5
