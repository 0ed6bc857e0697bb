"""Consensus attempt scoring and agreement metrics (F5–F7, G5–G6).

Semantics from ``/root/reference/src/socr/pipeline/consensus.py``:
grounded scoring vs a reference text (WER-dominated, 108-169),
ungrounded heuristic (172-191), sequence-aware pairwise agreement
(199-221) and discrepancy detection (224-252).
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field

from .editdist import wer

_STRUCT_LIST_RE = re.compile(r"^[-*+]\s")
_STRUCT_NUM_RE = re.compile(r"^\d+\.\s")


def count_structure(text: str) -> int:
    """Count structural markdown lines: headers, table rows, list items
    (consensus.py:108-119)."""
    count = 0
    for line in text.splitlines():
        stripped = line.strip()
        if stripped.startswith("#"):
            count += 1
        elif stripped.startswith("|") and stripped.endswith("|"):
            count += 1
        elif _STRUCT_LIST_RE.match(stripped) or _STRUCT_NUM_RE.match(stripped):
            count += 1
    return count


@dataclass
class Attempt:
    """One extraction attempt for a (url, unit) — row analog of PageOutput."""

    extractor: str
    text: str
    audit_passed: bool
    failure_mode: str = "none"
    confidence: float = 0.0
    spans: list = field(default_factory=list)
    processing_ms: float = 0.0

    @property
    def word_count(self) -> int:
        return len(self.text.split())


def score_attempt(attempt: Attempt, reference_text: str = "") -> float:
    """Dispatch grounded/ungrounded (consensus.py:122-134)."""
    if reference_text.strip():
        return score_attempt_grounded(attempt, reference_text)
    return score_attempt_ungrounded(attempt)


def score_attempt_grounded(attempt: Attempt, reference_text: str) -> float:
    """(1-min(WER,2))*70 + 15·audit - 20·hallucination + 5·min(struct_ratio,1)
    (consensus.py:137-169)."""
    wer_clamped = min(wer(attempt.text, reference_text), 2.0)
    fidelity = (1.0 - wer_clamped) * 70.0
    audit_bonus = 15.0 if attempt.audit_passed else 0.0

    ref_wc = len(reference_text.split())
    hallucination_penalty = -20.0 if ref_wc > 0 and attempt.word_count > ref_wc * 1.5 else 0.0

    ref_struct = max(count_structure(reference_text), 1)
    struct_bonus = 5.0 * min(count_structure(attempt.text) / ref_struct, 1.0)
    return fidelity + audit_bonus + hallucination_penalty + struct_bonus


def score_attempt_ungrounded(attempt: Attempt) -> float:
    """log1p(wc) + 5·log1p(struct) + 10·audit + 5·confidence
    (consensus.py:172-191)."""
    return (
        math.log1p(attempt.word_count)
        + math.log1p(count_structure(attempt.text)) * 5.0
        + (10.0 if attempt.audit_passed else 0.0)
        + attempt.confidence * 5.0
    )


def agreement_score(text_a: str, text_b: str) -> float:
    """1 - WER, clamped to [0, 1] (consensus.py:199-207)."""
    return max(0.0, 1.0 - wer(text_a, text_b))


def pairwise_agreement(texts: list[str]) -> float:
    """Mean pairwise agreement over all attempt pairs (consensus.py:210-221)."""
    if len(texts) < 2:
        return 1.0
    total, count = 0.0, 0
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            total += agreement_score(texts[i], texts[j])
            count += 1
    return total / count if count else 1.0


def find_discrepancies(attempts: list[Attempt]) -> list[str]:
    """Word-count spread >30% of mean; audit divergence (consensus.py:224-252)."""
    discs: list[str] = []
    if len(attempts) < 2:
        return discs

    wcs = [(a.extractor, a.word_count) for a in attempts]
    values = [wc for _, wc in wcs]
    avg = sum(values) / len(values) if values else 1
    if avg > 0 and (max(values) - min(values)) / avg > 0.3:
        ordered = sorted(wcs, key=lambda x: x[1], reverse=True)
        discs.append(
            "Word count spread: " + ", ".join(f"{e}={w}" for e, w in ordered)
        )

    statuses = {a.extractor: a.audit_passed for a in attempts}
    passed = [e for e, v in statuses.items() if v]
    failed = [e for e, v in statuses.items() if not v]
    if passed and failed:
        discs.append(
            f"Audit divergence: passed=[{', '.join(passed)}], "
            f"failed=[{', '.join(failed)}]"
        )
    return discs


def select_best(attempts: list[Attempt], reference_text: str = "") -> int:
    """Index of the winning attempt (consensus.py:402-405 argmax).

    Single attempt short-circuits; ties break to the earliest attempt
    (deterministic). Scores are grounded when a native reference text
    exists, ungrounded otherwise.
    """
    if len(attempts) == 1:
        return 0
    best_idx, best_score = 0, float("-inf")
    for i, attempt in enumerate(attempts):
        s = score_attempt(attempt, reference_text)
        if s > best_score:
            best_idx, best_score = i, s
    return best_idx
