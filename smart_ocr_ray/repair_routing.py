"""Repair routing policy (C3) — failure mode → next extractor.

The deterministic per-row analog of the reference's RepairRouter
(``/root/reference/src/socr/pipeline/repair.py:85-281``): given the
dominant failure mode and the set of extractors already tried, pick the
best untried extractor. The reference's engine families / cloud / light
/ capable tables (repair.py:19-53) map onto our extractor inventory:

  family    members      role analog
  --------  -----------  -------------------------------------
  native    native       free text layer (Tier 1)
  dom       dom          light CLI engine (Tier 2)
  layout    layout       capable heavy engine (Tier 3 / "cloud")
  raw       rawtext      last-resort light fallback

Routing matrix (repair.py:123-136):
  hallucination → different family · refusal → capable("cloud") ·
  garbage/low_word_count/truncated → capable · timeout → light ·
  anything else → first untried in chain order.
"""

from __future__ import annotations

from .functions import audit as fm

_FAMILY = {"native": "native", "dom": "dom", "layout": "layout", "rawtext": "raw"}

# Quality-ordered "capable" extractors (repair.py:48-53 analog).
_CAPABLE = ["layout", "dom", "rawtext"]
# Fast/light extractors for timeout recovery (repair.py:41-45 analog).
_LIGHT = ["native", "rawtext", "dom"]

# Fallback chain per payload kind: primary first, then alternatives that
# can actually parse that payload (repair.py:183-208 _full_chain analog;
# chain membership is constrained by payload kind instead of engine
# availability probes).
CHAINS = {
    "html": ["dom", "rawtext", "native"],
    "binary": ["layout", "rawtext", "native"],
    "empty": ["native", "rawtext"],
}

PRIMARY_FOR_ROUTE = {"native": "native", "html": "dom", "binary": "layout"}


def chain_for(doc_kind: str, route: str) -> list[str]:
    """Ordered full chain: route primary first, then the kind chain."""
    primary = PRIMARY_FOR_ROUTE.get(route)
    chain = CHAINS.get(doc_kind, CHAINS["empty"])
    seen: list[str] = []
    for name in ([primary] if primary else []) + chain:
        if name and name not in seen:
            seen.append(name)
    return seen


def select_repair_extractor(
    failure_mode: str, tried: set[str], doc_kind: str, route: str
) -> str | None:
    """Pick the next extractor, or None when the chain is exhausted."""
    candidates = [e for e in chain_for(doc_kind, route) if e not in tried]
    if not candidates:
        return None

    if failure_mode == fm.HALLUCINATION:
        tried_families = {_FAMILY[e] for e in tried if e in _FAMILY}
        for e in candidates:
            if _FAMILY.get(e) not in tried_families:
                return e
        return candidates[0]
    if failure_mode == fm.REFUSAL:
        return _first_in(_CAPABLE, candidates)
    if failure_mode in (fm.GARBAGE, fm.LOW_WORD_COUNT, fm.TRUNCATED):
        return _first_in(_CAPABLE, candidates)
    if failure_mode == fm.TIMEOUT:
        return _first_in(_LIGHT, candidates)
    return candidates[0]


def _first_in(preference: list[str], candidates: list[str]) -> str:
    for e in preference:
        if e in candidates:
            return e
    return candidates[0]


def dominant_failure(failure_modes: list[str]) -> str:
    """Most recent non-none failure (repair.py:247-257): scan from the
    end; empty history → empty_output."""
    for mode in reversed(failure_modes):
        if mode and mode != fm.NONE:
            return mode
    return fm.EMPTY_OUTPUT
