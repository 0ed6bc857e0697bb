"""Repair routing policy matrix (C3 — mirrors the reference's
tests/test_repair_router.py:154-247 pattern: failure mode × tried set →
selected extractor)."""

from smart_ocr_ray.functions import audit as fm
from smart_ocr_ray.repair_routing import (
    CHAINS,
    chain_for,
    dominant_failure,
    select_repair_extractor,
)


def test_chain_for_route_primary_first():
    assert chain_for("html", "html") == ["dom", "rawtext", "native"]
    assert chain_for("binary", "binary") == ["layout", "rawtext", "native"]
    assert chain_for("html", "native") == ["native", "dom", "rawtext"]


def test_hallucination_prefers_different_family():
    # dom (family 'dom') tried and hallucinated → rawtext ('raw' family).
    pick = select_repair_extractor(fm.HALLUCINATION, {"dom"}, "html", "html")
    assert pick == "rawtext"


def test_refusal_routes_capable():
    pick = select_repair_extractor(fm.REFUSAL, {"native"}, "html", "native")
    assert pick == "dom"  # most capable candidate for html payloads


def test_garbage_and_low_wc_route_capable():
    for mode in (fm.GARBAGE, fm.LOW_WORD_COUNT, fm.TRUNCATED):
        pick = select_repair_extractor(mode, {"layout"}, "binary", "binary")
        assert pick == "dom" or pick == "rawtext"  # next capable in chain
        pick2 = select_repair_extractor(mode, set(), "binary", "binary")
        assert pick2 == "layout"  # top capable when untried


def test_timeout_routes_light():
    pick = select_repair_extractor(fm.TIMEOUT, {"dom"}, "html", "html")
    assert pick == "native"


def test_default_routes_first_untried():
    pick = select_repair_extractor(fm.EMPTY_OUTPUT, set(), "html", "html")
    assert pick == "dom"
    pick = select_repair_extractor(fm.PARSE_ERROR, {"dom"}, "html", "html")
    assert pick == "rawtext"


def test_exhausted_chain_returns_none():
    tried = set(CHAINS["html"]) | {"dom"}
    assert select_repair_extractor(fm.GARBAGE, tried, "html", "html") is None


def test_tried_set_monotone_termination():
    # Walking the chain always terminates: each selection is untried.
    tried: set[str] = set()
    for _ in range(10):
        pick = select_repair_extractor(fm.GARBAGE, tried, "html", "html")
        if pick is None:
            break
        assert pick not in tried
        tried.add(pick)
    assert pick is None


def test_dominant_failure_most_recent_non_none():
    assert dominant_failure(["garbage", "none", "hallucination"]) == "hallucination"
    assert dominant_failure(["garbage", "hallucination", "none"]) == "hallucination"
    assert dominant_failure([]) == fm.EMPTY_OUTPUT
    assert dominant_failure(["none"]) == fm.EMPTY_OUTPUT
