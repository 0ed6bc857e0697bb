"""Per-document processing core: analyze → extract → normalize → audit
→ repair loop → per-unit consensus → assembly.

This module is pure Python over one document (or one chunk of one) and
is the single source of truth shared by:

  * the Ray extract stage (``stages/extract.py``) which applies it per
    row inside an actor-pool ``map_batches``,
  * the assembly ``groupby("url").map_groups`` stage, and
  * the pytest oracle: ``oracle_extract`` processes a whole document
    unchunked; the distributed pipeline (with chunk explode + shuffle
    reassembly) must produce **byte-identical** ``extracted_text`` per
    url.

Control-flow parity with the reference's unified pipeline (C1–C5,
``/root/reference/src/socr/pipeline/orchestrator.py:74-142``):
analyze (born-digital cascade) → backbone extract by route → audit →
≤``max_retries`` repair rounds routed by failure mode → consensus
selection among multi-attempt units → assembly with the
passing > native > any precedence joined by ``"\\n\\n---\\n\\n"``
(state.py:111-148).
"""

from __future__ import annotations

import json
import time

from .extractors import EXTRACTORS
from .extractors.base import render_unit
from .functions import deadline
from .extractors.layout import extract_layout
from .functions import audit as au
from .functions.assess import Assessment, assess_row
from .functions.normalize import UNIT_SEPARATOR, normalize
from .functions.scoring import Attempt, pairwise_agreement, select_best
from .repair_routing import PRIMARY_FOR_ROUTE, dominant_failure, select_repair_extractor

MAX_RETRIES = 2  # config.py:107 analog
MAX_FIGURES_PER_DOC = 25  # FigureExtractor(max_total=25), figures/extractor.py:73-78


def cap_figure_spans(spans: list[dict], max_total: int = MAX_FIGURES_PER_DOC) -> list[dict]:
    """Document-level figure cap (O6): keep the first ``max_total``
    figure spans in reading order; all other span kinds pass through.

    Prefix-stable: capping each chunk's spans and then re-capping the
    concatenation equals capping the whole document, because the cap
    always keeps a reading-order prefix — so the chunked pipeline stays
    byte/span-identical to the unchunked oracle."""
    kept = 0
    out = []
    for s in spans:
        if s.get("kind") == "figure":
            if kept >= max_total:
                continue
            kept += 1
        out.append(s)
    return out


def _run_extractor(name: str, html: bytes, text_layer: str, unit_base: int):
    # Attempt boundary: the cheapest place to honor the cooperative
    # per-row deadline (functions/deadline.py) — a no-op when none is
    # armed (oracle/test paths).
    deadline.check()
    if name == "layout":
        return extract_layout(html, text_layer, unit_base=unit_base)
    return EXTRACTORS[name](html, text_layer)


def process_payload(
    html: bytes,
    text_layer: str,
    assessment: Assessment | None = None,
    unit_base: int = 0,
    max_retries: int = MAX_RETRIES,
    multi_extractor: bool = False,
    consensus: str = "heuristic",
) -> list[dict]:
    """Extract one payload (a whole document or one chunk) into unit rows.

    Returns one dict per unit with the best attempt selected. The repair
    loop is bounded (tried-set monotone, ≤ max_retries extra rounds) and
    entirely row-local — no driver state, per SURVEY.md §7.4(3).

    ``multi_extractor=True`` is the reference's multi-engine mode
    (orchestrator.py:640-716 + consensus.py:334-529): EVERY extractor in
    the payload's chain runs, all attempts accumulate per unit (D5
    union), and consensus scoring — grounded against the native text
    layer when one exists — selects the winner.
    """
    t0 = time.perf_counter()
    a = assessment or assess_row(html, text_layer)

    if a.route == "empty":
        return [
            _unit_row(
                unit_id=unit_base + 1,
                attempt=Attempt("none", "", False, au.EMPTY_OUTPUT),
                a=a,
                n_attempts=1,
                extractors_tried="none",
                agreement=1.0,
                ms=_ms(t0),
                attempt_failures=f"none:{au.EMPTY_OUTPUT}",
            )
        ]

    primary = PRIMARY_FOR_ROUTE[a.route]
    tried: list[str] = []
    unit_attempts: dict[int, list[Attempt]] = {}
    extractor = primary

    if multi_extractor:
        from .repair_routing import chain_for

        for name in chain_for(a.doc_kind, a.route):
            units = _run_extractor(name, html, text_layer, unit_base)
            tried.append(name)
            for u in units:
                deadline.check()  # audit/normalize per unit is real work (X4)
                unit_attempts.setdefault(u.unit_id, []).append(
                    _attempt_from_unit(u, name, a)
                )
        _reconcile_latex(unit_attempts)
        return _select_rows(unit_attempts, a, tried, t0, consensus=consensus)

    for _ in range(max_retries + 1):
        units = _run_extractor(extractor, html, text_layer, unit_base)
        tried.append(extractor)
        for u in units:
            deadline.check()  # audit/normalize per unit is real work (X4)
            unit_attempts.setdefault(u.unit_id, []).append(
                _attempt_from_unit(u, extractor, a)
            )

        failing = {
            uid: atts
            for uid, atts in unit_attempts.items()
            if not any(at.audit_passed for at in atts)
        }
        if not failing:
            break
        # Dominant failure across still-failing units: highest priority
        # among each unit's most recent failure (repair.py:247-257 per
        # page, folded doc-level because our extractors re-run whole
        # payloads, like the reference's whole-doc retry path
        # orchestrator.py:1000-1043).
        recent = [dominant_failure([at.failure_mode for at in atts]) for atts in failing.values()]
        dom = max(recent, key=lambda m: au._PRIORITY.get(m, 0))
        nxt = select_repair_extractor(dom, set(tried), a.doc_kind, a.route)
        if nxt is None:
            break
        extractor = nxt

    return _select_rows(unit_attempts, a, tried, t0, consensus=consensus)


def _reconcile_latex(unit_attempts: dict[int, list[Attempt]]) -> None:
    """HPC-mode reconciliation (reconciler.py:67-135): when a unit has a
    passing primary attempt and a different attempt carries display
    LaTeX the primary lacks or typesets worse, merge the better blocks
    into the primary's text in place. Attempt order is the priority
    order, so the first passing attempt plays the primary role."""
    from .functions.reconcile import extract_latex_blocks, merge_latex

    for atts in unit_attempts.values():
        if len(atts) < 2:
            continue
        primary = next((at for at in atts if at.audit_passed), None)
        if primary is None:
            continue
        for other in atts:
            if other is primary or not other.text:
                continue
            if not any(b.is_display for b in extract_latex_blocks(other.text)):
                continue
            merged, count = merge_latex(primary.text, other.text)
            if count and merged != primary.text:
                primary.text = merged
                # Offsets shifted; degrade to a whole-text span rather
                # than let stale offsets lie.
                unit_id = primary.spans[0]["unit_id"] if primary.spans else 0
                primary.spans = [
                    {"unit_id": unit_id, "kind": "prose", "start": 0,
                     "end": len(merged), "meta": ""}
                ]


def _attempt_from_unit(u, extractor: str, a: Assessment) -> Attempt:
    if u.error:
        return Attempt(extractor, "", False, au.PARSE_ERROR)
    text, spans = render_unit(u)
    result = au.audit(text)
    return Attempt(
        extractor,
        text,
        result.passed,
        result.primary_failure,
        confidence=result.confidence if not result.passed else a.confidence,
        spans=spans,
    )


def _select_rows(
    unit_attempts: dict[int, list[Attempt]],
    a: Assessment,
    tried: list[str],
    t0: float,
    consensus: str = "heuristic",
) -> list[dict]:
    """Per-unit consensus selection + row emission (C5, J1)."""
    rows = []
    single_unit = len(unit_attempts) == 1
    figure_budget = MAX_FIGURES_PER_DOC
    # Per-unit processing time: the whole-payload elapsed amortized over
    # its units, so telemetry sums (G4) reconstruct the payload's true
    # wall time instead of inflating it n_units-fold.
    n_units = max(1, len(unit_attempts))
    per_unit_ms = _ms(t0) / n_units
    for uid in sorted(unit_attempts):
        deadline.check()  # consensus scoring per unit is real work (X4)
        atts = unit_attempts[uid]
        passing = [at for at in atts if at.audit_passed]
        pool = passing if passing else atts
        ref_text = a.native_text if a.is_native else ""
        if consensus == "arbiter" and len(atts) >= 2:
            # Arbiter mode (consensus.py:430-478 shape): a pluggable
            # verdict function judges the top attempts; ANY failure in
            # that path — unavailable, unparseable verdict, empty text
            # — falls back to the heuristic selection below.
            from .functions.arbiter import arbitrate
            from .functions.scoring import score_attempt

            idx, verdict_text = arbitrate(
                atts,
                select_fallback=lambda alist: alist.index(
                    (passing if passing else alist)[
                        select_best(passing if passing else alist, ref_text)
                    ]
                ),
                # Rank top-3 by the same heuristic the fallback uses
                # (grounded when a native reference exists) so the best
                # attempt is never excluded from arbitration — the
                # reference's ranked-top-3 shape (consensus.py:430-445).
                score=lambda at: score_attempt(at, ref_text),
            )
            best = atts[idx]
            if verdict_text is not None and verdict_text != best.text:
                # merged/edited verdict: adopt the text, degrade spans
                # to a whole-text span (offsets no longer apply).
                best.text = verdict_text
                best.extractor = "arbiter-merged"
                best.spans = [
                    {"unit_id": uid, "kind": "prose", "start": 0,
                     "end": len(verdict_text), "meta": ""}
                ]
        else:
            best = pool[select_best(pool, ref_text)]

        # Assembly precedence (state.py:138-148): passing attempt beats
        # native text beats any attempt. Native fallback applies when the
        # payload is single-unit (the text layer is document-level).
        if not passing and a.is_native and a.native_text and single_unit:
            best = Attempt(
                "native",
                normalize(a.native_text),
                False,
                best.failure_mode,
                confidence=a.confidence,
                spans=[{"unit_id": uid, "kind": "prose", "start": 0,
                        "end": len(normalize(a.native_text)), "meta": ""}],
            )

        # Running doc-level figure cap across this payload's units (O6);
        # re-applied over the full unit list in assemble_units for the
        # chunked path (cap_figure_spans is prefix-stable).
        best.spans = cap_figure_spans(best.spans, figure_budget)
        figure_budget -= sum(1 for s in best.spans if s.get("kind") == "figure")

        rows.append(
            _unit_row(
                unit_id=uid,
                attempt=best,
                a=a,
                n_attempts=len(atts),
                extractors_tried=",".join(dict.fromkeys(at.extractor for at in atts)),
                agreement=pairwise_agreement([at.text for at in atts]),
                ms=per_unit_ms,
                # Attempt lineage for calibration (G8): every attempt's
                # (extractor, failure outcome) in try order — the raw
                # material for P(recovered | extractor, failure mode),
                # calibrate.py:256-277.
                attempt_failures=",".join(
                    f"{at.extractor}:{at.failure_mode}" for at in atts
                ),
            )
        )
    return rows


def _ms(t0: float) -> float:
    return (time.perf_counter() - t0) * 1000.0


def _unit_row(
    unit_id: int,
    attempt: Attempt,
    a: Assessment,
    n_attempts: int,
    extractors_tried: str,
    agreement: float,
    ms: float,
    attempt_failures: str = "",
) -> dict:
    return {
        "unit_id": unit_id,
        "sub_id": 0,
        "attempt_failures": attempt_failures,
        "text": attempt.text,
        "word_count": len(attempt.text.split()),
        "extractor": attempt.extractor,
        "audit_passed": attempt.audit_passed,
        "failure_mode": attempt.failure_mode,
        "confidence": float(attempt.confidence),
        "n_attempts": n_attempts,
        "extractors_tried": extractors_tried,
        "agreement": float(agreement),
        "spans_json": json.dumps(attempt.spans, separators=(",", ":")),
        "route": a.route,
        "is_native": a.is_native,
        "processing_ms": ms,
    }


# ---------------------------------------------------------------- assembly (G1)


_FAILURE_PRIORITY = au._PRIORITY


def assemble_units(unit_rows: list[dict]) -> dict:
    """Reduce a document's unit rows to the final extracted row.

    ``unit_rows`` may contain chunk fragments (same unit_id, sub_id
    0..k from the oversized-row explode path): fragments merge first
    (join ``"\\n\\n"``, re-normalize — a byte no-op for already
    normalized fragments — rebase spans, re-audit the merged text),
    then units join with the canonical ``"\\n\\n---\\n\\n"`` separator
    (result.py:119-127).
    """
    by_unit: dict[int, list[dict]] = {}
    for r in unit_rows:
        by_unit.setdefault(int(r["unit_id"]), []).append(r)

    unit_texts: list[str] = []
    spans: list[dict] = []
    failure_modes: list[str] = []
    extractors: list[str] = []
    attempt_failures: list[str] = []
    all_passed = True
    any_text = False
    total_ms = 0.0
    agreements: list[float] = []
    confidences: list[float] = []

    for uid in sorted(by_unit):
        frags = sorted(by_unit[uid], key=lambda r: int(r["sub_id"]))
        if len(frags) == 1:
            r = frags[0]
            text = r["text"]
            unit_spans = json.loads(r["spans_json"])
            passed = bool(r["audit_passed"])
            failure = r["failure_mode"]
        else:
            # Fragment merge = plain join, NOT re-normalize: the oracle's
            # unit text is itself the "\n\n" join of block-normalized
            # texts (render_unit), and the blank line at every fragment
            # boundary blocks each normalize rule from matching across
            # it (line-repeat needs single-\n-adjacent lines; fragments
            # are stripped so no 3+ blank runs; all other rules are
            # per-char/per-line local) — so the join IS the normalized
            # form, byte-identical to the unchunked oracle.
            # The merged text IS re-audited: audit scans (refusal
            # window, sentence-loop detection) legitimately cross
            # fragment boundaries, and the oracle audits whole units.
            parts = [f["text"] for f in frags if f["text"]]
            text = "\n\n".join(parts)
            unit_spans = _rebase_spans(frags, text)
            result = au.audit(text)
            passed = result.passed
            failure = result.primary_failure
        for r in frags:
            if r.get("attempt_failures"):
                attempt_failures.append(r["attempt_failures"])
            for name in r["extractors_tried"].split(","):
                if name and name not in extractors:
                    extractors.append(name)
            total_ms += float(r["processing_ms"])
            agreements.append(float(r["agreement"]))
            confidences.append(float(r["confidence"]))
        if text:
            unit_texts.append(text)
            any_text = True
        spans.extend(unit_spans)
        if failure != au.NONE:
            failure_modes.append(failure)
        all_passed = all_passed and passed

    extracted = UNIT_SEPARATOR.join(unit_texts)
    spans = cap_figure_spans(spans)  # doc cap across chunk fragments (O6)
    primary = (
        max(failure_modes, key=lambda m: _FAILURE_PRIORITY.get(m, 0))
        if failure_modes
        else au.NONE
    )
    first = unit_rows[0]
    return {
        "extracted_text": extracted,
        "spans_json": json.dumps(spans, separators=(",", ":")),
        "attempt_failures": ",".join(attempt_failures),
        "audit_passed": all_passed and any_text,
        "failure_mode": primary,
        "extractor": ",".join(extractors),
        "route": first["route"],
        "n_units": len(by_unit),
        "word_count": len(extracted.split()),
        "char_count": len(extracted),
        "agreement": sum(agreements) / len(agreements) if agreements else 1.0,
        "confidence": sum(confidences) / len(confidences) if confidences else 0.0,
        "processing_ms": total_ms,
    }


def _rebase_spans(frags: list[dict], merged_text: str) -> list[dict]:
    """Rebase chunk-local span offsets into the merged unit text.

    Valid because fragments join with exactly ``"\\n\\n"`` and
    re-normalization of already-normalized fragments is byte-stable; if
    that invariant is ever violated (pathological cross-chunk repeat
    collapse), fall back to a single whole-unit prose span so offsets
    never lie.
    """
    expected_len = sum(len(f["text"]) for f in frags if f["text"])
    expected_len += 2 * (sum(1 for f in frags if f["text"]) - 1 if any(f["text"] for f in frags) else 0)
    if len(merged_text) != expected_len:
        return [
            {"unit_id": int(frags[0]["unit_id"]), "kind": "prose", "start": 0,
             "end": len(merged_text), "meta": ""}
        ]
    out: list[dict] = []
    offset = 0
    emitted_any = False
    for f in frags:
        if not f["text"]:
            continue
        if emitted_any:
            offset += 2
        for s in json.loads(f["spans_json"]):
            out.append(
                {"unit_id": s["unit_id"], "kind": s["kind"],
                 "start": s["start"] + offset, "end": s["end"] + offset,
                 "meta": s.get("meta", "")}
            )
        offset += len(f["text"])
        emitted_any = True
    return out


def oracle_extract(
    html: bytes,
    text_layer: str,
    multi_extractor: bool = False,
    consensus: str = "heuristic",
) -> dict:
    """Single-row oracle: process a whole document with no chunking and
    assemble. The Ray pipeline's per-url output must byte-match this —
    in every consensus mode (the kwargs mirror the pipeline's)."""
    return assemble_units(
        process_payload(
            html, text_layer, multi_extractor=multi_extractor, consensus=consensus
        )
    )
