"""Attempt-failure lineage (J6 extension) and failure-mode recovery
rates (G8 — calibrate.py:256-277 analog)."""


def test_attempt_lineage_records_failures_in_try_order():
    """Every unit row's lineage has one extractor:failure entry per
    attempt; documents that needed repair record the triggering failure
    followed by the retry's outcome."""
    from smart_ocr_ray.document import process_payload
    from smart_ocr_ray.fixtures import build_row

    known = {"layout", "dom", "rawtext", "native", "none"}
    repaired = 0
    for i in range(110):
        row = build_row(i, oversized_bytes=60_000, big_doc_pages=35)
        for unit in process_payload(row["html"], row["text"]):
            entries = [e.rsplit(":", 1) for e in unit["attempt_failures"].split(",")]
            assert len(entries) == unit["n_attempts"], row["url"]
            assert {e[0] for e in entries} <= known, row["url"]
            if len(entries) > 1:
                repaired += 1
                # a retry only happens after a failure: the first
                # attempt's recorded outcome must be a real failure mode
                assert entries[0][1] != "none", row["url"]
    assert repaired > 0  # the corpus exercises the repair loop


def test_known_recovery_outcome():
    """A document whose prose sits entirely inside <nav> (an
    over-aggressive boilerplate strip scenario): dom fails, the repair
    loop routes to rawtext which recovers the text — the lineage must
    show the dom failure AND the final document must pass."""
    from smart_ocr_ray.document import assemble_units, process_payload

    prose = (
        "The committee reviewed quarterly inflation figures in detail today. "
        "Members discussed the persistence of services inflation at length. "
        "Wage growth moderated across most sectors during the period. "
        "The staff projection anticipated gradual disinflation over the horizon. "
        "Financial conditions tightened modestly relative to the prior meeting. "
        "Credit growth to households slowed while corporate issuance held firm. "
        "The labor market remained resilient with vacancies still elevated. "
        "Energy base effects subtracted from headline inflation as expected."
    )
    html = f"<html><body><nav>{prose}</nav></body></html>".encode()
    doc = assemble_units(process_payload(html, ""))
    entries = [e.rsplit(":", 1) for e in doc["attempt_failures"].split(",")]
    assert entries[0][0] == "dom" and entries[0][1] != "none"  # the failure
    assert doc["audit_passed"]  # ...that the retry recovered
    assert "rawtext" in doc["extractor"]
    # This is exactly what the recovery query counts: the (dom, <mode>)
    # failure with a passing final doc → n_recovered increments.


def test_failure_recovery_query_shape(ray_session):
    """The failure_recovery query over the canonical corpus: correct
    grain and bounds (this corpus's failures are genuinely
    unrecoverable classes, so rates may legitimately be 0)."""
    import __ray_entry__ as entry

    df = entry.queries()["failure_recovery"]("/root/testdata/sf0.001").to_pandas()
    assert set(df.columns) == {
        "extractor", "failure_mode", "n_failures", "n_recovered", "recovery_rate_e6"
    }
    assert len(df) > 0
    assert (df["n_recovered"] <= df["n_failures"]).all()
    assert ((df["recovery_rate_e6"] >= 0) & (df["recovery_rate_e6"] <= 1_000_000)).all()
    assert (df["failure_mode"] != "none").all()
