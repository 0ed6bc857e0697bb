"""Input edge cases: nulls, recrawled (duplicate) urls, empty tables,
and the driver's entry() smoke contract."""

import pyarrow as pa
import pytest

from smart_ocr_ray.fixtures import SCHEMA, build_row


def _pages(rows):
    return pa.Table.from_pydict(
        {
            "url": [r["url"] for r in rows],
            "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("us")),
            "html": [r["html"] for r in rows],
            "text": [r["text"] for r in rows],
            "lang": [r["lang"] for r in rows],
        },
        schema=SCHEMA,
    )


def test_null_columns_survive(ray_session):
    """None html / None text rows must yield typed failure rows, not
    crashes."""
    import ray.data

    from smart_ocr_ray.pipelines.extract_pipeline import extract_pipeline

    table = pa.Table.from_pydict(
        {
            "url": ["https://x.test/null-html", "https://x.test/null-text",
                    "https://x.test/both-null"],
            "warc_ts": pa.array([0, 1, 2], pa.timestamp("us")),
            "html": pa.array([None, b"<html><body><p>" + b"real words here " * 30 + b"</p></body></html>", None], pa.binary()),
            "text": pa.array(["some short layer", None, None], pa.string()),
            "lang": ["en", "en", "en"],
        },
        schema=SCHEMA,
    )
    out = {r["url"]: r for r in extract_pipeline(ray.data.from_arrow(table)).take_all()}
    assert len(out) == 3
    assert out["https://x.test/both-null"]["failure_mode"] == "empty_output"
    assert out["https://x.test/null-text"]["audit_passed"]


def test_duplicate_url_recrawls_stay_distinct(ray_session):
    """Two captures of the same url with different payloads must
    assemble as two documents (identity = url + content hash)."""
    import ray.data

    from smart_ocr_ray.pipelines.extract_pipeline import extract_pipeline

    r1 = build_row(0)  # prose class
    r2 = dict(r1)
    r2["html"] = r1["html"].replace(b"Fixture Document", b"Recrawled Document")
    r2["warc_ts"] = r1["warc_ts"] + 1_000_000
    out = extract_pipeline(ray.data.from_arrow(_pages([r1, r2]))).take_all()
    assert len(out) == 2
    hashes = {r["content_hash"] for r in out}
    assert len(hashes) == 2


def test_duplicate_identical_capture_merges_consistently(ray_session):
    """Byte-identical duplicate rows share (url, hash): they merge into
    one group; the merged doc equals the single-row doc."""
    import ray.data

    from smart_ocr_ray.pipelines.extract_pipeline import extract_pipeline

    r1 = build_row(0)
    out = extract_pipeline(ray.data.from_arrow(_pages([r1, r1]))).take_all()
    single = extract_pipeline(ray.data.from_arrow(_pages([r1]))).take_all()
    # Units get merged under one identity; the doc count collapses to 1.
    assert len(out) == 1
    assert out[0]["url"] == single[0]["url"]


def test_empty_input(ray_session):
    import ray.data

    from smart_ocr_ray.pipelines.extract_pipeline import extract_pipeline

    empty = pa.Table.from_pydict(
        {c: pa.array([], SCHEMA.field(c).type) for c in SCHEMA.names}, schema=SCHEMA
    )
    assert extract_pipeline(ray.data.from_arrow(empty)).count() == 0


def test_driver_entry_contract(ray_session):
    """The driver imports __ray_entry__ with Ray already initialised and
    calls entry(); it must return rows with a stable schema."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry_mod

    ds = entry_mod.entry()
    rows = ds.take(5)
    assert rows
    assert {"url", "extracted_text", "audit_passed", "failure_mode"} <= set(rows[0])
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(queries)
    assert len(queries) >= 20
