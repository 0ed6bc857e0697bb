"""The byte-identity correctness gate (FIXTURES.md §3): the distributed
Ray pipeline's per-url output must equal the committed golden table
(produced once by the single-row oracle) byte-for-byte — extracted
text, span offsets, audit verdict, route, failure mode — across every
fixture row class, including the skew-exploded oversized documents that
cross the chunk/shuffle machinery.
"""

import json
import os

import pyarrow.parquet as pq
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "golden.parquet")


@pytest.fixture(scope="module")
def golden():
    table = pq.read_table(GOLDEN)
    return {r["url"]: r for r in table.to_pylist()}


@pytest.fixture(scope="module")
def pipeline_output(ray_session, fixture_parquet):
    from smart_ocr_ray.pipelines.extract_pipeline import extract_from_parquet

    # max_html_bytes shrunk so the fixture's 60 KB oversized rows
    # actually traverse the explode/reassemble path.
    ds = extract_from_parquet(fixture_parquet, max_html_bytes=16 * 1024)
    return {r["url"]: r for r in ds.take_all()}


def test_oracle_matches_committed_golden(fixture_pages, golden):
    """Guards against accidental semantic drift in the pure core."""
    from smart_ocr_ray.document import oracle_extract

    assert fixture_pages.num_rows == len(golden)
    for i in range(fixture_pages.num_rows):
        url = fixture_pages["url"][i].as_py()
        doc = oracle_extract(
            fixture_pages["html"][i].as_py(), fixture_pages["text"][i].as_py()
        )
        g = golden[url]
        assert doc["extracted_text"] == g["extracted_text"], url
        assert doc["spans_json"] == g["spans_json"], url


def test_pipeline_rowcount_and_urls(pipeline_output, golden):
    assert set(pipeline_output) == set(golden)


def test_pipeline_text_byte_identity(pipeline_output, golden):
    for url, g in golden.items():
        assert pipeline_output[url]["extracted_text"] == g["extracted_text"], url


def test_pipeline_spans_identity(pipeline_output, golden):
    for url, g in golden.items():
        assert pipeline_output[url]["spans_json"] == g["spans_json"], url


def test_pipeline_audit_and_route(pipeline_output, golden):
    for url, g in golden.items():
        r = pipeline_output[url]
        assert bool(r["audit_passed"]) == bool(g["audit_passed"]), url
        assert r["failure_mode"] == g["failure_mode"], url
        assert r["route"] == g["route"], url
        assert r["extractor"] == g["extractor"], url
        assert int(r["n_units"]) == int(g["n_units"]), url


def test_every_row_class_represented(golden):
    classes = {url.split("/")[3] for url in golden}
    assert classes == {
        "prose", "boilerplate", "table", "equation", "figure", "scanned",
        "garbage_layer", "cid_layer", "sparse", "mixed", "oversized",
        "repetition", "unicode", "empty",
    }


def test_expected_class_outcomes(golden):
    """FIXTURES.md §2 expected route/behavior per class."""
    by_class: dict[str, list[dict]] = {}
    for url, g in golden.items():
        by_class.setdefault(url.split("/")[3], []).append(g)

    assert all(g["route"] == "native" for g in by_class["prose"])
    assert all(g["audit_passed"] for g in by_class["prose"])
    assert all(g["route"] == "html" for g in by_class["boilerplate"])
    assert all(g["audit_passed"] for g in by_class["boilerplate"])
    assert all(g["route"] == "binary" for g in by_class["scanned"])
    assert all(g["extractor"] == "layout" for g in by_class["scanned"])
    assert all(g["route"] == "binary" for g in by_class["garbage_layer"])
    assert all(not g["audit_passed"] for g in by_class["empty"])
    assert all(g["failure_mode"] == "empty_output" for g in by_class["empty"])
    assert all(g["failure_mode"] == "low_word_count" for g in by_class["sparse"])
    assert all(g["failure_mode"] == "hallucination" for g in by_class["repetition"])
    assert all(g["n_units"] >= 2 for g in by_class["mixed"])
    # Markdown tables present in table-class outputs.
    assert all("| --- |" in g["extracted_text"] for g in by_class["table"])
    # Unicode class normalized to ASCII replacements.
    for g in by_class["unicode"]:
        assert "“" not in g["extracted_text"] and "ﬁ" not in g["extracted_text"]
        assert '"Smart quotes"' in g["extracted_text"]


def test_boilerplate_fully_stripped(golden):
    for url, g in golden.items():
        if "/boilerplate/" in url:
            text = g["extracted_text"]
            assert "Section 0" not in text  # nav links
            assert "Related article" not in text  # sidebar
            assert "Copyright" not in text  # footer


def test_spans_well_formed(golden):
    for url, g in golden.items():
        spans = json.loads(g["spans_json"])
        for s in spans:
            assert 0 <= s["start"] <= s["end"] <= len(g["extracted_text"]), url
            assert s["kind"] in {
                "prose", "heading", "table", "list", "figure", "equation", "code", "quote"
            }


def test_oversized_chunks_reassemble_to_unchunked_bytes(ray_session, fixture_pages):
    """Explode path invariant: chunked processing == unchunked oracle."""
    import ray.data

    from smart_ocr_ray.pipelines.extract_pipeline import extract_pipeline
    from smart_ocr_ray.document import oracle_extract

    oversized = [
        i for i in range(fixture_pages.num_rows)
        if "/oversized/" in fixture_pages["url"][i].as_py()
    ]
    assert oversized
    subset = fixture_pages.take(oversized)
    ds = extract_pipeline(
        ray.data.from_arrow(subset), max_html_bytes=8 * 1024, max_pages=10, chunk_pages=6
    )
    out = {r["url"]: r for r in ds.take_all()}
    for i in oversized:
        url = fixture_pages["url"][i].as_py()
        doc = oracle_extract(fixture_pages["html"][i].as_py(), fixture_pages["text"][i].as_py())
        assert out[url]["extracted_text"] == doc["extracted_text"], url
        assert out[url]["spans_json"] == doc["spans_json"], url


def test_actor_pool_path_byte_identity(ray_session, fixture_parquet, golden):
    """The actor-pool extract mode (use_actor_pool=True, the stateful
    A2/A3 stage shape) must produce the same bytes as the default
    stateless-task mode."""
    from smart_ocr_ray.pipelines.extract_pipeline import extract_from_parquet

    ds = extract_from_parquet(
        fixture_parquet, max_html_bytes=16 * 1024,
        use_actor_pool=True, extract_concurrency=(1, 2),
    )
    out = {r["url"]: r for r in ds.take_all()}
    assert set(out) == set(golden)
    for url, g in golden.items():
        assert out[url]["extracted_text"] == g["extracted_text"], url


def test_incremental_extract_is_rule_filtered_byte_identical(ray_session, fixture_parquet):
    """incremental_extract = the full pipeline restricted to the
    md5(url)-rule worklist: every worklist url byte-matches the full
    run's row; every skipped url is absent."""
    import hashlib

    from smart_ocr_ray.pipelines.extract_pipeline import (
        INCREMENTAL_HEX,
        extract_from_parquet,
        incremental_extract,
    )

    full = {r["url"]: r for r in extract_from_parquet(
        fixture_parquet, max_html_bytes=16 * 1024).take_all()}
    inc = {r["url"]: r for r in incremental_extract(
        fixture_parquet, max_html_bytes=16 * 1024).take_all()}

    expect_urls = {
        u for u in full
        if hashlib.md5(u.encode()).hexdigest()[0] in INCREMENTAL_HEX
    }
    assert set(inc) == expect_urls
    assert 0 < len(inc) < len(full)
    for u in expect_urls:
        a, b = full[u], inc[u]
        for col in ("extracted_text", "spans_json", "content_hash", "word_count",
                    "route", "extractor", "failure_mode"):
            assert a[col] == b[col], (u, col)
