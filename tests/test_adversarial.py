"""Adversarial-input robustness: arbitrary bytes, mojibake, deep
nesting, and giant payloads must produce typed rows — never a crash,
never an unbounded stall (SURVEY §4.2 resilience posture)."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from smart_ocr_ray.document import process_payload

_ROW_KEYS = {
    "unit_id", "sub_id", "text", "word_count", "attempt_failures", "extractor",
    "audit_passed", "failure_mode", "confidence", "n_attempts",
    "extractors_tried", "agreement", "spans_json", "route", "is_native",
    "processing_ms",
}


@settings(max_examples=120, deadline=None)
@given(st.binary(min_size=0, max_size=4096), st.text(max_size=512))
def test_process_payload_never_raises_on_fuzz(html, text):
    rows = process_payload(html, text)
    assert rows, "at least one unit row"
    for r in rows:
        assert _ROW_KEYS <= set(r)
        assert isinstance(r["text"], str)


def test_mojibake_and_control_chars():
    nasty = (
        b"<html><body><p>" + bytes(range(256)) + b"</p>"
        b"<p>\xff\xfe\x00\x01 overlong \xc0\xaf sequence</p></body></html>"
    )
    rows = process_payload(nasty, "")
    assert rows[0]["failure_mode"] in (
        "none", "garbage", "low_word_count", "empty_output"
    )


def test_deeply_nested_html_is_bounded():
    depth = 4000
    payload = b"<div>" * depth + b"<p>core prose survives deep nesting with words</p>" + b"</div>" * depth
    rows = process_payload(b"<html><body>" + payload + b"</body></html>", "")
    assert rows  # no RecursionError, no crash
    assert "core prose survives" in rows[0]["text"]


def test_malformed_layout_magic_variants():
    from smart_ocr_ray.extractors.layout import MAGIC

    for payload in (
        MAGIC,                                  # header only, no newline
        MAGIC + b" v1 npages=zzz offsets=\n",   # unparseable count
        MAGIC + b" v1 npages=3 offsets=0,5\n",  # offsets/count mismatch
        MAGIC + b" v1 npages=1 offsets=0\nnot-zlib-data",
    ):
        rows = process_payload(payload, "")
        assert rows
        assert all(isinstance(r["text"], str) for r in rows)


def test_giant_html_row_chunks_and_survives(ray_session):
    """A single multi-MB html row takes the explode/chunk path and
    round-trips byte-identically to the whole-doc oracle."""
    import pyarrow as pa
    import ray.data

    from smart_ocr_ray.document import oracle_extract
    from smart_ocr_ray.pipelines.extract_pipeline import extract_pipeline

    paras = "".join(
        f"<p>Giant paragraph number {i} has enough ordinary words to pass audits "
        f"without tripping repetition checks since each index {i} differs.</p>"
        for i in range(20_000)
    )
    html = f"<html><body>{paras}</body></html>".encode()
    assert len(html) > 2_000_000
    row = {"url": "https://fixture.test/giant/000001", "warc_ts": 0,
           "html": html, "text": "", "lang": "en"}
    ds = ray.data.from_arrow(pa.Table.from_pylist([row]))
    out = extract_pipeline(ds, max_html_bytes=256 * 1024).take_all()
    assert len(out) == 1
    oracle = oracle_extract(html, "")
    assert out[0]["extracted_text"] == oracle["extracted_text"]
    assert out[0]["audit_passed"]
