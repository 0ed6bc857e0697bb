"""WARC source tests: deterministic roundtrip, spec-tolerance parsing,
and composition with the extract pipeline."""

import gzip

import pyarrow as pa
import pyarrow.compute as pc

from smart_ocr_ray.fixtures import generate_pages
from smart_ocr_ray.sources.warc import (
    pages_to_warc_shards,
    parse_warc_records,
    read_warc,
)


def _sorted(t: pa.Table) -> pa.Table:
    return t.sort_by("url")


def test_warc_roundtrip_exact(ray_session, tmp_path):
    """read_warc(pages_to_warc_shards(t)) reproduces url/warc_ts/html
    byte-for-byte, across shard boundaries and gzip."""
    pages = generate_pages(24, seed=7, oversized_bytes=60_000, big_doc_pages=35)
    shards = pages_to_warc_shards(pages, str(tmp_path / "warc"), rows_per_shard=10)
    assert len(shards) == 3
    got = _sorted(pa.Table.from_pandas(read_warc(shards).to_pandas(), preserve_index=False))
    want = _sorted(pages)
    assert got.num_rows == 24
    assert got.column("url").to_pylist() == want.column("url").to_pylist()
    assert (
        got.column("warc_ts").cast(pa.int64()).to_pylist()
        == want.column("warc_ts").cast(pa.int64()).to_pylist()
    )
    assert got.column("html").to_pylist() == want.column("html").to_pylist()
    # text/lang are NOT carried by WARC response records: empty.
    assert set(got.column("text").to_pylist()) == {""}
    assert set(got.column("lang").to_pylist()) == {""}


def test_warc_shard_bytes_deterministic(tmp_path):
    pages = generate_pages(6, seed=3, oversized_bytes=60_000)
    a = pages_to_warc_shards(pages, str(tmp_path / "a"), rows_per_shard=6)
    b = pages_to_warc_shards(pages, str(tmp_path / "b"), rows_per_shard=6)
    assert open(a[0], "rb").read() == open(b[0], "rb").read()


def test_parse_skips_non_response_and_truncated_tail():
    """warcinfo/request records are skipped; a truncated final record
    ends the walk with everything before it intact; payloads containing
    the record magic don't confuse the Content-Length walk."""
    tricky_payload = b"<html>WARC/1.0\r\n\r\nnot a record</html>"
    rec = (
        b"WARC/1.0\r\n"
        b"WARC-Type: warcinfo\r\n"
        b"Content-Length: 4\r\n\r\nmeta\r\n\r\n"
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: http://t.example/a\r\n"
        b"WARC-Date: 2026-01-01T00:00:00Z\r\n"
        + f"Content-Length: {len(tricky_payload)}\r\n\r\n".encode()
        + tricky_payload
        + b"\r\n\r\n"
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: http://t.example/b\r\n"
        b"Content-Length: 999\r\n\r\ntrunc"
    )
    t = parse_warc_records(rec)
    assert t.column("url").to_pylist() == ["http://t.example/a"]
    assert t.column("html").to_pylist() == [tricky_payload]
    # gzipped variant parses identically (magic sniff, not extension)
    t2 = parse_warc_records(gzip.compress(rec))
    assert t2.equals(t)


def test_parse_multi_member_gzip():
    """Per-record gzip members (the layout real crawlers write)
    decompress as one stream."""
    r1 = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: u1\r\nWARC-Date: 2026-01-01T00:00:00Z\r\n"
        b"Content-Length: 2\r\n\r\nhi\r\n\r\n"
    )
    r2 = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: u2\r\nWARC-Date: 2026-01-01T00:00:01.500000Z\r\n"
        b"Content-Length: 2\r\n\r\nyo\r\n\r\n"
    )
    data = gzip.compress(r1, mtime=0) + gzip.compress(r2, mtime=0)
    t = parse_warc_records(data)
    assert t.column("url").to_pylist() == ["u1", "u2"]
    ts = t.column("warc_ts").cast(pa.int64()).to_pylist()
    assert ts[1] - ts[0] == 1_500_000


def test_warc_feeds_extract_pipeline(ray_session, tmp_path):
    """extract_pipeline(read_warc(shards)) composes: every url comes out
    exactly once; html-routed rows produce non-empty text (WARC rows
    carry no native text layer, so everything takes the extractor
    path)."""
    from smart_ocr_ray.pipelines.extract_pipeline import extract_pipeline

    pages = generate_pages(12, seed=11, oversized_bytes=60_000, big_doc_pages=35)
    shards = pages_to_warc_shards(pages, str(tmp_path / "warc"), rows_per_shard=8)
    out = extract_pipeline(read_warc(shards)).to_pandas()
    assert sorted(out["url"]) == sorted(pages.column("url").to_pylist())
    assert (out["extracted_text"].str.len() > 0).any()
    # no row took the native-text shortcut: WARC carries no text layer
    assert not (out["route"] == "native").any()
