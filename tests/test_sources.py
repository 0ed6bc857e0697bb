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


# ---------------------------------------------------------------------------
# JSONL source
# ---------------------------------------------------------------------------


def _docs_table(n=40):
    import pyarrow as pa

    return pa.Table.from_pydict({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(
            [f"doc {i} text with unicode é中 and \"quotes\"\nline2" if i % 5
             else "" for i in range(n)],
            pa.string(),
        ),
        "lang": pa.array(["en" if i % 2 else "de" for i in range(n)], pa.string()),
        "source": pa.array([f"host{i % 3}.test" for i in range(n)], pa.string()),
        "n_chars": pa.array(
            [len(f"doc {i} text with unicode é中 and \"quotes\"\nline2")
             if i % 5 else 0 for i in range(n)],
            pa.int64(),
        ),
    })


def test_jsonl_roundtrip_exact(ray_session, tmp_path):
    """documents → jsonl shards (mixed plain/gz) → read_jsonl_docs is
    an exact roundtrip, including unicode, embedded newlines-as-\\n,
    quotes, and empty texts."""
    from smart_ocr_ray.sources.jsonl import docs_to_jsonl_shards, read_jsonl_docs

    table = _docs_table()
    out = tmp_path / "shards"
    paths = docs_to_jsonl_shards(table, str(out), rows_per_shard=16, gzip_every=2)
    assert any(p.endswith(".jsonl.gz") for p in paths)
    assert any(p.endswith(".jsonl") and not p.endswith(".gz") for p in paths)

    got = sorted(read_jsonl_docs(str(out)).take_all(), key=lambda r: r["doc_id"])
    want = sorted(table.to_pylist(), key=lambda r: r["doc_id"])
    assert got == want


def test_jsonl_shard_bytes_deterministic(tmp_path):
    from smart_ocr_ray.sources.jsonl import docs_to_jsonl_shards

    table = _docs_table(10)
    a = tmp_path / "a"; b = tmp_path / "b"
    pa_ = docs_to_jsonl_shards(table, str(a), rows_per_shard=4)
    pb = docs_to_jsonl_shards(table, str(b), rows_per_shard=4)
    for x, y in zip(pa_, pb):
        assert open(x, "rb").read() == open(y, "rb").read()


def test_jsonl_parse_tolerance():
    """Blank lines, malformed JSON, non-dict rows, and records without
    an integer id are skipped; missing fields default; n_chars
    recomputes from text when absent."""
    import json

    from smart_ocr_ray.sources.jsonl import parse_jsonl_records

    lines = [
        "",                                        # blank
        "{not json",                               # malformed
        "[1,2,3]",                                 # non-dict
        json.dumps({"text": "no id"}),             # missing id
        json.dumps({"id": "7", "text": "str id"}),  # non-int id
        json.dumps({"id": True, "text": "bool"}),   # bool id rejected
        json.dumps({"id": 1}),                      # no text -> ""
        json.dumps({"id": 2, "text": "ab", "lang": 5}),   # bad lang -> ""
        json.dumps({"id": 3, "text": "xyz", "n_chars": 99}),  # explicit n_chars kept
    ]
    t = parse_jsonl_records(("\n".join(lines) + "\n").encode())
    rows = {r["doc_id"]: r for r in t.to_pylist()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["text"] == "" and rows[1]["n_chars"] == 0
    assert rows[2]["lang"] == "" and rows[2]["n_chars"] == 2
    assert rows[3]["n_chars"] == 99


def test_jsonl_truncated_gz_salvages_prefix(tmp_path):
    """A truncated .jsonl.gz shard yields the lines that decompressed
    cleanly instead of raising (the WARC truncated-tail rule)."""
    import gzip as _gz

    from smart_ocr_ray.sources.jsonl import parse_jsonl_records

    full = b'{"id":1,"text":"aaaa"}\n{"id":2,"text":"bbbb"}\n' * 200
    blob = _gz.compress(full, mtime=0)
    cut = blob[: len(blob) // 2]
    # Re-add magic check: the prefix still starts with 1f 8b.
    t = parse_jsonl_records(cut)
    ids = set(t.column("doc_id").to_pylist())
    assert ids <= {1, 2}
    assert t.num_rows < 400  # strictly fewer than the full stream


def test_cli_convert_jsonl_roundtrip(ray_session, tmp_path):
    """`cli convert --format jsonl` lands the documents schema in
    parquet, byte-equal to the source table."""
    import pyarrow.dataset as pads

    from smart_ocr_ray import cli
    from smart_ocr_ray.sources.jsonl import docs_to_jsonl_shards

    table = _docs_table(12)
    shards = tmp_path / "sh"; out = tmp_path / "outpq"
    docs_to_jsonl_shards(table, str(shards), rows_per_shard=5)
    rc = cli.main([
        "convert", "--input", str(shards), "--output", str(out),
        "--format", "jsonl",
    ])
    assert rc == 0
    got = sorted(pads.dataset(str(out)).to_table().to_pylist(),
                 key=lambda r: r["doc_id"])
    assert got == sorted(table.to_pylist(), key=lambda r: r["doc_id"])


def test_jsonl_corpus_feeds_documents_ops(ray_session, tmp_path):
    """A converted JSONL corpus drives the documents-table operators:
    convert writes dir/documents.parquet, and lang_id/token counting
    over the converted sf dir equals the same ops over the original
    table — the format is a drop-in corpus source."""
    import pyarrow.parquet as pq

    from smart_ocr_ray import cli
    from smart_ocr_ray.ops.text_analysis import token_counts
    from smart_ocr_ray.sources.jsonl import docs_to_jsonl_shards

    table = _docs_table(20)
    shards = tmp_path / "sh"
    sf = tmp_path / "sf"; sf.mkdir()
    docs_to_jsonl_shards(table, str(shards), rows_per_shard=7)
    rc = cli.main([
        "convert", "--input", str(shards),
        "--output", str(sf / "documents.parquet"), "--format", "jsonl",
    ])
    assert rc == 0

    # Reference run over the original table written directly.
    sf_ref = tmp_path / "sfref"; sf_ref.mkdir()
    pq.write_table(table, sf_ref / "documents.parquet")

    got = sorted(token_counts(str(sf)).take_all(), key=lambda r: r["doc_id"])
    want = sorted(token_counts(str(sf_ref)).take_all(), key=lambda r: r["doc_id"])
    assert got == want and len(got) == 20
