"""JSONL source: read newline-delimited-JSON corpus shards into the
documents schema.

The reference engine reads exactly one input format (a directory of
PDFs, ``pipeline/orchestrator.py:152``); the rebuild's primary source
is the Parquet documents table. Public webtext corpora, however, ship
overwhelmingly as JSON Lines — Dolma, RedPajama, The Pile, OSCAR all
distribute ``*.jsonl`` / ``*.jsonl.gz`` shards — and converting them to
Parquet is itself a pipeline stage. ``read_jsonl_docs`` is that stage
as a Ray Data source, the sibling of ``warc.read_warc``:

  * ``ray.data.read_binary_files`` with one block per shard file — the
    shard file is the parallelism unit (a 100-TB corpus is ~100k shard
    files fanning out to ~100k parse tasks with no coordination);
  * each task gunzips (magic-sniffed, never by extension; truncated
    tails salvage the readable prefix), splits lines, and
    ``json.loads`` each record — a per-LINE loop is inherent to the
    format (the record boundary IS the newline), the same way the WARC
    walk is per-record; downstream stages stay columnar;
  * malformed lines and records without an integer ``id`` are skipped
    (counted into nothing — a lossy input format gets a lossy-prefix
    contract, exactly like the WARC truncated-tail rule);
  * output schema == the documents table (doc_id, text, lang, source,
    n_chars), with missing string fields defaulting to ``""`` and
    ``n_chars`` recomputed as ``len(text)`` when absent — so every
    documents-table operator composes directly on a JSONL corpus.

``docs_to_jsonl_shards`` is the inverse (and the fixture generator):
deterministic serialization (sorted keys, ``ensure_ascii``, compact
separators, ``\\n`` terminators, gzip mtime=0) from a documents table,
so tests can assert the exact roundtrip
``read_jsonl_docs(docs_to_jsonl_shards(t)) == t``.
"""

from __future__ import annotations

import gzip
import json
import os
import zlib

import pyarrow as pa
import ray.data

DOCS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("source", pa.string()),
        ("n_chars", pa.int64()),
    ]
)


def docs_to_jsonl_shards(
    table: pa.Table,
    out_dir: str,
    rows_per_shard: int = 256,
    gzip_every: int = 3,
) -> list[str]:
    """Write a documents table as deterministic JSONL shard files
    (``shard-{i:05d}.jsonl``, every ``gzip_every``-th one gzipped to
    exercise both read paths). Records serialize with sorted keys,
    ascii escapes, and compact separators; gzip uses mtime=0 — bytes
    are stable run-to-run."""
    os.makedirs(out_dir, exist_ok=True)
    rows = table.to_pylist()
    paths: list[str] = []
    for shard_i, start in enumerate(range(0, len(rows), rows_per_shard)):
        lines = []
        for r in rows[start : start + rows_per_shard]:
            lines.append(
                json.dumps(
                    {
                        "id": int(r["doc_id"]),
                        "text": r.get("text") or "",
                        "lang": r.get("lang") or "",
                        "source": r.get("source") or "",
                    },
                    sort_keys=True,
                    ensure_ascii=True,
                    separators=(",", ":"),
                )
            )
        data = ("\n".join(lines) + "\n").encode("utf-8") if lines else b""
        if gzip_every and shard_i % gzip_every == 0:
            path = os.path.join(out_dir, f"shard-{shard_i:05d}.jsonl.gz")
            data = gzip.compress(data, mtime=0)
        else:
            path = os.path.join(out_dir, f"shard-{shard_i:05d}.jsonl")
        with open(path, "wb") as f:
            f.write(data)
        paths.append(path)
    return paths


def _gunzip_salvage(data: bytes) -> bytes:
    """Decompress a (possibly multi-member, possibly truncated) gzip
    stream, keeping whatever decompressed cleanly — the truncated-tail
    tolerance rule shared with the WARC reader."""
    out = bytearray()
    pos = 0
    while pos < len(data) and data[pos : pos + 2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=31)
        try:
            out += d.decompress(data[pos:])
        except zlib.error:
            break
        if not d.eof:  # truncated member: keep the salvaged prefix
            break
        consumed = len(data) - pos - len(d.unused_data)
        pos += consumed
    return bytes(out)


def parse_jsonl_records(data: bytes) -> pa.Table:
    """One shard's bytes → documents-schema table. Gzip is sniffed by
    magic; blank lines, malformed JSON, and records without an integer
    ``id`` are skipped."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_salvage(data)
    ids, texts, langs, sources, n_chars = [], [], [], [], []
    for line in data.decode("utf-8", errors="replace").split("\n"):
        if not line.strip():
            continue
        try:
            rec = json.loads(line)
        except ValueError:
            continue
        rid = rec.get("id") if isinstance(rec, dict) else None
        # NB: bool is an int subclass in Python — a JSON `true` id is
        # rejected, not coerced to 1.
        if not isinstance(rid, int) or isinstance(rid, bool):
            continue
        text = rec.get("text")
        if not isinstance(text, str):
            text = ""
        lang = rec.get("lang")
        source = rec.get("source")
        nc = rec.get("n_chars")
        ids.append(rid)
        texts.append(text)
        langs.append(lang if isinstance(lang, str) else "")
        sources.append(source if isinstance(source, str) else "")
        n_chars.append(nc if isinstance(nc, int) and not isinstance(nc, bool) else len(text))
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array(n_chars, pa.int64()),
        },
        schema=DOCS_SCHEMA,
    )


def read_jsonl_docs(paths: str | list[str]) -> ray.data.Dataset:
    """Read JSONL shard files into a documents-schema Dataset — one
    parse task per shard file, streaming into whatever consumes it
    (every documents-table operator, a Parquet-conversion write)."""
    if isinstance(paths, str) and os.path.isdir(paths):
        paths = sorted(
            os.path.join(paths, f)
            for f in os.listdir(paths)
            if f.endswith((".jsonl", ".jsonl.gz"))
        )
    files = ray.data.read_binary_files(paths)

    def _parse(batch: pa.Table) -> pa.Table:
        tables = [parse_jsonl_records(b) for b in batch.column("bytes").to_pylist()]
        return pa.concat_tables(tables) if tables else DOCS_SCHEMA.empty_table()

    return files.map_batches(_parse, batch_format="pyarrow")
