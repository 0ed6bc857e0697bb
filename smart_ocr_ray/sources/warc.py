"""WARC source: read raw Common-Crawl-style WARC shard files into the
pages schema.

The reference engine reads exactly one input format (a directory of
PDFs, ``pipeline/orchestrator.py:152``); the rebuild's primary source is
the Parquet pages table. Real web corpora, however, arrive as WARC
(ISO 28500) response records — one file per crawler output shard,
usually gzipped — and converting them to Parquet is itself a pipeline
stage. ``read_warc`` is that stage as a Ray Data source:

  * ``ray.data.read_binary_files`` with one block per shard file — the
    shard file is the parallelism unit, exactly as for the Parquet
    reader (``extract_pipeline.read_pages``); a 100-TB crawl is ~100k
    WARC files fanning out to ~100k parse tasks with no coordination;
  * each task parses its shard's records with a Content-Length walk
    (never a byte-pattern split — payloads may contain the record
    magic) and emits pages-schema rows; each payload is sliced once
    from the shard buffer into the Arrow binary column;
  * output schema == ``fixtures.SCHEMA`` (url, warc_ts, html, text,
    lang) with ``text``/``lang`` empty — a WARC response record carries
    only the raw payload; text IS what the extract pipeline derives, so
    ``extract_pipeline(read_warc(shards))`` composes directly.

Only ``WARC-Type: response`` records with a ``WARC-Target-URI`` are
emitted (request/metadata/warcinfo records are skipped), matching how
CC-derived text pipelines consume WARC. Gzipped shards (the on-disk
norm; sniffed by magic, not extension) are decompressed per task —
multi-member streams, the per-record-gzip layout real crawlers write,
decompress in one call via zlib's member loop.

``pages_to_warc_shards`` is the inverse (and the fixture generator):
deterministic WARC/1.0 bytes from a pages table, so tests can assert
the exact roundtrip ``read_warc(pages_to_warc_shards(t)) == t``.
"""

from __future__ import annotations

import gzip
import io
import os

import pyarrow as pa
import ray.data

_EPOCH_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z (fixtures.py)

WARC_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def _ts_to_warc_date(us: int) -> str:
    """Microseconds-since-epoch → WARC-Date (ISO 8601, second
    precision per the WARC/1.0 spec; sub-second digits are kept only
    when non-zero so canonical fixtures stay minimal)."""
    import datetime

    dt = datetime.datetime.fromtimestamp(us / 1e6, tz=datetime.timezone.utc)
    frac = us % 1_000_000
    base = dt.strftime("%Y-%m-%dT%H:%M:%S")
    return f"{base}.{frac:06d}Z" if frac else f"{base}Z"


def _warc_date_to_us(s: str) -> int:
    import datetime

    s = s.strip()
    if s.endswith("Z"):
        s = s[:-1] + "+00:00"
    return int(datetime.datetime.fromisoformat(s).timestamp() * 1e6 + 0.5)


def pages_to_warc_shards(
    table: pa.Table,
    out_dir: str,
    rows_per_shard: int = 1024,
    compress: bool = True,
) -> list[str]:
    """Write a pages table as deterministic WARC/1.0 shard files
    (``shard-{i:05d}.warc[.gz]``), ``rows_per_shard`` response records
    each. Record layout follows ISO 28500: version line, named headers,
    CRLF-CRLF, Content-Length payload bytes, CRLF-CRLF trailer. The
    record id is derived from the url so bytes are stable across runs.
    """
    import hashlib

    os.makedirs(out_dir, exist_ok=True)
    urls = table.column("url").to_pylist()
    tss = table.column("warc_ts").cast(pa.int64()).to_pylist()
    htmls = table.column("html").to_pylist()
    paths: list[str] = []
    for shard_i in range(0, len(urls), rows_per_shard):
        buf = io.BytesIO()
        for url, ts, html in zip(
            urls[shard_i : shard_i + rows_per_shard],
            tss[shard_i : shard_i + rows_per_shard],
            htmls[shard_i : shard_i + rows_per_shard],
        ):
            payload = html or b""
            rid = hashlib.md5(url.encode("utf-8")).hexdigest()
            header = (
                "WARC/1.0\r\n"
                "WARC-Type: response\r\n"
                f"WARC-Record-ID: <urn:md5:{rid}>\r\n"
                f"WARC-Target-URI: {url}\r\n"
                f"WARC-Date: {_ts_to_warc_date(int(ts) if ts is not None else _EPOCH_US)}\r\n"
                "Content-Type: application/http; msgtype=response\r\n"
                f"Content-Length: {len(payload)}\r\n"
                "\r\n"
            ).encode("utf-8")
            buf.write(header)
            buf.write(payload)
            buf.write(b"\r\n\r\n")
        ext = "warc.gz" if compress else "warc"
        path = os.path.join(out_dir, f"shard-{shard_i // rows_per_shard:05d}.{ext}")
        data = buf.getvalue()
        if compress:
            # mtime=0 keeps shard bytes deterministic run-to-run.
            data = gzip.compress(data, mtime=0)
        with open(path, "wb") as f:
            f.write(data)
        paths.append(path)
    return paths


def parse_warc_records(data: bytes) -> pa.Table:
    """Parse one WARC shard's bytes into a pages-schema Arrow table.

    Content-Length walk: find the header block (terminated by
    CRLF-CRLF), read the named headers, slice exactly Content-Length
    payload bytes, skip the record trailer. Malformed tails (a
    truncated final record) end the walk rather than raising — one bad
    shard tail must not kill a 100k-shard read; the parser emits what
    it could decode.
    """
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    urls: list[str] = []
    tss: list[int] = []
    payloads: list[bytes] = []
    pos = 0
    n = len(data)
    view = memoryview(data)
    while pos < n:
        # Tolerate inter-record padding/blank lines.
        while pos < n and data[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            break
        if data[pos : pos + 5] != b"WARC/":
            break  # not a record boundary: stop, don't guess
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            break
        headers: dict[str, str] = {}
        for line in data[pos:hdr_end].decode("utf-8", "replace").split("\r\n")[1:]:
            k, sep, v = line.partition(":")
            if sep:
                headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            break
        body_start = hdr_end + 4
        if body_start + clen > n:
            break  # truncated final record
        if headers.get("warc-type") == "response" and "warc-target-uri" in headers:
            urls.append(headers["warc-target-uri"])
            try:
                tss.append(_warc_date_to_us(headers.get("warc-date", "")))
            except ValueError:
                tss.append(_EPOCH_US)
            payloads.append(bytes(view[body_start : body_start + clen]))
        pos = body_start + clen
    empty = [""] * len(urls)
    return pa.Table.from_pydict(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.int64()).cast(pa.timestamp("us")),
            "html": pa.array(payloads, pa.binary()),
            "text": pa.array(empty, pa.string()),
            "lang": pa.array(empty, pa.string()),
        },
        schema=WARC_SCHEMA,
    )


def read_warc(paths: str | list[str]) -> ray.data.Dataset:
    """Read WARC shard files into a pages-schema Dataset — one parse
    task per shard file, streaming into whatever consumes it (the
    extract pipeline, a Parquet-conversion write, dedup)."""
    if isinstance(paths, str) and os.path.isdir(paths):
        paths = sorted(
            os.path.join(paths, f)
            for f in os.listdir(paths)
            if f.endswith((".warc", ".warc.gz"))
        )
    files = ray.data.read_binary_files(paths)

    def _parse(batch: pa.Table) -> pa.Table:
        tables = [parse_warc_records(b) for b in batch.column("bytes").to_pylist()]
        return pa.concat_tables(tables) if tables else WARC_SCHEMA.empty_table()

    return files.map_batches(_parse, batch_format="pyarrow")
