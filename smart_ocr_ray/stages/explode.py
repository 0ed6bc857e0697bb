"""Skew-aware oversized-row explode (M14/C7, north_rule requirement).

The analog of the reference's PDF chunker
(``/root/reference/src/socr/core/chunker.py:29-108``, thresholds
``config.py:109-110``: chunk documents >30 pages into ≤20-page chunks)
re-expressed as a batch-level expansion so one pathological multi-MB
row cannot stall a worker or blow a batch's memory budget:

  * binary payloads with npages > ``max_pages`` are byte-sliced (no
    decompression) into ≤``chunk_pages``-page sub-payloads carrying a
    ``unit_base`` so page/unit ids stay globally 1-based;
  * html payloads larger than ``max_html_bytes`` are split at
    top-level ``</p>`` boundaries into fragments carrying a
    ``chunk_id``; fragments re-merge at assembly (sorted by chunk_id,
    joined ``"\\n\\n"``) — byte-identical to the unchunked oracle
    because splits happen only at block boundaries.

The routing decision here uses only O(1) sniffs — magic bytes, payload
length, header page count, text-layer length — never a payload parse:
an html row is chunked only when its text layer is too short to ever
pass the native cascade (< 50 chars, assess.MIN_CHARS_FOR_TEXT_LAYER),
which guarantees the document-level route of every exploded row is the
payload route and fragments never shadow a native text layer.

Output blocks are dynamically split by Ray's block sizing, so chunks of
one document land in different tasks and a straggler document
parallelizes across workers.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

from ..extractors.layout import MAGIC, peek_npages, slice_pages
from ..functions.assess import MIN_CHARS_FOR_TEXT_LAYER

MAX_PAGES = 30     # config.py:109
CHUNK_PAGES = 20   # config.py:110
# Chunk threshold for html payloads. Chunking exists to keep one
# pathological row from stalling a worker (and to parallelize it); a
# sub-MB parse is not a straggler, and every chunked document pays a
# merged re-audit at assembly, so the threshold sits at 1 MiB (the
# reference's analog: only >30-page documents chunk, config.py:109).
MAX_HTML_BYTES = 1024 * 1024
_P_BOUNDARY = b"</p>"

_CARRY = ("url", "warc_ts", "lang", "text")


def split_html_bytes(html: bytes, target: int) -> list[bytes]:
    """Split an HTML payload at ``</p>`` boundaries into ~target-byte
    fragments; returns [html] when no boundary exists."""
    if len(html) <= target:
        return [html]
    out = []
    pos = 0
    n = len(html)
    while pos < n:
        if n - pos <= target:
            out.append(html[pos:])
            break
        cut = html.find(_P_BOUNDARY, pos + target)
        if cut < 0:
            out.append(html[pos:])
            break
        cut += len(_P_BOUNDARY)
        out.append(html[pos:cut])
        pos = cut
    return out


def explode_batch(
    batch: pa.Table,
    max_pages: int = MAX_PAGES,
    chunk_pages: int = CHUNK_PAGES,
    max_html_bytes: int = MAX_HTML_BYTES,
) -> pa.Table:
    html_col = batch.column("html")
    text_col = batch.column("text")

    # Fast path: nothing oversized in this batch → zero-copy passthrough.
    needs_explode = []
    for i in range(batch.num_rows):
        html = html_col[i].as_py() or b""
        if html.startswith(MAGIC):
            if peek_npages(html) > max_pages:
                needs_explode.append(i)
        elif len(html) > max_html_bytes:
            text = text_col[i].as_py() or ""
            if len(text) < MIN_CHARS_FOR_TEXT_LAYER:
                needs_explode.append(i)
    # Whole-document fingerprint, computed BEFORE any split so chunked
    # documents keep the payload-level hash (the resume filter keys on
    # sha256 of the full payload, metadata.py:58-67 semantics).
    hashes = [
        hashlib.sha256(html_col[i].as_py() or b"").hexdigest()
        for i in range(batch.num_rows)
    ]
    sizes = [len(html_col[i].as_py() or b"") for i in range(batch.num_rows)]

    if not needs_explode:
        return (
            batch.append_column("content_hash", pa.array(hashes, pa.string()))
            .append_column("doc_bytes", pa.array(sizes, pa.int64()))
            .append_column(
                "route", pa.array([""] * batch.num_rows, pa.string())
            )
            .append_column("chunk_id", pa.array([0] * batch.num_rows, pa.int32()))
            .append_column("unit_base", pa.array([0] * batch.num_rows, pa.int32()))
        )

    out: dict[str, list] = {name: [] for name in _CARRY}
    out.update({"content_hash": [], "doc_bytes": [], "html": [], "route": [],
                "chunk_id": [], "unit_base": []})
    cols = {name: batch.column(name) for name in _CARRY}

    def _emit(i: int, html: bytes, route: str, chunk_id: int, unit_base: int) -> None:
        for name in _CARRY:
            out[name].append(cols[name][i].as_py())
        out["content_hash"].append(hashes[i])
        out["doc_bytes"].append(sizes[i])
        out["html"].append(html)
        out["route"].append(route)
        out["chunk_id"].append(chunk_id)
        out["unit_base"].append(unit_base)

    explode_set = set(needs_explode)
    for i in range(batch.num_rows):
        html = html_col[i].as_py() or b""
        if i not in explode_set:
            _emit(i, html, "", 0, 0)
        elif html.startswith(MAGIC):
            npages = peek_npages(html)
            for ci, start in enumerate(range(0, npages, chunk_pages)):
                _emit(i, slice_pages(html, start, start + chunk_pages), "binary", ci, start)
        else:
            for ci, frag in enumerate(split_html_bytes(html, max_html_bytes)):
                _emit(i, frag, "html", ci, 0)

    schema = pa.schema(
        [batch.schema.field(name) for name in _CARRY]
        + [
            pa.field("content_hash", pa.string()),
            pa.field("doc_bytes", pa.int64()),
            pa.field("html", pa.binary()),
            pa.field("route", pa.string()),
            pa.field("chunk_id", pa.int32()),
            pa.field("unit_base", pa.int32()),
        ]
    )
    return pa.Table.from_pydict({k: out[k] for k in schema.names}, schema=schema)
