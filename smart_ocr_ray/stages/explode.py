"""Skew-aware oversized-row explode (M14/C7, north_rule requirement).

The analog of the reference's PDF chunker
(``/root/reference/src/socr/core/chunker.py:29-108``, thresholds
``config.py:109-110``: chunk documents >30 pages into ≤20-page chunks)
re-expressed as a batch-level expansion so one pathological multi-MB
row cannot stall an actor or blow a batch's memory budget:

  * binary payloads with npages > ``max_pages`` are byte-sliced (no
    decompression) into ≤``chunk_pages``-page sub-payloads carrying a
    ``unit_base`` so page/unit ids stay globally 1-based;
  * html payloads larger than ``max_html_bytes`` are split at
    top-level ``</p>`` boundaries into fragments carrying a
    ``chunk_id``; fragments re-merge at assembly (sorted by chunk_id,
    joined ``"\\n\\n"``) — byte-identical to the unchunked oracle
    because splits happen only at block boundaries.

Rows routed ``native`` are never exploded (their payload is not
parsed). Output blocks are dynamically split by Ray's block sizing, so
chunks of one document land in different tasks and a straggler
document parallelizes across workers.
"""

from __future__ import annotations

import pyarrow as pa

from ..extractors.layout import MAGIC, peek_npages, slice_pages

MAX_PAGES = 30     # config.py:109
CHUNK_PAGES = 20   # config.py:110
MAX_HTML_BYTES = 256 * 1024
_P_BOUNDARY = b"</p>"

_CARRY = ("url", "warc_ts", "lang", "text", "content_hash", "n_bytes",
          "doc_kind", "route", "is_native")


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
    cols = {name: batch.column(name) for name in _CARRY}
    html_col = batch.column("html")

    out: dict[str, list] = {name: [] for name in _CARRY}
    out["html"] = []
    out["chunk_id"] = []
    out["unit_base"] = []

    def _emit(i: int, html: bytes, chunk_id: int, unit_base: int) -> None:
        for name in _CARRY:
            out[name].append(cols[name][i].as_py())
        out["html"].append(html)
        out["chunk_id"].append(chunk_id)
        out["unit_base"].append(unit_base)

    for i in range(batch.num_rows):
        html = html_col[i].as_py() or b""
        route = cols["route"][i].as_py()
        if route == "binary" and html.startswith(MAGIC):
            npages = peek_npages(html)
            if npages > max_pages:
                for ci, start in enumerate(range(0, npages, chunk_pages)):
                    _emit(i, slice_pages(html, start, start + chunk_pages), ci, start)
                continue
        elif route == "html" and len(html) > max_html_bytes:
            fragments = split_html_bytes(html, max_html_bytes)
            if len(fragments) > 1:
                for ci, frag in enumerate(fragments):
                    _emit(i, frag, ci, 0)
                continue
        _emit(i, html, 0, 0)

    schema = pa.schema(
        [batch.schema.field(name) for name in _CARRY]
        + [
            pa.field("html", pa.binary()),
            pa.field("chunk_id", pa.int32()),
            pa.field("unit_base", pa.int32()),
        ]
    )
    return pa.Table.from_pydict({k: out[k] for k in schema.names}, schema=schema)
