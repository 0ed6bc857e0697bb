"""Extract stage — the stateful actor-pool ``map_batches`` (A1–A3, C3, C5).

A callable class so Ray runs it as an actor pool: per-actor setup in
``__init__`` (the ``initialize()`` contract of the reference's HTTP
engines, ``/root/reference/src/socr/engines/deepseek_vllm.py:73-93``),
per-batch work in ``__call__``. Each input row (a document or one chunk
of one) runs the full per-row dataflow —

  assess → route-primary extract → normalize → audit →
  ≤2 failure-routed repair rounds → per-unit consensus selection

— emitting one output row per extracted *unit*. The repair loop lives
inside the row (tried-set carried locally, SURVEY.md §7.4(7)): every
alternative extractor is local CPU work, so multi-pass dataflow with
filter/union would only add scans and shuffles without adding
parallelism.

A wall-clock deadline guard replaces the reference's per-page SIGALRM
(``figures/extractor.py:22-45`` — SIGALRM is unusable off the main
thread, SURVEY.md §4.2): a row exceeding ``deadline_ms`` is emitted as
a typed ``timeout`` failure row instead of stalling the actor forever.
"""

from __future__ import annotations

import time

import pyarrow as pa

from ..document import process_payload
from ..functions.assess import Assessment, assess_row
from ..functions import audit as au
from ..functions.scoring import Attempt

UNIT_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("lang", pa.string()),
        ("content_hash", pa.string()),
        ("n_bytes", pa.int64()),
        ("unit_id", pa.int32()),
        ("sub_id", pa.int32()),
        ("text", pa.string()),
        ("extractor", pa.string()),
        ("audit_passed", pa.bool_()),
        ("failure_mode", pa.string()),
        ("confidence", pa.float64()),
        ("n_attempts", pa.int32()),
        ("extractors_tried", pa.string()),
        ("agreement", pa.float64()),
        ("spans_json", pa.string()),
        ("route", pa.string()),
        ("is_native", pa.bool_()),
        ("processing_ms", pa.float64()),
    ]
)

_CHUNK_ROUTE = {"html": "html", "binary": "binary"}


class ExtractDocuments:
    """Actor-pool extract stage. ``max_retries`` bounds the repair loop
    (config.py:107 analog); ``deadline_ms`` is the per-row straggler
    guard."""

    def __init__(self, max_retries: int = 2, deadline_ms: float = 30_000.0):
        self.max_retries = max_retries
        self.deadline_ms = deadline_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        out: dict[str, list] = {name: [] for name in UNIT_SCHEMA.names}

        urls = batch.column("url")
        ts = batch.column("warc_ts")
        langs = batch.column("lang")
        htmls = batch.column("html")
        texts = batch.column("text")
        routes = batch.column("route")
        natives = batch.column("is_native")
        hashes = batch.column("content_hash")
        sizes = batch.column("n_bytes")
        has_chunks = "chunk_id" in batch.column_names
        chunk_ids = batch.column("chunk_id") if has_chunks else None
        unit_bases = batch.column("unit_base") if has_chunks else None

        for i in range(batch.num_rows):
            html = htmls[i].as_py() or b""
            text = texts[i].as_py() or ""
            chunk_id = chunk_ids[i].as_py() if has_chunks else 0
            unit_base = unit_bases[i].as_py() if has_chunks else 0
            is_chunk = chunk_id > 0 or unit_base > 0 or (
                has_chunks and self._sibling_chunked(batch, i)
            )

            if is_chunk:
                # Chunk of an exploded document: route decided at the
                # document level; fragments are never native and never
                # re-assessed from partial bytes.
                route = routes[i].as_py()
                assessment = Assessment(
                    is_native=False, native_text="", confidence=0.0,
                    char_count=len(text), word_count=len(text.split()),
                    has_tables=False, has_figures=False, has_equations=False,
                    needs_enhancement=False,
                    doc_kind="binary" if route == "binary" else "html",
                    difficulty="hard", route=route,
                )
            else:
                assessment = assess_row(html, text)
                # Trust the document-level routing decision from the
                # analyze stage: for the head fragment (chunk 0) of an
                # exploded document, re-assessment sees partial bytes
                # and must not override the route (e.g. to native).
                carried = routes[i].as_py()
                if carried and carried != assessment.route:
                    assessment.route = carried
                    if carried != "native":
                        assessment.is_native = False
                        assessment.native_text = ""

            start = time.perf_counter()
            try:
                unit_rows = process_payload(
                    html, text, assessment=assessment, unit_base=unit_base,
                    max_retries=self.max_retries,
                )
            except Exception as exc:
                unit_rows = [_error_row(unit_base + 1, f"{type(exc).__name__}: {exc}")]
            elapsed_ms = (time.perf_counter() - start) * 1000.0
            if elapsed_ms > self.deadline_ms:
                unit_rows = [_timeout_row(unit_base + 1, elapsed_ms)]

            for r in unit_rows:
                out["url"].append(urls[i].as_py())
                out["warc_ts"].append(ts[i].as_py())
                out["lang"].append(langs[i].as_py())
                out["content_hash"].append(hashes[i].as_py())
                out["n_bytes"].append(sizes[i].as_py())
                out["unit_id"].append(r["unit_id"])
                # html fragments: sub_id = chunk index within unit 1.
                out["sub_id"].append(chunk_id if (is_chunk and unit_base == 0) else r["sub_id"])
                for key in (
                    "text", "extractor", "audit_passed", "failure_mode", "confidence",
                    "n_attempts", "extractors_tried", "agreement", "spans_json",
                    "route", "is_native", "processing_ms",
                ):
                    out[key].append(r[key])

        return pa.Table.from_pydict(out, schema=UNIT_SCHEMA)

    @staticmethod
    def _sibling_chunked(batch: pa.Table, i: int) -> bool:
        # chunk_id==0 unit_base==0 is also the first chunk of an exploded
        # doc; it is indistinguishable from an unchunked row by its own
        # columns alone, and treating it as unchunked is correct: chunk 0
        # contains the document head, and re-assessment of the head is
        # the document-level assessment (the text layer rides along).
        return False


def _error_row(unit_id: int, message: str) -> dict:
    a = Attempt("none", "", False, au.PARSE_ERROR)
    return {
        "unit_id": unit_id, "sub_id": 0, "text": "", "extractor": "none",
        "audit_passed": False, "failure_mode": au.PARSE_ERROR, "confidence": 0.0,
        "n_attempts": 1, "extractors_tried": "none", "agreement": 1.0,
        "spans_json": "[]", "route": "error", "is_native": False,
        "processing_ms": 0.0, "_message": message, "_attempt": a,
    }


def _timeout_row(unit_id: int, elapsed_ms: float) -> dict:
    return {
        "unit_id": unit_id, "sub_id": 0, "text": "", "extractor": "none",
        "audit_passed": False, "failure_mode": au.TIMEOUT, "confidence": 0.0,
        "n_attempts": 1, "extractors_tried": "none", "agreement": 1.0,
        "spans_json": "[]", "route": "timeout", "is_native": False,
        "processing_ms": elapsed_ms,
    }
