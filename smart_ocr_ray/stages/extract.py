"""Extract stage — the heavy per-row ``map_batches`` (A1–A3, C3, C5).

Each input row (a document or one chunk of one) runs the full per-row
dataflow —

  assess → route-primary extract → normalize → audit →
  ≤2 failure-routed repair rounds → per-unit consensus selection

— emitting one output row per extracted *unit*. The repair loop lives
inside the row (tried-set carried locally, SURVEY.md §7.4(7)): every
alternative extractor is local CPU work, so multi-pass dataflow with
filter/union would only add scans and shuffles without adding
parallelism.

The stage is a callable class; the pipeline runs it either as stateless
tasks (default — its warm state is module-level compiled regexes,
amortized per worker process) or as an actor pool via
``map_batches(ExtractDocuments, concurrency=...)`` for heavyweight
extractor state (the ``initialize()`` contract of the reference's HTTP
engines, ``/root/reference/src/socr/engines/deepseek_vllm.py:73-93``).

Carried columns (url, timestamp, lang) are replicated to output rows
with a vectorized Arrow ``take`` — only computed columns are built in
Python.

A cooperative wall-clock deadline replaces the reference's per-page
SIGALRM (``figures/extractor.py:22-45`` — SIGALRM is unusable off the
main thread, SURVEY.md §4.2): the stage arms a thread-local deadline
per row and the parse loops poll it (``functions/deadline.py``), so a
pathological payload is aborted *during* the parse and emitted as a
typed ``timeout`` row. A row that completes is never discarded, however
slow — output stays independent of wall-clock load.
"""

from __future__ import annotations

import time
import zlib

import pyarrow as pa

from ..document import process_payload
from ..functions.assess import Assessment, assess_row
from ..functions import audit as au
from ..functions.deadline import DeadlineExceeded, arm, disarm

# Assembly-bucket anchor. Tradeoff: map_groups invokes the reducer once
# per bucket, so buckets must be few enough that a group amortizes its
# Arrow-kernel overhead (≥~100 docs/bucket) yet numerous enough to keep
# every reducer busy; 512 covers both on the 32-CPU dev box. At
# pipeline-build time the stage derives the actual count from cluster
# size (tuning.assembly_buckets(), == 512 at 32 CPUs), so a 256-node
# cluster gets proportionally more reducers without retuning.
NUM_ASSEMBLY_BUCKETS = 512

_COMPUTED = (
    "unit_id", "sub_id", "text", "word_count", "attempt_failures", "extractor", "audit_passed", "failure_mode",
    "confidence", "n_attempts", "extractors_tried", "agreement", "spans_json",
    "route", "is_native", "processing_ms",
)

_COMPUTED_TYPES = {
    "unit_id": pa.int32(),
    "sub_id": pa.int32(),
    "text": pa.string(),
    "word_count": pa.int64(),
    "attempt_failures": pa.string(),
    "extractor": pa.string(),
    "audit_passed": pa.bool_(),
    "failure_mode": pa.string(),
    "confidence": pa.float64(),
    "n_attempts": pa.int32(),
    "extractors_tried": pa.string(),
    "agreement": pa.float64(),
    "spans_json": pa.string(),
    "route": pa.string(),
    "is_native": pa.bool_(),
    "processing_ms": pa.float64(),
}


class ExtractDocuments:
    """Extract stage. ``max_retries`` bounds the repair loop
    (config.py:107 analog); ``deadline_ms`` is the per-row straggler
    guard."""

    def __init__(
        self,
        max_retries: int = 2,
        deadline_ms: float = 30_000.0,
        multi_extractor: bool = False,
        consensus: str = "heuristic",
        num_buckets: int | None = None,
    ):
        self.max_retries = max_retries
        self.deadline_ms = deadline_ms
        self.multi_extractor = multi_extractor
        self.consensus = consensus
        # The bucket count MUST be resolved exactly once per run, on
        # the DRIVER, and passed in explicitly: resolving it inside
        # actor __init__ would let actors created at different times
        # (cluster scale-up mid-run, or a driver-only env override)
        # disagree on the modulus — and rows of one url landing in
        # different buckets silently corrupts assembly. The pipeline
        # builder passes tuning.assembly_buckets(); the fallback here
        # only serves direct driver-side construction in tests.
        if num_buckets is None:
            from ..tuning import assembly_buckets

            num_buckets = assembly_buckets()
        self.num_buckets = num_buckets

    def __call__(self, batch: pa.Table) -> pa.Table:
        htmls = batch.column("html")
        texts = batch.column("text")
        routes = batch.column("route") if "route" in batch.column_names else None
        has_chunks = "chunk_id" in batch.column_names
        chunk_ids = batch.column("chunk_id") if has_chunks else None
        unit_bases = batch.column("unit_base") if has_chunks else None
        # Whole-document fingerprints carried from the explode stage
        # (fragment bytes must not re-hash — resume keys on the payload).
        hash_col = batch.column("content_hash") if "content_hash" in batch.column_names else None
        size_col = batch.column("doc_bytes") if "doc_bytes" in batch.column_names else None

        take_indices: list[int] = []
        computed: dict[str, list] = {name: [] for name in _COMPUTED}
        part_keys: list[int] = []
        content_hashes: list[str] = []
        n_bytes: list[int] = []

        url_col = batch.column("url")

        for i in range(batch.num_rows):
            html = htmls[i].as_py() or b""
            text = texts[i].as_py() or ""
            chunk_id = chunk_ids[i].as_py() if has_chunks else 0
            unit_base = unit_bases[i].as_py() if has_chunks else 0
            is_chunk = chunk_id > 0 or unit_base > 0

            if is_chunk:
                # Chunk of an exploded document: route was decided at
                # the document level; fragments are never native and
                # never re-assessed from partial bytes.
                route = routes[i].as_py() if routes is not None else "html"
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

            start = time.perf_counter()
            arm(self.deadline_ms / 1000.0)
            try:
                unit_rows = process_payload(
                    html, text, assessment=assessment, unit_base=unit_base,
                    max_retries=self.max_retries,
                    multi_extractor=self.multi_extractor,
                    consensus=self.consensus,
                )
            except DeadlineExceeded:
                elapsed_ms = (time.perf_counter() - start) * 1000.0
                unit_rows = [_timeout_row(unit_base + 1, elapsed_ms)]
            except Exception as exc:
                unit_rows = [_error_row(unit_base + 1, f"{type(exc).__name__}: {exc}")]
            finally:
                disarm()

            url = url_col[i].as_py()
            if hash_col is not None:
                content_hash = hash_col[i].as_py()
                doc_bytes = size_col[i].as_py()
            else:
                import hashlib

                content_hash = hashlib.sha256(html).hexdigest()
                doc_bytes = len(html)
            # Group key includes the payload hash: a recrawled url (two
            # input rows, same url, different capture) must assemble as
            # two documents, never silently merge; chunks of one
            # document share the whole-payload hash so they still meet.
            part_key = zlib.crc32(
                f"{url}:{content_hash}".encode("utf-8")
            ) % self.num_buckets
            for r in unit_rows:
                take_indices.append(i)
                part_keys.append(part_key)
                content_hashes.append(content_hash)
                n_bytes.append(doc_bytes)
                # html fragments: sub_id = chunk index within unit 1.
                sub_id = chunk_id if (is_chunk and unit_base == 0) else r["sub_id"]
                for key in _COMPUTED:
                    computed[key].append(sub_id if key == "sub_id" else r[key])

        indices = pa.array(take_indices, pa.int64())
        out = pa.Table.from_pydict(
            {
                "url": batch.column("url").take(indices),
                # part_key groups the assembly shuffle: numeric hash of
                # the url so the sort-based shuffle sorts a single int64
                # (not url strings) and url-prefix skew cannot
                # range-cluster expensive documents into one reducer.
                "part_key": pa.array(part_keys, pa.int64()),
                "warc_ts": batch.column("warc_ts").take(indices),
                "lang": batch.column("lang").take(indices),
                "content_hash": pa.array(content_hashes, pa.string()),
                "n_bytes": pa.array(n_bytes, pa.int64()),
                **{
                    key: pa.array(computed[key], _COMPUTED_TYPES[key])
                    for key in _COMPUTED
                },
            }
        )
        return out


def _error_row(unit_id: int, message: str) -> dict:
    return {
        "unit_id": unit_id, "sub_id": 0, "text": "", "word_count": 0,
        "attempt_failures": f"none:{au.PARSE_ERROR}", "extractor": "none",
        "audit_passed": False, "failure_mode": au.PARSE_ERROR, "confidence": 0.0,
        "n_attempts": 1, "extractors_tried": "none", "agreement": 1.0,
        "spans_json": "[]", "route": "error", "is_native": False,
        "processing_ms": 0.0,
    }


def _timeout_row(unit_id: int, elapsed_ms: float) -> dict:
    return {
        "unit_id": unit_id, "sub_id": 0, "text": "", "word_count": 0,
        "attempt_failures": f"none:{au.TIMEOUT}", "extractor": "none",
        "audit_passed": False, "failure_mode": au.TIMEOUT, "confidence": 0.0,
        "n_attempts": 1, "extractors_tried": "none", "agreement": 1.0,
        "spans_json": "[]", "route": "timeout", "is_native": False,
        "processing_ms": elapsed_ms,
    }
