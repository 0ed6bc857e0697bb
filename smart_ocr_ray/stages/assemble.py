"""Assembly stage — the one wide step (G1): groupby + per-group reduce.

Hash-shuffles the *compact* unit rows (extracted text, never the raw
payloads — the ``html`` column dies at the extract stage) grouped by
the numeric ``part_key`` bucket, and reduces each document with the
deterministic assembly rule
(``/root/reference/src/socr/core/state.py:111-148``): chunk fragments
merge sorted by ``sub_id``, units join sorted by ``unit_id`` with
``"\\n\\n---\\n\\n"``. Ordering never relies on block order — groups are
explicitly sorted inside the reducer (SURVEY.md §7.4(4)).

Fast path: the overwhelming majority of documents are a single unit
with a single fragment; those rows convert column-to-column with no
Python-per-row reduction. Only multi-row documents take the full merge
path.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..document import assemble_units

DOC_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("lang", pa.string()),
        ("content_hash", pa.string()),
        ("n_bytes", pa.int64()),
        ("extracted_text", pa.string()),
        ("spans_json", pa.string()),
        ("attempt_failures", pa.string()),
        ("route", pa.string()),
        ("extractor", pa.string()),
        ("audit_passed", pa.bool_()),
        ("failure_mode", pa.string()),
        ("n_units", pa.int32()),
        ("word_count", pa.int64()),
        ("char_count", pa.int64()),
        ("agreement", pa.float64()),
        ("confidence", pa.float64()),
        ("processing_ms", pa.float64()),
    ]
)

_UNIT_KEYS = (
    "unit_id", "sub_id", "text", "attempt_failures", "extractor", "audit_passed", "failure_mode",
    "confidence", "n_attempts", "extractors_tried", "agreement", "spans_json",
    "route", "is_native", "processing_ms",
)


def _fast_single(batch: pa.Table) -> pa.Table:
    """Vectorized assembly of single-row documents (1 unit, 1 fragment):
    the unit text IS the document text; counts come from Arrow kernels."""
    texts = batch.column("text")
    # word_count is computed once in the extract stage (Arrow's regex
    # split materializes every token just to count them — 40x slower).
    word_counts = batch.column("word_count")
    empty = pc.equal(pc.utf8_length(texts), 0)
    # audit_passed requires non-empty text (assemble_units: any_text).
    passed = pc.and_(batch.column("audit_passed"), pc.invert(empty))
    return pa.Table.from_arrays(
        [
            batch.column("url"),
            batch.column("warc_ts"),
            batch.column("lang"),
            batch.column("content_hash"),
            batch.column("n_bytes"),
            texts,
            batch.column("spans_json"),
            batch.column("attempt_failures"),
            batch.column("route"),
            batch.column("extractors_tried"),
            passed,
            batch.column("failure_mode"),
            pa.array([1] * batch.num_rows, pa.int32()),
            word_counts,
            pc.cast(pc.utf8_length(texts), pa.int64()),
            batch.column("agreement"),
            batch.column("confidence"),
            batch.column("processing_ms"),
        ],
        schema=DOC_SCHEMA,
    )


def assemble_group(group: pa.Table) -> pa.Table:
    """Reduce one assembly group: all unit/fragment rows of the urls
    hashed into this ``part_key`` bucket (every row of a url shares its
    bucket, so documents are never split across groups)."""
    # Document identity = (url, content_hash): recrawls of a url are
    # distinct documents; chunks of one capture share the payload hash.
    keys = pc.binary_join_element_wise(
        group.column("url"), group.column("content_hash"), ":"
    )
    counts = pc.value_counts(keys)
    multi_keys = {
        v["values"] for v in counts.to_pylist() if v["counts"] > 1
    }

    if not multi_keys:
        return _fast_single(group)

    multi_mask = pc.is_in(keys, value_set=pa.array(sorted(multi_keys), pa.string()))
    single = group.filter(pc.invert(multi_mask))
    multi = group.filter(multi_mask)

    tables = []
    if single.num_rows:
        tables.append(_fast_single(single))

    rows = multi.to_pylist()
    by_url: dict[tuple, list[dict]] = {}
    for r in rows:
        by_url.setdefault((r["url"], r["content_hash"]), []).append(r)

    out: dict[str, list] = {name: [] for name in DOC_SCHEMA.names}
    for (url, _chash), unit_rows in sorted(by_url.items()):
        doc = assemble_units([{k: r[k] for k in _UNIT_KEYS} for r in unit_rows])
        first = unit_rows[0]
        out["url"].append(url)
        out["warc_ts"].append(first["warc_ts"])
        out["lang"].append(first["lang"])
        out["content_hash"].append(first["content_hash"])
        out["n_bytes"].append(first["n_bytes"])
        for key in (
            "extracted_text", "spans_json", "attempt_failures", "route", "extractor", "audit_passed",
            "failure_mode", "n_units", "word_count", "char_count", "agreement",
            "confidence", "processing_ms",
        ):
            out[key].append(doc[key])
    tables.append(pa.Table.from_pydict(out, schema=DOC_SCHEMA))
    return pa.concat_tables(tables)
