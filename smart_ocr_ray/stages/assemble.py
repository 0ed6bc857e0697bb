"""Assembly stage — the one wide step (G1): ``groupby("url").map_groups``.

Hash-shuffles the *compact* unit rows (extracted text, never the raw
payloads — the ``html`` column is dropped before the shuffle) and
reduces each url group with the deterministic assembly rule
(``/root/reference/src/socr/core/state.py:111-148``): chunk fragments
merge sorted by ``sub_id``, units join sorted by ``unit_id`` with
``"\\n\\n---\\n\\n"``. Ordering never relies on block order — the group
is explicitly sorted inside the reducer (SURVEY.md §7.4(4)).
"""

from __future__ import annotations

import pyarrow as pa

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
    "unit_id", "sub_id", "text", "extractor", "audit_passed", "failure_mode",
    "confidence", "n_attempts", "extractors_tried", "agreement", "spans_json",
    "route", "is_native", "processing_ms",
)


def assemble_group(group: pa.Table) -> pa.Table:
    """Reduce one url group (all unit/fragment rows of one document)."""
    rows = group.to_pylist()
    # A group is one url by construction of groupby("url"); tolerate a
    # multi-url batch defensively by sub-grouping.
    by_url: dict[str, list[dict]] = {}
    for r in rows:
        by_url.setdefault(r["url"], []).append(r)

    out: dict[str, list] = {name: [] for name in DOC_SCHEMA.names}
    for url, unit_rows in sorted(by_url.items()):
        doc = assemble_units([{k: r[k] for k in _UNIT_KEYS} for r in unit_rows])
        first = unit_rows[0]
        out["url"].append(url)
        out["warc_ts"].append(first["warc_ts"])
        out["lang"].append(first["lang"])
        out["content_hash"].append(first["content_hash"])
        out["n_bytes"].append(first["n_bytes"])
        for key in (
            "extracted_text", "spans_json", "route", "extractor", "audit_passed",
            "failure_mode", "n_units", "word_count", "char_count", "agreement",
            "confidence", "processing_ms",
        ):
            out[key].append(doc[key])
    return pa.Table.from_pydict(out, schema=DOC_SCHEMA)
