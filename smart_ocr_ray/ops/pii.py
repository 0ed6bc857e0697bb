"""PII redaction over the ``documents`` table.

The scrub stage a webtext training pipeline runs before tokenization:
find emails / North-American phone numbers / IPv4 addresses, replace
them with typed placeholders, and report per-document match counts so
downstream filters can drop PII-heavy documents.

Everything is vectorized RE2: ``pyarrow.compute``'s
``count_substring_regex`` / ``replace_substring_regex`` run the same
regex engine DuckDB's ``regexp_*`` functions use, so the SQL oracle
applies byte-identical semantics (``__ray_entry__.oracle_sql``'s
``pii_scrub`` entry). Stateless map — no shuffle; at 100 TB this is a
pure streaming stage.

The synthetic corpus is word-soup with no natural PII, so the operator
SEEDS deterministic PII derived from ``doc_id`` (one email / phone /
IPv4 per doc, round-robin by ``doc_id % 3``) before scrubbing — the
identical arithmetic is inlined in the SQL oracle, making the gate
exercise the real match paths, not just the no-match fall-through.
Unseeded behavior (including no-match and multi-match documents) is
pinned by ``tests/test_pii.py``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .text_analysis import read_documents

# RE2-compatible (no lookaround); \b is an ASCII word boundary in both
# pyarrow (RE2) and DuckDB (also RE2).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

# Scrub order matters and is frozen: emails first (their local parts
# may contain digit runs), then phones, then IPv4 (an IPv4 cannot
# overlap a phone: phones are dash-separated, IPs dot-separated).
_SCRUB_ORDER = (
    (EMAIL_RE, "<EMAIL>"),
    (PHONE_RE, "<PHONE>"),
    (IPV4_RE, "<IP>"),
)


def seed_pii(doc_ids, texts: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Append one deterministic PII token per document (round-robin by
    ``doc_id % 3``) — pure integer arithmetic so the SQL oracle can
    reproduce it verbatim:

      doc_id % 3 == 0 → `` contact user{id}@example.com now``
      doc_id % 3 == 1 → `` call 555-{100 + id%900}-{1000 + id%9000} today``
      doc_id % 3 == 2 → `` from 192.168.{id%256}.{(id*7)%256} logged``

    The phone groups are always 3 and 4 digits (ranges [100,999] and
    [1000,9999]) so no zero-padding is needed on either side.
    """
    suffixes = []
    for i in doc_ids:
        i = int(i)
        m = i % 3
        if m == 0:
            suffixes.append(f" contact user{i}@example.com now")
        elif m == 1:
            suffixes.append(f" call 555-{100 + i % 900}-{1000 + i % 9000} today")
        else:
            suffixes.append(f" from 192.168.{i % 256}.{(i * 7) % 256} logged")
    texts = pc.fill_null(texts, "")
    return pc.binary_join_element_wise(texts, pa.array(suffixes, pa.string()), "")


def scrub_batch(texts: pa.Array) -> tuple[pa.Array, dict[str, pa.Array]]:
    """Vectorized scrub of one Arrow string column.

    Returns the scrubbed column plus per-pattern match counts.
    Counts are taken BEFORE any replacement so they reflect the
    original text (placeholders cannot shadow later patterns).
    """
    counts = {
        "n_emails": pc.count_substring_regex(texts, EMAIL_RE),
        "n_phones": pc.count_substring_regex(texts, PHONE_RE),
        "n_ips": pc.count_substring_regex(texts, IPV4_RE),
    }
    scrubbed = texts
    for pattern, placeholder in _SCRUB_ORDER:
        scrubbed = pc.replace_substring_regex(scrubbed, pattern, placeholder)
    return scrubbed, counts


def pii_scrub(sf_dir: str) -> ray.data.Dataset:
    """doc_id, n_emails, n_phones, n_ips, scrubbed_md5 — match counts
    and the md5 of the placeholder-scrubbed (seeded) text."""
    from ..functions.textstats import content_md5

    def _batch(batch: pa.Table) -> pa.Table:
        seeded = seed_pii(
            batch.column("doc_id").to_pylist(), batch.column("text").combine_chunks()
        )
        scrubbed, counts = scrub_batch(seeded)
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "n_emails": pc.cast(counts["n_emails"], pa.int64()),
                "n_phones": pc.cast(counts["n_phones"], pa.int64()),
                "n_ips": pc.cast(counts["n_ips"], pa.int64()),
                "scrubbed_md5": pa.array(
                    [content_md5(t) for t in scrubbed.to_pylist()], pa.string()
                ),
            }
        )

    return read_documents(sf_dir).map_batches(_batch, batch_format="pyarrow")


_PII_DOMAIN_SCHEMA = pa.schema(
    [
        ("source", pa.string()),
        ("n_docs", pa.int64()),
        ("n_emails", pa.int64()),
        ("n_phones", pa.int64()),
        ("n_ips", pa.int64()),
        ("pii_per_doc_e6", pa.int64()),
    ]
)


def pii_by_domain(sf_dir: str) -> ray.data.Dataset:
    """Per-domain PII density — the scrub-planning rollup a pipeline
    runs before deciding which sources need the expensive scrubbing
    passes (or exclusion): total email/phone/IP matches per source and
    the density ``pii_per_doc_e6 = (1e6 * total_matches) // n_docs``.

    Frozen rule: match counts are exactly ``pii_scrub``'s per-doc
    counts (same RE2 patterns, same deterministic doc_id-derived
    seeding); the oracle embeds the pii_scrub SQL verbatim so the
    rollup can never drift from the per-doc scrubber.

    Scale shape: the per-doc count pass is the same stateless map as
    ``pii_scrub``; per-batch Arrow partials collapse each block to one
    row per source before the single source-keyed shuffle; density is
    a floor-div over the tiny per-source table.
    """
    from ray.data.aggregate import Sum

    def _partial(batch: pa.Table) -> pa.Table:
        seeded = seed_pii(
            batch.column("doc_id").to_pylist(),
            batch.column("text").combine_chunks(),
        )
        _, counts = scrub_batch(seeded)
        tbl = pa.table(
            {
                "source": batch.column("source"),
                "n": pa.array([1] * batch.num_rows, pa.int64()),
                "e": pc.cast(counts["n_emails"], pa.int64()),
                "p": pc.cast(counts["n_phones"], pa.int64()),
                "i": pc.cast(counts["n_ips"], pa.int64()),
            }
        )
        out = pa.TableGroupBy(tbl, ["source"]).aggregate(
            [("n", "sum"), ("e", "sum"), ("p", "sum"), ("i", "sum")]
        )
        return out.rename_columns(["source", "n", "e", "p", "i"])

    agg = (
        read_documents(sf_dir)
        .map_batches(_partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("e", alias_name="e"),
            Sum("p", alias_name="p"),
            Sum("i", alias_name="i"),
        )
    )

    def _finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _PII_DOMAIN_SCHEMA.empty_table()
        import numpy as np

        n = batch.column("n").cast(pa.int64()).to_numpy(zero_copy_only=False)
        e = batch.column("e").cast(pa.int64()).to_numpy(zero_copy_only=False)
        p = batch.column("p").cast(pa.int64()).to_numpy(zero_copy_only=False)
        i = batch.column("i").cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {
                "source": batch.column("source"),
                "n_docs": pa.array(n, pa.int64()),
                "n_emails": pa.array(e, pa.int64()),
                "n_phones": pa.array(p, pa.int64()),
                "n_ips": pa.array(i, pa.int64()),
                "pii_per_doc_e6": pa.array(
                    (1_000_000 * (e + p + i)) // n, pa.int64()
                ),
            },
            schema=_PII_DOMAIN_SCHEMA,
        )

    return agg.map_batches(_finish, batch_format="pyarrow").sort("source")
