"""The composed corpus-curation pipeline — the end-to-end keep-list a
training-data pipeline actually materializes before tokenization,
chaining this repo's operators in the order real pipelines run them
(C4/Gopher → dedup → per-host caps):

  1. quality gate   — ``text_analysis.quality_filter`` (Gopher rules)
  2. deduplication  — ``dedup.dedup_survivors`` (exact + MinHash-LSH
                      near-dup clusters)
  3. per-source cap — top-k longest among the docs that SURVIVED 1+2
                      (capping already-dropped docs would waste budget)

Per document: ``(doc_id, keep, reason)`` where reason is the FIRST
failing stage — a quality_filter reason, else ``exact_dup`` /
``near_dup``, else ``source_cap``, else ``''``.

Scale shape: three corpus-narrow tables (quality verdicts, dedup
verdicts, (source, n_tokens) metadata) meet in chained INNER joins on
doc_id — every doc exists in all three, so no null-typed fill columns
reach a downstream shuffle (the hazard documented at
``dedup.cluster_pairs`` applies only to outer joins); the cap stage
reuses ``topk_per_source``'s per-block combiner over the eligible
subset, and only the final capped-keep left join produces nulls, which
the terminal verdict map consumes directly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .dedup import dedup_survivors
from .text_analysis import (
    quality_filter,
    read_documents,
    token_count,
    topk_per_source,
)

CAP_K = 3


def corpus_curation(sf_dir: str, k: int = CAP_K) -> ray.data.Dataset:
    from ..tuning import join_partitions as _jp

    jp = _jp()

    meta_schema = pa.schema(
        [("doc_id", pa.int64()), ("source", pa.string()), ("n_tokens", pa.int64())]
    )

    def _meta(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "source": batch.column("source").cast(pa.string()),
                "n_tokens": pa.array(
                    [token_count(t or "") for t in batch.column("text").to_pylist()],
                    pa.int64(),
                ),
            },
            schema=meta_schema,
        )

    meta = read_documents(sf_dir).map_batches(_meta, batch_format="pyarrow")

    def _rename(col: str):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.Table.from_pydict(
                {
                    "doc_id": batch.column("doc_id").cast(pa.int64()),
                    col: batch.column("reason").cast(pa.string()),
                },
                schema=pa.schema([("doc_id", pa.int64()), (col, pa.string())]),
            )

        return fn

    qual = quality_filter(sf_dir).map_batches(
        _rename("qreason"), batch_format="pyarrow"
    )
    dedup = dedup_survivors(sf_dir).map_batches(
        _rename("dreason"), batch_format="pyarrow"
    )

    # Chained INNER joins: all three tables hold every doc_id, so every
    # block stays fully typed. Materialized because both the cap stage
    # and the final verdict read it.
    joined = (
        meta.join(qual.repartition(jp), "inner", jp, on=("doc_id",))
        .join(dedup.repartition(jp), "inner", jp, on=("doc_id",))
        .repartition(jp)
        .materialize()
    )

    def _eligible(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.and_(
            pc.equal(batch.column("qreason"), ""),
            pc.equal(batch.column("dreason"), ""),
        )
        return batch.filter(mask).select(["source", "doc_id", "n_tokens"])

    capped_schema = pa.schema([("doc_id", pa.int64()), ("capped_keep", pa.int8())])

    def _capped(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "doc_id" not in batch.column_names:
            return capped_schema.empty_table()
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "capped_keep": pa.array([1] * batch.num_rows, pa.int8()),
            },
            schema=capped_schema,
        )

    kept = (
        topk_per_source(
            joined.map_batches(_eligible, batch_format="pyarrow"), k
        )
        .map_batches(_capped, batch_format="pyarrow")
        .repartition(jp)
        .materialize()
    )

    verdicted = joined
    if kept.count() > 0:
        verdicted = joined.join(kept, "left_outer", jp, on=("doc_id",))

    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("keep", pa.bool_()), ("reason", pa.string())]
    )

    def _verdict(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = batch.column_names
        capk = (
            batch.column("capped_keep").to_pylist()
            if "capped_keep" in cols
            else [None] * n
        )
        reasons = []
        for q, d, c in zip(
            batch.column("qreason").to_pylist(),
            batch.column("dreason").to_pylist(),
            capk,
        ):
            if q:
                reasons.append(q)
            elif d:
                reasons.append(d)
            elif not c:
                reasons.append("source_cap")
            else:
                reasons.append("")
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "keep": pa.array([r == "" for r in reasons], pa.bool_()),
                "reason": pa.array(reasons, pa.string()),
            },
            schema=out_schema,
        )

    return verdicted.map_batches(_verdict, batch_format="pyarrow")


BLOCK_KEYWORDS: tuple[str, ...] = ("casino", "viagra", "lottery")


def blocklist_filter(sf_dir: str) -> ray.data.Dataset:
    """UT1-style blocklist filtering — the domain/keyword gate crawl
    curation runs before any expensive stage (the Université Toulouse
    blocklists are the standard public artifact; RefinedWeb/FineWeb
    both apply one). Two frozen rules, domain precedence first:

      * DOMAIN: the document's host (``source || '.example.com'``, the
        same synthesis as ``ops/urls``) is on the blocklist — here the
        deterministic stand-in rule ``md5(host)`` starts with hex
        ``'0'`` (no external data, ~1/16 of hosts);
      * KEYWORD: lowercased text contains any of ``BLOCK_KEYWORDS``
        as a substring.

    Output per document: (doc_id, blocked, reason) with reason in
    ``('domain', 'keyword', '')`` — audit-style like
    ``quality_filter``, so downstream stages can anti-join or report.

    Scale shape: the blocklist is built DISTRIBUTED (a distinct-host
    groupby — bounded by the domain count, not the corpus) and the
    tiny verdict list broadcast once via ``ray.put``; the scan is one
    stateless ``map_batches`` with an O(1) set probe per row plus
    vectorized substring checks. At 100 TB the real UT1 list is ~5M
    domains — still a broadcast, never a shuffle join.
    """
    import hashlib

    import pyarrow.compute as pc

    docs = read_documents(sf_dir)

    src_schema = pa.schema([("source", pa.string())])

    def _sources(batch: pa.Table) -> pa.Table:
        # Per-block distinct collapse AND the blocklist predicate both
        # run here, before any shuffle: only the ~1/16 blocked hosts
        # enter the groupby or reach the driver (filtering after the
        # shuffle would move — and take_all() — every distinct host).
        hosts = sorted(
            s
            for s in set(batch.column("source").to_pylist())
            if hashlib.md5(f"{s}.example.com".encode()).hexdigest()[0] == "0"
        )
        return pa.Table.from_pydict(
            {"source": pa.array(hosts, pa.string())}, schema=src_schema
        )

    blocked_sources = frozenset(
        r["source"]
        for r in docs.map_batches(_sources, batch_format="pyarrow")
        .groupby("source")
        .count()
        .take_all()
    )
    bl_ref = ray.put(blocked_sources)

    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("blocked", pa.bool_()), ("reason", pa.string())]
    )

    def _scan(batch: pa.Table) -> pa.Table:
        bl = ray.get(bl_ref)
        srcs = batch.column("source").to_pylist()
        dom = np.array([s in bl for s in srcs], dtype=bool)
        low = pc.utf8_lower(pc.fill_null(batch.column("text"), ""))
        kw = np.zeros(batch.num_rows, dtype=bool)
        for w in BLOCK_KEYWORDS:
            kw |= pc.match_substring(low, w).to_numpy(zero_copy_only=False)
        reason = np.where(dom, "domain", np.where(kw, "keyword", ""))
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "blocked": pa.array((dom | kw).tolist(), pa.bool_()),
                "reason": pa.array(reason.tolist(), pa.string()),
            },
            schema=out_schema,
        )

    return docs.map_batches(_scan, batch_format="pyarrow")
