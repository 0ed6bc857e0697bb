"""Per-document text analysis over the ``documents`` table.

Stateless vectorized ``map_batches`` stages: token counting, quality
signals, language-ID, fingerprinting. Column semantics are frozen to
stay exactly DuckDB-expressible so the driver's oracle comparison
verifies them value-for-value (see ``__ray_entry__.oracle_sql``).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from ..functions.textstats import (
    STOPWORDS,
    bpeish_token_count,
    content_md5,
    predict_lang,
    quality_score,
    stopword_hits,
    token_count,
    winnow_fingerprint,
    word_lengths_total,
)


def read_documents(sf_dir: str) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet")


def token_counts(sf_dir: str) -> ray.data.Dataset:
    """doc_id, n_tokens (whitespace), n_bpeish (sub-word-ish)."""

    def _batch(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pa.array([token_count(t or "") for t in texts], pa.int64()),
                "n_bpeish": pa.array([bpeish_token_count(t or "") for t in texts], pa.int64()),
            }
        )

    return read_documents(sf_dir).map_batches(_batch, batch_format="pyarrow")


def quality(sf_dir: str) -> ray.data.Dataset:
    """doc_id, n_tokens, token_chars, stop_hits_en — exact-integer quality
    signals (SQL-checkable); plus the float composite quality_score."""

    def _batch(batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch.column("text").to_pylist()]
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pa.array([token_count(t) for t in texts], pa.int64()),
                "token_chars": pa.array([word_lengths_total(t) for t in texts], pa.int64()),
                "stop_hits_en": pa.array([stopword_hits(t, "en") for t in texts], pa.int64()),
                "quality_score": pa.array(
                    [round(quality_score(t), 6) for t in texts], pa.float64()
                ),
            }
        )

    return read_documents(sf_dir).map_batches(_batch, batch_format="pyarrow")


def lang_id(sf_dir: str) -> ray.data.Dataset:
    """doc_id, pred_lang — stopword-bank language-ID (SQL-mirrored)."""

    def _batch(batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch.column("text").to_pylist()]
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "pred_lang": pa.array([predict_lang(t) for t in texts], pa.string()),
            }
        )

    return read_documents(sf_dir).map_batches(_batch, batch_format="pyarrow")


def domain_stats(sf_dir: str) -> ray.data.Dataset:
    """Per-(source, lang) corpus rollup — the per-domain quality view a
    crawl pipeline runs before sampling (``source`` is this corpus's
    domain analog): doc count, token sum, integer-grid mean tokens, and
    exact distinct-text count (content md5, so recrawled duplicates are
    visible per domain).

    Distinct counting is exact and shuffle-light: per-batch (source,
    lang, md5) dedup, then a groupby over (source, lang) counts
    distinct hashes inside the (small) group."""

    def _prep(batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch.column("text").to_pylist()]
        return pa.Table.from_pydict(
            {
                "source": batch.column("source"),
                "lang": batch.column("lang"),
                "text_md5": pa.array([content_md5(t) for t in texts], pa.string()),
                "n_tokens": pa.array([token_count(t) for t in texts], pa.int64()),
            }
        )

    def _rollup(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = group.num_rows
        tokens = pc.sum(group.column("n_tokens")).as_py() or 0
        distinct = pc.count_distinct(group.column("text_md5")).as_py()
        return pa.Table.from_pydict(
            {
                "source": [group.column("source")[0].as_py()],
                "lang": [group.column("lang")[0].as_py()],
                "n_docs": pa.array([n], pa.int64()),
                "total_tokens": pa.array([tokens], pa.int64()),
                "mean_tokens_e2": pa.array([(tokens * 100) // n], pa.int64()),
                "n_distinct_texts": pa.array([distinct], pa.int64()),
            }
        )

    return (
        read_documents(sf_dir)
        .map_batches(_prep, batch_format="pyarrow")
        .groupby(["source", "lang"])
        .map_groups(_rollup, batch_format="pyarrow")
    )


def top_ngrams(sf_dir: str, n: int = 2, k: int = 20) -> ray.data.Dataset:
    """Corpus-wide top-k word n-grams by document-token count (the
    vocabulary/contamination sweep a training pipeline runs): per-batch
    Counter partials → one small groupby(ngram) sum → global top-k.

    The shuffle moves one row per distinct n-gram per block (the
    partial combine), never per occurrence; top-k is a sort over the
    aggregated (distinct-ngram-sized) table with a deterministic
    (count desc, ngram asc) tie order mirrored by the SQL oracle."""

    def _partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        counts: Counter = Counter()
        for t in batch.column("text").to_pylist():
            toks = (t or "").lower().split()
            counts.update(
                " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
            )
        return pa.Table.from_pydict(
            {
                "ngram": pa.array(list(counts.keys()), pa.string()),
                "cnt": pa.array(list(counts.values()), pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    return (
        read_documents(sf_dir)
        .map_batches(_partial, batch_format="pyarrow")
        .groupby("ngram")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .sort(["cnt", "ngram"], descending=[True, False])
        .limit(k)
    )


def fingerprints(sf_dir: str) -> ray.data.Dataset:
    """doc_id, text_md5 (exact; SQL md5), n_winnow (winnowing
    fingerprint cardinality, rolling-hash based — rows-only check)."""

    def _batch(batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch.column("text").to_pylist()]
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "text_md5": pa.array([content_md5(t) for t in texts], pa.string()),
                "n_winnow": pa.array(
                    [len(winnow_fingerprint(t)) for t in texts], pa.int64()
                ),
            }
        )

    return read_documents(sf_dir).map_batches(_batch, batch_format="pyarrow")
