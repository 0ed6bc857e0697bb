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
