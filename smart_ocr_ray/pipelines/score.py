"""Benchmark scoring job (F1–F4, G7, J4): extracted ⋈ golden → WER/CER/
NES per url → rollups per extractor.

The golden table is the small side (broadcast via ``ray.put`` once,
looked up per batch — no shuffle join, J4 pattern from
``/root/reference/src/socr/benchmark/scorer.py:206-213``).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..functions.editdist import cer, nes, wer_cased


def score_against_golden(
    extracted: ray.data.Dataset, golden: dict[str, str]
) -> ray.data.Dataset:
    """Per-url scores: url, extractor, wer, cer, nes, exact_match."""
    golden_ref = ray.put(golden)

    def _score(batch: pa.Table) -> pa.Table:
        truth = ray.get(golden_ref)
        urls = batch.column("url").to_pylist()
        texts = batch.column("extracted_text").to_pylist()
        extractors = batch.column("extractor").to_pylist()
        out = {"url": [], "extractor": [], "wer": [], "cer": [], "nes": [], "exact_match": []}
        for url, text, extractor in zip(urls, texts, extractors):
            gt = truth.get(url)
            if gt is None:
                continue
            out["url"].append(url)
            out["extractor"].append(extractor)
            out["wer"].append(round(wer_cased(text or "", gt), 6))
            out["cer"].append(round(cer(text or "", gt), 6))
            out["nes"].append(round(nes(text or "", gt), 6))
            out["exact_match"].append((text or "") == gt)
        return pa.Table.from_pydict(out)

    return extracted.map_batches(_score, batch_format="pyarrow")


def rollup_by_extractor(scores: ray.data.Dataset) -> ray.data.Dataset:
    """Mean WER/CER/NES and exact-match rate per extractor (G7 analog of
    /root/reference/src/socr/benchmark/runner.py:46-58)."""

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        df["exact"] = df["exact_match"].astype(float)
        agg = df.groupby("extractor", as_index=False)[["wer", "cer", "nes", "exact"]].sum()
        agg["n"] = df.groupby("extractor").size().values
        return agg

    from ray.data.aggregate import Sum

    partial = scores.map_batches(_partial, batch_format="pandas")
    final = partial.groupby("extractor").aggregate(
        Sum("wer", alias_name="wer"),
        Sum("cer", alias_name="cer"),
        Sum("nes", alias_name="nes"),
        Sum("exact", alias_name="exact"),
        Sum("n", alias_name="n"),
    )

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        for col in ("wer", "cer", "nes", "exact"):
            df["avg_" + col if col != "exact" else "exact_rate"] = (
                df[col] / df["n"]
            ).round(6)
        return df[["extractor", "avg_wer", "avg_cer", "avg_nes", "exact_rate", "n"]]

    return final.map_batches(_finish, batch_format="pandas").sort("extractor")
