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


from ..functions.grid import e6 as _score_e6  # one shared grid definition


def score_against_golden(
    extracted: ray.data.Dataset, golden: dict[str, str]
) -> ray.data.Dataset:
    """Per-url scores: url, extractor, wer_e6, cer_e6, nes_e6,
    exact_match (broadcast-golden variant for small golden tables)."""
    golden_ref = ray.put(golden)

    def _score(batch: pa.Table) -> pa.Table:
        truth = ray.get(golden_ref)
        urls = batch.column("url").to_pylist()
        texts = batch.column("extracted_text").to_pylist()
        extractors = batch.column("extractor").to_pylist()
        out = {"url": [], "extractor": [], "wer_e6": [], "cer_e6": [], "nes_e6": [], "exact_match": []}
        for url, text, extractor in zip(urls, texts, extractors):
            gt = truth.get(url)
            if gt is None:
                continue
            out["url"].append(url)
            out["extractor"].append(extractor)
            out["wer_e6"].append(_score_e6(wer_cased(text or "", gt)))
            out["cer_e6"].append(_score_e6(cer(text or "", gt)))
            out["nes_e6"].append(_score_e6(nes(text or "", gt)))
            out["exact_match"].append((text or "") == gt)
        return pa.Table.from_pydict(out)

    return extracted.map_batches(_score, batch_format="pyarrow")


def score_against_golden_ds(
    extracted: ray.data.Dataset, golden: ray.data.Dataset,
    join_partitions: int | None = None,
) -> ray.data.Dataset:
    """Distributed variant of ``score_against_golden``: the golden side
    is a (url, golden_text) Dataset and the lookup is a hash join on
    url, so neither side ever materializes on the driver — the scale
    path when the golden table is itself corpus-sized (the r1 weak spot
    where ``_q_score`` built the golden dict in a driver loop)."""

    if join_partitions is None:
        from ..tuning import join_partitions as _jp

        join_partitions = _jp()

    def _prune(batch: pa.Table) -> pa.Table:
        return batch.select(["url", "extractor", "extracted_text"])

    joined = extracted.map_batches(_prune, batch_format="pyarrow").join(
        golden, "inner", join_partitions, on=("url",)
    )

    score_schema = pa.schema(
        [
            ("url", pa.string()),
            ("extractor", pa.string()),
            ("wer_e6", pa.int64()),
            ("cer_e6", pa.int64()),
            ("nes_e6", pa.int64()),
            ("exact_match", pa.bool_()),
        ]
    )

    def _score(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "url" not in batch.column_names:
            return score_schema.empty_table()
        texts = batch.column("extracted_text").to_pylist()
        golds = batch.column("golden_text").to_pylist()
        return pa.Table.from_pydict(
            {
                "url": batch.column("url"),
                "extractor": batch.column("extractor"),
                "wer_e6": pa.array(
                    [_score_e6(wer_cased(t or "", g)) for t, g in zip(texts, golds)],
                    pa.int64(),
                ),
                "cer_e6": pa.array(
                    [_score_e6(cer(t or "", g)) for t, g in zip(texts, golds)],
                    pa.int64(),
                ),
                "nes_e6": pa.array(
                    [_score_e6(nes(t or "", g)) for t, g in zip(texts, golds)],
                    pa.int64(),
                ),
                "exact_match": pa.array(
                    [(t or "") == g for t, g in zip(texts, golds)], pa.bool_()
                ),
            },
            schema=score_schema,
        )

    return joined.map_batches(_score, batch_format="pyarrow")


def rollup_by_extractor(scores: ray.data.Dataset) -> ray.data.Dataset:
    """Mean WER/CER/NES and exact-match rate per extractor (G7 analog of
    /root/reference/src/socr/benchmark/runner.py:46-58).

    Integer-grid throughout: per-doc e6 scores sum exactly, means are
    floor divisions — so the DuckDB pseudo-oracle divides identical
    integers (no float crosses an engine boundary)."""

    def _partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if batch.num_rows == 0 or "extractor" not in batch.column_names:
            return pa.schema(
                [("extractor", pa.string()), ("wer_e6", pa.int64()),
                 ("cer_e6", pa.int64()), ("nes_e6", pa.int64()),
                 ("exact", pa.int64()), ("n", pa.int64())]
            ).empty_table()
        batch = batch.set_column(
            batch.column_names.index("exact_match"), "exact",
            pc.cast(batch.column("exact_match"), pa.int64()),
        )
        out = pa.TableGroupBy(batch, ["extractor"]).aggregate(
            [("wer_e6", "sum"), ("cer_e6", "sum"), ("nes_e6", "sum"),
             ("exact", "sum"), ([], "count_all")]
        )
        rename = {"wer_e6_sum": "wer_e6", "cer_e6_sum": "cer_e6",
                  "nes_e6_sum": "nes_e6", "exact_sum": "exact", "count_all": "n"}
        return out.rename_columns([rename.get(c, c) for c in out.column_names])

    from ray.data.aggregate import Sum

    partial = scores.map_batches(_partial, batch_format="pyarrow")
    final = partial.groupby("extractor").aggregate(
        Sum("wer_e6", alias_name="wer_e6"),
        Sum("cer_e6", alias_name="cer_e6"),
        Sum("nes_e6", alias_name="nes_e6"),
        Sum("exact", alias_name="exact"),
        Sum("n", alias_name="n"),
    )

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"]
        df["avg_wer_e6"] = df["wer_e6"] // n
        df["avg_cer_e6"] = df["cer_e6"] // n
        df["avg_nes_e6"] = df["nes_e6"] // n
        df["exact_rate_e6"] = (df["exact"] * 1_000_000) // n
        df["n_docs"] = n
        return df[["extractor", "avg_wer_e6", "avg_cer_e6", "avg_nes_e6",
                   "exact_rate_e6", "n_docs"]]

    return final.map_batches(_finish, batch_format="pandas").sort("extractor")
