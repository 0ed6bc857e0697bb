"""The flagship extraction pipeline (SURVEY.md §3.4 target shape)::

    read_parquet(pages)                       # S1, column-pruned
      → map_batches(analyze)                  # S3 + M1-M8, stateless, fused
      → map_batches(explode)                  # M14/C7 skew path, stateless
      → map_batches(ExtractDocuments, ...)    # A1-A3 + C3 + C5, actor pool
      → groupby(url).map_groups(assemble)     # G1 — the single shuffle
      [→ write_parquet + manifests]           # S5-S6 via state.manifests

Everything before the groupby is streaming map-only work; the raw
payload bytes die at the extract stage, so the one all-to-all exchange
moves only compact extracted text. No stage materializes the dataset.
"""

from __future__ import annotations

from typing import Optional

import ray.data

from ..stages.analyze import analyze_batch
from ..stages.assemble import assemble_group
from ..stages.explode import explode_batch
from ..stages.extract import ExtractDocuments

PAGES_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]


def read_pages(paths, parallelism: int = -1) -> ray.data.Dataset:
    """Read the pages table with column pruning (only the five canonical
    columns leave storage)."""
    return ray.data.read_parquet(paths, columns=PAGES_COLUMNS)


def extract_pipeline(
    pages: ray.data.Dataset,
    *,
    extract_concurrency: Optional[int] = None,
    extract_batch_size: int = 32,
    max_html_bytes: int = 256 * 1024,
    max_pages: int = 30,
    chunk_pages: int = 20,
    max_retries: int = 2,
) -> ray.data.Dataset:
    """Compose the full pipeline; returns the lazy extracted Dataset.

    ``extract_batch_size`` is deliberately small: a batch is bounded by
    rows × payload size, and multi-MB html rows need small batches so a
    batch × pool concurrency stays within worker heaps (SURVEY.md
    §7.4(2)). ``extract_concurrency=None`` sizes the actor pool to the
    cluster's CPUs (autoscaling from 1); pass an int or (min, max) to
    pin it.
    """
    if extract_concurrency is None:
        import ray

        total_cpus = int(ray.cluster_resources().get("CPU", 4))
        extract_concurrency = (1, max(2, total_cpus))
    analyzed = pages.map_batches(analyze_batch, batch_format="pyarrow")
    exploded = analyzed.map_batches(
        lambda b: explode_batch(
            b, max_pages=max_pages, chunk_pages=chunk_pages, max_html_bytes=max_html_bytes
        ),
        batch_format="pyarrow",
    )
    units = exploded.map_batches(
        ExtractDocuments,
        fn_constructor_kwargs={"max_retries": max_retries},
        batch_format="pyarrow",
        batch_size=extract_batch_size,
        concurrency=extract_concurrency,
        num_cpus=1,
    )
    return units.groupby("url").map_groups(assemble_group, batch_format="pyarrow")


def extract_from_parquet(paths, **kwargs) -> ray.data.Dataset:
    return extract_pipeline(read_pages(paths), **kwargs)
