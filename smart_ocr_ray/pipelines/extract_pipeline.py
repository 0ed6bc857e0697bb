"""The flagship extraction pipeline (SURVEY.md §3.4 target shape)::

    read_parquet(pages)                       # S1, column-pruned
      → map_batches(explode)                  # M14/C7 skew path, O(1) sniffs
      → map_batches(ExtractDocuments, ...)    # S3+M1-M13+A1-A3+C2-C5 per row
      → groupby(part_key).map_groups(assemble)  # G1 — the single shuffle
      [→ write_parquet + manifests]           # S5-S6 via state.manifests

Everything before the groupby is streaming map-only work; the raw
payload bytes die at the extract stage, so the one all-to-all exchange
moves only compact extracted text. No stage materializes the dataset.

The full analysis (assessment cascade + routing, M1–M8) runs once per
row INSIDE the extract stage — a separate analyze pass would scan every
payload twice for no added parallelism. ``stages.analyze.analyze_batch``
remains available as a standalone metrics/routing operator.
"""

from __future__ import annotations

from typing import Optional

import ray.data

from ..stages.assemble import assemble_group
from ..stages.explode import explode_batch
from ..stages.extract import ExtractDocuments

PAGES_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]


def read_pages(paths, parallelism: int = -1) -> ray.data.Dataset:
    """Read the pages table with column pruning (only the five canonical
    columns leave storage).

    One block per input file: Ray's default block re-splitting multiplies
    the block count several-fold, and the downstream groupby's shuffle
    cost grows with map_blocks × reduce_partitions — measured 83k tiny
    partition slices (100s of reduce time) at 288 blocks vs 6k at
    file-count blocks. Shard files are the parallelism unit, as they are
    for a real WARC-derived corpus.
    """
    import os

    num_blocks = None
    if isinstance(paths, str) and os.path.isdir(paths):
        num_blocks = sum(1 for f in os.listdir(paths) if f.endswith(".parquet")) or None
    elif isinstance(paths, (list, tuple)):
        num_blocks = len(paths) or None
    return ray.data.read_parquet(
        paths, columns=PAGES_COLUMNS, override_num_blocks=num_blocks
    )


def extract_pipeline(
    pages: ray.data.Dataset,
    *,
    extract_concurrency: Optional[int] = None,
    extract_batch_size: int = 64,
    max_html_bytes: int = 1024 * 1024,
    max_pages: int = 30,
    chunk_pages: int = 20,
    max_retries: int = 2,
    deadline_ms: float = 30_000.0,
    use_actor_pool: bool = False,
    assembly_coalesce_rows: int = 4096,
    multi_extractor: bool = False,
    consensus: str = "heuristic",
) -> ray.data.Dataset:
    """Compose the full pipeline; returns the lazy extracted Dataset.

    ``extract_batch_size`` is deliberately modest: a batch is bounded by
    rows × payload size, and multi-hundred-KB html rows need bounded
    batches so batch × parallelism stays within worker heaps (SURVEY.md
    §7.4(2)).

    ``use_actor_pool=False`` (default) runs the extract stage as
    stateless tasks: its warm state — compiled regexes, routing tables —
    lives at module level and is amortized per worker *process*, which
    Ray reuses across tasks, so tasks get actor-pool warmth with full
    elasticity (measured ~2× faster than a pool on a 32-core node: no
    pool ramp-up, perfect work stealing). Set ``use_actor_pool=True``
    (with ``extract_concurrency``) for extractor classes that hold
    genuinely heavy per-actor state (a loaded model, a large index) —
    the MinHash and multimodal-decode stages in ``ops/`` keep that
    shape because they build real constructor state.
    """
    exploded = pages.map_batches(
        lambda b: explode_batch(
            b, max_pages=max_pages, chunk_pages=chunk_pages, max_html_bytes=max_html_bytes
        ),
        batch_format="pyarrow",
    )
    # Resolve the assembly-bucket count ONCE, driver-side, and pass it
    # into every stage instance: actors resolving it themselves could
    # disagree (cluster scale-up mid-run, driver-only env override) and
    # a modulus disagreement splits one url across buckets — silent
    # assembly corruption.
    from ..tuning import assembly_buckets

    num_buckets = assembly_buckets()
    if use_actor_pool:
        if extract_concurrency is None:
            import ray

            total_cpus = int(ray.cluster_resources().get("CPU", 4))
            extract_concurrency = (max(1, total_cpus // 2), max(2, total_cpus))
        units = exploded.map_batches(
            ExtractDocuments,
            fn_constructor_kwargs={
                "max_retries": max_retries, "deadline_ms": deadline_ms,
                "multi_extractor": multi_extractor, "consensus": consensus,
                "num_buckets": num_buckets,
            },
            batch_format="pyarrow",
            batch_size=extract_batch_size,
            concurrency=extract_concurrency,
            num_cpus=1,
        )
    else:
        extractor = ExtractDocuments(
            max_retries=max_retries, deadline_ms=deadline_ms,
            multi_extractor=multi_extractor, consensus=consensus,
            num_buckets=num_buckets,
        )
        units = exploded.map_batches(
            lambda b: extractor(b),
            batch_format="pyarrow",
            batch_size=extract_batch_size,
        )
    # Identity coalesce ahead of the shuffle: the groupby's slice count
    # is map_blocks × reduce_partitions, so many small upstream blocks
    # (fine-grained extract tasks over thousands of shard files) would
    # explode it quadratically. A no-op map_batches with a large
    # batch_size merges blocks at Arrow concat speed — one cheap memcpy
    # pass that bounds the shuffle's object count for any input layout.
    # num_cpus=0.5 deliberately differs from the extract stage so the
    # two do NOT fuse: fusion would impose the huge coalesce batch size
    # on the extract stage itself (few giant poorly-balanced tasks).
    units = units.map_batches(
        lambda b: b, batch_format="pyarrow", batch_size=assembly_coalesce_rows,
        num_cpus=0.5,
    )
    # The one wide step: group by the numeric hash bucket (see
    # stages/extract.py NUM_ASSEMBLY_BUCKETS) — equivalent to
    # groupby("url") because every row of a url shares its bucket, but
    # the shuffle sorts a single int64 instead of url strings and the
    # range partitioner stays balanced under url-prefix skew.
    return units.groupby("part_key").map_groups(assemble_group, batch_format="pyarrow")


def extract_from_parquet(paths, **kwargs) -> ray.data.Dataset:
    """Pipeline over parquet input, with the pre-shuffle coalesce sized
    to the corpus: the shuffle's slice count is map_blocks ×
    reduce_partitions, so post-coalesce block count must stay ~64
    regardless of row count (a fixed batch_size degrades quadratically
    as the corpus grows). Row count comes from parquet footers — a
    driver-side metadata peek, no data read."""
    if "assembly_coalesce_rows" not in kwargs:
        total_rows = _estimate_rows(paths)
        if total_rows:
            kwargs["assembly_coalesce_rows"] = max(4096, total_rows // 64)
    return extract_pipeline(read_pages(paths), **kwargs)


def _estimate_rows(paths) -> int:
    import os

    import pyarrow.parquet as pq

    try:
        if isinstance(paths, str) and os.path.isdir(paths):
            files = [
                os.path.join(paths, f)
                for f in os.listdir(paths)
                if f.endswith(".parquet")
            ]
        elif isinstance(paths, str):
            files = [paths]
        else:
            files = list(paths)
        return sum(pq.read_metadata(f).num_rows for f in files)
    except Exception:
        return 0


INCREMENTAL_HEX: str = "012345"


def incremental_extract(paths, **kwargs) -> ray.data.Dataset:
    """Recrawl-delta extraction — the incremental-ingest composition a
    production crawl runs between full sweeps: only pages whose
    fingerprint differs from the previous snapshot (added or changed)
    re-run the extraction pipeline; unchanged pages are skipped WITHOUT
    parsing their payloads, and prev-only (removed) pages simply emit
    nothing. The companion worklist operator over the documents table
    is ``ops/dedup.crawl_diff``; the partition-granular resume path is
    ``state/manifests`` — this is the page-level delta between them.

    The previous snapshot is synthesized deterministically (no external
    data): a page re-extracts iff ``md5(url)`` starts with a hex digit
    in ``INCREMENTAL_HEX`` (6/16 = 37.5% of the corpus). On a real
    corpus the parquet would carry a fingerprint column and this filter
    becomes a read-time row-group predicate; here the drop happens in
    the first map after the read, so payload bytes of skipped pages die
    in the task that read them and never reach the extract stage.

    Output: identical schema and per-url values to the full pipeline,
    restricted to the worklist — verified through the value-hash gate
    against the golden per-doc table filtered by the same rule.
    """
    import hashlib

    if "assembly_coalesce_rows" not in kwargs:
        total_rows = _estimate_rows(paths)
        if total_rows:
            # worklist is ~6/16 of the corpus; size the coalesce to it
            kwargs["assembly_coalesce_rows"] = max(
                4096, (total_rows * len(INCREMENTAL_HEX) // 16) // 64
            )

    pages = read_pages(paths)

    def _worklist(batch):
        import pyarrow as pa

        urls = batch.column("url").to_pylist()
        keep = [
            i
            for i, u in enumerate(urls)
            if hashlib.md5(u.encode()).hexdigest()[0] in INCREMENTAL_HEX
        ]
        return batch.take(pa.array(keep, pa.int64()))

    return extract_pipeline(pages.map_batches(_worklist, batch_format="pyarrow"), **kwargs)
