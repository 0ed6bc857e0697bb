"""Storage-layout operators — shard compaction planning.

At 100 TB the corpus is hundreds of thousands of Parquet files, and
every incremental crawl/extract run appends more, many of them small
(the classic small-file problem: per-file open/footer overhead comes
to dominate scan time, and the object store pays one block per tiny
file). A compaction planner assigns existing files to merge groups of
a target size so a rewrite job can coalesce them; the reference's
per-run output layout has the same concern in miniature (one output
per input document, SURVEY.md §2.1 S5/S6 — our ``run_partitioned``
writes per-partition shards for the same reason).

``shard_plan`` plans by ROW COUNT read from Parquet FOOTERS only —
the planner never touches row data, so planning 100k files costs 100k
footer reads (a few KB each), distributed across the cluster.

Frozen semantics (mirrored exactly by the DuckDB oracle, which counts
rows instead of reading footers — same number by the Parquet spec):
files ordered by basename ascending; ``cum_prev`` = exclusive prefix
sum of row counts in that order; ``shard = cum_prev // target_rows``.
Greedy contiguous packing: a shard closes as soon as the running sum
crosses the target, so every shard except possibly the last holds at
least ``target_rows`` rows once its first file lands past the
boundary — the deterministic, restart-stable rule (adding new files
sorts them into the plan reproducibly).
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data

_PLAN_SCHEMA = pa.schema(
    [
        ("file", pa.string()),
        ("n_rows", pa.int64()),
        ("shard", pa.int64()),
    ]
)


def shard_plan(pages_path: str, target_rows: int = 1000) -> ray.data.Dataset:
    """Compaction plan for a Parquet directory: one row per file with
    its row count and assigned output shard id.

    Scale shape: the file LIST is the only driver-side state (one
    string per file — O(files), not O(rows)); footer reads fan out as
    a ``map_batches`` over the file-name Dataset; the cumulative walk
    runs in one block because the per-file table is file-count-sized
    (~100k rows at 100 TB), orders of magnitude below block size —
    documented single-block pass, NOT a corpus-sized materialization.
    """
    import pyarrow.parquet as pq

    files = sorted(
        f for f in os.listdir(pages_path) if f.endswith(".parquet")
    )

    counted_schema = pa.schema([("file", pa.string()), ("n_rows", pa.int64())])

    def _footer_rows(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "file" not in batch.column_names:
            return counted_schema.empty_table()
        names = batch.column("file").to_pylist()
        return pa.Table.from_pydict(
            {
                "file": pa.array(names, pa.string()),
                "n_rows": pa.array(
                    [
                        pq.read_metadata(os.path.join(pages_path, f)).num_rows
                        for f in names
                    ],
                    pa.int64(),
                ),
            },
            schema=counted_schema,
        )

    def _assign(block: pa.Table) -> pa.Table:
        import numpy as np

        if block.num_rows == 0 or "file" not in block.column_names:
            return _PLAN_SCHEMA.empty_table()
        block = block.sort_by("file").combine_chunks()
        n = block.column("n_rows").to_numpy(zero_copy_only=False)
        cum_prev = np.concatenate(([0], np.cumsum(n)[:-1]))
        return pa.Table.from_pydict(
            {
                "file": block.column("file"),
                "n_rows": block.column("n_rows"),
                "shard": pa.array(cum_prev // target_rows, pa.int64()),
            },
            schema=_PLAN_SCHEMA,
        )

    per_file = ray.data.from_items([{"file": f} for f in files]).map_batches(
        _footer_rows, batch_format="pyarrow"
    )
    # File-count-sized table: one block by construction (see docstring).
    return per_file.repartition(1).map_batches(
        _assign, batch_format="pyarrow", batch_size=None
    )
