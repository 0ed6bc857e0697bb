"""Storage-layout operators — shard compaction planning + execution.

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
``compact_shards`` executes the plan with per-shard atomic tmp+rename
commits and manifest-based resume (the reference's atomic-commit
pattern, /root/reference/src/socr/core/metadata.py:48-56).

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


def _shard_manifest_path(out_dir: str, shard: int) -> str:
    return os.path.join(out_dir, "_manifests", f"shard-{shard}.json")


def _write_shard_manifest(out_dir: str, shard: int, manifest: dict) -> None:
    """Atomic tmp+rename commit — the reference's manifest pattern
    (/root/reference/src/socr/core/metadata.py:48-56) applied to
    compaction: the manifest is the commit record, written only after
    the shard file itself has been atomically renamed into place."""
    import json

    mdir = os.path.join(out_dir, "_manifests")
    os.makedirs(mdir, exist_ok=True)
    tmp = os.path.join(mdir, f".shard-{shard}.json.tmp-{os.getpid()}")
    with open(tmp, "w") as f:
        json.dump(manifest, f, sort_keys=True)
    os.replace(tmp, _shard_manifest_path(out_dir, shard))


def compact_shards(
    pages_path: str,
    out_dir: str,
    target_rows: int = 1000,
    input_sig: str = "",
) -> dict:
    """Execute a ``shard_plan``: merge each shard's small input files
    into one output file ``shard-<k>.parquet`` under ``out_dir``, with
    per-shard atomic commits and manifest-based resume.

    Commit protocol per shard (inside the worker task, so a killed run
    keeps every shard that finished): write the merged file to a
    pid-tagged tmp name → ``os.replace`` to the final name (atomic) →
    write the shard manifest (files, rows, sig) via the same
    tmp+rename. Resume: a shard whose manifest matches its planned
    input files + ``input_sig`` AND whose output file exists is
    skipped without reading anything. Stale tmp files from killed runs
    are swept at startup.

    Scale shape: compaction is file-level, not row-level — the work
    unit is "merge these N files", so the job is one ``map_batches``
    over a shard-manifest dataset (one task per few shards, no
    all-to-all, no corpus-sized driver state). The plan table and the
    returned per-shard stats are O(files)/O(shards), both bounded and
    documented driver-side. Output files are ~``target_rows`` each, so
    re-running after adding crawl files only rewrites the shards whose
    file sets changed (the plan rule is restart-stable by
    construction).
    """
    import json

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    for stale in os.listdir(out_dir):
        if stale.startswith("_tmp-shard-"):
            os.remove(os.path.join(out_dir, stale))

    plan_rows = shard_plan(pages_path, target_rows).take_all()  # O(files)
    groups: dict[int, list[str]] = {}
    for r in plan_rows:
        groups.setdefault(int(r["shard"]), []).append(r["file"])

    summary: dict = {"completed": [], "skipped": [], "rows": 0,
                     "n_shards": len(groups)}
    pending = []
    for shard in sorted(groups):
        files = sorted(groups[shard])
        mpath = _shard_manifest_path(out_dir, shard)
        final = os.path.join(out_dir, f"shard-{shard:05d}.parquet")
        if os.path.exists(mpath) and os.path.exists(final):
            with open(mpath) as f:
                m = json.load(f)
            if m.get("files") == files and m.get("input_sig") == input_sig:
                summary["skipped"].append(shard)
                summary["rows"] += m["n_rows"]
                continue
        pending.append({"shard": shard, "files": files})

    if not pending:
        return summary

    stats_schema = pa.schema([("shard", pa.int64()), ("n_rows", pa.int64())])

    def _merge(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "shard" not in batch.column_names:
            return stats_schema.empty_table()
        shards_out, rows_out = [], []
        for shard, files in zip(
            batch.column("shard").to_pylist(), batch.column("files").to_pylist()
        ):
            shard = int(shard)
            tbl = pa.concat_tables(
                [pq.read_table(os.path.join(pages_path, f)) for f in files]
            )
            tmp = os.path.join(
                out_dir, f"_tmp-shard-{shard}-{os.getpid()}.parquet"
            )
            pq.write_table(tbl, tmp)
            final = os.path.join(out_dir, f"shard-{shard:05d}.parquet")
            os.replace(tmp, final)
            _write_shard_manifest(
                out_dir,
                shard,
                {
                    "shard": shard,
                    "files": list(files),
                    "n_rows": tbl.num_rows,
                    "input_sig": input_sig,
                },
            )
            shards_out.append(shard)
            rows_out.append(tbl.num_rows)
        return pa.Table.from_pydict(
            {"shard": shards_out, "n_rows": rows_out}, schema=stats_schema
        )

    stats = (
        ray.data.from_items(pending)
        .repartition(min(len(pending), 64))
        .map_batches(_merge, batch_format="pyarrow")
        .take_all()
    )  # O(shards) rows
    for s in stats:
        summary["completed"].append(int(s["shard"]))
        summary["rows"] += int(s["n_rows"])
    summary["completed"].sort()
    return summary


_ZORDER_SCHEMA = pa.schema(
    [
        ("cell", pa.int64()),
        ("n_rows", pa.int64()),
        ("u_min", pa.int64()),
        ("u_max", pa.int64()),
        ("h_min", pa.int64()),
        ("h_max", pa.int64()),
        ("pruned", pa.int64()),
    ]
)


def zorder_cells(sf_dir: str, level: int = 4) -> ray.data.Dataset:
    """Z-order (Morton-curve) clustering cells over the events table
    with two-dimensional pruning stats — the layout optimization
    behind Delta/Iceberg ``OPTIMIZE ZORDER BY``: interleaving the bits
    of two filter columns makes ONE physical order serve range
    predicates on BOTH, where a single-key sort prunes only its own
    key. Each z-prefix cell is the quadtree tile a clustered file
    would cover; ``pruned`` says whether a file holding exactly that
    cell could be skipped for the reference range query via its
    min/max footer stats — the row-group-pruning mechanic
    ``shard_plan`` footers feed.

    Frozen rule (mirrored exactly by the SQL oracle, pure integer
    arithmetic): raw dims are ``user_id`` and the epoch hour
    ``epoch_us(ts) // 3.6e9``; each is min-max normalized to the
    16-bit grid — ``un = (u - umin)·65535 // max(1, umax - umin)`` —
    the scaled mapping real z-order clustering applies so the
    interleave spreads over the full key space whatever the raw
    ranges are; ``z = Σ_i ((un>>i)&1) << 2i | ((hn>>i)&1) << (2i+1)``
    over 16 bits; ``cell = z >> (32 - 2·level)`` (4^level tiles). The
    reference query is the fixed mid-range octave of the normalized
    grid, ``[65535·3//8, 65535·4//8]`` on both dimensions. A cell is
    pruned (1) iff its normalized [u_min,u_max]×[h_min,h_max] box
    misses the query box. Output one row per non-empty cell (stats in
    normalized units) ordered by cell.

    Scale shape: one tiny global min/max aggregate (4 scalars to the
    driver), then a stateless vectorized z/cell map and per-block
    per-cell partials (numpy reduceat) collapsed by ONE
    ``groupby(cell)`` over <= 4^level · blocks partial rows — row
    count never shuffles, no sort of the corpus.
    """
    import numpy as np
    from ray.data.aggregate import Max, Min, Sum

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["ts", "user_id"]
    )

    def _uh(batch: pa.Table) -> tuple:
        u = batch.column("user_id").to_numpy(zero_copy_only=False)
        ts = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        h = ts // 3_600_000_000
        return u.astype(np.int64), h.astype(np.int64)

    def _bounds_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {c: pa.array([], pa.int64())
                 for c in ("umin", "umax", "hmin", "hmax")}
            )
        u, h = _uh(batch)
        return pa.table(
            {
                "umin": pa.array([int(u.min())], pa.int64()),
                "umax": pa.array([int(u.max())], pa.int64()),
                "hmin": pa.array([int(h.min())], pa.int64()),
                "hmax": pa.array([int(h.max())], pa.int64()),
            }
        )

    b = (
        ds.map_batches(_bounds_partial, batch_format="pyarrow")
        .aggregate(Min("umin"), Max("umax"), Min("hmin"), Max("hmax"))
    )
    umin, umax = int(b["min(umin)"]), int(b["max(umax)"])
    hmin, hmax = int(b["min(hmin)"]), int(b["max(hmax)"])
    uspan = max(1, umax - umin)
    hspan = max(1, hmax - hmin)
    u1, u2 = 65535 * 3 // 8, 65535 * 4 // 8
    h1, h2 = 65535 * 3 // 8, 65535 * 4 // 8
    shift = 32 - 2 * level

    partial_schema = pa.schema(
        [
            ("cell", pa.int64()),
            ("n", pa.int64()),
            ("u_min", pa.int64()),
            ("u_max", pa.int64()),
            ("h_min", pa.int64()),
            ("h_max", pa.int64()),
        ]
    )

    def _cell_partials(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return partial_schema.empty_table()
        u, h = _uh(batch)
        u = (u - umin) * 65535 // uspan
        h = (h - hmin) * 65535 // hspan
        z = np.zeros(len(u), np.int64)
        for i in range(16):
            z |= ((u >> i) & 1) << (2 * i)
            z |= ((h >> i) & 1) << (2 * i + 1)
        cell = z >> shift
        order = np.argsort(cell, kind="stable")
        cs, us, hs = cell[order], u[order], h[order]
        ucells, starts = np.unique(cs, return_index=True)
        return pa.Table.from_pydict(
            {
                "cell": pa.array(ucells),
                "n": pa.array(
                    np.diff(np.append(starts, len(cs))).astype(np.int64)
                ),
                "u_min": pa.array(np.minimum.reduceat(us, starts)),
                "u_max": pa.array(np.maximum.reduceat(us, starts)),
                "h_min": pa.array(np.minimum.reduceat(hs, starts)),
                "h_max": pa.array(np.maximum.reduceat(hs, starts)),
            },
            schema=partial_schema,
        )

    agg = (
        ds.map_batches(_cell_partials, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(
            Sum("n", alias_name="n_rows"),
            Min("u_min", alias_name="u_min"),
            Max("u_max", alias_name="u_max"),
            Min("h_min", alias_name="h_min"),
            Max("h_max", alias_name="h_max"),
        )
    )

    def _finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _ZORDER_SCHEMA.empty_table()
        um = batch.column("u_min").to_numpy(zero_copy_only=False)
        ux = batch.column("u_max").to_numpy(zero_copy_only=False)
        hm = batch.column("h_min").to_numpy(zero_copy_only=False)
        hx = batch.column("h_max").to_numpy(zero_copy_only=False)
        overlap = (um <= u2) & (ux >= u1) & (hm <= h2) & (hx >= h1)
        return pa.Table.from_pydict(
            {
                "cell": batch.column("cell").cast(pa.int64()),
                "n_rows": batch.column("n_rows").cast(pa.int64()),
                "u_min": batch.column("u_min").cast(pa.int64()),
                "u_max": batch.column("u_max").cast(pa.int64()),
                "h_min": batch.column("h_min").cast(pa.int64()),
                "h_max": batch.column("h_max").cast(pa.int64()),
                "pruned": pa.array((~overlap).astype(np.int64)),
            },
            schema=_ZORDER_SCHEMA,
        )

    return agg.map_batches(_finish, batch_format="pyarrow").sort("cell")
