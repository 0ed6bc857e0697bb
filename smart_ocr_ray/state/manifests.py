"""Partition-granular checkpoint/resume with lineage manifests (S2/S6/J5).

The distributed analog of the reference's ``metadata.json`` incremental
manifest (``/root/reference/src/socr/core/metadata.py:30-93``): instead
of one file-level manifest mutated after every document, each *input
partition* commits its output shard atomically (write to a temp dir,
``os.replace`` rename — the reference's tmp+replace pattern,
``metadata.py:48-56``) together with a small lineage manifest:

    out_dir/part=<k>/*.parquet
    out_dir/_manifests/part-<k>.json
        {partition, status, row_count, content_hash_xor, input_sig,
         wall_ms, urls_processed}

Resume = anti-join of the partition list against completed manifests
(J5): a killed run restarts and skips every committed partition; a
partition whose input signature changed is recomputed. Input→partition
assignment is deterministic and *file-granular* whenever the corpus has
at least as many shard files as partitions (the fleet-scale case):
``crc32(shard_basename) % num_partitions`` assigns every input file to
exactly one partition, so each partition's run reads only its own
files and the corpus is scanned once total across all partitions.
Hash-by-basename keeps assignments stable when new shards are added.
Only when files < partitions (toy inputs) does it fall back to a
row-level ``crc32(url) % num_partitions`` filter, which re-scans the
(small) input per partition.

Writing one directory per partition (never one giant file) is what
makes a 100 TB run resumable and its output addressable by key range.
"""

from __future__ import annotations

import json
import os
import time
import zlib

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..pipelines.extract_pipeline import extract_pipeline, read_pages


def partition_of(url: str, num_partitions: int) -> int:
    return zlib.crc32(url.encode("utf-8")) % num_partitions


def resolve_input_files(input_paths) -> list[str] | None:
    """Expand the input spec into a sorted list of parquet shard files,
    or None when it isn't locally enumerable (then row-mode applies)."""
    if isinstance(input_paths, str):
        if os.path.isdir(input_paths):
            return sorted(
                os.path.join(input_paths, f)
                for f in os.listdir(input_paths)
                if f.endswith(".parquet")
            )
        if os.path.isfile(input_paths):
            return [input_paths]
        return None
    if isinstance(input_paths, (list, tuple)):
        return sorted(str(p) for p in input_paths)
    return None


def files_for_partition(files: list[str], part: int, num_partitions: int) -> list[str]:
    """Deterministic shard→partition assignment by basename hash (stable
    under shard additions; shard basenames are unique in a corpus)."""
    return [
        f
        for f in files
        if partition_of(os.path.basename(f), num_partitions) == part
    ]


def _partition_filter(batch: pa.Table, part: int, num_partitions: int) -> pa.Table:
    urls = batch.column("url").to_pylist()
    mask = pa.array([partition_of(u, num_partitions) == part for u in urls])
    return batch.filter(mask)


def manifest_path(out_dir: str, part: int) -> str:
    return os.path.join(out_dir, "_manifests", f"part-{part}.json")


def load_manifest(out_dir: str, part: int) -> dict | None:
    path = manifest_path(out_dir, part)
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            manifest = json.load(f)
        return manifest if manifest.get("status") == "completed" else None
    except (json.JSONDecodeError, OSError):
        return None


def _write_manifest_atomic(out_dir: str, part: int, manifest: dict) -> None:
    os.makedirs(os.path.join(out_dir, "_manifests"), exist_ok=True)
    path = manifest_path(out_dir, part)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, path)  # atomic commit (metadata.py:48-56 pattern)


_AUTO_EXPANSION = 3.0  # uncompressed pages bytes → in-flight working set
_AUTO_BUDGET_FRACTION = 0.5  # leave headroom for shuffle + output blocks


def auto_partitions(
    input_paths, object_store_budget: float | None = None
) -> int:
    """Derive a partition count from corpus bytes vs the object-store
    budget — footer-only (no data read), so it costs one metadata round
    regardless of corpus size.

    Sizing rule: one partition's in-flight working set is its
    uncompressed input bytes × ``_AUTO_EXPANSION`` (decoded Arrow
    blocks + extraction output + shuffle copies, measured ~2-3× on the
    4M-doc run — the single-shot failure BASELINE.md documents was
    exactly this working set exceeding the store and collapsing into
    disk-spill thrash). Keeping it under
    ``_AUTO_BUDGET_FRACTION`` × object store means the streaming
    executor never spills the hot path, so::

        partitions = ceil(total_bytes × EXPANSION / (budget × FRACTION))

    clamped to [1, 4096]. ``object_store_budget`` defaults to the live
    cluster's ``object_store_memory`` resource (sums over nodes on a
    real cluster — more nodes → fewer, larger partitions, which is the
    right direction: partitions exist to bound memory, not to create
    parallelism; each partition is internally fully parallel).
    """
    import math

    import pyarrow.parquet as pq

    files = resolve_input_files(input_paths)
    if not files:
        return 1
    total = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        total += sum(
            md.row_group(i).total_byte_size for i in range(md.num_row_groups)
        )
    if object_store_budget is None and ray.is_initialized():
        object_store_budget = ray.cluster_resources().get(
            "object_store_memory", 0.0
        )
    if not object_store_budget:
        object_store_budget = 2 * 1024**3  # conservative un-initialized default
    usable = object_store_budget * _AUTO_BUDGET_FRACTION
    return max(1, min(4096, math.ceil(total * _AUTO_EXPANSION / usable)))


def run_partitioned(
    input_paths,
    out_dir: str,
    num_partitions: int | None = None,
    input_sig: str = "",
    **pipeline_kwargs,
) -> dict:
    """Run the extraction pipeline partition by partition, resumably.

    Each partition saturates the cluster on its own (the pipeline inside
    is fully parallel); sequential partitions bound the blast radius of
    a failure to one partition's work. Returns a summary dict.

    ``num_partitions=None`` (default) sizes the partition count from
    the corpus's parquet footers vs the object-store budget
    (``auto_partitions``), so the oversized single-shot case that dies
    on spill bandwidth is partitioned automatically and a small corpus
    stays single-pass.

    File mode (shard files >= partitions): each partition reads ONLY its
    assigned shard files — the corpus is scanned once total, which is
    what makes this viable on a 100 TB input. Row mode (toy inputs with
    fewer files than partitions): per-partition row filter over the
    whole (small) input.
    """
    os.makedirs(out_dir, exist_ok=True)
    if num_partitions is None:
        num_partitions = auto_partitions(input_paths)
    summary = {"completed": [], "skipped": [], "rows": 0,
               "num_partitions": num_partitions}

    files = resolve_input_files(input_paths)
    file_mode = files is not None and len(files) >= num_partitions

    for part in range(num_partitions):
        part_files = (
            files_for_partition(files, part, num_partitions) if file_mode else None
        )
        part_basenames = (
            [os.path.basename(f) for f in part_files] if file_mode else None
        )
        existing = load_manifest(out_dir, part)
        if (
            existing is not None
            and existing.get("input_sig", "") == input_sig
            and existing.get("input_files") == part_basenames
        ):
            summary["skipped"].append(part)
            summary["rows"] += existing["row_count"]
            continue

        t0 = time.perf_counter()
        if file_mode and not part_files:
            # No shard hashes to this partition: commit an empty manifest
            # so resume bookkeeping stays uniform.
            _write_manifest_atomic(
                out_dir,
                part,
                {
                    "partition": part,
                    "status": "completed",
                    "row_count": 0,
                    "content_hash_xor": 0,
                    "input_sig": input_sig,
                    "input_files": [],
                    "wall_ms": 0.0,
                },
            )
            summary["completed"].append(part)
            continue

        if file_mode:
            pages = read_pages(part_files)
        else:
            pages = read_pages(input_paths).map_batches(
                lambda b, p=part: _partition_filter(b, p, num_partitions),
                batch_format="pyarrow",
            )
        extracted = extract_pipeline(pages, **pipeline_kwargs)

        part_dir = os.path.join(out_dir, f"part={part}")
        tmp_dir = os.path.join(out_dir, f"_tmp-part={part}-{os.getpid()}")
        if os.path.exists(tmp_dir):
            _rmtree(tmp_dir)
        extracted.write_parquet(tmp_dir)

        # Lineage (row count + order-insensitive content hash) and the
        # partition's extraction metrics (north_star: "per-partition
        # lineage manifests and extraction metrics written alongside
        # outputs") in one metadata pass over the committed shard.
        row_count = 0
        hash_xor = 0
        n_passed = 0
        total_words = 0
        failure_counts: dict[str, int] = {}
        for batch in ray.data.read_parquet(
            tmp_dir,
            columns=["url", "content_hash", "audit_passed", "failure_mode", "word_count"],
        ).iter_batches(batch_format="pyarrow"):
            row_count += batch.num_rows
            for u, h in zip(batch.column("url").to_pylist(),
                            batch.column("content_hash").to_pylist()):
                hash_xor ^= zlib.crc32(f"{u}:{h}".encode())
            import pyarrow.compute as pc

            n_passed += pc.sum(pc.cast(batch.column("audit_passed"), "int64")).as_py() or 0
            total_words += pc.sum(batch.column("word_count")).as_py() or 0
            for v in pc.value_counts(batch.column("failure_mode")).to_pylist():
                if v["values"] != "none":
                    failure_counts[v["values"]] = (
                        failure_counts.get(v["values"], 0) + v["counts"]
                    )

        if os.path.exists(part_dir):
            _rmtree(part_dir)
        os.replace(tmp_dir, part_dir)
        _write_manifest_atomic(
            out_dir,
            part,
            {
                "partition": part,
                "status": "completed",
                "row_count": row_count,
                "content_hash_xor": hash_xor,
                "input_sig": input_sig,
                "input_files": part_basenames,
                "wall_ms": (time.perf_counter() - t0) * 1000.0,
                "metrics": {
                    "n_passed": int(n_passed),
                    "pass_rate": round(n_passed / row_count, 6) if row_count else 0.0,
                    "total_words": int(total_words),
                    "failure_counts": dict(sorted(failure_counts.items())),
                },
            },
        )
        summary["completed"].append(part)
        summary["rows"] += row_count

    return summary


def committed_parts(out_dir: str, input_sig: str | None = None) -> list[int]:
    """Partition ids whose manifest loads as ``status=completed`` (and,
    when ``input_sig`` is given, was produced from the same input) —
    mirroring ``run_partitioned``'s own skip condition, so documents
    from an invalidated or never-committed partition are recomputed.
    Driver-side metadata only (one small JSON per partition)."""
    manifest_dir = os.path.join(out_dir, "_manifests")
    if not os.path.isdir(manifest_dir):
        return []
    committed: list[int] = []
    for name in os.listdir(manifest_dir):
        if not (name.startswith("part-") and name.endswith(".json")):
            continue
        part = int(name[len("part-"):-len(".json")])
        manifest = load_manifest(out_dir, part)
        if manifest is None:
            continue
        if input_sig is not None and manifest.get("input_sig", "") != input_sig:
            continue
        committed.append(part)
    return sorted(committed)


def committed_keys_ds(
    out_dir: str,
    input_sig: str | None = None,
    parts: list[int] | None = None,
) -> ray.data.Dataset | None:
    """Committed content hashes (J5 row-level resume keys) as a DATASET
    — never a driver-side set: on a mostly-complete 100 TB run the key
    table is O(committed docs) and must stay in the object store (the
    r2 `weak` spot: a Python set of billions of 64-char strings).
    Reads only the key column from committed partitions; ``parts``
    scopes the read to the partitions actually being recomputed."""
    committed = committed_parts(out_dir, input_sig)
    if parts is not None:
        committed = sorted(set(committed) & set(parts))
    if not committed:
        return None
    ds = read_extracted(out_dir, parts=committed)
    if ds is None:
        return None
    return ds.select_columns(["content_hash"])


def filter_processed(
    pages: ray.data.Dataset,
    done: "set[str] | ray.data.Dataset | None",
    join_partitions: int | None = None,
) -> ray.data.Dataset:
    """Drop input rows whose payload hash is already committed (S2 —
    the reference's sha256 skip-if-processed, metadata.py:58-67).

    ``done`` is the committed-keys DATASET from ``committed_keys_ds``:
    each page hashes its payload in a map stage, then a distributed
    ``left_anti`` join on ``content_hash`` drops the committed rows —
    keys never materialize on the driver, so resume scales to runs
    where "already done" is itself corpus-sized. A plain set is still
    accepted for small explicit skip-lists (broadcast via ``ray.put``).
    """
    import hashlib

    if done is None or (isinstance(done, set) and not done):
        return pages

    def _add_hash(batch: pa.Table) -> pa.Table:
        hashes = [
            hashlib.sha256(h or b"").hexdigest()
            for h in batch.column("html").to_pylist()
        ]
        return batch.append_column("content_hash", pa.array(hashes, pa.string()))

    if isinstance(done, set):
        import ray as _ray

        done_ref = _ray.put(frozenset(done))

        def _filter(batch: pa.Table) -> pa.Table:
            seen = _ray.get(done_ref)
            mask = pa.array(
                [
                    hashlib.sha256(h or b"").hexdigest() not in seen
                    for h in batch.column("html").to_pylist()
                ]
            )
            return batch.filter(mask)

        return pages.map_batches(_filter, batch_format="pyarrow")

    if join_partitions is None:
        from ..tuning import join_partitions as _jp

        join_partitions = _jp()
    remaining = pages.map_batches(_add_hash, batch_format="pyarrow").join(
        done, "left_anti", join_partitions, on=("content_hash",)
    )
    # Restore the input schema (the hash column was join plumbing).
    return remaining.drop_columns(["content_hash"])


def read_extracted(out_dir: str, parts: list[int] | None = None):
    """Read committed partitions back as one Dataset; ``parts`` scopes
    the read to specific partition ids. Returns None when no shard
    files exist (empty partitions write a manifest but no directory).

    (read_parquet takes a single directory or a list of files, not a
    list of directories — enumerate the shard files explicitly.)
    """
    wanted = None if parts is None else {f"part={p}" for p in parts}
    files = []
    for d in sorted(os.listdir(out_dir)):
        if d.startswith("part=") and (wanted is None or d in wanted):
            part_dir = os.path.join(out_dir, d)
            files.extend(
                os.path.join(part_dir, f)
                for f in sorted(os.listdir(part_dir))
                if f.endswith(".parquet")
            )
    if not files:
        return None
    return ray.data.read_parquet(files)


def _rmtree(path: str) -> None:
    import shutil

    shutil.rmtree(path, ignore_errors=True)
