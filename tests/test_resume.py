"""Checkpoint/resume at partition granularity (S2/S6/J5, north_rule):
a killed run restarts and skips committed partitions; recomputation is
limited to uncommitted ones; resumed output equals a single-shot run.
"""

import json
import os

import pytest


@pytest.fixture(scope="module")
def partitioned_run(ray_session, fixture_parquet, tmp_path_factory):
    from smart_ocr_ray.state.manifests import run_partitioned

    out_dir = str(tmp_path_factory.mktemp("extracted"))
    summary = run_partitioned(
        fixture_parquet, out_dir, num_partitions=4, input_sig="sig-v1",
        max_html_bytes=16 * 1024,
    )
    return out_dir, summary


def test_all_partitions_completed(partitioned_run):
    out_dir, summary = partitioned_run
    assert summary["completed"] == [0, 1, 2, 3]
    assert summary["skipped"] == []
    assert summary["rows"] == 110


def test_manifests_written(partitioned_run):
    out_dir, _ = partitioned_run
    for part in range(4):
        path = os.path.join(out_dir, "_manifests", f"part-{part}.json")
        assert os.path.exists(path)
        with open(path) as f:
            manifest = json.load(f)
        assert manifest["status"] == "completed"
        assert manifest["row_count"] > 0
        assert manifest["input_sig"] == "sig-v1"
        assert os.path.isdir(os.path.join(out_dir, f"part={part}"))


def test_resume_skips_committed_partitions(partitioned_run, fixture_parquet):
    from smart_ocr_ray.state.manifests import run_partitioned

    out_dir, _ = partitioned_run
    # Simulate a kill after partition 1: delete manifests 2 and 3.
    for part in (2, 3):
        os.remove(os.path.join(out_dir, "_manifests", f"part-{part}.json"))
    mtimes_before = {
        part: os.path.getmtime(os.path.join(out_dir, f"part={part}")) for part in (0, 1)
    }

    summary = run_partitioned(
        fixture_parquet, out_dir, num_partitions=4, input_sig="sig-v1",
        max_html_bytes=16 * 1024,
    )
    assert summary["skipped"] == [0, 1]
    assert summary["completed"] == [2, 3]
    assert summary["rows"] == 110
    # Committed partitions were not rewritten.
    for part in (0, 1):
        assert os.path.getmtime(os.path.join(out_dir, f"part={part}")) == mtimes_before[part]


def test_changed_input_sig_recomputes(partitioned_run, fixture_parquet):
    from smart_ocr_ray.state.manifests import run_partitioned

    out_dir, _ = partitioned_run
    summary = run_partitioned(
        fixture_parquet, out_dir, num_partitions=4, input_sig="sig-v2",
        max_html_bytes=16 * 1024,
    )
    assert summary["completed"] == [0, 1, 2, 3]  # all recomputed


def test_resumed_output_matches_single_shot(partitioned_run, fixture_parquet):
    import ray.data

    from smart_ocr_ray.pipelines.extract_pipeline import extract_from_parquet
    from smart_ocr_ray.state.manifests import read_extracted

    out_dir, _ = partitioned_run
    partitioned = {r["url"]: r["extracted_text"] for r in read_extracted(out_dir).take_all()}
    single = {
        r["url"]: r["extracted_text"]
        for r in extract_from_parquet(fixture_parquet, max_html_bytes=16 * 1024).take_all()
    }
    assert partitioned == single


def test_partition_assignment_deterministic():
    from smart_ocr_ray.state.manifests import partition_of

    urls = [f"https://fixture.test/prose/{i:06d}" for i in range(200)]
    first = [partition_of(u, 8) for u in urls]
    second = [partition_of(u, 8) for u in urls]
    assert first == second
    assert len(set(first)) == 8  # spreads across all partitions


@pytest.fixture(scope="module")
def sharded_fixture(fixture_pages, tmp_path_factory):
    """The same 110-row corpus split into 8 shard files (file mode)."""
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("pages_sharded")
    n = fixture_pages.num_rows
    paths = []
    for i in range(8):
        lo = i * n // 8
        hi = (i + 1) * n // 8
        p = d / f"shard-{i:02d}.parquet"
        pq.write_table(fixture_pages.slice(lo, hi - lo), p)
        paths.append(str(p))
    return str(d), paths


def test_file_mode_reads_each_shard_once(ray_session, sharded_fixture, tmp_path_factory):
    """With files >= partitions, each shard is assigned to exactly one
    partition (manifest input_files are disjoint and cover all shards),
    so the corpus is scanned once total across partitions."""
    import json

    from smart_ocr_ray.state.manifests import run_partitioned

    shard_dir, paths = sharded_fixture
    out_dir = str(tmp_path_factory.mktemp("extracted_fm"))
    summary = run_partitioned(
        shard_dir, out_dir, num_partitions=4, input_sig="fm-v1",
        max_html_bytes=16 * 1024,
    )
    assert sorted(summary["completed"]) == [0, 1, 2, 3]
    assert summary["rows"] == 110

    seen = []
    for part in range(4):
        with open(os.path.join(out_dir, "_manifests", f"part-{part}.json")) as f:
            manifest = json.load(f)
        assert manifest["status"] == "completed"
        assert manifest["input_files"] is not None
        seen.extend(manifest["input_files"])
    assert sorted(seen) == sorted(os.path.basename(p) for p in paths)
    assert len(seen) == len(set(seen))  # disjoint: no shard read twice


def test_file_mode_output_matches_single_shot(ray_session, sharded_fixture, tmp_path_factory):
    from smart_ocr_ray.pipelines.extract_pipeline import extract_from_parquet
    from smart_ocr_ray.state.manifests import read_extracted, run_partitioned

    shard_dir, paths = sharded_fixture
    out_dir = str(tmp_path_factory.mktemp("extracted_fm2"))
    run_partitioned(
        shard_dir, out_dir, num_partitions=4, input_sig="fm-v1",
        max_html_bytes=16 * 1024,
    )
    partitioned = {
        r["url"]: r["extracted_text"] for r in read_extracted(out_dir).take_all()
    }
    single = {
        r["url"]: r["extracted_text"]
        for r in extract_from_parquet(paths, max_html_bytes=16 * 1024).take_all()
    }
    assert partitioned == single


def test_file_mode_resume_and_new_shard(ray_session, sharded_fixture, tmp_path_factory):
    """Killed-run resume in file mode; adding a shard recomputes only
    the partition the new shard hashes to (stable basename-hash assignment)."""
    import pyarrow.parquet as pq

    from smart_ocr_ray.fixtures import generate_pages
    from smart_ocr_ray.state.manifests import (
        files_for_partition,
        partition_of,
        run_partitioned,
    )

    shard_dir, paths = sharded_fixture
    out_dir = str(tmp_path_factory.mktemp("extracted_fm3"))
    run_partitioned(
        shard_dir, out_dir, num_partitions=4, input_sig="fm-v1",
        max_html_bytes=16 * 1024,
    )
    # Full rerun: everything skipped.
    summary = run_partitioned(
        shard_dir, out_dir, num_partitions=4, input_sig="fm-v1",
        max_html_bytes=16 * 1024,
    )
    assert sorted(summary["skipped"]) == [0, 1, 2, 3]
    assert summary["completed"] == []

    # Drop a new shard in: only its partition recomputes.
    extra = generate_pages(12, seed=99)
    new_path = os.path.join(shard_dir, "shard-extra.parquet")
    pq.write_table(extra, new_path)
    target = partition_of("shard-extra.parquet", 4)
    summary = run_partitioned(
        shard_dir, out_dir, num_partitions=4, input_sig="fm-v1",
        max_html_bytes=16 * 1024,
    )
    assert summary["completed"] == [target]
    assert sorted(summary["skipped"]) == sorted(set(range(4)) - {target})
    os.remove(new_path)


def test_committed_keys_ignore_uncommitted_partition(
    ray_session, fixture_parquet, tmp_path_factory
):
    """A partition whose manifest is missing/invalidated must not
    contribute committed keys (its docs must be recomputed). Keys are a
    Dataset (the scale-safe join path); materialization here is
    test-side only."""
    from smart_ocr_ray.state.manifests import committed_keys_ds, run_partitioned

    def keys(ds):
        return (
            set()
            if ds is None
            else {r["content_hash"] for r in ds.take_all()}
        )

    out_dir = str(tmp_path_factory.mktemp("extracted_ch"))
    run_partitioned(
        fixture_parquet, out_dir, num_partitions=2, input_sig="s1",
        max_html_bytes=16 * 1024,
    )
    all_keys = keys(committed_keys_ds(out_dir))
    assert len(all_keys) > 0
    # Invalidate partition 1's manifest; its output dir remains on disk.
    os.remove(os.path.join(out_dir, "_manifests", "part-1.json"))
    reduced = keys(committed_keys_ds(out_dir))
    assert reduced < all_keys
    # Sig-scoped lookup drops everything under a different input_sig.
    assert committed_keys_ds(out_dir, input_sig="other") is None
    assert keys(committed_keys_ds(out_dir, input_sig="s1")) == reduced
    # parts= scopes the read to partitions being recomputed.
    assert keys(committed_keys_ds(out_dir, parts=[0])) == reduced
    assert committed_keys_ds(out_dir, parts=[1]) is None


def test_auto_partitions_sizing(ray_session, fixture_parquet):
    """auto_partitions derives the count from parquet footers vs the
    object-store budget: an oversized corpus (tiny budget) splits into
    >1 partition, a comfortable budget stays single-pass, and the
    count scales ~linearly in corpus bytes / budget."""
    import pyarrow.parquet as pq

    from smart_ocr_ray.state.manifests import (
        _AUTO_BUDGET_FRACTION,
        _AUTO_EXPANSION,
        auto_partitions,
        resolve_input_files,
    )

    files = resolve_input_files(fixture_parquet)
    total = sum(
        sum(
            pq.ParquetFile(f).metadata.row_group(i).total_byte_size
            for i in range(pq.ParquetFile(f).metadata.num_row_groups)
        )
        for f in files
    )
    assert total > 0
    # Budget sized so the working set is ~5.3 partitions' worth.
    budget = total * _AUTO_EXPANSION / _AUTO_BUDGET_FRACTION / 5.3
    n = auto_partitions(fixture_parquet, object_store_budget=budget)
    assert n == 6  # ceil(5.3)
    assert auto_partitions(fixture_parquet, object_store_budget=total * 100) == 1
    # Clamps: never 0, never unbounded.
    assert auto_partitions(fixture_parquet, object_store_budget=1.0) == 4096


def test_run_partitioned_auto(ray_session, fixture_parquet, tmp_path_factory):
    """num_partitions=None auto-sizes (here: small corpus → 1
    partition against the live object store) and completes end-to-end
    with the same total rows as the explicit-count runs."""
    from smart_ocr_ray.state.manifests import run_partitioned

    out_dir = str(tmp_path_factory.mktemp("extracted_auto"))
    summary = run_partitioned(
        fixture_parquet, out_dir, input_sig="auto-v1",
        max_html_bytes=16 * 1024,
    )
    assert summary["num_partitions"] >= 1
    assert summary["rows"] == 110
    assert len(summary["completed"]) == summary["num_partitions"]


def test_compaction_transparent_to_extraction(ray_session, fixture_parquet, tmp_path):
    """Integration: compacting the input shards (merge small files into
    ~target-row outputs) must be invisible to the extraction pipeline —
    identical (url, content_hash) multisets from the original and the
    compacted corpus."""
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.storage import compact_shards
    from smart_ocr_ray.pipelines.extract_pipeline import extract_from_parquet

    # small-file layout: the fixture split into 22 tiny shards
    src = tmp_path / "shards"; src.mkdir()
    table = pq.read_table(fixture_parquet)
    for i, start in enumerate(range(0, table.num_rows, 5)):
        pq.write_table(table.slice(start, 5), src / f"s{i:03d}.parquet")

    def keyset(path):
        rows = (
            extract_from_parquet(path, max_html_bytes=16 * 1024)
            .select_columns(["url", "content_hash"])
            .take_all()
        )
        return sorted((r["url"], r["content_hash"]) for r in rows)

    compacted = tmp_path / "compacted"
    summary = compact_shards(
        str(src), str(compacted), target_rows=40, input_sig="it"
    )
    assert summary["n_shards"] >= 2  # genuinely merged layout
    assert keyset(str(src)) == keyset(str(compacted))


def test_transient_udf_failure_retries_exactly_once_semantics(ray_session, tmp_path):
    """Infra-retry correctness: a map_batches UDF that fails ONCE per
    input block (simulated transient fault via an on-disk marker per
    block) completes under Ray's task retry with every row present
    exactly once — retried tasks re-run the deterministic UDF without
    duplicating or dropping output. This is the engine property the
    resume/lineage design assumes when it lets Ray retry tasks under a
    partition's atomic commit."""
    import os

    import pyarrow as pa
    import ray

    marker_dir = tmp_path / "markers"
    marker_dir.mkdir()
    mdir = str(marker_dir)

    def _flaky(batch: pa.Table) -> pa.Table:
        import hashlib
        import os as _os

        ids = batch.column("x").to_pylist()
        key = hashlib.md5(",".join(map(str, ids)).encode()).hexdigest()
        marker = _os.path.join(mdir, key)
        if not _os.path.exists(marker):
            open(marker, "w").close()
            raise RuntimeError("injected transient fault")
        return pa.table({"x": batch.column("x"),
                         "y": pa.table({"x": batch.column("x")}).column("x")})

    ds = (
        ray.data.from_arrow(pa.table({"x": pa.array(range(1000), pa.int64())}))
        .repartition(8)
        .map_batches(_flaky, batch_format="pyarrow", batch_size=None,
                     max_retries=3, retry_exceptions=True)
    )
    rows = sorted(r["x"] for r in ds.take_all())
    assert rows == list(range(1000))
    # every block hit the fault exactly once before succeeding
    assert len(os.listdir(mdir)) == 8
