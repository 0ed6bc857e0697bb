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
