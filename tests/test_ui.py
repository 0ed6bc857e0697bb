"""Run-report rendering (smart_ocr_ray/ui.py) — the Ray-native analog
of the reference's ui/ panel layer, built from lineage manifests."""

import json
import os

import pytest


def test_report_from_manifests(tmp_path):
    from smart_ocr_ray.state.manifests import _write_manifest_atomic
    from smart_ocr_ray.ui import report_from_manifests

    out = str(tmp_path / "run")
    os.makedirs(out)
    for part, rows, wall, failures in (
        (0, 1200, 2400.0, {"garbled": 3}),
        (1, 800, 1600.0, {}),
    ):
        _write_manifest_atomic(
            out,
            part,
            {
                "partition": part,
                "status": "completed",
                "row_count": rows,
                "content_hash_xor": 0,
                "input_sig": "",
                "input_files": [],
                "wall_ms": wall,
                "metrics": {
                    "n_passed": rows - sum(failures.values()),
                    "pass_rate": round(
                        (rows - sum(failures.values())) / rows, 6
                    ),
                    "total_words": rows * 10,
                    "failure_counts": failures,
                },
            },
        )
    rep = report_from_manifests(out)
    assert "partition 0" in rep and "partition 1" in rep
    assert "rows: 1,200" in rep and "rows: 800" in rep
    assert "[x] garbled  x3" in rep
    assert "total_rows: 2,000" in rep
    assert "throughput: 500 docs/s" in rep  # 2000 rows / 4.0s
    assert "[########################] 2/2 committed" in rep
    # deterministic: same manifests, same text
    assert rep == report_from_manifests(out)


def test_stats_breakdown_parses_operator_walls():
    from smart_ocr_ray.ui import stats_breakdown

    stats = (
        "Operator 1 ReadParquet->MapBatches(f): 8 tasks executed, "
        "8 blocks produced in 0.29s\n"
        "* Remote wall time: 1ms min\n"
        "Operator 2 Sort: 4 tasks executed, 4 blocks produced in 1.50s\n"
    )
    assert stats_breakdown(stats) == [
        ("ReadParquet->MapBatches(f)", 0.29),
        ("Sort", 1.5),
    ]
    assert stats_breakdown("garbage") == []
