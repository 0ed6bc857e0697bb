"""Cluster-derived shuffle constants (tuning.py): measured-anchor
floors, scale-up formulas, validated env overrides."""

import pytest


def test_floors_at_dev_box_anchor(monkeypatch):
    import smart_ocr_ray.tuning as tuning

    monkeypatch.setattr(tuning, "cluster_cpus", lambda: 32)
    assert tuning.assembly_buckets() == 512
    assert tuning.join_partitions() == 8
    # Below the anchor the measured values hold (un-floored 256 buckets
    # at 16 CPUs measured 3.6% slower — BASELINE r3).
    monkeypatch.setattr(tuning, "cluster_cpus", lambda: 16)
    assert tuning.assembly_buckets() == 512
    assert tuning.join_partitions() == 8


def test_scales_beyond_anchor(monkeypatch):
    import smart_ocr_ray.tuning as tuning

    monkeypatch.setattr(tuning, "cluster_cpus", lambda: 8192)  # 256 nodes x 32
    assert tuning.assembly_buckets() == 16 * 8192
    assert tuning.join_partitions() == 2048


def test_env_overrides_validated(monkeypatch):
    import smart_ocr_ray.tuning as tuning

    monkeypatch.setenv("SMART_OCR_ASSEMBLY_BUCKETS", "1024")
    assert tuning.assembly_buckets() == 1024
    monkeypatch.setenv("SMART_OCR_ASSEMBLY_BUCKETS", "0")
    with pytest.raises(ValueError):
        tuning.assembly_buckets()
    monkeypatch.setenv("SMART_OCR_ASSEMBLY_BUCKETS", "not-a-number")
    with pytest.raises(ValueError):
        tuning.assembly_buckets()
    monkeypatch.setenv("SMART_OCR_JOIN_PARTITIONS", "-3")
    with pytest.raises(ValueError):
        tuning.join_partitions()
