"""Cluster-size-derived shuffle constants (VERDICT r2 item 6).

Single-node-tuned literals (512 assembly buckets, 8 join partitions,
measured on the 32-CPU dev box) generalize as functions of the
cluster's CPU count, so the same code drives a 256-node cluster without
retuning. The formulas anchor at the measured 32-CPU sweet spot:

  * assembly buckets = 16 × CPUs — map_groups invokes the reducer once
    per bucket, so buckets must be few enough that a group amortizes
    its Arrow-kernel overhead (≥~100 docs/bucket at realistic corpus
    sizes) yet numerous enough to keep every reducer busy and the range
    partitioner balanced.
  * join partitions = CPUs / 4 — small-table Dataset joins (label
    propagation, candidate-pair verify) want enough partitions for
    parallelism but not a per-partition aggregator storm (hash-shuffle
    with hundreds of tiny partitions measured 2-5× slower here).

Resolution happens lazily at pipeline-build time (Ray is initialised by
then); outside a Ray session the 32-CPU anchors apply, keeping pure
unit tests session-free.
"""

from __future__ import annotations

_ANCHOR_CPUS = 32


def cluster_cpus() -> int:
    """Total cluster CPUs, or the 32-CPU dev-box anchor outside Ray."""
    try:
        import ray

        if ray.is_initialized():
            return int(ray.cluster_resources().get("CPU", 0)) or _ANCHOR_CPUS
    except Exception:
        pass
    return _ANCHOR_CPUS


import os


def _env_positive_int(name: str) -> int | None:
    """Validated env override: a present-but-invalid value is a hard
    error at resolution time (a 0 would otherwise surface later as a
    ZeroDivisionError inside the extract stage's modulus)."""
    raw = os.environ.get(name)
    if raw is None or raw == "":
        return None
    try:
        val = int(raw)
    except ValueError as exc:
        raise ValueError(f"{name} must be a positive integer, got {raw!r}") from exc
    if val <= 0:
        raise ValueError(f"{name} must be a positive integer, got {val}")
    return val


def assembly_buckets() -> int:
    """Reducer count for the assembly shuffle: 16 × CPUs, FLOORED at
    the measured 512 dev-box sweet spot (an interleaved A/B at 16 CPUs
    measured 512 buckets 3.6% faster than the un-floored 256 — small
    bucket counts trade reducer balance for nothing below one node).
    The formula's job is the other direction: a 256-node / 8k-CPU
    cluster derives 128k buckets instead of a single-node constant.
    SMART_OCR_ASSEMBLY_BUCKETS overrides for ops tuning / A-B tests."""
    env = _env_positive_int("SMART_OCR_ASSEMBLY_BUCKETS")
    if env is not None:
        return env
    return max(512, 16 * cluster_cpus())


def join_partitions() -> int:
    """Partition count for small-table joins: CPUs / 4, floored at the
    measured 8 (join partitions below the dev-box anchor are unmeasured
    territory; small tables don't care about a few extra partitions).
    SMART_OCR_JOIN_PARTITIONS overrides for ops tuning / A-B tests."""
    env = _env_positive_int("SMART_OCR_JOIN_PARTITIONS")
    if env is not None:
        return env
    return max(8, cluster_cpus() // 4)
