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


def assembly_buckets() -> int:
    """Reducer count for the assembly shuffle (== 512 at 32 CPUs)."""
    return max(64, 16 * cluster_cpus())


def join_partitions() -> int:
    """Partition count for small-table joins (== 8 at 32 CPUs)."""
    return max(2, cluster_cpus() // 4)
