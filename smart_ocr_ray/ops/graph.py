"""Graph analytics over candidate graphs derived from the corpus.

PageRank over the approximate k-NN graph is the centrality pass
web-corpus curation runs to weight documents by neighborhood density
(and the canonical iterative-join workload: each power-iteration step
is one distributed hash join + one shuffle aggregate over the edge
table, the same shape as ``dedup.cluster_pairs``' label propagation).

All rank arithmetic lives on an exact integer grid (1e-12) with
floor-division damping, so every engine — numpy here, DuckDB in the
oracle — derives bit-identical ranks: integer sums are
order-independent, which a float PageRank is not.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

PR_SCALE = 10**12  # rank grid (1e-12); damping = 85/100 exactly
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100

# Below these bounds the power iteration runs driver-local on numpy
# int64 (identical recurrence, bit-identical output): a rank vector +
# edge list this small costs less than ONE distributed join's fixed
# overhead (~1 s/wide-op on this box; measured 15 s of pure overhead
# for 3 iterations over 2.5k edges). BOTH bounds must hold — a sparse
# candidate graph over a huge embedding corpus (many nodes, few edges)
# would otherwise take_all() a corpus-sized node table onto the
# driver. The distributed join loop below is the scale path and is
# pinned by the same test through both branches.
LOCAL_ITER_MAX_EDGES = 2**21
LOCAL_ITER_MAX_NODES = 2**21


def graph_pagerank(
    sf_dir: str,
    n_iter: int = 3,
    edges: ray.data.Dataset | None = None,
    nodes: ray.data.Dataset | None = None,
    local_max_edges: int = LOCAL_ITER_MAX_EDGES,
    seed_mod: int | None = None,
) -> ray.data.Dataset:
    """Integer-grid PageRank over the directed approximate k-NN graph
    (``similarity.embedding_knn_graph``): per node, its rank after
    ``n_iter`` power iterations on the 1e-12 grid.

    Frozen semantics (mirrored exactly by the SQL oracle):
      * nodes = every ``vec_id`` in ``embeddings`` (isolated vectors
        included); N = node count; pr0 = SCALE // N for all nodes;
      * per edge (src → dst): contribution = pr[src] // outdeg[src]
        (exact floor division — deterministic, order-free);
      * pr'[v] = (15·SCALE) // (100·N) + (85 · Σ contribs[v]) // 100
        — the simplified PageRank without dangling-mass
        redistribution, so sink-node mass leaks by design (< 15% per
        iteration here: every vector with any LSH candidate has
        out-edges).

    Scale shape: the embedding corpus is read once (k-NN graph build);
    afterwards every iteration touches only the O(V·k) edge table —
    one hash join of the V-row rank table against edges on src, one
    groupby(dst) integer sum, and a union with a zero row per node so
    contribution-less nodes survive the aggregate without an outer
    join. Edge and zero tables are materialized once into the object
    store (they are k-NN-sized, corpus-independent of payload bytes);
    ranks never touch the driver.

    ``edges``/``nodes`` exist for tests: pass (src, dst) and (vec_id)
    datasets to run the iteration core on a hand-built graph.

    ``seed_mod`` switches the recurrence to PERSONALIZED PageRank
    (random walk with restart): the teleport mass goes only to the
    seed set {v : vec_id % seed_mod == 0} (S = its size) —
    pr0 = SCALE // S on seeds / 0 elsewhere, and the per-iteration
    base (15·SCALE) // (100·S) is likewise seeds-only. Non-seed nodes
    hold rank only through link proximity to a seed — the
    seed-expansion signal targeted-crawl curation ranks by. S == 0
    degenerates to all-zero ranks (both branches and the SQL oracle
    mirror this).
    """
    from ..tuning import join_partitions as _jp

    jp = _jp()

    if nodes is None:
        nodes = ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id"]
        )
    if edges is None:
        from .similarity import embedding_knn_graph

        knn = embedding_knn_graph(sf_dir)

        def _to_edges(batch: pa.Table) -> pa.Table:
            return pa.Table.from_pydict(
                {"src": batch.column("vec_id"), "dst": batch.column("nbr")}
            )

        edges = knn.map_batches(_to_edges, batch_format="pyarrow")

    n_nodes = nodes.count()
    if n_nodes == 0:
        return ray.data.from_arrow(
            pa.schema([("vec_id", pa.int64()), ("pr_e12", pa.int64())]).empty_table()
        )
    if seed_mod is None:
        mass_nodes = n_nodes
    else:
        # Seed count as per-block partial sums (Ray 2.49's filter-expr
        # parser rejects `vec_id % m == 0`); the driver sees O(blocks)
        # ints, nodes never leave the cluster.
        def _seed_part(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0 or "vec_id" not in batch.column_names:
                return pa.table({"s": pa.array([], pa.int64())})
            ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
            return pa.table(
                {"s": pa.array([int((ids % seed_mod == 0).sum())], pa.int64())}
            )

        mass_nodes = sum(
            r["s"]
            for r in nodes.map_batches(
                _seed_part, batch_format="pyarrow"
            ).take_all()
        )
    if mass_nodes == 0:  # empty seed set: all ranks are exactly 0
        base, pr0 = 0, 0
    else:
        base = (15 * PR_SCALE) // (100 * mass_nodes)
        pr0 = PR_SCALE // mass_nodes

    edges = edges.materialize()
    if edges.count() <= local_max_edges and n_nodes <= LOCAL_ITER_MAX_NODES:
        return _pagerank_local(nodes, edges, n_nodes, n_iter, base, pr0, seed_mod)

    # Static per-iteration inputs, materialized once (k-NN-graph-sized,
    # not corpus-sized): edges carrying their src outdegree, and a zero
    # contribution row per node (keeps contribution-less nodes in the
    # groupby without an outer join).
    from .grouped import rename_agg

    outdeg = rename_agg(edges.groupby("src").count(), {"count()": "odeg"}, jp)
    edges_w = edges.join(outdeg, "inner", jp, on=("src",)).materialize()

    zero_schema = pa.schema([("vec_id", pa.int64()), ("c", pa.int64())])

    def _zeros(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "vec_id": batch.column("vec_id"),
                "c": pa.array(np.zeros(batch.num_rows, dtype=np.int64), pa.int64()),
            },
            schema=zero_schema,
        )

    zeros = nodes.map_batches(_zeros, batch_format="pyarrow").materialize()

    rank_schema = pa.schema([("vec_id", pa.int64()), ("pr", pa.int64())])

    def _node_mass(ids: np.ndarray, amount: int) -> np.ndarray:
        # uniform mass, or seeds-only when personalized.
        if seed_mod is None:
            return np.full(len(ids), amount, dtype=np.int64)
        return np.where(ids % seed_mod == 0, amount, 0).astype(np.int64)

    def _init(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {
                "vec_id": batch.column("vec_id"),
                "pr": pa.array(_node_mass(ids, pr0), pa.int64()),
            },
            schema=rank_schema,
        )

    ranks = nodes.map_batches(_init, batch_format="pyarrow").repartition(jp)

    def _contrib(batch: pa.Table) -> pa.Table:
        # Join folded the right key (src) into vec_id; per-edge rows.
        if batch.num_rows == 0:
            return zero_schema.empty_table()
        pr = batch.column("pr").to_numpy(zero_copy_only=False)
        odeg = batch.column("odeg").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {
                "vec_id": batch.column("dst"),
                "c": pa.array(np.floor_divide(pr, odeg), pa.int64()),
            },
            schema=zero_schema,
        )

    def _apply(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return rank_schema.empty_table()
        s = batch.column("sum(c)").to_numpy(zero_copy_only=False)
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        pr = _node_mass(ids, base) + np.floor_divide(PR_DAMP_NUM * s, PR_DAMP_DEN)
        return pa.Table.from_pydict(
            {
                "vec_id": batch.column("vec_id"),
                "pr": pa.array(pr, pa.int64()),
            },
            schema=rank_schema,
        )

    for _ in range(n_iter):
        contribs = ranks.join(
            edges_w, "inner", jp, on=("vec_id",), right_on=("src",)
        ).map_batches(_contrib, batch_format="pyarrow")
        ranks = (
            contribs.union(zeros)
            .groupby("vec_id")
            .sum("c")
            .map_batches(_apply, batch_format="pyarrow")
            .repartition(jp)  # launder empties before the next join
        )

    def _final(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(
            ["pr_e12" if c == "pr" else c for c in batch.column_names]
        )

    return ranks.map_batches(_final, batch_format="pyarrow")


def _pagerank_local(
    nodes: ray.data.Dataset,
    edges: ray.data.Dataset,
    n_nodes: int,
    n_iter: int,
    base: int,
    pr0: int,
    seed_mod: int | None = None,
) -> ray.data.Dataset:
    """Driver-local power iteration for small graphs: the identical
    integer recurrence on dense numpy int64 (np.add.at accumulation is
    exact — no float ever enters), bit-identical to the distributed
    join loop (asserted by the pytest hand-graph test through both
    branches). Edges must reference node ids from ``nodes`` — a
    malformed edge list raises here rather than silently crediting
    the wrong node (the distributed branch would instead drop unknown
    srcs / emit phantom dst rows, so strictness keeps the two
    branches from diverging quietly)."""
    node_ids = np.sort(
        np.fromiter(
            (r["vec_id"] for r in nodes.take_all()), dtype=np.int64, count=n_nodes
        )
    )
    edge_rows = edges.take_all()
    src = np.fromiter((r["src"] for r in edge_rows), dtype=np.int64)
    dst = np.fromiter((r["dst"] for r in edge_rows), dtype=np.int64)
    si = np.searchsorted(node_ids, src)
    di = np.searchsorted(node_ids, dst)
    if len(src) and not (
        (si < n_nodes).all()
        and (di < n_nodes).all()
        and (node_ids[np.minimum(si, n_nodes - 1)] == src).all()
        and (node_ids[np.minimum(di, n_nodes - 1)] == dst).all()
    ):
        raise ValueError("pagerank edges reference ids absent from nodes")
    odeg = np.zeros(n_nodes, dtype=np.int64)
    np.add.at(odeg, si, 1)

    if seed_mod is None:
        base_v = np.full(n_nodes, base, dtype=np.int64)
        pr = np.full(n_nodes, pr0, dtype=np.int64)
    else:
        seed = node_ids % seed_mod == 0
        base_v = np.where(seed, base, 0).astype(np.int64)
        pr = np.where(seed, pr0, 0).astype(np.int64)
    for _ in range(n_iter):
        contrib = np.zeros(n_nodes, dtype=np.int64)
        if len(si):
            np.add.at(contrib, di, pr[si] // odeg[si])
        pr = base_v + (PR_DAMP_NUM * contrib) // PR_DAMP_DEN

    return ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "vec_id": pa.array(node_ids, pa.int64()),
                "pr_e12": pa.array(pr, pa.int64()),
            }
        )
    )
