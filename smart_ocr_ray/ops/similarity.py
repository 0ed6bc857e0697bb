"""Similarity search over the ``embeddings`` table.

Brute-force cosine top-k is the exact baseline: the query matrix is
broadcast once (``ray.put``), every batch computes a numpy matmul
against it, emits batch-local top-k, and a tiny ``groupby(query_id)``
merge produces the global top-k — the shuffle moves only
O(queries × k × blocks) candidate rows, never the embeddings.

The IVF variant is the scale path: embeddings are bucketed to fixed
deterministic centroids in one pass; a query probes only its nearest
``n_probe`` buckets, so compute drops by ~n_buckets/n_probe at a small
recall cost (rows-only correctness check — approximate by design).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def read_embeddings(sf_dir: str) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")


def _load_queries(sf_dir: str, n_queries: int) -> tuple[np.ndarray, list[int]]:
    import pyarrow.parquet as pq

    table = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    ids = table.column("vec_id").to_pylist()
    order = np.argsort(ids)[:n_queries]
    q_ids = [int(ids[i]) for i in order]
    mat = np.stack(
        [np.asarray(table.column("embedding")[i].as_py(), dtype=np.float64) for i in order]
    )
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    return mat, q_ids


def ann_cosine_topk(sf_dir: str, k: int = 10, n_queries: int = 5) -> ray.data.Dataset:
    """Exact cosine top-k for the first ``n_queries`` vec_ids.

    Output: (query_id, vec_id, cos_sim_e3 = round(sim*1000) as an integer — binary-exact for value-hash comparison; 1e-3 granularity is coarse enough that numpy-f64 vs DuckDB kernel differences ~1e-8 cannot flip it, rank 1..k),
    ties broken by vec_id ascending. Self-matches included (rank 1,
    sim 1.0) — the SQL oracle mirrors both choices.
    """
    queries, query_ids = _load_queries(sf_dir, n_queries)
    q_ref = ray.put((queries, query_ids))

    def _local_topk(batch: pa.Table) -> pa.Table:
        q_mat, q_ids = ray.get(q_ref)
        vec_ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        emb = np.asarray(
            [np.asarray(e, dtype=np.float64) for e in batch.column("embedding").to_pylist()]
        )
        norms = np.linalg.norm(emb, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        emb = emb / norms
        sims = emb @ q_mat.T  # (batch, n_queries)
        out_q, out_v, out_s = [], [], []
        top = min(len(vec_ids), k)
        for qi, q_id in enumerate(q_ids):
            col = sims[:, qi]
            idx = np.argpartition(-col, top - 1)[:top]
            for j in idx:
                out_q.append(q_id)
                out_v.append(int(vec_ids[j]))
                out_s.append(float(col[j]))
        return pa.Table.from_pydict(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "cos_sim": pa.array(out_s, pa.float64()),
            }
        )

    def _merge(group: pa.Table) -> pa.Table:
        rows = sorted(
            zip(
                group.column("query_id").to_pylist(),
                group.column("vec_id").to_pylist(),
                group.column("cos_sim").to_pylist(),
            ),
            key=lambda r: (-r[2], r[1]),
        )[:k]
        return pa.Table.from_pydict(
            {
                "query_id": pa.array([r[0] for r in rows], pa.int64()),
                "vec_id": pa.array([r[1] for r in rows], pa.int64()),
                "cos_sim_e3": pa.array([int(round(r[2] * 1000)) for r in rows], pa.int64()),
                "rank": pa.array(list(range(1, len(rows) + 1)), pa.int64()),
            }
        )

    local = read_embeddings(sf_dir).map_batches(_local_topk, batch_format="pyarrow")
    return local.groupby("query_id").map_groups(_merge, batch_format="pyarrow")


def ivf_topk(
    sf_dir: str, k: int = 10, n_queries: int = 5, n_buckets: int = 16, n_probe: int = 4
) -> ray.data.Dataset:
    """IVF-bucketed approximate top-k: centroids = the first n_buckets
    vectors (deterministic, no training pass); vectors assign to their
    nearest centroid; queries probe the n_probe nearest buckets."""
    import pyarrow.parquet as pq

    table = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = table.column("vec_id").to_pylist()
    order = np.argsort(ids)[:n_buckets]
    centroids = np.stack(
        [np.asarray(table.column("embedding")[i].as_py(), dtype=np.float64) for i in order]
    )
    centroids /= np.linalg.norm(centroids, axis=1, keepdims=True)
    queries, query_ids = _load_queries(sf_dir, n_queries)
    probe = {
        q_id: set(np.argsort(-(queries[qi] @ centroids.T))[:n_probe].tolist())
        for qi, q_id in enumerate(query_ids)
    }
    ref = ray.put((centroids, queries, query_ids, probe))

    def _local(batch: pa.Table) -> pa.Table:
        cents, q_mat, q_ids, probe_map = ray.get(ref)
        vec_ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        emb = np.asarray(
            [np.asarray(e, dtype=np.float64) for e in batch.column("embedding").to_pylist()]
        )
        norms = np.linalg.norm(emb, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        emb = emb / norms
        buckets = np.argmax(emb @ cents.T, axis=1)
        out_q, out_v, out_s = [], [], []
        for qi, q_id in enumerate(q_ids):
            mask = np.isin(buckets, list(probe_map[q_id]))
            if not mask.any():
                continue
            # Mask BEFORE the matmul: only probed-bucket rows are ever
            # multiplied — this is the IVF compute saving (an n_probe/
            # n_buckets fraction of the batch), not just a result filter.
            col = emb[mask] @ q_mat[qi]
            cand_ids = vec_ids[mask]
            top = min(len(cand_ids), k)
            idx = np.argpartition(-col, top - 1)[:top]
            for j in idx:
                out_q.append(q_id)
                out_v.append(int(cand_ids[j]))
                out_s.append(float(col[j]))
        return pa.Table.from_pydict(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "cos_sim": pa.array(out_s, pa.float64()),
            }
        )

    def _merge(group: pa.Table) -> pa.Table:
        rows = sorted(
            zip(
                group.column("query_id").to_pylist(),
                group.column("vec_id").to_pylist(),
                group.column("cos_sim").to_pylist(),
            ),
            key=lambda r: (-r[2], r[1]),
        )[:k]
        return pa.Table.from_pydict(
            {
                "query_id": pa.array([r[0] for r in rows], pa.int64()),
                "vec_id": pa.array([r[1] for r in rows], pa.int64()),
                "cos_sim_e3": pa.array([int(round(r[2] * 1000)) for r in rows], pa.int64()),
                "rank": pa.array(list(range(1, len(rows) + 1)), pa.int64()),
            }
        )

    local = read_embeddings(sf_dir).map_batches(_local, batch_format="pyarrow")
    return local.groupby("query_id").map_groups(_merge, batch_format="pyarrow")
