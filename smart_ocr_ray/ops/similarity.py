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


def _normalized(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    vec_ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
    emb = np.asarray(
        [np.asarray(e, dtype=np.float64) for e in batch.column("embedding").to_pylist()]
    )
    norms = np.linalg.norm(emb, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return vec_ids, emb / norms


def embedding_neardup_pairs(
    sf_dir: str, threshold_e3: int = 450, max_vec_id: int = 2000
) -> ray.data.Dataset:
    """Exact embedding-cosine near-duplicate pairs on the bounded
    ``vec_id < max_vec_id`` subset (the oracle-checkable variant, like
    ``ngram_jaccard_pairs``; the scale path is
    ``embedding_neardup_lsh``). The subset matrix broadcasts once via
    ``ray.put``; each batch does one matmul against it.

    The threshold is applied on the integer-scaled similarity
    (``round(sim*1000) >= threshold_e3``) so the SQL oracle filters on
    the identical integer and float kernel differences cannot flip
    membership at the boundary. The default 0.45 reflects the synthetic
    embeddings' similarity range (max off-diagonal cosine ~0.5-0.6);
    a real near-dup corpus would run this at 0.9+.

    Output: (left_id, right_id, cos_sim_e3) with left < right.
    """
    docs = read_embeddings(sf_dir).filter(expr=f"vec_id < {max_vec_id}")
    import pyarrow.parquet as pq

    table = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    mask = np.asarray(table.column("vec_id").to_pylist(), dtype=np.int64) < max_vec_id
    all_ids = np.asarray(table.column("vec_id").to_pylist(), dtype=np.int64)[mask]
    all_emb = np.asarray(
        [np.asarray(e, dtype=np.float64) for e, keep in zip(table.column("embedding").to_pylist(), mask) if keep]
    )
    norms = np.linalg.norm(all_emb, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    ref = ray.put((all_ids, all_emb / norms))

    def _pairs(batch: pa.Table) -> pa.Table:
        ids_all, mat_all = ray.get(ref)
        vec_ids, emb = _normalized(batch)
        sims = emb @ mat_all.T
        left, right, e3s = [], [], []
        for bi, lid in enumerate(vec_ids):
            e3 = np.round(sims[bi] * 1000).astype(np.int64)
            hits = np.nonzero((e3 >= threshold_e3) & (ids_all > lid))[0]
            for j in hits:
                left.append(int(lid))
                right.append(int(ids_all[j]))
                e3s.append(int(e3[j]))
        return pa.Table.from_pydict(
            {
                "left_id": pa.array(left, pa.int64()),
                "right_id": pa.array(right, pa.int64()),
                "cos_sim_e3": pa.array(e3s, pa.int64()),
            }
        )

    return docs.map_batches(_pairs, batch_format="pyarrow")


class _HyperplaneStage:
    """Actor-pool stage: random-hyperplane LSH signatures for cosine
    similarity (Charikar 2002) — planes compiled once per actor."""

    def __init__(self, dim: int = 64, n_planes: int = 16, n_bands: int = 4, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((n_planes, dim))
        self.n_bands = n_bands
        self.rows_per_band = n_planes // n_bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        vec_ids, emb = _normalized(batch)
        bits = (emb @ self.planes.T) > 0  # (n, n_planes)
        out_id, out_band, out_vec = [], [], []
        embs_list = batch.column("embedding").to_pylist()
        for i, vid in enumerate(vec_ids):
            for b in range(self.n_bands):
                chunk = bits[i, b * self.rows_per_band : (b + 1) * self.rows_per_band]
                key = (b << self.rows_per_band) | int(
                    sum(1 << k for k, v in enumerate(chunk) if v)
                )
                out_id.append(int(vid))
                out_band.append(key)
                out_vec.append(embs_list[i])
        return pa.Table.from_pydict(
            {
                "vec_id": pa.array(out_id, pa.int64()),
                "band_key": pa.array(out_band, pa.int64()),
                "embedding": pa.array(out_vec, pa.list_(pa.float32())),
            }
        )


def embedding_neardup_lsh(
    sf_dir: str, threshold_e3: int = 450, n_planes: int = 16, n_bands: int = 4
) -> ray.data.Dataset:
    """Embedding near-dup pairs at scale: random-hyperplane LSH buckets
    (sign bits of ``emb @ planes``, banded) co-locate likely-similar
    vectors; exact cosine verification runs only inside buckets, and a
    final pair-keyed groupby dedups across bands. Approximate by design
    (a pair whose signs differ in every band is missed) — recall vs the
    exact variant is pinned by pytest.

    Partitioning assumption: bucket sizes stay small because hyperplane
    bits split mass ~evenly; a degenerate corpus (many identical
    vectors) concentrates buckets, and the same representative-collapse
    guard as MinHash would apply before the O(m^2) verify.
    """
    bands = read_embeddings(sf_dir).map_batches(
        _HyperplaneStage,
        fn_constructor_kwargs={"n_planes": n_planes, "n_bands": n_bands},
        batch_format="pyarrow",
        concurrency=(1, 8),
        num_cpus=1,
    )

    def _verify(group: pa.Table) -> pa.Table:
        vec_ids, emb = _normalized(group)
        uniq: dict[int, int] = {}
        for i, v in enumerate(vec_ids):
            uniq.setdefault(int(v), i)
        order = sorted(uniq)
        idx = [uniq[v] for v in order]
        mat = emb[idx]
        sims = mat @ mat.T
        e3 = np.round(sims * 1000).astype(np.int64)
        iu, ju = np.triu_indices(len(order), k=1)
        hits = e3[iu, ju] >= threshold_e3
        return pa.Table.from_pydict(
            {
                "left_id": pa.array([order[i] for i in iu[hits]], pa.int64()),
                "right_id": pa.array([order[j] for j in ju[hits]], pa.int64()),
                "cos_sim_e3": pa.array([int(v) for v in e3[iu, ju][hits]], pa.int64()),
            }
        )

    candidates = bands.groupby("band_key").map_groups(_verify, batch_format="pyarrow")

    from ray.data.aggregate import Max

    def _pair_key(batch: pa.Table) -> pa.Table:
        keys = [
            f"{l}:{r}"
            for l, r in zip(
                batch.column("left_id").to_pylist(), batch.column("right_id").to_pylist()
            )
        ]
        return batch.append_column("pair", pa.array(keys, pa.string()))

    return (
        candidates.map_batches(_pair_key, batch_format="pyarrow")
        .groupby("pair")
        .aggregate(
            Max("left_id", alias_name="left_id"),
            Max("right_id", alias_name="right_id"),
            Max("cos_sim_e3", alias_name="cos_sim_e3"),
        )
        .drop_columns(["pair"])
    )
