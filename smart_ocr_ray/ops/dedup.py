"""Deduplication family over the ``documents`` table.

  * exact              — hash-partition by content hash, first-wins
  * MinHash + LSH      — shingle → minhash → band explode → bucket
                         groupby → candidate pairs → verify
  * SimHash            — 64-bit near-dup fingerprints
  * n-gram Jaccard     — exact pairwise similarity on a bounded subset

Scale notes (100 TB): every variant keys its shuffle by a short hash,
never by document text; MinHash band rows carry only (band_key, doc_id,
signature) so the all-to-all moves ~1 KB/doc regardless of document
size; pair verification dedupes candidates inside the bucket group
before any exact-similarity work.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..functions.hashing import (
    MinHasher,
    jaccard,
    minhash_jaccard,
    shingle_hashes,
    shingles,
    simhash,
)
from ..functions.textstats import content_md5
from .text_analysis import read_documents


def dedup_exact(sf_dir: str) -> ray.data.Dataset:
    """One surviving doc_id per distinct text: groupby(text_md5) →
    min(doc_id) (first-wins on the deterministic key order, D1 analog
    of /root/reference/src/socr/core/metadata.py:58-67)."""

    def _hash(batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch.column("text").to_pylist()]
        return pa.Table.from_pydict(
            {
                "text_md5": pa.array([content_md5(t) for t in texts], pa.string()),
                "doc_id": batch.column("doc_id"),
            }
        )

    hashed = read_documents(sf_dir).map_batches(_hash, batch_format="pyarrow")
    # Pre-aggregate per batch (partial min) before the shuffle so the
    # all-to-all moves one row per distinct hash per block, not per doc.
    def _partial(batch: pa.Table) -> pa.Table:
        ids: dict[str, int] = {}
        for h, d in zip(batch.column("text_md5").to_pylist(), batch.column("doc_id").to_pylist()):
            if h not in ids or d < ids[h]:
                ids[h] = d
        return pa.Table.from_pydict(
            {"text_md5": list(ids.keys()), "doc_id": pa.array(list(ids.values()), pa.int64())}
        )

    from ray.data.aggregate import Min

    return (
        hashed.map_batches(_partial, batch_format="pyarrow")
        .groupby("text_md5")
        .aggregate(Min("doc_id", alias_name="doc_id"))
    )


class _MinHashStage:
    """Actor-pool stage: signatures built with permutations compiled once
    per actor (stateful-stage contract)."""

    def __init__(self, num_perm: int = 64, num_bands: int = 16, k: int = 3):
        self.hasher = MinHasher(num_perm=num_perm)
        self.num_bands = num_bands
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        texts = [t or "" for t in batch.column("text").to_pylist()]
        out_doc, out_band, out_sig = [], [], []
        for doc_id, text in zip(doc_ids, texts):
            sig = self.hasher.signature(shingle_hashes(text, self.k))
            sig_bytes = sig.tobytes()
            for band_idx, key in enumerate(self.hasher.band_keys(sig, self.num_bands)):
                out_doc.append(doc_id)
                out_band.append(bytes([band_idx]) + key)
                out_sig.append(sig_bytes)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(out_doc, pa.int64()),
                "band_key": pa.array(out_band, pa.binary()),
                "sig": pa.array(out_sig, pa.binary()),
            }
        )


def dedup_minhash_lsh(
    sf_dir: str, threshold: float = 0.7, num_perm: int = 64, num_bands: int = 16
) -> ray.data.Dataset:
    """Near-duplicate pairs via MinHash-LSH: band-bucket groupby →
    candidate pairs → MinHash-estimated Jaccard ≥ threshold.

    Returns (left_id, right_id, est_jaccard) with left < right, deduped
    across bands by a final groupby on the pair key.
    """
    bands = read_documents(sf_dir).map_batches(
        _MinHashStage,
        fn_constructor_kwargs={"num_perm": num_perm, "num_bands": num_bands},
        batch_format="pyarrow",
        concurrency=(1, 8),
        num_cpus=1,
    )

    def _pairs(group: pa.Table) -> pa.Table:
        ids = group.column("doc_id").to_pylist()
        sigs = group.column("sig").to_pylist()
        uniq: dict[int, bytes] = {}
        for d, s in zip(ids, sigs):
            uniq[d] = s
        left, right, est = [], [], []
        ordered = sorted(uniq)
        for i in range(len(ordered)):
            sig_i = np.frombuffer(uniq[ordered[i]], dtype=np.uint64)
            for j in range(i + 1, len(ordered)):
                sig_j = np.frombuffer(uniq[ordered[j]], dtype=np.uint64)
                e = minhash_jaccard(sig_i, sig_j)
                if e >= threshold:
                    left.append(ordered[i])
                    right.append(ordered[j])
                    est.append(round(e, 6))
        return pa.Table.from_pydict(
            {
                "left_id": pa.array(left, pa.int64()),
                "right_id": pa.array(right, pa.int64()),
                "est_jaccard": pa.array(est, pa.float64()),
            }
        )

    candidates = bands.groupby("band_key").map_groups(_pairs, batch_format="pyarrow")
    # A pair can surface from several bands — final dedup keyed by pair.
    from ray.data.aggregate import Max

    def _pair_key(batch: pa.Table) -> pa.Table:
        keys = [
            f"{l}:{r}"
            for l, r in zip(batch.column("left_id").to_pylist(), batch.column("right_id").to_pylist())
        ]
        return batch.append_column("pair", pa.array(keys, pa.string()))

    deduped = (
        candidates.map_batches(_pair_key, batch_format="pyarrow")
        .groupby("pair")
        .aggregate(
            Max("left_id", alias_name="left_id"),
            Max("right_id", alias_name="right_id"),
            Max("est_jaccard", alias_name="est_jaccard"),
        )
        .drop_columns(["pair"])
    )
    return deduped


def dedup_clusters(sf_dir: str, threshold: float = 0.7, max_rounds: int = 5) -> ray.data.Dataset:
    """Near-duplicate clusters: MinHash-LSH candidate pairs → connected
    components by iterative min-label propagation.

    Each round: explode pairs to (node, neighbor_label) edges in both
    directions, ``groupby(node).aggregate(Min(label))``, join the new
    labels back. Converges in O(component diameter) rounds — near-dup
    components are tiny, so ``max_rounds=5`` is plenty — and every step
    is a bounded Ray groupby, never a driver-side union-find over the
    full corpus (the guide's scale pattern; union-find on the driver is
    only sound when the candidate set is provably small).

    Output: (doc_id, cluster_id) for every doc in a near-dup pair,
    cluster_id = min doc_id of the component.
    """
    import pandas as pd

    pairs = dedup_minhash_lsh(sf_dir, threshold=threshold).to_pandas()
    if pairs.empty:
        import pyarrow as pa_mod

        return ray.data.from_arrow(
            pa_mod.Table.from_pydict(
                {"doc_id": pa_mod.array([], pa_mod.int64()),
                 "cluster_id": pa_mod.array([], pa_mod.int64())}
            )
        )
    # Candidate pairs are a tiny fraction of the corpus; propagation
    # runs as Ray groupbys over the edge list.
    edges = pd.concat(
        [
            pairs.rename(columns={"left_id": "node", "right_id": "peer"})[["node", "peer"]],
            pairs.rename(columns={"right_id": "node", "left_id": "peer"})[["node", "peer"]],
        ]
    )
    labels = (
        pd.concat([edges["node"], edges["peer"]])
        .drop_duplicates()
        .to_frame("node")
        .assign(label=lambda df: df["node"])
    )
    edge_ds = ray.data.from_pandas(edges.reset_index(drop=True))

    from ray.data.aggregate import Min

    for _ in range(max_rounds):
        label_map = dict(zip(labels["node"], labels["label"]))
        label_ref = ray.put(label_map)

        def _peer_labels(df: pd.DataFrame) -> pd.DataFrame:
            lookup = ray.get(label_ref)
            out = df.copy()
            out["label"] = out["peer"].map(lookup)
            # own label competes too
            own = df[["node"]].copy()
            own["label"] = own["node"].map(lookup)
            return pd.concat([out[["node", "label"]], own])

        new_labels = (
            edge_ds.map_batches(_peer_labels, batch_format="pandas")
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .to_pandas()
        )
        if new_labels.sort_values("node")["label"].tolist() == labels.sort_values("node")[
            "label"
        ].tolist():
            labels = new_labels
            break
        labels = new_labels

    labels = labels.rename(columns={"node": "doc_id", "label": "cluster_id"})
    return ray.data.from_pandas(labels.sort_values("doc_id").reset_index(drop=True))


def dedup_simhash(sf_dir: str, max_hamming: int = 3) -> ray.data.Dataset:
    """doc_id, simhash_hex, plus near-dup bucket key (top 16 bits) —
    documents sharing a bucket and within ``max_hamming`` bits are
    near-duplicates. Returns the per-doc fingerprint table."""

    def _batch(batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch.column("text").to_pylist()]
        hashes = [simhash(t) for t in texts]
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "simhash_hex": pa.array([f"{int(h):016x}" for h in hashes], pa.string()),
                "bucket": pa.array([int(h) >> 48 for h in hashes], pa.int64()),
            }
        )

    return read_documents(sf_dir).map_batches(_batch, batch_format="pyarrow")


def ngram_jaccard_pairs(
    sf_dir: str, max_doc_id: int = 300, threshold: float = 0.2, k: int = 3
) -> ray.data.Dataset:
    """Exact pairwise n-gram Jaccard on the bounded doc_id < max_doc_id
    subset (the oracle-checkable exact variant; the scalable path is
    ``dedup_minhash_lsh``). Small side broadcast: the subset's shingle
    sets ship to every task once via ``ray.put``."""
    import ray

    docs = read_documents(sf_dir).filter(
        expr=f"doc_id < {max_doc_id}"
    )
    subset = docs.to_pandas()
    sets = {
        int(row.doc_id): shingles(row.text or "", k) for row in subset.itertuples()
    }
    sets_ref = ray.put(sets)

    def _pairs(batch: pa.Table) -> pa.Table:
        all_sets = ray.get(sets_ref)
        left, right, sims = [], [], []
        for doc_id in batch.column("doc_id").to_pylist():
            a = all_sets[int(doc_id)]
            for other_id, b in all_sets.items():
                if other_id <= doc_id:
                    continue
                s = jaccard(a, b)
                if s >= threshold:
                    left.append(int(doc_id))
                    right.append(other_id)
                    sims.append(round(s, 6))
        return pa.Table.from_pydict(
            {
                "left_id": pa.array(left, pa.int64()),
                "right_id": pa.array(right, pa.int64()),
                "jaccard_sim": pa.array(sims, pa.float64()),
            }
        )

    return docs.map_batches(_pairs, batch_format="pyarrow")
