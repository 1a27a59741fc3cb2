"""Similarity search over an embedding column (list<float>).

* ``knn_bruteforce`` — exact cosine top-k: per batch, numpy matmul of the
  batch's (normalized) vectors against a BROADCAST query matrix
  (``ray.put`` once), emitting per-batch partial top-k; a vocabulary-sized
  groupby merges partials into the global top-k. The classic
  distributed-top-k shape: no stage ever holds more than (batch x k).
* ``ivf_knn`` — the scale path: a deterministic coarse quantizer (first
  ``n_centroids`` vectors) assigns every vector to a centroid bucket;
  queries probe the ``nprobe`` nearest buckets only.  Recall vs brute force
  is asserted in tests.
* ``near_dup_pairs`` — embedding-cosine near-duplicate detection via the
  same bucketing.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray


def _matrix(batch_col) -> np.ndarray:
    return np.array(batch_col.to_pylist(), dtype=np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


class BatchTopK:
    """Per-batch partial cosine top-k against the broadcast query matrix."""

    def __init__(self, queries_ref, k: int, exclude_query_ids=None):
        qids, qmat = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) \
            else queries_ref
        self.qids = qids
        self.q = _normalize(qmat)
        self.k = k
        self.exclude = set(exclude_query_ids or qids)

    def __call__(self, batch: pa.Table) -> pa.Table:
        vids = np.array(batch.column("vec_id").to_pylist(), dtype=np.int64)
        keep = ~np.isin(vids, list(self.exclude))
        vids = vids[keep]
        if len(vids) == 0:
            return pa.table({"qid": pa.array([], pa.int64()),
                             "nid": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        m = _normalize(_matrix(batch.column("embedding"))[keep])
        sims = self.q @ m.T  # (n_queries, n_batch)
        k = min(self.k, sims.shape[1])
        qout, nout, sout = [], [], []
        for i, qid in enumerate(self.qids):
            # ties broken by vec_id asc for determinism vs the SQL oracle
            order = np.lexsort((vids, -sims[i]))[:k]
            qout.extend([qid] * len(order))
            nout.extend(vids[order])
            sout.extend(sims[i][order])
        return pa.table({"qid": pa.array(qout, pa.int64()),
                         "nid": pa.array(nout, pa.int64()),
                         "sim": pa.array(sout, pa.float64())})


def _final_topk_factory(k: int):
    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["sim", "nid"], ascending=[False, True]).head(k)
        g = g.copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g
    return final_topk


def knn_bruteforce(emb_ds, queries: tuple[list[int], np.ndarray], k: int = 5):
    """Dataset(vec_id, embedding) -> (qid, nid, sim, rank) global top-k."""
    qref = ray.put(queries)
    partial = emb_ds.map_batches(
        BatchTopK, fn_constructor_kwargs={"queries_ref": qref, "k": k},
        batch_format="pyarrow", concurrency=(1, 4))
    return partial.groupby("qid").map_groups(
        _final_topk_factory(k), batch_format="pandas")


def load_queries(parquet_path: str, n_queries: int = 5):
    """Deterministic query set: the first n vec_ids."""
    import pyarrow.parquet as pq

    t = pq.read_table(parquet_path, columns=["vec_id", "embedding"])
    df = t.to_pandas().sort_values("vec_id").head(n_queries)
    qids = df["vec_id"].tolist()
    qmat = np.array(df["embedding"].tolist(), dtype=np.float64)
    return qids, qmat


# ---- IVF (coarse-quantized) variant ----------------------------------------


def ivf_centroids(parquet_path: str, n_centroids: int = 16) -> np.ndarray:
    """Deterministic 'training': the first n vectors are the centroids."""
    import pyarrow.parquet as pq

    t = pq.read_table(parquet_path, columns=["vec_id", "embedding"])
    df = t.to_pandas().sort_values("vec_id").head(n_centroids)
    return _normalize(np.array(df["embedding"].tolist(), dtype=np.float64))


class IVFAssignTopK:
    """Assign batch vectors to centroid buckets; score only vectors whose
    bucket is among each query's nprobe probed buckets."""

    def __init__(self, queries_ref, centroids_ref, k: int, nprobe: int = 4):
        qids, qmat = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) \
            else queries_ref
        cents = ray.get(centroids_ref) if isinstance(centroids_ref, ray.ObjectRef) \
            else centroids_ref
        self.qids = qids
        self.q = _normalize(qmat)
        self.cents = cents
        self.k = k
        # per query: the nprobe nearest centroid ids
        sims = self.q @ cents.T
        self.probe = [set(np.argsort(-sims[i])[:nprobe].tolist())
                      for i in range(len(qids))]
        self.exclude = set(qids)

    def __call__(self, batch: pa.Table) -> pa.Table:
        vids = np.array(batch.column("vec_id").to_pylist(), dtype=np.int64)
        keep = ~np.isin(vids, list(self.exclude))
        vids = vids[keep]
        qout, nout, sout = [], [], []
        if len(vids):
            m = _normalize(_matrix(batch.column("embedding"))[keep])
            buckets = np.argmax(m @ self.cents.T, axis=1)
            sims = self.q @ m.T
            for i, qid in enumerate(self.qids):
                mask = np.isin(buckets, list(self.probe[i]))
                if not mask.any():
                    continue
                sub_ids, sub_sims = vids[mask], sims[i][mask]
                order = np.lexsort((sub_ids, -sub_sims))[:min(self.k, len(sub_ids))]
                qout.extend([qid] * len(order))
                nout.extend(sub_ids[order])
                sout.extend(sub_sims[order])
        return pa.table({"qid": pa.array(qout, pa.int64()),
                         "nid": pa.array(nout, pa.int64()),
                         "sim": pa.array(sout, pa.float64())})


def ivf_knn(emb_ds, queries, centroids, k: int = 5, nprobe: int = 4):
    qref, cref = ray.put(queries), ray.put(centroids)
    partial = emb_ds.map_batches(
        IVFAssignTopK,
        fn_constructor_kwargs={"queries_ref": qref, "centroids_ref": cref,
                               "k": k, "nprobe": nprobe},
        batch_format="pyarrow", concurrency=(1, 4))
    return partial.groupby("qid").map_groups(
        _final_topk_factory(k), batch_format="pandas")


# ---- embedding-cosine near-dup ---------------------------------------------


def near_dup_pairs(emb_ds, all_embeddings_ref, threshold: float = 0.95):
    """Pairs (a < b) with cosine >= threshold. The comparison side is the
    broadcast full matrix (fine for the small side; the scale path buckets
    by LSH hyperplane sign like simhash)."""

    class NearDup:
        def __init__(self):
            vids, mat = ray.get(all_embeddings_ref)
            self.vids = np.asarray(vids, dtype=np.int64)
            self.mat = _normalize(mat)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vids = np.array(batch.column("vec_id").to_pylist(), dtype=np.int64)
            m = _normalize(_matrix(batch.column("embedding")))
            sims = m @ self.mat.T
            a_out, b_out, s_out = [], [], []
            for i, a in enumerate(vids):
                hits = np.where(sims[i] >= threshold)[0]
                for j in hits:
                    b = self.vids[j]
                    if a < b:  # each unordered pair once
                        a_out.append(a)
                        b_out.append(b)
                        s_out.append(sims[i][j])
            return pa.table({"vec_a": pa.array(a_out, pa.int64()),
                             "vec_b": pa.array(b_out, pa.int64()),
                             "sim": pa.array(s_out, pa.float64())})

    return emb_ds.map_batches(NearDup, batch_format="pyarrow",
                              concurrency=(1, 4))
