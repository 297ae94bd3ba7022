"""Similarity search over an embedding column (list<float>).

- ``brute_knn``: exact cosine top-k. The query matrix is broadcast once
  (``ray.put``); each batch does one float64 matmul against it and emits a
  per-batch partial top-k; the driver merges ~k×n_batches rows. No shuffle,
  no full materialization — the scale path for "score 1e9 docs against a
  handful of queries".
- ``ivf_knn``: IVF-style approximate variant: deterministic k-means
  (fixed seed/iters) on a sample builds centroids; batches are assigned to
  cells map-side; queries probe the top-``nprobe`` cells only. At cluster
  scale the cell assignment becomes the partitioning key for the index
  layout (partition pruning at query time).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def _to_matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(len(col), -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def brute_knn(ds, query_ids: np.ndarray, query_matrix: np.ndarray, *, k: int,
              id_col: str = "vec_id", emb_col: str = "embedding",
              exclude_self: bool = True) -> pd.DataFrame:
    """Exact cosine top-k for each query vector. Returns
    (qid, rank, nid) with rank 1..k by (sim desc, nid asc)."""
    qn = _normalize(np.asarray(query_matrix, dtype=np.float64))
    ref = ray.put((np.asarray(query_ids, dtype=np.int64), qn))

    def partial(batch: pa.Table) -> pa.Table:
        qids, q = ray.get(ref)
        m = _normalize(_to_matrix(batch[emb_col]))
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        sims = m @ q.T  # (batch, nq)
        out_q, out_n, out_s = [], [], []
        for j in range(q.shape[0]):
            s = sims[:, j]
            mask = ids != qids[j] if exclude_self else np.ones_like(ids, dtype=bool)
            cand_ids, cand_s = ids[mask], s[mask]
            if cand_ids.size == 0:
                continue
            top = min(k, cand_ids.size)
            sel = np.lexsort((cand_ids, -cand_s))[:top]
            out_q.extend([int(qids[j])] * top)
            out_n.extend(cand_ids[sel].tolist())
            out_s.extend(cand_s[sel].tolist())
        return pa.table({
            "qid": pa.array(out_q, pa.int64()),
            "nid": pa.array(out_n, pa.int64()),
            "sim": pa.array(out_s, pa.float64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out_rows = []
    for qid, grp in parts.groupby("qid", sort=True):
        grp = grp.sort_values(["sim", "nid"], ascending=[False, True], kind="mergesort").head(k)
        for rank, (_, r) in enumerate(grp.iterrows(), 1):
            out_rows.append((int(qid), rank, int(r["nid"])))
    return pd.DataFrame(out_rows, columns=["qid", "rank", "nid"]).astype(
        {"qid": np.int64, "rank": np.int64, "nid": np.int64}
    )


def embedding_near_dup(ds, *, threshold: float, id_col: str = "vec_id",
                       emb_col: str = "embedding", max_side: int | None = None) -> pd.DataFrame:
    """All pairs (a < b) with cosine sim > threshold. The comparison side is
    broadcast (valid when it fits one worker; beyond that, LSH-bucket first)."""
    def limit_ids(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.less(batch[id_col], max_side))

    side = ds if max_side is None else ds.map_batches(limit_ids, batch_format="pyarrow")
    side_tbl = pa.concat_tables([ray.get(r) for r in side.to_arrow_refs()])
    side_ids = side_tbl[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    side_m = _normalize(_to_matrix(side_tbl[emb_col]))
    ref = ray.put((side_ids, side_m))

    def partial(batch: pa.Table) -> pa.Table:
        ids_b, m_b = ray.get(ref)
        m = _normalize(_to_matrix(batch[emb_col]))
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        sims = m @ m_b.T
        ai, bi = np.nonzero(sims > threshold)
        a, b_ = ids[ai], ids_b[bi]
        keep = a < b_
        return pa.table({
            "a": pa.array(a[keep], pa.int64()),
            "b": pa.array(b_[keep], pa.int64()),
            "sim": pa.array(np.round(sims[ai, bi][keep], 6), pa.float64()),
        })

    src = ds if max_side is None else ds.map_batches(limit_ids, batch_format="pyarrow")
    return src.map_batches(partial, batch_format="pyarrow").to_pandas().sort_values(
        ["a", "b"]).reset_index(drop=True)


def kmeans_fit(sample: np.ndarray, n_clusters: int, *, iters: int = 10, seed: int = 0) -> np.ndarray:
    """Deterministic Lloyd k-means on normalized vectors (cosine ≈ L2)."""
    rng = np.random.default_rng(seed)
    x = _normalize(sample)
    centroids = x[rng.choice(len(x), size=n_clusters, replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ centroids.T, axis=1)
        for c in range(n_clusters):
            m = assign == c
            if m.any():
                centroids[c] = x[m].mean(axis=0)
        centroids = _normalize(centroids)
    return centroids


def ivf_knn(ds, query_ids: np.ndarray, query_matrix: np.ndarray, *, k: int,
            n_clusters: int = 16, nprobe: int = 4, sample_limit: int = 5000,
            id_col: str = "vec_id", emb_col: str = "embedding") -> pd.DataFrame:
    """Approximate top-k: probe only the ``nprobe`` nearest IVF cells."""
    sample_tbl = ds.limit(sample_limit).to_arrow_refs()
    sample = pa.concat_tables([ray.get(r) for r in sample_tbl])
    centroids = kmeans_fit(_to_matrix(sample[emb_col]), n_clusters)
    qn = _normalize(np.asarray(query_matrix, dtype=np.float64))
    probe = np.argsort(-(qn @ centroids.T), axis=1, kind="stable")[:, :nprobe]
    ref = ray.put((np.asarray(query_ids, dtype=np.int64), qn, centroids, probe))

    def partial(batch: pa.Table) -> pa.Table:
        qids, q, cents, prb = ray.get(ref)
        m = _normalize(_to_matrix(batch[emb_col]))
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cell = np.argmax(m @ cents.T, axis=1)
        sims = m @ q.T
        out_q, out_n, out_s = [], [], []
        for j in range(q.shape[0]):
            mask = np.isin(cell, prb[j]) & (ids != qids[j])
            cand_ids, cand_s = ids[mask], sims[mask, j]
            if cand_ids.size == 0:
                continue
            top = min(k, cand_ids.size)
            sel = np.lexsort((cand_ids, -cand_s))[:top]
            out_q.extend([int(qids[j])] * top)
            out_n.extend(cand_ids[sel].tolist())
            out_s.extend(cand_s[sel].tolist())
        return pa.table({
            "qid": pa.array(out_q, pa.int64()),
            "nid": pa.array(out_n, pa.int64()),
            "sim": pa.array(out_s, pa.float64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    rows = []
    for qid, grp in parts.groupby("qid", sort=True):
        grp = grp.sort_values(["sim", "nid"], ascending=[False, True], kind="mergesort").head(k)
        for rank, (_, r) in enumerate(grp.iterrows(), 1):
            rows.append((int(qid), rank, int(r["nid"])))
    return pd.DataFrame(rows, columns=["qid", "rank", "nid"]).astype(np.int64)
