"""SemDedup: semantic (embedding-space) deduplication.

Abbas et al. 2023 ("SemDeDup: Data-efficient learning at web-scale through
semantic deduplication", arXiv:2303.09540): cluster the corpus embeddings
with k-means, then inside each cluster drop every example whose cosine
similarity to an earlier-kept-priority example meets ``tau``.

Ray-Data shape (the 100 TB path):

1. centroids: ``ann.kmeans_centroids`` — map-side partial sums, only the
   (n_clusters, dim) matrix reaches the driver (or pass ``centroids=`` /
   ``cluster_fn=`` to skip training);
2. assignment: one stateless ``map_batches`` with the centroid matrix
   broadcast via ``ray.put`` (read once per task, never re-shipped per batch);
3. prune: ONE groupby shuffle keyed by cluster id, then a vectorized
   upper-triangle cosine pass per cluster (tiled matmul, memory bounded by
   ``tile`` columns at a time).

Per-cluster work is O(m^2 d) flops — the algorithm's inherent cost (the
paper runs the same within-cluster pairwise pass). Size ``n_clusters``
so corpus_rows / n_clusters keeps m^2 d per group affordable; the shuffle
itself moves each row once.

Drop rule (matches the reference SemDeDup implementation): order the
cluster's rows by keep priority; row j is dropped iff ANY earlier row i
(kept or not) has cos(i, j) >= tau. "Any earlier, kept or not" is the
upper-triangular-matrix semantics — non-recursive, so it is exactly
SQL-expressible (NOT EXISTS earlier same-cluster row with cos >= tau),
which is how the driver oracle checks it.

No counterpart in the reference repo (mismo stops at pairwise embedding
blocking, mismo/ann semantics); this is the corpus-level prune built on it.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pyarrow as pa
import ray.data

__all__ = ["semdedup"]


def _matrix(batch: pa.Table, column: str) -> np.ndarray:
    col = batch[column].combine_chunks()
    flat = np.asarray(col.flatten(), dtype=np.float64)
    return flat.reshape(len(batch), -1) if len(batch) else flat.reshape(0, 1)


def _normalize_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def semdedup(
    ds: ray.data.Dataset,
    *,
    vector_column: str = "embedding",
    id_column: str = "vec_id",
    tau: float = 0.7,
    n_clusters: int = 64,
    iters: int = 4,
    centroids: np.ndarray | None = None,
    cluster_fn: Callable[[pa.Table], np.ndarray] | None = None,
    keep_order: str = "min_id",
    return_all: bool = False,
    tile: int = 2048,
    seed: int = 7,
) -> ray.data.Dataset:
    """Semantic dedupe: k-means cluster -> within-cluster cosine prune.

    Returns the input rows plus ``cluster`` (int64), ``semdedup_keep``
    (bool) and ``max_prior_sim`` (double: max cosine to any higher-priority
    row in the cluster; -1.0 for the highest-priority row). With
    ``return_all=False`` (default) only surviving rows are returned.

    - ``cluster_fn``: optional batch -> int64 ndarray cluster assignment
      (e.g. a precomputed partition column) that skips k-means entirely;
      used by the SQL oracle with a deterministic modulo clustering.
    - ``centroids``: pass a trained (n_clusters, dim) matrix to make
      indexing a single assignment pass (the 100 TB path: train once on a
      sample, reuse everywhere).
    - ``keep_order``: ``"min_id"`` (deterministic, SQL-checkable) or
      ``"low_centroid_sim"`` (the paper's choice: keep the example LEAST
      similar to its centroid; requires centroid assignment, ties broken
      by id).
    """
    if keep_order not in ("min_id", "low_centroid_sim"):
        raise ValueError("keep_order must be 'min_id' or 'low_centroid_sim'")
    if keep_order == "low_centroid_sim" and cluster_fn is not None:
        raise ValueError(
            "keep_order='low_centroid_sim' needs centroid assignment; "
            "cluster_fn gives no centroid similarity"
        )

    if cluster_fn is not None:
        def assign(t: pa.Table) -> pa.Table:
            cl = np.asarray(cluster_fn(t), dtype=np.int64)
            return t.append_column("cluster", pa.array(cl)).append_column(
                "__csim__", pa.array(np.zeros(len(t)))
            )
    else:
        if centroids is None:
            from mismo_ray.ann import kmeans_centroids

            centroids = kmeans_centroids(
                ds,
                n_centroids=n_clusters,
                iters=iters,
                id_column=id_column,
                vector_column=vector_column,
                seed=seed,
            )
        cm = np.asarray(centroids, dtype=np.float64)
        c_ref = ray.put(cm)

        def assign(t: pa.Table) -> pa.Table:
            c = ray.get(c_ref)
            g = _normalize_rows(_matrix(t, vector_column))
            sims = g @ c.T if len(g) else np.zeros((0, len(c)))
            cl = (
                np.argmax(sims, axis=1).astype(np.int64)
                if sims.size
                else np.zeros(len(t), dtype=np.int64)
            )
            csim = sims[np.arange(len(t)), cl] if sims.size else np.zeros(len(t))
            return t.append_column("cluster", pa.array(cl)).append_column(
                "__csim__", pa.array(csim)
            )

    assigned = ds.map_batches(assign, batch_format="pyarrow")

    def prune(g: pa.Table) -> pa.Table:
        n = len(g)
        ids = np.asarray(g[id_column])
        if keep_order == "low_centroid_sim":
            order = np.lexsort((ids, np.asarray(g["__csim__"])))
        else:
            order = np.argsort(ids, kind="stable")
        vm = _normalize_rows(_matrix(g, vector_column))[order]
        max_prior = np.full(n, -1.0)
        # tiled upper-triangle max: column block [s, e) sees all rows < e
        for s in range(1, n, tile):
            e = min(s + tile, n)
            sims = vm[:e] @ vm[s:e].T  # (e, e - s)
            invalid = np.arange(e)[:, None] >= np.arange(s, e)[None, :]
            sims[invalid] = -np.inf
            max_prior[s:e] = sims.max(axis=0)
        keep = max_prior < tau
        inv = np.empty(n, dtype=np.int64)
        inv[order] = np.arange(n)
        out = g.drop_columns(["__csim__"]).append_column(
            "semdedup_keep", pa.array(keep[inv])
        ).append_column("max_prior_sim", pa.array(max_prior[inv]))
        if return_all:
            return out
        return out.filter(pa.array(keep[inv]))

    return assigned.groupby("cluster").map_groups(prune, batch_format="pyarrow")
