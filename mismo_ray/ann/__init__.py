"""Approximate-nearest-neighbor search over an embedding column.

Not in the reference (mismo's vector module stops at pairwise similarity,
/root/reference/mismo/vector/_vector.py); required by the 100 TB
training-data-pipeline surface (task brief):

- ``brute_force_topk``: baseline — one numpy matmul per batch against a
  broadcast query matrix (``ray.put`` once), per-batch top-k, then a tiny
  groupby(query) merge. Exact.
- ``cosine_threshold_pairs``: all pairs with cosine >= tau, batch x broadcast
  corpus matmul (valid while the corpus matrix fits a worker; see the LSH
  variant for beyond-memory corpora).
- ``lsh_topk``: scale path — random-hyperplane LSH buckets both sides, exact
  search within buckets only. Recall < 1, cost ~ corpus/2^bits per query.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from mismo_ray._util import splitmix64


def _matrix(batch: pa.Table, column: str) -> np.ndarray:
    arr = batch[column]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = np.asarray(arr.values, dtype=np.float64)
    n = len(arr)
    return flat.reshape(n, -1) if n else flat.reshape(0, 0)


def _normalize_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = np.nan
    return m / n


def brute_force_topk(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    *,
    k: int = 10,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
    query_ids: np.ndarray | None = None,
    exclude_self: bool = True,
) -> ray.data.Dataset:
    """Exact cosine top-k: per-batch matmul + local top-k, merged per query.

    Output columns: (query_id, neighbor_id, rank) with rank 1..k by cosine
    descending, ties broken by neighbor_id ascending.
    """
    qm = _normalize_rows(np.asarray(queries, dtype=np.float64))
    qids = (
        np.arange(len(qm), dtype=np.int64)
        if query_ids is None
        else np.asarray(query_ids, dtype=np.int64)
    )
    q_ref = ray.put((qm, qids))

    def local_topk(batch: pa.Table) -> pa.Table:
        qm, qids = ray.get(q_ref)
        vm = _normalize_rows(_matrix(batch, vector_column))
        ids = np.asarray(batch[id_column], dtype=np.int64)
        if len(ids) == 0 or len(qm) == 0:
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "neighbor_id": pa.array([], type=pa.int64()),
                    "sim": pa.array([], type=pa.float64()),
                }
            )
        sims = vm @ qm.T  # (n, q)
        out_q, out_n, out_s = [], [], []
        kk = min(k + (1 if exclude_self else 0), len(ids))
        for j in range(sims.shape[1]):
            col = sims[:, j]
            idx = np.argpartition(-col, kk - 1)[:kk] if kk < len(col) else np.arange(len(col))
            for i in idx:
                if exclude_self and ids[i] == qids[j]:
                    continue
                out_q.append(qids[j])
                out_n.append(ids[i])
                out_s.append(col[i])
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "neighbor_id": pa.array(out_n, type=pa.int64()),
                "sim": pa.array(out_s, type=pa.float64()),
            }
        )

    candidates = ds.map_batches(local_topk, batch_format="pyarrow")

    def merge(g: pa.Table) -> pa.Table:
        sims = np.asarray(g["sim"], dtype=np.float64)
        nids = np.asarray(g["neighbor_id"], dtype=np.int64)
        order = np.lexsort((nids, -sims))[:k]
        return pa.table(
            {
                "query_id": g["query_id"].take(pa.array(order, type=pa.int64())),
                "neighbor_id": pa.array(nids[order]),
                "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
                "sim": pa.array(sims[order]),
            }
        )

    return candidates.groupby("query_id").map_groups(merge, batch_format="pyarrow")


def cosine_threshold_pairs(
    ds: ray.data.Dataset,
    *,
    tau: float,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
) -> ray.data.Dataset:
    """All unordered pairs (id_l < id_r) with cosine >= tau.

    The corpus matrix is collected once and broadcast (embedding tables are
    small relative to the corpus; an LSH-bucketed variant covers the case
    where they are not)."""
    rows = []
    ids = []
    for b in ds.select_columns([id_column, vector_column]).iter_batches(
        batch_format="pyarrow"
    ):
        rows.append(_matrix(b, vector_column))
        ids.append(np.asarray(b[id_column], dtype=np.int64))
    corpus = _normalize_rows(np.concatenate(rows)) if rows else np.zeros((0, 0))
    corpus_ids = np.concatenate(ids) if ids else np.array([], dtype=np.int64)
    ref = ray.put((corpus, corpus_ids))

    def pairs(batch: pa.Table) -> pa.Table:
        corpus, corpus_ids = ray.get(ref)
        vm = _normalize_rows(_matrix(batch, vector_column))
        bids = np.asarray(batch[id_column], dtype=np.int64)
        out_l, out_r = [], []
        if len(bids) and len(corpus_ids):
            sims = vm @ corpus.T
            ii, jj = np.nonzero(sims >= tau)
            a, b_ = bids[ii], corpus_ids[jj]
            keep = a < b_
            out_l, out_r = a[keep], b_[keep]
        return pa.table(
            {
                "record_id_l": pa.array(out_l, type=pa.int64()),
                "record_id_r": pa.array(out_r, type=pa.int64()),
            }
        )

    return ds.map_batches(pairs, batch_format="pyarrow")


def random_hyperplanes(dim: int, bits: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(
        int(splitmix64(np.array([seed], dtype=np.uint64))[0])
    )
    return rng.standard_normal((bits, dim))


def lsh_bucket(vectors: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Sign-bit bucketing: (n, d) -> int64 bucket ids."""
    bits = (vectors @ planes.T) > 0
    weights = (1 << np.arange(planes.shape[0], dtype=np.int64))
    return bits.astype(np.int64) @ weights


def lsh_topk(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    *,
    k: int = 10,
    bits: int = 8,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
    query_ids: np.ndarray | None = None,
    seed: int = 7,
) -> ray.data.Dataset:
    """Approximate top-k: exact search restricted to the query's LSH bucket.

    Scale path: the shuffle key is the bucket, each task sees ~n/2^bits
    corpus rows; recall trades off against 2^bits.
    """
    qm = np.asarray(queries, dtype=np.float64)
    qids = (
        np.arange(len(qm), dtype=np.int64)
        if query_ids is None
        else np.asarray(query_ids, dtype=np.int64)
    )
    dim = qm.shape[1]
    planes = random_hyperplanes(dim, bits, seed)
    qbuckets = lsh_bucket(qm, planes)
    by_bucket: dict[int, list[int]] = {}
    for i, b in enumerate(qbuckets):
        by_bucket.setdefault(int(b), []).append(i)
    q_ref = ray.put((qm, qids, by_bucket))
    planes_ref = ray.put(planes)

    def bucketize(batch: pa.Table) -> pa.Table:
        planes = ray.get(planes_ref)
        vm = _matrix(batch, vector_column)
        buckets = lsh_bucket(vm, planes) if len(vm) else np.array([], dtype=np.int64)
        return batch.append_column("__bucket__", pa.array(buckets))

    bucketed = ds.map_batches(bucketize, batch_format="pyarrow")

    def search(g: pa.Table) -> pa.Table:
        qm, qids, by_bucket = ray.get(q_ref)
        bucket = int(g["__bucket__"][0].as_py())
        qidx = by_bucket.get(bucket, [])
        if not qidx:
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "neighbor_id": pa.array([], type=pa.int64()),
                    "rank": pa.array([], type=pa.int64()),
                    "sim": pa.array([], type=pa.float64()),
                }
            )
        vm = _normalize_rows(_matrix(g, vector_column))
        ids = np.asarray(g[id_column], dtype=np.int64)
        sub_q = _normalize_rows(qm[qidx])
        sims = vm @ sub_q.T
        out = {"query_id": [], "neighbor_id": [], "rank": [], "sim": []}
        for j, qi in enumerate(qidx):
            col = sims[:, j]
            mask = ids != qids[qi]
            order = np.lexsort((ids[mask], -col[mask]))[:k]
            sel_ids = ids[mask][order]
            sel_sims = col[mask][order]
            out["query_id"].extend([qids[qi]] * len(order))
            out["neighbor_id"].extend(sel_ids)
            out["rank"].extend(range(1, len(order) + 1))
            out["sim"].extend(sel_sims)
        return pa.table(
            {
                "query_id": pa.array(out["query_id"], type=pa.int64()),
                "neighbor_id": pa.array(out["neighbor_id"], type=pa.int64()),
                "rank": pa.array(out["rank"], type=pa.int64()),
                "sim": pa.array(out["sim"], type=pa.float64()),
            }
        )

    return bucketed.groupby("__bucket__").map_groups(search, batch_format="pyarrow")
