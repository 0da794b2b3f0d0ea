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

from mismo_ray._util import hash64, splitmix64


def _matrix(batch: pa.Table, column: str) -> np.ndarray:
    arr = batch[column]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    flat = np.asarray(arr.values, dtype=np.float64)
    if arr.null_count:
        # null embedding rows: zero vectors (zero norm -> nan cosine via
        # _normalize_rows -> never ranked into a top-k)
        valid = ~np.asarray(arr.is_null())
        n_valid = int(valid.sum())
        if pa.types.is_fixed_size_list(arr.type):
            m = flat.reshape(n, -1)
            m[~valid] = 0.0
            return m
        d = len(flat) // n_valid if n_valid else 0
        out = np.zeros((n, d), dtype=np.float64)
        if d:
            out[valid] = flat.reshape(n_valid, d)
        return out
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
        kk = min(k + (1 if exclude_self else 0), len(ids))
        nq = sims.shape[1]
        if kk < len(ids):
            # tie-STABLE per-block cutoff: an argpartition would keep an
            # arbitrary subset of sim-tied candidates at the boundary
            # (exact-duplicate embeddings make such ties routine), so which
            # ids reach the global merge would depend on the partition
            # layout and diverge from the documented min-id rule. One
            # lexsort per query column keeps (sim desc, id asc) exactly;
            # the queries matrix is small by contract, so q * n log n per
            # block is fine.
            top = np.empty((kk, nq), dtype=np.int64)
            for j in range(nq):
                top[:, j] = np.lexsort((ids, -sims[:, j]))[:kk]
        else:
            top = np.tile(np.arange(len(ids))[:, None], (1, nq))
        qj = np.tile(np.arange(nq), top.shape[0])
        ni = top.ravel()
        keep = np.ones(len(ni), dtype=bool)
        if exclude_self:
            keep = ids[ni] != qids[qj]
        return pa.table(
            {
                "query_id": pa.array(qids[qj][keep], type=pa.int64()),
                "neighbor_id": pa.array(ids[ni][keep], type=pa.int64()),
                "sim": pa.array(sims[ni, qj][keep], type=pa.float64()),
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
    right: ray.data.Dataset | None = None,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
    chunk_rows: int = 8192,
) -> ray.data.Dataset:
    """All pairs with cosine >= tau. EXACT and fully distributed — nothing
    is collected to the driver. ``right=None`` (or ``right is ds``): dedupe
    task, unordered pairs (id_l < id_r) within one corpus. Otherwise: link
    task, (left id, right id) pairs across the two corpora, sides preserved.

    Block-nested-loop theta join (the 1-Bucket-Theta shape): rows are hashed
    into ceil(n / chunk_rows) chunks per side; each row is replicated into
    the chunk-pair groups it participates in; one keyed shuffle; each reduce
    task holds exactly two chunks (<= 2*chunk_rows*dim*8 bytes) and computes
    the cross/triangle cosine with a tiled matmul (bounded scratch memory).

    Cost is inherent to exact all-pairs: n*K rows shuffled, K_l*K_r tasks.
    For corpora where that is infeasible use ``lsh_threshold_pairs``
    (approximate, near-linear) — this exact path is the oracle/baseline.
    """
    link = right is not None and right is not ds
    narrow = ds.select_columns([id_column, vector_column])
    n = narrow.count()
    KL = max(1, -(-n // chunk_rows))
    if link:
        narrow_r = right.select_columns([id_column, vector_column])
        KR = max(1, -(-narrow_r.count() // chunk_rows))
    else:
        KR = KL

    def expand(side: int):
        # dedupe: replicate each row once per partner chunk, group id =
        # canonical (min,max) chunk pair so every unordered row pair lands
        # in exactly one group. link: left rows fan out over right chunks
        # and vice versa, group id = left_chunk * KR + right_chunk.
        def fn(batch: pa.Table) -> pa.Table:
            ids = batch[id_column].combine_chunks().cast(pa.int64())
            m = len(batch)
            K_own = KL if side == 0 else KR
            K_other = KR if side == 0 else KL
            chunk = (hash64(ids) % np.uint64(K_own)).astype(np.int64)
            take_idx = np.repeat(np.arange(m, dtype=np.int64), K_other)
            c = np.repeat(chunk, K_other)
            p = np.tile(np.arange(K_other, dtype=np.int64), m)
            if not link:
                grp = np.where(c < p, c * KR + p, p * KR + c)
            elif side == 0:
                grp = c * KR + p
            else:
                grp = p * KR + c
            rep = batch.take(pa.array(take_idx))
            return (
                rep.append_column(
                    "__side__", pa.array(np.full(len(c), side, dtype=np.int64))
                )
                .append_column("__chunk__", pa.array(c))
                .append_column("__pg__", pa.array(grp))
            )

        return fn

    expanded = narrow.map_batches(expand(0), batch_format="pyarrow")
    if link:
        expanded = expanded.union(
            narrow_r.map_batches(expand(1), batch_format="pyarrow")
        )

    def pairs_in_group(g: pa.Table, *, tile: int = 1024) -> pa.Table:
        ids = np.asarray(g[id_column], dtype=np.int64)
        chunks = np.asarray(g["__chunk__"], dtype=np.int64)
        sides = np.asarray(g["__side__"], dtype=np.int64)
        vm = _normalize_rows(_matrix(g, vector_column))
        # the chunk pair is encoded in the group id (NOT inferred from the
        # chunks present — a cross group whose partner chunk is empty must
        # not degenerate into a second triangle over the present chunk)
        pgid = int(g["__pg__"][0].as_py())
        c1, c2 = pgid // KR, pgid % KR
        out_l: list[np.ndarray] = []
        out_r: list[np.ndarray] = []

        def emit(ai, bi, same):
            if not (len(ai) and len(bi)):
                return
            # tiled matmul: bounded scratch even with large chunks
            for s in range(0, len(ai), tile):
                a_idx = ai[s : s + tile]
                sims = vm[a_idx] @ vm[bi].T
                ii, jj = np.nonzero(sims >= tau)
                a, b_ = ids[a_idx[ii]], ids[bi[jj]]
                if same:
                    keep = a < b_
                    a, b_ = a[keep], b_[keep]
                elif not link:
                    keep = a != b_
                    a, b_ = a[keep], b_[keep]
                    swap = a > b_
                    a, b_ = np.where(swap, b_, a), np.where(swap, a, b_)
                out_l.append(a)
                out_r.append(b_)

        if link:
            emit(
                np.flatnonzero((sides == 0) & (chunks == c1)),
                np.flatnonzero((sides == 1) & (chunks == c2)),
                same=False,
            )
        elif c1 == c2:
            idx = np.flatnonzero(chunks == c1)
            emit(idx, idx, same=True)
        else:
            emit(np.flatnonzero(chunks == c1), np.flatnonzero(chunks == c2), same=False)
        l = np.concatenate(out_l) if out_l else np.array([], dtype=np.int64)
        r = np.concatenate(out_r) if out_r else np.array([], dtype=np.int64)
        return pa.table(
            {
                "record_id_l": pa.array(l, type=pa.int64()),
                "record_id_r": pa.array(r, type=pa.int64()),
            }
        )

    return expanded.groupby("__pg__").map_groups(
        pairs_in_group, batch_format="pyarrow"
    )


def lsh_threshold_pairs(
    ds: ray.data.Dataset,
    *,
    tau: float,
    right: ray.data.Dataset | None = None,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
    bits_per_band: int = 8,
    n_bands: int = 8,
    max_pairs: int | None = 5_000_000,
    seed: int = 7,
) -> ray.data.Dataset:
    """Approximate cosine >= tau pairs, near-linear: banded random-hyperplane
    LSH candidates -> exact cosine verify. ``right=None``: dedupe task
    (unordered in-corpus pairs); otherwise link task — both corpora bucketed
    with the SAME seeded hyperplanes, cross-side candidates only.

    A pair is a candidate when ALL bits of SOME band agree:
    P(candidate) = 1 - (1 - (1 - theta/pi)^bits_per_band)^n_bands, theta =
    arccos(cos sim). Candidate generation reuses the salted pair-gen core
    (UnnestLinker over the per-row band keys — inherits hot-bucket dropping +
    salting), so no bucket ever exceeds one task's memory; the verify joins
    the two vectors back per pair and computes a row-wise dot (einsum). This
    is the 100 TB path; ``cosine_threshold_pairs`` is the exact baseline.
    """
    from mismo_ray.linker._unnest import UnnestLinker

    total_bits = bits_per_band * n_bands
    narrow = ds.select_columns([id_column, vector_column])

    def with_rid(t: pa.Table) -> pa.Table:
        rid = t[id_column].combine_chunks().cast(pa.int64())
        if id_column == "record_id":
            return t.set_column(t.schema.get_field_index("record_id"), "record_id", rid)
        return t.append_column("record_id", rid)

    recs = narrow.map_batches(with_rid, batch_format="pyarrow")
    recs_r = (
        right.select_columns([id_column, vector_column]).map_batches(
            with_rid, batch_format="pyarrow"
        )
        if right is not None and right is not ds
        else recs
    )

    def band_keys(batch: pa.Table) -> pa.Array:
        vm = _matrix(batch, vector_column)
        dim = vm.shape[1] if vm.size else 1
        planes = random_hyperplanes(dim, total_bits, seed)
        if not len(vm):
            return pa.array([], type=pa.list_(pa.int64()))
        bits = (vm @ planes.T) > 0  # (n, total_bits)
        keys = np.empty((len(vm), n_bands), dtype=np.int64)
        for b in range(n_bands):
            seg = bits[:, b * bits_per_band : (b + 1) * bits_per_band]
            w = 1 << np.arange(bits_per_band, dtype=np.int64)
            keys[:, b] = (seg.astype(np.int64) @ w) | (b << 56)
        return pa.array(keys.tolist(), type=pa.list_(pa.int64()))

    band_keys.__name__ = "hyperplane_bands"
    linkage = UnnestLinker(band_keys, max_pairs=max_pairs)(recs, recs_r)
    cand = linkage.links.with_both([vector_column], [vector_column])

    def verify(t: pa.Table) -> pa.Table:
        a = _normalize_rows(_matrix(t, f"{vector_column}_l"))
        b = _normalize_rows(_matrix(t, f"{vector_column}_r"))
        sims = np.einsum("ij,ij->i", a, b) if len(a) else np.array([])
        return t.filter(pa.array(sims >= tau)).select(
            ["record_id_l", "record_id_r"]
        )

    return cand.map_batches(verify, batch_format="pyarrow")


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
        sub_qids = qids[qidx]
        sub_q = _normalize_rows(qm[qidx])
        sims = vm @ sub_q.T  # (n, q)
        # self-matches to -inf, then one argpartition over the whole matrix
        # + one grouped lexsort — no python per query (mirrors brute_force)
        sims[ids[:, None] == sub_qids[None, :]] = -np.inf
        n, q = sims.shape
        kk = min(k + 1, n)  # +1 headroom: a selected self slot is dropped
        if kk < n:
            top = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (kk, q)
        else:
            top = np.tile(np.arange(n)[:, None], (1, q))
        qcol = np.repeat(np.arange(q), kk)
        ni = top.T.ravel()  # grouped per query
        ssel = sims[ni, qcol]
        isel = ids[ni]
        order = np.lexsort((isel, -ssel, qcol))
        ssel, isel, qcol = ssel[order], isel[order], qcol[order]
        rank = np.arange(len(ssel), dtype=np.int64) % kk + 1
        keep = (ssel > -np.inf) & (rank <= k)
        return pa.table(
            {
                "query_id": pa.array(sub_qids[qcol[keep]], type=pa.int64()),
                "neighbor_id": pa.array(isel[keep], type=pa.int64()),
                "rank": pa.array(rank[keep], type=pa.int64()),
                "sim": pa.array(ssel[keep], type=pa.float64()),
            }
        )

    return bucketed.groupby("__bucket__").map_groups(search, batch_format="pyarrow")


# ------------------------------------------------------------------- IVF
def kmeans_centroids(
    ds: ray.data.Dataset,
    *,
    n_centroids: int = 64,
    iters: int = 10,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
    seed: int = 7,
) -> np.ndarray:
    """Deterministic distributed Lloyd k-means over an embedding column.

    Init: the ``n_centroids`` rows with the smallest ``hash64(id, seed)``
    (a deterministic corpus sample independent of partitioning). Each
    iteration is one ``map_batches`` pass emitting per-batch partial sums
    (one row per non-empty centroid per batch: sum-vector + count) and a
    tiny driver-side reduce — the classic map-side-combine k-means; the
    driver never sees more than blocks x centroids partials. Empty
    centroids keep their previous position. Vectors are L2-normalized
    (cosine/spherical k-means) to match the cosine search path.
    """
    # ---- deterministic init: n_centroids smallest-hash rows
    def sample_key(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_column], dtype=np.int64)
        h = hash64(ids, seed)
        vm = _matrix(batch, vector_column)
        # null embeddings decode to zero vectors (and an all-null block to
        # zero-width ones) — they must not seed centroids
        ok = (
            np.linalg.norm(vm, axis=1) > 0
            if vm.size
            else np.zeros(len(ids), dtype=bool)
        )
        h, vm = h[ok], vm[ok]
        if len(h) == 0:
            return pa.table(
                {"h": pa.array([], type=pa.uint64()), "v": pa.array([], type=pa.list_(pa.float64()))}
            )
        order = np.argsort(h)[:n_centroids]
        return pa.table(
            {
                "h": pa.array(h[order]),
                "v": pa.array(list(vm[order]), type=pa.list_(pa.float64())),
            }
        )

    top = ds.map_batches(sample_key, batch_format="pyarrow").sort("h").limit(n_centroids)
    init_rows = top.take_all()
    cm = _normalize_rows(np.array([r["v"] for r in init_rows], dtype=np.float64))

    for _ in range(iters):
        c_ref = ray.put(cm)

        def partials(batch: pa.Table) -> pa.Table:
            c = ray.get(c_ref)
            vm = _matrix(batch, vector_column)
            # vm.size == 0 also covers an ALL-null block, which decodes to
            # zero-WIDTH rows that would break the matmul
            if vm.size == 0:
                return pa.table(
                    {
                        "cid": pa.array([], type=pa.int64()),
                        "s": pa.array([], type=pa.list_(pa.float64())),
                        "n": pa.array([], type=pa.int64()),
                    }
                )
            vn = _normalize_rows(vm)
            ok = ~np.isnan(vn).any(axis=1)
            vn = vn[ok]
            assign = np.argmax(vn @ c.T, axis=1)
            cids = np.unique(assign)
            sums = np.zeros((len(cids), vn.shape[1]), dtype=np.float64)
            counts = np.zeros(len(cids), dtype=np.int64)
            pos = np.searchsorted(cids, assign)
            np.add.at(sums, pos, vn)
            np.add.at(counts, pos, 1)
            return pa.table(
                {
                    "cid": pa.array(cids.astype(np.int64)),
                    "s": pa.array(list(sums), type=pa.list_(pa.float64())),
                    "n": pa.array(counts),
                }
            )

        rows = ds.map_batches(partials, batch_format="pyarrow").take_all()
        sums = np.zeros_like(cm)
        counts = np.zeros(len(cm), dtype=np.int64)
        for r in rows:
            sums[r["cid"]] += np.asarray(r["s"], dtype=np.float64)
            counts[r["cid"]] += r["n"]
        live = counts > 0
        new = cm.copy()
        new[live] = sums[live] / counts[live, None]
        cm = _normalize_rows(new)
    return cm


def ivf_topk(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    *,
    k: int = 10,
    n_centroids: int = 64,
    nprobe: int = 8,
    iters: int = 10,
    centroids: np.ndarray | None = None,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
    query_ids: np.ndarray | None = None,
    seed: int = 7,
) -> ray.data.Dataset:
    """Approximate cosine top-k via an IVF (inverted-file) index: corpus
    rows are assigned to their nearest k-means centroid, each query is
    searched exactly against its ``nprobe`` nearest lists only.

    The scale path when hyperplane LSH recall is too bucket-lucky: cost per
    query ~ nprobe/n_centroids of the corpus, recall rises smoothly with
    nprobe. One shuffle (groupby list), centroids broadcast via ``ray.put``;
    at 100 TB pass precomputed ``centroids=`` (train on a sample) so
    indexing is a single assignment pass.
    """
    qm = _normalize_rows(np.asarray(queries, dtype=np.float64))
    qids = (
        np.arange(len(qm), dtype=np.int64)
        if query_ids is None
        else np.asarray(query_ids, dtype=np.int64)
    )
    if centroids is None:
        centroids = kmeans_centroids(
            ds,
            n_centroids=n_centroids,
            iters=iters,
            id_column=id_column,
            vector_column=vector_column,
            seed=seed,
        )
    # caller-supplied centroids may be raw means / float32-rounded unit
    # vectors; normalize so assignment and probe rank by COSINE (matching
    # the learned spherical-k-means path and the SQL oracle), not dot
    cm = _normalize_rows(np.asarray(centroids, dtype=np.float64))
    nprobe = min(nprobe, len(cm))
    # queries -> nprobe nearest lists (tiny driver-side matmul)
    qsims = qm @ cm.T
    probe = np.argsort(-qsims, axis=1)[:, :nprobe]  # (q, nprobe)
    by_list: dict[int, list[int]] = {}
    for qi in range(len(qm)):
        for cid in probe[qi]:
            by_list.setdefault(int(cid), []).append(qi)
    q_ref = ray.put((qm, qids, by_list))
    c_ref = ray.put(cm)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(c_ref)
        vm = _normalize_rows(_matrix(batch, vector_column))
        if len(vm) == 0:
            return batch.append_column("__list__", pa.array([], type=pa.int64()))
        if vm.shape[1] == 0:
            # ALL-null block: zero-width rows — park them in sentinel list
            # -1 (no query ever probes it)
            return batch.append_column(
                "__list__", pa.array(np.full(len(vm), -1, dtype=np.int64))
            )
        sims = np.where(np.isnan(vm), 0.0, vm) @ c.T
        return batch.append_column(
            "__list__", pa.array(np.argmax(sims, axis=1).astype(np.int64))
        )

    listed = ds.map_batches(assign, batch_format="pyarrow")

    def search(g: pa.Table) -> pa.Table:
        qm, qids, by_list = ray.get(q_ref)
        empty = pa.table(
            {
                "query_id": pa.array([], type=pa.int64()),
                "neighbor_id": pa.array([], type=pa.int64()),
                "sim": pa.array([], type=pa.float64()),
            }
        )
        lid = int(g["__list__"][0].as_py())
        qidx = by_list.get(lid, [])
        if not qidx:
            return empty
        vm = _normalize_rows(_matrix(g, vector_column))
        ids = np.asarray(g[id_column], dtype=np.int64)
        sub_qids = qids[qidx]
        sims = vm @ qm[qidx].T  # (n, q)
        sims[ids[:, None] == sub_qids[None, :]] = -np.inf
        n, q = sims.shape
        kk = min(k, n)
        if kk < n:
            topi = np.argpartition(-sims, kk - 1, axis=0)[:kk]
        else:
            topi = np.tile(np.arange(n)[:, None], (1, q))
        qj = np.tile(np.arange(q), topi.shape[0])
        ni = topi.ravel()
        ssel = sims[ni, qj]
        keep = ssel > -np.inf
        return pa.table(
            {
                "query_id": pa.array(sub_qids[qj[keep]], type=pa.int64()),
                "neighbor_id": pa.array(ids[ni[keep]], type=pa.int64()),
                "sim": pa.array(ssel[keep], type=pa.float64()),
            }
        )

    candidates = listed.groupby("__list__").map_groups(search, batch_format="pyarrow")

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


from mismo_ray.ann._pq import ivfpq_topk, pq_encode, pq_train  # noqa: E402
from mismo_ray.ann._mmr import kcenter_select, mmr_select  # noqa: E402
