"""Product-quantized IVF search (IVFADC, Jegou et al. 2011, "Product
Quantization for Nearest Neighbor Search", IEEE TPAMI).

Not in the reference (mismo's vector module stops at pairwise similarity);
this is the 100 TB scale path for the embedding column: ``ivf_topk`` ships
full float vectors through the groupby shuffle (8*dim bytes/row — 512 B at
dim=64), while IVFADC ships an ``m``-byte uint8 code plus an int64 list id
(~24 B at m=8), a 20-30x shuffle-payload reduction, and searches lists with
per-query lookup-table sums instead of matmuls against full vectors.

Pipeline shape (all streaming, one keyed shuffle):

1. coarse centroids — reuse :func:`mismo_ray.ann.kmeans_centroids`
   (distributed, deterministic hash-sample init);
2. ``pq_train`` — m sub-codebooks trained driver-side on a DETERMINISTIC
   bounded hash-sample of coarse residuals (the standard practice: FAISS
   trains PQ on a sample too; the collect is gated at ``sample`` rows);
3. ``pq_encode`` — one ``map_batches`` pass emitting
   ``(id, __list__, pq_code)``; at 100 TB this output is what you persist
   (write_parquet) so re-searches never touch the raw vectors again;
4. search — ``groupby(__list__).map_groups``: per query an (m x ksub)
   inner-product LUT is built once driver-side and broadcast; scoring a
   list row is ``base + lut[j, code_j].sum()`` — a vectorized uint8 gather,
   no floats from the corpus at all;
5. optional ``refine`` — exact re-rank of the top-``refine`` ADC candidates
   per query by streaming the corpus ONCE with the candidate-id set
   broadcast (bounded at nq x nprobe x refine candidate rows, gated).

Cosine semantics match the rest of the module: vectors and queries are
L2-normalized, so the ADC score ``q . (c_list + decode(code))``
approximates cosine similarity; null/zero embeddings get list sentinel -1
and are never searched.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from mismo_ray._util import hash64


def _sample_rows(
    ds: ray.data.Dataset,
    n: int,
    *,
    id_column: str,
    vector_column: str,
    seed: int,
) -> np.ndarray:
    """The ``n`` corpus rows with the smallest ``hash64(id, seed)`` — a
    deterministic sample independent of partitioning (same pattern as
    ``kmeans_centroids`` init). Driver collect bounded at ``n`` rows."""
    from mismo_ray.ann import _matrix

    def key(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_column], dtype=np.int64)
        h = hash64(ids, seed) if len(ids) else np.zeros(0, dtype=np.uint64)
        vm = _matrix(batch, vector_column)
        # drop null embeddings (zero rows; zero-WIDTH rows in an all-null
        # block) so the sample stays rectangular
        ok = (
            np.linalg.norm(vm, axis=1) > 0
            if vm.size
            else np.zeros(len(ids), dtype=bool)
        )
        h, vm = h[ok], vm[ok]
        if len(h) == 0:
            return pa.table(
                {
                    "h": pa.array([], type=pa.uint64()),
                    "v": pa.array([], type=pa.list_(pa.float64())),
                }
            )
        order = np.argsort(h, kind="stable")[:n]
        return pa.table(
            {
                "h": pa.array(h[order]),
                "v": pa.array(list(vm[order]), type=pa.list_(pa.float64())),
            }
        )

    rows = ds.map_batches(key, batch_format="pyarrow").sort("h").limit(n).take_all()
    if not rows:
        return np.zeros((0, 0), dtype=np.float64)
    return np.array([r["v"] for r in rows], dtype=np.float64)


def _lloyd(x: np.ndarray, ksub: int, iters: int) -> np.ndarray:
    """Plain deterministic Lloyd k-means (L2) on a driver-side sample.
    Init = the first ``ksub`` sample rows (the sample is already in
    deterministic hash order); empty clusters keep their position."""
    n = len(x)
    if n == 0:
        return np.zeros((ksub, x.shape[1] if x.ndim == 2 else 0))
    if n < ksub:
        # tile the sample so every centroid starts somewhere real
        x_init = np.concatenate([x] * (ksub // n + 1), axis=0)[:ksub]
    else:
        x_init = x[:ksub]
    c = x_init.copy()
    for _ in range(iters):
        # argmin ||x - c||^2 = argmax (x.c - ||c||^2/2)
        scores = x @ c.T - 0.5 * (c * c).sum(axis=1)[None, :]
        assign = np.argmax(scores, axis=1)
        for j in np.unique(assign):
            c[j] = x[assign == j].mean(axis=0)
    return c


def pq_train(
    ds: ray.data.Dataset,
    *,
    m: int = 8,
    ksub: int = 256,
    sample: int = 16384,
    iters: int = 10,
    centroids: np.ndarray | None = None,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
    seed: int = 7,
) -> np.ndarray:
    """Train ``m`` product-quantizer sub-codebooks -> (m, ksub, dim/m).

    Trains on L2-normalized vectors; when coarse ``centroids`` are given,
    trains on the coarse RESIDUALS (v - nearest centroid), the IVFADC
    variant — residuals concentrate near 0 so the same ksub codes spend
    their resolution where the list actually lives. Deterministic: the
    training sample is a hash-sample, Lloyd init is sample order.
    """
    from mismo_ray.ann import _normalize_rows

    xs = _sample_rows(
        ds, sample, id_column=id_column, vector_column=vector_column, seed=seed
    )
    if xs.size == 0:
        raise ValueError("pq_train: empty corpus")
    d = xs.shape[1]
    if d % m != 0:
        raise ValueError(f"pq_train: dim {d} not divisible by m={m}")
    xn = _normalize_rows(xs)
    xn = xn[~np.isnan(xn).any(axis=1)]
    if len(xn) == 0:
        raise ValueError("pq_train: all sampled embeddings are null/zero")
    if centroids is not None:
        # normalize caller-supplied centroids: assignment must rank by
        # cosine (matching ivfpq_topk/pq_encode, which normalize the same
        # way so residuals subtract the identical unit centroid)
        cm = _normalize_rows(np.asarray(centroids, dtype=np.float64))
        assign = np.argmax(xn @ cm.T, axis=1)
        xn = xn - cm[assign]
    dsub = d // m
    return np.stack(
        [_lloyd(xn[:, j * dsub : (j + 1) * dsub], ksub, iters) for j in range(m)]
    )


def pq_encode(
    ds: ray.data.Dataset,
    codebooks: np.ndarray,
    *,
    centroids: np.ndarray | None = None,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
    list_column: str = "__list__",
    code_column: str = "pq_code",
) -> ray.data.Dataset:
    """One streaming pass: (id, list id, m-byte code). This projected
    triple is the whole shuffle/storage payload — persist it with
    ``write_parquet`` to make the index reusable across searches.

    Null/zero embeddings get ``list_column = -1`` (never probed)."""
    from mismo_ray.ann import _matrix, _normalize_rows

    cb = np.asarray(codebooks, dtype=np.float64)  # (m, ksub, dsub)
    m, _, dsub = cb.shape
    # per-subspace -||c||^2/2 terms, precomputed once per actor call
    cb_norm = 0.5 * (cb * cb).sum(axis=2)  # (m, ksub)
    cm = (
        None
        if centroids is None
        else _normalize_rows(np.asarray(centroids, dtype=np.float64))
    )
    c_ref = ray.put((cb, cb_norm, cm))

    def encode(batch: pa.Table) -> pa.Table:
        cb, cb_norm, cm = ray.get(c_ref)
        ids = np.asarray(batch[id_column], dtype=np.int64)
        if len(ids) == 0:
            return pa.table(
                {
                    id_column: pa.array([], type=pa.int64()),
                    list_column: pa.array([], type=pa.int64()),
                    code_column: pa.array(
                        [], type=pa.list_(pa.uint8(), m)
                    ),
                }
            )
        vn = _normalize_rows(_matrix(batch, vector_column))
        if vn.shape[1] == 0:
            # ALL-null block decodes to zero-width rows: sentinel list -1,
            # all-zero codes (never probed)
            return pa.table(
                {
                    id_column: pa.array(ids),
                    list_column: pa.array(
                        np.full(len(ids), -1, dtype=np.int64)
                    ),
                    code_column: pa.array(
                        list(np.zeros((len(ids), m), dtype=np.uint8)),
                        type=pa.list_(pa.uint8(), m),
                    ),
                }
            )
        bad = np.isnan(vn).any(axis=1)
        vn = np.where(bad[:, None], 0.0, vn)
        if cm is not None:
            lists = np.argmax(vn @ cm.T, axis=1).astype(np.int64)
            r = vn - cm[lists]
        else:
            lists = np.zeros(len(ids), dtype=np.int64)
            r = vn
        lists[bad] = -1
        codes = np.empty((len(ids), m), dtype=np.uint8)
        for j in range(m):
            rj = r[:, j * dsub : (j + 1) * dsub]
            codes[:, j] = np.argmax(rj @ cb[j].T - cb_norm[j][None, :], axis=1)
        return pa.table(
            {
                id_column: pa.array(ids),
                list_column: pa.array(lists),
                code_column: pa.array(
                    list(codes), type=pa.list_(pa.uint8(), m)
                ),
            }
        )

    return ds.map_batches(encode, batch_format="pyarrow")


def ivfpq_topk(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    *,
    k: int = 10,
    n_centroids: int = 64,
    nprobe: int = 8,
    m: int = 8,
    ksub: int = 256,
    refine: int | None = None,
    iters: int = 10,
    sample: int = 16384,
    centroids: np.ndarray | None = None,
    codebooks: np.ndarray | None = None,
    encoded: ray.data.Dataset | None = None,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
    query_ids: np.ndarray | None = None,
    seed: int = 7,
    max_refine_candidates: int = 2_000_000,
) -> ray.data.Dataset:
    """Approximate cosine top-k via IVFADC: coarse lists + product-quantized
    residual codes + per-query ADC lookup tables, optional exact re-rank.

    ``refine=R`` keeps the top R ADC candidates per (query, list) and
    re-ranks them exactly with ONE extra streaming pass over the corpus
    (candidate-id set broadcast via ``ray.put``; the set is bounded at
    nq x nprobe x R rows and gated by ``max_refine_candidates``). With
    refine, ``sim`` is the exact cosine; without, it is the ADC estimate.

    Pass precomputed ``centroids=``/``codebooks=``/``encoded=`` (from
    :func:`pq_encode`, e.g. read back from parquet) to make the search a
    single groupby over the m-byte codes — the 100 TB re-search path.
    """
    from mismo_ray.ann import _matrix, _normalize_rows, kmeans_centroids

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
    cm = _normalize_rows(np.asarray(centroids, dtype=np.float64))
    if codebooks is None:
        codebooks = pq_train(
            ds,
            m=m,
            ksub=ksub,
            sample=sample,
            iters=iters,
            centroids=cm,
            id_column=id_column,
            vector_column=vector_column,
            seed=seed,
        )
    cb = np.asarray(codebooks, dtype=np.float64)
    m = cb.shape[0]
    dsub = cb.shape[2]
    if encoded is None:
        encoded = pq_encode(
            ds,
            cb,
            centroids=cm,
            id_column=id_column,
            vector_column=vector_column,
        )

    nprobe = min(nprobe, len(cm))
    qsims = qm @ cm.T  # (nq, n_centroids)
    probe = np.argsort(-qsims, axis=1)[:, :nprobe]
    by_list: dict[int, list[int]] = {}
    for qi in range(len(qm)):
        for cid in probe[qi]:
            by_list.setdefault(int(cid), []).append(qi)
    # per-query ADC LUT: lut[qi, j, b] = q_sub_j . codebook[j][b]
    # (nq, m, ksub) float64 — e.g. 100 queries x 8 x 256 = 1.6 MB
    lut = np.einsum("qjd,jbd->qjb", qm.reshape(len(qm), m, dsub), cb)
    keep_n = max(k, refine or 0)
    q_ref = ray.put((qids, by_list, lut, qsims))

    def search(g: pa.Table) -> pa.Table:
        qids, by_list, lut, qsims = ray.get(q_ref)
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
        ids = np.asarray(g[id_column], dtype=np.int64)
        codes = np.asarray(
            g["pq_code"].combine_chunks().values, dtype=np.int64
        ).reshape(len(ids), -1)
        jj = np.arange(codes.shape[1])
        out_q, out_n, out_s = [], [], []
        for qi in qidx:
            # base (q . c_list) + sum_j lut[qi, j, code_j]
            scores = qsims[qi, lid] + lut[qi][jj[None, :], codes].sum(axis=1)
            scores[ids == qids[qi]] = -np.inf
            kk = min(keep_n, len(scores))
            top = np.argpartition(-scores, kk - 1)[:kk] if kk < len(scores) else np.arange(len(scores))
            ok = scores[top] > -np.inf
            top = top[ok]
            out_q.append(np.full(len(top), qids[qi], dtype=np.int64))
            out_n.append(ids[top])
            out_s.append(scores[top])
        if not out_q:
            return empty
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "neighbor_id": pa.array(np.concatenate(out_n)),
                "sim": pa.array(np.concatenate(out_s), type=pa.float64()),
            }
        )

    candidates = encoded.groupby("__list__").map_groups(
        search, batch_format="pyarrow"
    )

    if refine:
        cand_tbl = candidates.select_columns(["query_id", "neighbor_id"])
        n_cand = cand_tbl.count()
        if n_cand > max_refine_candidates:
            raise ValueError(
                f"ivfpq_topk: {n_cand} refine candidates exceed "
                f"max_refine_candidates={max_refine_candidates}; lower "
                "refine/nprobe or raise the gate"
            )
        rows = cand_tbl.take_all()  # bounded: <= nq * nprobe * refine
        want: dict[int, list[int]] = {}
        qpos = {int(q): i for i, q in enumerate(qids)}
        for r in rows:
            want.setdefault(int(r["neighbor_id"]), []).append(
                qpos[int(r["query_id"])]
            )
        w_ref = ray.put((want, qm, qids))

        def exact(batch: pa.Table) -> pa.Table:
            want, qm, qids = ray.get(w_ref)
            ids = np.asarray(batch[id_column], dtype=np.int64)
            empty = pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "neighbor_id": pa.array([], type=pa.int64()),
                    "sim": pa.array([], type=pa.float64()),
                }
            )
            if len(ids) == 0:
                return empty
            hit = np.array([i in want for i in ids.tolist()], dtype=bool)
            if not hit.any():
                return empty
            vn = _normalize_rows(_matrix(batch, vector_column))[hit]
            hids = ids[hit]
            oq, on, os_ = [], [], []
            for row, nid in enumerate(hids.tolist()):
                qis = want[nid]
                s = qm[qis] @ vn[row]
                good = ~np.isnan(s)
                oq.append(qids[np.asarray(qis)[good]])
                on.append(np.full(int(good.sum()), nid, dtype=np.int64))
                os_.append(s[good])
            return pa.table(
                {
                    "query_id": pa.array(np.concatenate(oq)),
                    "neighbor_id": pa.array(np.concatenate(on)),
                    "sim": pa.array(np.concatenate(os_), type=pa.float64()),
                }
            )

        candidates = ds.map_batches(exact, batch_format="pyarrow")

    def merge(g: pa.Table) -> pa.Table:
        sims = np.asarray(g["sim"], dtype=np.float64)
        nids = np.asarray(g["neighbor_id"], dtype=np.int64)
        # a neighbor can arrive from several probed lists (ADC path) or
        # batches (refine path) — dedupe before ranking
        _, first = np.unique(nids, return_index=True)
        sims, nids = sims[first], nids[first]
        order = np.lexsort((nids, -sims))[:k]
        return pa.table(
            {
                "query_id": g["query_id"].take(
                    pa.array(first[order], type=pa.int64())
                ),
                "neighbor_id": pa.array(nids[order]),
                "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
                "sim": pa.array(sims[order]),
            }
        )

    return candidates.groupby("query_id").map_groups(merge, batch_format="pyarrow")
