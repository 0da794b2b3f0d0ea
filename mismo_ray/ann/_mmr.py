"""MMR (maximal marginal relevance) diverse top-k selection.

The eval-set / demonstration-pool curation primitive: pick ``k`` items
that are RELEVANT to a query embedding but not redundant with each other
(Carbonell & Goldstein 1998) — score(x) = lambda * cos(q, x) -
(1 - lambda) * max_{s in selected} cos(x, s), greedily argmaxed.

Scale shape: the corpus-wide stage is one stateless ``map_batches`` pass
computing query relevance and keeping only each block's top ``pool_n``
(id, rel) rows — the greedy refinement then runs on the driver over the
global top-``pool_n`` pool only (its embeddings fetched with one
``broadcast_isin`` filter pass; ``pool_n x dim`` doubles, a few MB at
curation sizes). The greedy loop is inherently sequential in k, so
bounding it to a relevance pool is the standard practice — at 100 TB the
corpus pass is the only part that touches every row.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from mismo_ray.ann import _matrix, _normalize_rows


def _collect_batches(d: ray.data.Dataset) -> pa.Table | None:
    """Arrow-native bounded collect (no python row-dict round trip)."""
    batches = list(d.iter_batches(batch_format="pyarrow"))
    return pa.concat_tables(batches) if batches else None


def kcenter_select(
    ds: ray.data.Dataset,
    *,
    k: int = 10,
    pool_n: int = 1000,
    seed: int = 0,
    column: str = "embedding",
    id_column: str = "vec_id",
) -> pa.Table:
    """Greedy k-center (farthest-point) diverse selection — the QUERY-FREE
    sibling of :func:`mmr_select`: pick ``k`` items maximizing pairwise
    spread (each pick minimizes its max cosine to the already-selected
    set), the coreset / probe-set sampling primitive.

    Since there is no relevance to pool by, the candidate pool is a
    DETERMINISTIC pseudo-random sample: the ``pool_n`` smallest
    ``splitmix64(id + seed)`` ranks — a pure (id, seed) function any
    engine can reproduce exactly (the repo-wide sampling pattern). The
    first pick is the pool's min id; each next pick is the pool item with
    the smallest max-similarity to the selected set (scores rounded to 12
    decimals; ties to min id). Null and zero-norm embeddings never enter
    the pool. Returns ``(rank, <id_column>)``.
    """
    from mismo_ray._util import splitmix64

    if k <= 0 or pool_n <= 0:
        raise ValueError("k and pool_n must be positive")

    def _rank_topn(ids: np.ndarray) -> np.ndarray:
        """THE pool-ranking rule, shared by the per-block sample and the
        global merge (diverging copies would break partition invariance):
        pool_n smallest (splitmix64(id + seed), id) keys, duplicate ids
        dropped (same id -> same rank -> adjacent after the sort)."""
        with np.errstate(over="ignore"):
            rk = splitmix64(
                (ids.astype(np.int64) + np.int64(seed)).astype(np.uint64)
            )
        order = np.lexsort((ids, rk))
        srt = ids[order]
        first = np.concatenate(([True], srt[1:] != srt[:-1]))
        return srt[first][:pool_n]

    def block_sample(t: pa.Table) -> pa.Table:
        m = _matrix(t, column)
        norms = np.linalg.norm(m, axis=1)
        ok = np.isfinite(norms) & (norms > 0)
        ids = np.asarray(t[id_column].to_numpy(zero_copy_only=False))[ok]
        if len(ids) == 0:
            return pa.table({id_column: pa.array([], type=pa.int64())})
        return pa.table(
            {id_column: pa.array(_rank_topn(ids), type=pa.int64())}
        )

    cand = _collect_batches(
        ds.map_batches(block_sample, batch_format="pyarrow")
    )
    empty = pa.table(
        {
            "rank": pa.array([], type=pa.int64()),
            id_column: pa.array([], type=pa.int64()),
        }
    )
    if cand is None or len(cand) == 0:
        return empty
    ids = _rank_topn(
        np.asarray(cand[id_column].to_numpy(zero_copy_only=False))
    )

    from mismo_ray._joins import broadcast_isin

    pool_rows = _collect_batches(
        broadcast_isin(
            ds.select_columns([id_column, column]), id_column, set(ids.tolist())
        )
    )
    pid = np.asarray(pool_rows[id_column].to_numpy(zero_copy_only=False))
    pemb = _normalize_rows(_matrix(pool_rows, column))
    pos = {int(v): i for i, v in enumerate(pid)}
    emb = pemb[[pos[int(v)] for v in ids]]
    # id order makes the min-id tie rule a plain first-argmin
    id_order = np.argsort(ids)
    ids, emb = ids[id_order], emb[id_order]

    k = min(k, len(ids))
    n = len(ids)
    selected = np.zeros(n, dtype=bool)
    max_sim = np.full(n, -np.inf)
    out_id = []
    for step in range(k):
        if step == 0:
            pick = 0  # min id of the pool
        else:
            score = np.round(max_sim, 12)
            score[selected] = np.inf
            pick = int(np.argmin(score))  # first (=min-id) argmin
        selected[pick] = True
        out_id.append(int(ids[pick]))
        max_sim = np.maximum(max_sim, emb @ emb[pick])
    return pa.table(
        {
            "rank": pa.array(np.arange(k), type=pa.int64()),
            id_column: pa.array(out_id, type=pa.int64()),
        }
    )


def mmr_select(
    ds: ray.data.Dataset,
    query,
    *,
    k: int = 10,
    pool_n: int = 1000,
    lambda_: float = 0.5,
    column: str = "embedding",
    id_column: str = "vec_id",
) -> pa.Table:
    """Greedy MMR over the top-``pool_n`` relevance pool.

    Returns a small arrow table ``(rank, <id_column>)`` — rank 0 is the
    most relevant item, each further rank the pool item maximizing
    ``lambda * rel - (1 - lambda) * max-sim-to-selected`` (ties broken by
    min id). Null embeddings never enter the pool. ``k`` is clamped to
    the pool size.
    """
    if not 0.0 <= lambda_ <= 1.0:
        raise ValueError(f"lambda_ must be in [0, 1], got {lambda_}")
    if k <= 0 or pool_n <= 0:
        raise ValueError("k and pool_n must be positive")
    q = np.asarray(query, dtype=np.float64).reshape(-1)
    qn = np.linalg.norm(q)
    if qn == 0 or not np.isfinite(qn):
        raise ValueError("query embedding has zero or non-finite norm")
    q = q / qn

    # the corpus-wide stage IS brute_force_topk: per-block tie-stable
    # relevance top-pool_n, merged globally by (sim desc, id asc) — the
    # machinery (and its tie rule) lives in exactly one place
    from mismo_ray.ann import brute_force_topk

    cand = _collect_batches(
        brute_force_topk(
            ds,
            q[None, :],
            k=pool_n,
            id_column=id_column,
            vector_column=column,
            exclude_self=False,
        )
    )
    empty = pa.table(
        {
            "rank": pa.array([], type=pa.int64()),
            id_column: pa.array([], type=pa.int64()),
        }
    )
    if cand is None or len(cand) == 0:
        return empty
    ids = np.asarray(cand["neighbor_id"].to_numpy(zero_copy_only=False))
    rel = np.asarray(cand["sim"].to_numpy(zero_copy_only=False))
    ok = np.isfinite(rel)  # null/zero embeddings surface as nan sims
    ids, rel = ids[ok], rel[ok]
    if len(ids) == 0:
        return empty
    order = np.lexsort((ids, -rel))
    ids, rel = ids[order], rel[order]
    # duplicate ids (duplicate input rows surface once per block) carry
    # identical rel, hence sort adjacent: keep the first so no id can be
    # selected at two ranks (the oracle's NOT IN removes all copies)
    first = np.concatenate(([True], ids[1:] != ids[:-1]))
    ids, rel = ids[first], rel[first]

    # fetch the pool's embeddings (bounded: pool_n x dim doubles)
    from mismo_ray._joins import broadcast_isin

    pool_rows = _collect_batches(
        broadcast_isin(
            ds.select_columns([id_column, column]), id_column, set(ids.tolist())
        )
    )
    pid = np.asarray(pool_rows[id_column].to_numpy(zero_copy_only=False))
    pemb = _normalize_rows(_matrix(pool_rows, column))
    # align pool embeddings to the (rel-sorted) candidate order
    pos = {int(v): i for i, v in enumerate(pid)}
    emb = pemb[[pos[int(v)] for v in ids]]

    k = min(k, len(ids))
    n = len(ids)
    selected = np.zeros(n, dtype=bool)
    max_sim = np.full(n, -np.inf)
    out_rank, out_id = [], []
    for step in range(k):
        if step == 0:
            score = rel.copy()
        else:
            score = lambda_ * rel - (1.0 - lambda_) * max_sim
        # round to 12 decimals before the argmax: candidates whose TRUE
        # scores are equal (e.g. rel == sim when the query coincides with
        # a selected item) would otherwise be ranked by ~1e-16 float noise
        # that differs between computation routes; after rounding, equal
        # scores tie and the min-id rule below decides deterministically
        score = np.round(score, 12)
        score[selected] = -np.inf
        best = score.max()
        tied = np.flatnonzero(score == best)
        pick = tied[np.argmin(ids[tied])]
        selected[pick] = True
        out_rank.append(step)
        out_id.append(int(ids[pick]))
        sims = emb @ emb[pick]
        max_sim = np.maximum(max_sim, sims)
    return pa.table(
        {
            "rank": pa.array(out_rank, type=pa.int64()),
            id_column: pa.array(out_id, type=pa.int64()),
        }
    )
