"""ANN / embedding near-dup: the distributed exact chunk-pair join must
reproduce numpy brute force (incl. with many chunks — the no-driver-collect
scale path), and the LSH variant must be a high-recall subset of it."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from tests.conftest import rows_set


def _corpus(n: int, dim: int = 16, seed: int = 3, dup_frac: float = 0.2):
    """Random unit-ish vectors; a fraction are small perturbations of an
    earlier row (planted near-duplicates)."""
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n, dim))
    n_dup = int(n * dup_frac)
    src = rng.integers(0, n - n_dup, size=n_dup)
    m[n - n_dup :] = m[src] + 0.05 * rng.standard_normal((n_dup, dim))
    ids = np.arange(n, dtype=np.int64)
    return ids, m


def _brute_pairs(ids: np.ndarray, m: np.ndarray, tau: float) -> set:
    norm = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = norm @ norm.T
    ii, jj = np.nonzero(sims >= tau)
    return {(int(ids[i]), int(ids[j])) for i, j in zip(ii, jj) if ids[i] < ids[j]}


def _ds(ids, m) -> ray.data.Dataset:
    tbl = pa.table(
        {
            "vec_id": pa.array(ids, type=pa.int64()),
            "embedding": pa.array(
                m.tolist(), type=pa.list_(pa.float64(), m.shape[1])
            ),
        }
    )
    return ray.data.from_arrow(tbl).repartition(4)


@pytest.mark.parametrize("chunk_rows", [10_000, 37])  # one chunk / many chunks
def test_cosine_threshold_pairs_exact(ray_session, chunk_rows):
    from mismo_ray.ann import cosine_threshold_pairs

    ids, m = _corpus(240)
    expected = _brute_pairs(ids, m, 0.9)
    assert expected  # planted dups guarantee a non-trivial answer
    got = rows_set(
        cosine_threshold_pairs(
            _ds(ids, m), tau=0.9, chunk_rows=chunk_rows
        ),
        ["record_id_l", "record_id_r"],
    )
    assert got == expected


def test_cosine_threshold_pairs_tiling(ray_session):
    """Tiny matmul tile: the tiled inner loop must not change the result."""
    from mismo_ray.ann import cosine_threshold_pairs

    ids, m = _corpus(150, seed=9)
    expected = _brute_pairs(ids, m, 0.85)
    # chunk_rows=64 -> 3 chunks; default tile (1024) > chunk size exercises
    # the single-tile path; chunk_rows interplay covered above
    got = rows_set(
        cosine_threshold_pairs(_ds(ids, m), tau=0.85, chunk_rows=64),
        ["record_id_l", "record_id_r"],
    )
    assert got == expected


def test_lsh_threshold_pairs_subset_and_recall(ray_session):
    from mismo_ray.ann import lsh_threshold_pairs

    ids, m = _corpus(300, dup_frac=0.3)
    exact = _brute_pairs(ids, m, 0.95)
    assert len(exact) >= 30
    got = rows_set(
        lsh_threshold_pairs(
            _ds(ids, m), tau=0.95, bits_per_band=4, n_bands=16
        ),
        ["record_id_l", "record_id_r"],
    )
    # verify stage makes it a subset; banded LSH at these settings has
    # near-1 recall for cos >= 0.95 (theta <= 18deg: P(band) ~ (1-0.1)^4 ~ .65,
    # P(any of 16) ~ 1-4e-8)
    assert got <= exact
    assert len(got) >= 0.95 * len(exact)


def test_embedding_neardup_methods_agree(ray_session):
    from mismo_ray.dedupe import embedding_neardup_pairs

    ids, m = _corpus(200, dup_frac=0.25, seed=5)
    ds = _ds(ids, m)
    exact = rows_set(
        embedding_neardup_pairs(
            ds, tau=0.95, id_column="vec_id", method="exact", chunk_rows=50
        ).links_ds,
        ["record_id_l", "record_id_r"],
    )
    lsh = rows_set(
        embedding_neardup_pairs(
            ds, tau=0.95, id_column="vec_id", method="lsh",
            bits_per_band=4, n_bands=16,
        ).links_ds,
        ["record_id_l", "record_id_r"],
    )
    assert exact == _brute_pairs(ids, m, 0.95)
    assert lsh <= exact


def test_ivf_topk_recall(ray_session):
    from mismo_ray.ann import brute_force_topk, ivf_topk

    ids, m = _corpus(600, dim=8, seed=13, dup_frac=0.3)
    ds = _ds(ids, m)
    queries = m[:40]
    qids = ids[:40]
    exact = brute_force_topk(
        ds, queries, k=5, id_column="vec_id", query_ids=qids
    ).take_all()
    approx = ivf_topk(
        ds, queries, k=5, n_centroids=16, nprobe=6, id_column="vec_id",
        query_ids=qids,
    ).take_all()
    def tops(rows):
        out = {}
        for r in rows:
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out
    te, ta = tops(exact), tops(approx)
    # includes self (exclude_self False in ivf path): compare overlap on the
    # exact sets minus self
    hits = total = 0
    for q, e in te.items():
        a = ta.get(q, set())
        hits += len(e & a)
        total += len(e)
    recall = hits / total
    assert recall >= 0.7, recall
    # probing every list == exact (incl. self which brute excludes)
    full = ivf_topk(
        ds, queries, k=5, n_centroids=16, nprobe=16, id_column="vec_id",
        query_ids=qids,
    ).take_all()
    tf = tops(full)
    for q in tf:
        tf[q].discard(q)
    for q, e in te.items():
        # exact-from-IVF contains the brute-force set up to k-boundary ties
        assert len(e - (tf[q] | {q})) <= 1


def test_lsh_topk_recall(ray_session):
    from mismo_ray.ann import lsh_topk

    # planted near-duplicates: rows[n-ndup:] are perturbed copies of earlier
    # rows (cos ~ 0.99) — at 2 hyperplane bits such a pair shares the bucket
    # with prob ~ (1 - theta/pi)^2 ~ 0.94, so the source must appear in the
    # probe's top-3 for the vast majority of duplicate queries
    n, frac = 500, 0.3
    rng = np.random.default_rng(21)
    m = rng.standard_normal((n, 8))
    ndup = int(n * frac)
    src_idx = rng.integers(0, n - ndup, size=ndup)
    m[n - ndup :] = m[src_idx] + 0.05 * rng.standard_normal((ndup, 8))
    ids = np.arange(n, dtype=np.int64)
    ds = _ds(ids, m)
    queries, qids = m[n - ndup :], ids[n - ndup :]
    approx = lsh_topk(
        ds, queries, k=3, bits=2, id_column="vec_id", query_ids=qids
    ).take_all()
    tops: dict = {}
    for r in approx:
        tops.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(
        1
        for qi, si in zip(range(n - ndup, n), src_idx)
        if si in tops.get(qi, set())
    )
    assert hits / ndup >= 0.8, hits / ndup


def test_embedding_neardup_auto_switches(ray_session):
    # auto picks exact under the threshold (matches exact's output) and lsh
    # above it (subset); this is the scale-footgun guard
    from mismo_ray.dedupe import embedding_neardup_pairs

    ids, m = _corpus(120, dup_frac=0.25, seed=9)
    ds = _ds(ids, m)
    auto = rows_set(
        embedding_neardup_pairs(ds, tau=0.95, id_column="vec_id").links_ds,
        ["record_id_l", "record_id_r"],
    )
    assert auto == _brute_pairs(ids, m, 0.95)
    as_lsh = rows_set(
        embedding_neardup_pairs(
            ds, tau=0.95, id_column="vec_id", auto_exact_max_rows=50,
            bits_per_band=4, n_bands=16,
        ).links_ds,
        ["record_id_l", "record_id_r"],
    )
    assert as_lsh <= auto


def test_lsh_recall_sf001_tau040(ray_session):
    # verdict-mandated recall floor: LSH pairs vs exact pairs on the real
    # sf0.01 embeddings table, tau=0.40, recall >= 0.95 (band params sized
    # for the low threshold: P(collide) = (1 - acos(s)/pi)^bits per band)
    import os

    from mismo_ray.ann import cosine_threshold_pairs, lsh_threshold_pairs

    path = "/root/testdata/sf0.01/embeddings.parquet"
    if not os.path.exists(path):
        pytest.skip("testdata not present")
    emb = ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    exact = rows_set(
        cosine_threshold_pairs(emb, tau=0.40, id_column="vec_id"),
        ["record_id_l", "record_id_r"],
    )
    lsh = rows_set(
        lsh_threshold_pairs(
            emb, tau=0.40, id_column="vec_id", bits_per_band=4, n_bands=32
        ),
        ["record_id_l", "record_id_r"],
    )
    assert lsh <= exact
    recall = len(lsh & exact) / max(1, len(exact))
    assert recall >= 0.95, f"LSH recall {recall:.3f} < 0.95 ({len(exact)} exact pairs)"
