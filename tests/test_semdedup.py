"""SemDedup: within-cluster cosine prune vs a brute-force reference."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from mismo_ray.dedupe import semdedup


def _mkds(vectors: np.ndarray, ids: np.ndarray | None = None) -> ray.data.Dataset:
    n = len(vectors)
    ids = np.arange(n, dtype=np.int64) if ids is None else ids
    t = pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.array(
                [v.tolist() for v in vectors], type=pa.list_(pa.float32())
            ),
        }
    )
    return ray.data.from_arrow(t).repartition(4)


def _brute_keep(vectors: np.ndarray, clusters: np.ndarray, tau: float) -> np.ndarray:
    """Upper-triangle reference: drop j iff any i<j in same cluster cos>=tau."""
    v = vectors.astype(np.float64)
    v = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-300)
    n = len(v)
    keep = np.ones(n, dtype=bool)
    for j in range(n):
        for i in range(j):
            if clusters[i] == clusters[j] and float(v[i] @ v[j]) >= tau:
                keep[j] = False
                break
    return keep


def test_semdedup_mod_clusters_matches_bruteforce(ray_session):
    rng = np.random.default_rng(11)
    base = rng.standard_normal((60, 8))
    # plant near-duplicates: rows 40..59 are noisy copies of rows 0..19
    base[40:] = base[:20] + 0.01 * rng.standard_normal((20, 8))
    ds = _mkds(base)
    clusters = np.arange(60, dtype=np.int64) % 5

    out = semdedup(
        ds,
        tau=0.9,
        cluster_fn=lambda t: np.asarray(t["vec_id"], dtype=np.int64) % 5,
        return_all=True,
        tile=7,  # force several tiles
    ).to_pandas().sort_values("vec_id").reset_index(drop=True)

    expect = _brute_keep(base, clusters, 0.9)
    assert (out["cluster"].to_numpy() == clusters).all()
    np.testing.assert_array_equal(out["semdedup_keep"].to_numpy(), expect)
    # survivors-only mode returns exactly the kept rows
    kept = semdedup(
        ds,
        tau=0.9,
        cluster_fn=lambda t: np.asarray(t["vec_id"], dtype=np.int64) % 5,
        tile=7,
    ).to_pandas()
    assert sorted(kept["vec_id"]) == sorted(out.loc[expect, "vec_id"])
    assert expect.sum() < 60  # the planted dups actually got dropped


def test_semdedup_kmeans_drops_exact_dups_deterministically(ray_session):
    rng = np.random.default_rng(5)
    # 4 well-separated blobs + exact duplicates of the first 10 rows
    centers = rng.standard_normal((4, 16)) * 6
    pts = np.concatenate(
        [c + 0.1 * rng.standard_normal((25, 16)) for c in centers]
    )
    dup = pts[:10].copy()
    all_pts = np.concatenate([pts, dup])
    ds = _mkds(all_pts)

    out1 = semdedup(ds, tau=0.999999, n_clusters=4, iters=4).to_pandas()
    out2 = semdedup(ds, tau=0.999999, n_clusters=4, iters=4).to_pandas()
    # identical vectors land in the same cluster, so every exact dup dies
    kept = set(out1["vec_id"])
    for j in range(100, 110):
        assert j not in kept
    for j in range(10):
        assert j in kept
    # deterministic across runs
    assert sorted(out1["vec_id"]) == sorted(out2["vec_id"])


def test_semdedup_low_centroid_sim_keeps_far_example(ray_session):
    # one cluster: centroid ~ mean; a is closer to the centroid than b,
    # a and b are near-dups -> the paper's rule keeps b (lower centroid sim)
    a = np.array([1.0, 0.0, 0.0])
    b_dir = np.array([0.96, 0.28, 0.0])
    b = b_dir / np.linalg.norm(b_dir)
    filler = np.array([0.9, -0.1, 0.1])
    vecs = np.stack([a, b, filler])
    ds = _mkds(vecs)
    cm = np.stack([(a + b + filler) / 3.0])

    out = semdedup(
        ds, tau=0.95, centroids=cm, keep_order="low_centroid_sim", return_all=True
    ).to_pandas().sort_values("vec_id")
    keep = dict(zip(out["vec_id"], out["semdedup_keep"]))
    sim_ab = float(a @ b)
    assert sim_ab >= 0.95
    # exactly one of (a, b) survives, and it is the one farther from centroid
    cn = cm[0] / np.linalg.norm(cm[0])
    farther = 0 if a @ cn < b @ cn else 1
    assert keep[farther] and not keep[1 - farther]

    with pytest.raises(ValueError):
        semdedup(ds, keep_order="low_centroid_sim", cluster_fn=lambda t: None)
    with pytest.raises(ValueError):
        semdedup(ds, keep_order="bogus")
