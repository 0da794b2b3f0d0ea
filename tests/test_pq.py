"""IVFADC (product-quantized IVF): recall gates vs brute force, exact
refine path, determinism, encode-once/search-from-codes reuse, payload
size, and degenerate inputs."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data


def _recall(bf_df, got_df) -> float:
    b = {q: set(g.neighbor_id) for q, g in bf_df.groupby("query_id")}
    v = {q: set(g.neighbor_id) for q, g in got_df.groupby("query_id")}
    return float(np.mean([len(b[q] & v.get(q, set())) / len(b[q]) for q in b]))


def _clustered(n_centers=20, per=100, d=32, seed=3):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_centers, d))
    pts = np.repeat(centers, per, axis=0) + 0.15 * rng.normal(
        size=(n_centers * per, d)
    )
    ids = np.arange(len(pts), dtype=np.int64)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": ids,
                "embedding": pa.array(list(pts), type=pa.list_(pa.float64())),
            }
        )
    ).repartition(8)
    return ds, pts, ids


def test_ivfpq_refine_recall_and_exact_sims(ray_session):
    from mismo_ray.ann import brute_force_topk, ivfpq_topk

    ds, pts, ids = _clustered()
    q, qids = pts[::97], ids[::97]
    bf = brute_force_topk(ds, q, k=10, query_ids=qids).to_pandas()
    # refine must cover the tight ~100-member cluster the true neighbors
    # live in: ADC orders across clusters near-perfectly but cannot rank
    # near-tie in-cluster sims, so candidates = the cluster, re-rank exact
    pq = ivfpq_topk(
        ds, q, k=10, n_centroids=16, nprobe=6, m=8, ksub=64,
        refine=100, iters=5, query_ids=qids,
    ).to_pandas()
    assert _recall(bf, pq) >= 0.9
    # refine re-ranks exactly: any (query, neighbor) pair shared with brute
    # force must carry the identical cosine
    merged = bf.merge(pq, on=["query_id", "neighbor_id"], suffixes=("_bf", "_pq"))
    assert len(merged) > 0
    assert np.allclose(merged["sim_bf"], merged["sim_pq"], atol=1e-12)


def test_ivfpq_adc_only_recall(ray_session):
    from mismo_ray.ann import brute_force_topk, ivfpq_topk

    ds, pts, ids = _clustered()
    q, qids = pts[::97], ids[::97]
    bf = brute_force_topk(ds, q, k=10, query_ids=qids).to_pandas()
    # pure ADC (no exact re-rank), all lists probed: the gate is CANDIDATE
    # quality — the true top-10 must sit inside the ADC top-40 (what a
    # refine stage would consume); in-cluster near-ties make exact ADC@10
    # ordering meaningless for any m-byte code
    pq = ivfpq_topk(
        ds, q, k=40, n_centroids=16, nprobe=16, m=16, ksub=256,
        refine=None, iters=5, query_ids=qids,
    ).to_pandas()
    assert _recall(bf, pq) >= 0.75


def test_ivfpq_deterministic_and_reusable_index(ray_session):
    from mismo_ray.ann import ivfpq_topk, kmeans_centroids, pq_encode, pq_train

    ds, pts, ids = _clustered(n_centers=8, per=50)
    q, qids = pts[::37], ids[::37]
    kw = dict(k=5, n_centroids=8, nprobe=3, m=8, ksub=32, iters=4, query_ids=qids)
    a = ivfpq_topk(ds, q, refine=20, **kw).to_pandas()
    b = ivfpq_topk(ds, q, refine=20, **kw).to_pandas()
    key = ["query_id", "rank"]
    assert a.sort_values(key).reset_index(drop=True).equals(
        b.sort_values(key).reset_index(drop=True)
    )
    # encode once, search from the stored codes: identical ADC result
    cm = kmeans_centroids(ds, n_centroids=8, iters=4)
    cb = pq_train(ds, m=8, ksub=32, iters=4, centroids=cm)
    enc = pq_encode(ds, cb, centroids=cm)
    # the persisted payload is (int64 id, int64 list, m uint8 codes)
    sch = enc.schema()
    assert sch.base_schema.field("pq_code").type == pa.list_(pa.uint8(), 8)
    direct = ivfpq_topk(ds, q, centroids=cm, codebooks=cb, **kw).to_pandas()
    reused = ivfpq_topk(
        ds, q, centroids=cm, codebooks=cb, encoded=enc, **kw
    ).to_pandas()
    assert direct.sort_values(key).reset_index(drop=True).equals(
        reused.sort_values(key).reset_index(drop=True)
    )


def test_ivfpq_index_parquet_roundtrip(ray_session, tmp_path):
    """The 100 TB re-search path: persist the encoded (id, list, code)
    table with write_parquet, read it back, search from the stored codes —
    identical result to searching the in-memory encoding."""
    from mismo_ray.ann import ivfpq_topk, kmeans_centroids, pq_encode, pq_train

    ds, pts, ids = _clustered(n_centers=8, per=50)
    q, qids = pts[::37], ids[::37]
    cm = kmeans_centroids(ds, n_centroids=8, iters=4)
    cb = pq_train(ds, m=8, ksub=32, iters=4, centroids=cm)
    enc = pq_encode(ds, cb, centroids=cm)
    path = str(tmp_path / "pq_index")
    enc.write_parquet(path)
    enc_back = ray.data.read_parquet(path)
    kw = dict(k=5, nprobe=3, iters=4, query_ids=qids, centroids=cm, codebooks=cb)
    a = ivfpq_topk(ds, q, encoded=enc, **kw).to_pandas()
    b = ivfpq_topk(ds, q, encoded=enc_back, **kw).to_pandas()
    key = ["query_id", "rank"]
    assert a.sort_values(key).reset_index(drop=True).equals(
        b.sort_values(key).reset_index(drop=True)
    )


def test_ivfpq_guards_and_degenerate_inputs(ray_session):
    from mismo_ray.ann import ivfpq_topk, pq_train

    ds, pts, ids = _clustered(n_centers=4, per=30)
    with pytest.raises(ValueError, match="not divisible"):
        pq_train(ds, m=5)
    # null embeddings are never returned as neighbors
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(40, dtype=np.int64)),
            "embedding": pa.array(
                list(pts[:30]) + [None] * 10, type=pa.list_(pa.float64())
            ),
        }
    )
    dn = ray.data.from_arrow(t).repartition(4)
    out = ivfpq_topk(
        dn, pts[:3], k=5, n_centroids=4, nprobe=4, m=8, ksub=16,
        refine=10, iters=3, query_ids=np.array([100, 101, 102]),
    ).to_pandas()
    assert len(out) > 0
    assert out["neighbor_id"].max() < 30
    # refine-candidate gate trips
    with pytest.raises(ValueError, match="refine candidates"):
        ivfpq_topk(
            dn, pts[:3], k=5, n_centroids=4, nprobe=4, m=8, ksub=16,
            refine=10, iters=3, max_refine_candidates=2,
        )


def test_ivfpq_embeddings_table(ray_session):
    """Driver embeddings table (64-dim float32): recall >= 0.8 with refine."""
    import os

    from mismo_ray.ann import brute_force_topk, ivfpq_topk

    path = "/root/testdata/sf0.01/embeddings.parquet"
    if not os.path.exists(path):
        pytest.skip("testdata not present")
    emb = ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    head = emb.filter(expr="vec_id < 20").to_pandas()
    queries = np.stack(head["embedding"].to_numpy())
    qids = head["vec_id"].to_numpy()
    bf = brute_force_topk(emb, queries, k=5, query_ids=qids).to_pandas()
    pq = ivfpq_topk(
        emb, queries, k=5, n_centroids=16, nprobe=10, m=8, ksub=64,
        refine=25, iters=5, query_ids=qids,
    ).to_pandas()
    assert _recall(bf, pq) >= 0.8
