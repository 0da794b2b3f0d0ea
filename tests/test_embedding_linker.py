"""EmbeddingLinker: cosine blocking as a Linker — exact link/dedupe
correctness vs a numpy oracle, LSH cross-corpus recall, task inference,
and parity with embedding_neardup_pairs on the dedupe task."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def _tbl(ids, vecs):
    return pa.table(
        {
            "record_id": pa.array(np.asarray(ids, dtype=np.int64)),
            "embedding": pa.array(
                [None if v is None else list(v) for v in vecs],
                type=pa.list_(pa.float64()),
            ),
        }
    )


def _oracle_link(lids, lv, rids, rv, tau):
    ln = lv / np.linalg.norm(lv, axis=1, keepdims=True)
    rn = rv / np.linalg.norm(rv, axis=1, keepdims=True)
    sims = ln @ rn.T
    ii, jj = np.nonzero(sims >= tau)
    return {(int(lids[i]), int(rids[j])) for i, j in zip(ii, jj)}


def test_embedding_linker_link_exact_matches_oracle(ray_session):
    from mismo_ray.linker import EmbeddingLinker

    rng = np.random.default_rng(4)
    lv = rng.normal(size=(300, 16))
    rv = np.concatenate([lv[:80] + 0.05 * rng.normal(size=(80, 16)),
                         rng.normal(size=(220, 16))])
    lids = np.arange(300)
    rids = np.arange(1000, 1300)
    left = ray.data.from_arrow(_tbl(lids, lv)).repartition(5)
    right = ray.data.from_arrow(_tbl(rids, rv)).repartition(7)

    linker = EmbeddingLinker("embedding", tau=0.9, method="exact", chunk_rows=64)
    linkage = linker(left, right)
    got = {
        (r["record_id_l"], r["record_id_r"])
        for r in linkage.links_ds.take_all()
    }
    assert got == _oracle_link(lids, lv, rids, rv, 0.9)
    # sides preserved: every left id from the left corpus
    assert all(l < 1000 <= r for l, r in got)


def test_embedding_linker_dedupe_parity_and_task_inference(ray_session):
    from mismo_ray.dedupe import embedding_neardup_pairs
    from mismo_ray.linker import EmbeddingLinker

    rng = np.random.default_rng(9)
    v = rng.normal(size=(200, 12))
    v[100:150] = v[:50] + 0.03 * rng.normal(size=(50, 12))
    ds = ray.data.from_arrow(_tbl(np.arange(200), v)).repartition(4)

    linker = EmbeddingLinker("embedding", tau=0.95, method="exact", chunk_rows=64)
    got = {
        (r["record_id_l"], r["record_id_r"])
        for r in linker(ds, ds).links_ds.take_all()  # same object -> dedupe
    }
    ref = {
        (r["record_id_l"], r["record_id_r"])
        for r in embedding_neardup_pairs(
            ds, tau=0.95, id_column="record_id", method="exact", chunk_rows=64
        ).links_ds.take_all()
    }
    assert got == ref
    assert all(l < r for l, r in got)  # dedupe canonical order


def test_embedding_linker_lsh_link_recall(ray_session):
    from mismo_ray.linker import EmbeddingLinker

    rng = np.random.default_rng(13)
    lv = rng.normal(size=(400, 24))
    rv = lv + 0.02 * rng.normal(size=(400, 24))  # every left has a near twin
    left = ray.data.from_arrow(_tbl(np.arange(400), lv)).repartition(4)
    right = ray.data.from_arrow(_tbl(np.arange(5000, 5400), rv)).repartition(4)

    exact = EmbeddingLinker("embedding", tau=0.98, method="exact", chunk_rows=64)
    truth = {
        (r["record_id_l"], r["record_id_r"])
        for r in exact(left, right).links_ds.take_all()
    }
    lsh = EmbeddingLinker(
        "embedding", tau=0.98, method="lsh", bits_per_band=6, n_bands=16
    )
    got = {
        (r["record_id_l"], r["record_id_r"])
        for r in lsh(left, right).links_ds.take_all()
    }
    assert got <= truth  # verify step: no false positives, ever
    assert len(got & truth) / len(truth) >= 0.9  # banded recall


def test_embedding_linker_composes_in_or_linker(ray_session):
    """EmbeddingLinker is a first-class Linker: OR it with a KeyLinker and
    the union is overlap-free and equals the set union of the rules."""
    from mismo_ray.linker import EmbeddingLinker, KeyLinker, OrLinker

    rng = np.random.default_rng(21)
    v = rng.normal(size=(120, 8))
    v[60:90] = v[:30] + 0.02 * rng.normal(size=(30, 8))
    t = _tbl(np.arange(120), v).append_column(
        "bucket", pa.array((np.arange(120) % 7).astype(np.int64))
    )
    ds = ray.data.from_arrow(t).repartition(4)

    emb = EmbeddingLinker("embedding", tau=0.98, method="exact", chunk_rows=32)
    key = KeyLinker("bucket")
    a = {
        (r["record_id_l"], r["record_id_r"])
        for r in emb(ds, ds).links_ds.take_all()
    }
    b = {
        (r["record_id_l"], r["record_id_r"])
        for r in key(ds, ds).links_ds.take_all()
    }
    both = OrLinker([emb, key])(ds, ds).links_ds.take_all()
    got = [(r["record_id_l"], r["record_id_r"]) for r in both]
    assert len(got) == len(set(got))  # overlap removed, each pair once
    assert set(got) == a | b
    assert a and b  # both rules contributed pairs


def test_embedding_linker_nulls_and_auto_route(ray_session):
    from mismo_ray.linker import EmbeddingLinker

    v = [[1.0, 0.0], None, [0.99, 0.14], [0.0, 1.0]]
    ds = ray.data.from_arrow(_tbl([0, 1, 2, 3], v)).repartition(2)
    out = EmbeddingLinker("embedding", tau=0.9)(ds, ds).links_ds.take_all()
    got = {(r["record_id_l"], r["record_id_r"]) for r in out}
    assert got == {(0, 2)}  # null never pairs; orthogonal never pairs