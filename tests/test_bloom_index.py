"""Bloom-filter dedup index: same filter_new contract as the exact index,
one-sided error only (seen rows NEVER pass), measured false-positive rate
within theory, replay-token idempotency, snapshot param guard."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data


def test_bloom_index_cross_run_contract(ray_session, tmp_path):
    from mismo_ray.state.dedup_index import StreamingBloomDedupIndex

    idx = StreamingBloomDedupIndex(n_bits=1 << 16, n_probes=7, n_shards=4)
    monday = ray.data.from_arrow(
        pa.table(
            {
                "record_id": [0, 1, 2, 3],
                "text": ["aaa", "bbb", "aaa", None],  # internal dup + null
            }
        )
    )
    out1 = idx.filter_new(monday, "text").take_all()
    texts1 = sorted(r["text"] for r in out1 if r["text"] is not None)
    assert texts1 == ["aaa", "bbb"]
    assert any(r["text"] is None for r in out1)  # nulls pass through
    assert idx.n_seen() == 2

    tuesday = ray.data.from_arrow(
        pa.table({"record_id": [10, 11, 12], "text": ["bbb", "ccc", "ddd"]})
    )
    out2 = idx.filter_new(tuesday, "text").take_all()
    assert sorted(r["text"] for r in out2) == ["ccc", "ddd"]

    # snapshot -> fresh index with MATCHING params -> history still filters
    snap = str(tmp_path / "bloom.parquet")
    idx.snapshot(snap)
    idx2 = StreamingBloomDedupIndex(
        n_bits=1 << 16, n_probes=7, n_shards=4
    ).restore(snap)
    assert idx2.filter_new(tuesday, "text").take_all() == []
    # mismatched sizing must refuse, not silently mis-probe
    with pytest.raises(ValueError, match="params"):
        StreamingBloomDedupIndex(n_bits=1 << 14, n_probes=7, n_shards=4).restore(
            snap
        )
    idx.shutdown()
    idx2.shutdown()


def test_bloom_one_sided_error_and_fp_rate(ray_session):
    """Insert 5000 keys into a filter sized for p=0.01: every seen key is
    dropped on re-presentation (no false negatives, ever), and fresh keys
    are wrongly dropped at <= ~3x the theoretical rate. The filter is sized
    for the TOTAL expected ingest (10k keys: the fresh pass legitimately
    inserts as it filters, raising the fill factor as it goes)."""
    from mismo_ray.state.dedup_index import StreamingBloomDedupIndex, bloom_params

    m, k = bloom_params(10_000, 0.01)
    idx = StreamingBloomDedupIndex(n_bits=m, n_probes=k, n_shards=4)
    first = pa.table(
        {
            "record_id": np.arange(5000, dtype=np.int64),
            "text": [f"doc-{i}" for i in range(5000)],
        }
    )
    out1 = idx.filter_new(ray.data.from_arrow(first).repartition(4), "text")
    n1 = out1.count()
    assert n1 >= 5000 * 0.97  # few intra-run fp losses at most

    # re-present the same content with new ids: NOTHING may pass
    again = pa.table(
        {
            "record_id": np.arange(9000, 14000, dtype=np.int64),
            "text": [f"doc-{i}" for i in range(5000)],
        }
    )
    assert idx.filter_new(ray.data.from_arrow(again).repartition(4), "text").count() == 0

    # fresh keys: false-positive drops bounded
    fresh = pa.table(
        {
            "record_id": np.arange(20000, 25000, dtype=np.int64),
            "text": [f"new-{i}" for i in range(5000)],
        }
    )
    n3 = idx.filter_new(ray.data.from_arrow(fresh).repartition(4), "text").count()
    assert n3 >= 5000 * (1 - 3 * 0.01)
    idx.shutdown()


def test_bloom_shard_replay_token_idempotent(ray_session):
    """A replayed batch (same claim token) gets the same answers; a
    different token presenting the same keys sees them as seen."""
    from mismo_ray.state.dedup_index import _BloomShard

    sh = _BloomShard.remote(1 << 12, 5)
    fps = [11, 22, 33]
    first = ray.get(sh.check_and_add.remote(fps, 777))
    assert first == [True, True, True]
    replay = ray.get(sh.check_and_add.remote(fps, 777))
    assert replay == [True, True, True]
    other = ray.get(sh.check_and_add.remote(fps, 888))
    assert other == [False, False, False]
    ray.kill(sh)


def test_bloom_params_sizing():
    from mismo_ray.state.dedup_index import bloom_params

    m, k = bloom_params(10**6, 0.01)
    assert 9_000_000 < m < 10_500_000  # ~9.59 bits/key
    assert k == 7
    with pytest.raises(ValueError):
        bloom_params(0, 0.01)
    with pytest.raises(ValueError):
        bloom_params(100, 1.5)
