"""Sequence packing (packing.pack_sequences): prefix-sum parity, determinism."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _corpus(n: int = 500, seed: int = 0):
    rng = np.random.default_rng(seed)
    t = pa.table(
        {
            "record_id": np.arange(n, dtype=np.int64),
            "n_tokens": rng.integers(0, 900, n).astype(np.int64),
        }
    )
    return t, ray.data.from_arrow(t).repartition(5)


def _brute(t: pa.Table, budget: int, seed: int, order: str):
    import sys

    sys.path.insert(0, "/root/repo")
    from mismo_ray._util import splitmix64

    ids = np.asarray(t["record_id"]).astype(np.uint64)
    toks = np.asarray(t["n_tokens"], dtype=np.int64)
    key = splitmix64(ids + np.uint64(seed)) if order == "hash" else ids
    o = np.lexsort((ids, key))
    before = np.zeros(len(o), dtype=np.int64)
    before[o] = np.cumsum(toks[o]) - toks[o]
    return {
        int(i): (int(b), int(b // budget), int(b % budget))
        for i, b in zip(np.asarray(t["record_id"]), before)
    }


def test_matches_single_threaded_definition(ray_session):
    from mismo_ray.packing import pack_sequences

    t, ds = _corpus()
    for order in ("hash", "id"):
        out = pack_sequences(
            ds, "n_tokens", budget=2048, seed=7, order=order
        ).to_pandas()
        got = {
            int(r.record_id): (int(r.global_offset), int(r.seq_id), int(r.seq_pos))
            for r in out.itertuples()
        }
        assert got == _brute(t, 2048, 7, order), order


def test_offsets_are_a_permutation_of_the_stream(ray_session):
    from mismo_ray.packing import pack_sequences

    t, ds = _corpus(300, seed=2)
    out = (
        pack_sequences(ds, "n_tokens", budget=1000, seed=1)
        .to_pandas()
        .sort_values("global_offset")
    )
    # offsets tile the token stream exactly: each offset = previous + tokens
    starts = out["global_offset"].to_numpy()
    toks = out["n_tokens"].to_numpy()
    assert starts[0] == 0
    assert (starts[1:] == starts[:-1] + toks[:-1]).all()
    assert (out["seq_id"] == starts // 1000).all()


def test_stable_across_partitioning_and_bucket_count(ray_session):
    from mismo_ray.packing import pack_sequences

    t, _ = _corpus(200, seed=3)
    a = pack_sequences(
        ray.data.from_arrow(t).repartition(2), "n_tokens", budget=512, n_buckets=4
    ).to_pandas()
    b = pack_sequences(
        ray.data.from_arrow(t).repartition(9), "n_tokens", budget=512, n_buckets=32
    ).to_pandas()
    a = a.sort_values("record_id").reset_index(drop=True)
    b = b.sort_values("record_id").reset_index(drop=True)
    assert a.equals(b)


def test_write_training_shards(ray_session, tmp_path):
    import os

    import pyarrow.parquet as pq

    from mismo_ray.packing import write_training_shards
    from mismo_ray.state.resume import is_complete

    t, ds = _corpus(400, seed=5)
    out = str(tmp_path / "shards")
    counters = write_training_shards(
        ds, out, tokens_column="n_tokens", budget=1024, seqs_per_shard=16
    )
    assert counters["docs"] == 400
    assert counters["tokens"] == int(t["n_tokens"].to_numpy().sum())
    assert counters["n_seqs"] == -(-counters["tokens"] // 1024)
    assert is_complete(out)
    # shards hold contiguous seq ranges, rows ordered by (seq_id, seq_pos)
    shard_dirs = sorted(d for d in os.listdir(out) if d.startswith("shard="))
    assert len(shard_dirs) == counters["n_shards"]
    back = pq.read_table(os.path.join(out, shard_dirs[0])).to_pandas()
    assert (back["seq_id"] // 16 == int(shard_dirs[0].split("=")[1])).all()
    key = back["seq_id"] * 10_000 + back["seq_pos"]
    assert (key.to_numpy()[1:] >= key.to_numpy()[:-1]).all()


def test_null_tokens_count_zero(ray_session):
    from mismo_ray.packing import pack_sequences

    t = pa.table(
        {
            "record_id": pa.array([0, 1, 2], type=pa.int64()),
            "n_tokens": pa.array([10, None, 5], type=pa.int64()),
        }
    )
    out = (
        pack_sequences(
            ray.data.from_arrow(t), "n_tokens", budget=8, order="id"
        )
        .to_pandas()
        .sort_values("record_id")
    )
    assert list(out["global_offset"]) == [0, 10, 10]
    assert list(out["seq_id"]) == [0, 1, 1]


def test_add_row_number(ray_session):
    from mismo_ray.packing import add_row_number

    t, ds = _corpus(300, seed=7)
    out = add_row_number(ds, order="id").to_pandas().sort_values("record_id")
    # id order: row_number == record_id (ids are 0..n-1)
    assert (out["row_number"].to_numpy() == out["record_id"].to_numpy()).all()
    shuf = add_row_number(ds, order="hash", seed=3).to_pandas()
    rn = np.sort(shuf["row_number"].to_numpy())
    assert (rn == np.arange(300)).all()  # a permutation
    # deterministic across partitionings
    import ray.data as rd

    shuf2 = add_row_number(
        rd.from_arrow(t).repartition(11), order="hash", seed=3
    ).to_pandas()
    a = shuf.sort_values("record_id")["row_number"].to_numpy()
    b = shuf2.sort_values("record_id")["row_number"].to_numpy()
    assert (a == b).all()
