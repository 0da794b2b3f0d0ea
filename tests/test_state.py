"""Resumable checkpoint / shard-processing machinery (mismo_ray.state)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from mismo_ray import state


def test_checkpoint_and_resume(ray_session, tmp_path):
    calls = {"n": 0}

    def compute():
        calls["n"] += 1
        return ray.data.from_arrow(pa.table({"x": [1, 2, 3]}))

    p = str(tmp_path / "stage1")
    ds1, resumed1 = state.resume_or_compute(p, compute)
    assert not resumed1 and calls["n"] == 1 and ds1.count() == 3
    ds2, resumed2 = state.resume_or_compute(p, compute)
    assert resumed2 and calls["n"] == 1 and ds2.count() == 3
    assert state.read_manifest(p)["n_rows"] == 3


def test_process_shards_skips_completed(ray_session, tmp_path):
    # build 3 input shards
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    shards = []
    for i in range(3):
        p = str(in_dir / f"shard{i}.parquet")
        pq.write_table(pa.table({"v": list(range(i * 10, i * 10 + 5))}), p)
        shards.append(p)

    processed = []

    def process(shard: str):
        processed.append(shard)
        ds = ray.data.read_parquet(shard)
        return ds.map_batches(
            lambda t: t.append_column(
                "v2", pa.array([x * 2 for x in t["v"].to_pylist()])
            ),
            batch_format="pyarrow",
        )

    out = str(tmp_path / "out")
    r1 = state.process_shards(shards, process, out)
    assert r1["n_done"] == 3 and r1["n_skipped"] == 0
    assert len(processed) == 3

    # rerun: everything skipped, process_fn not called again
    r2 = state.process_shards(shards, process, out)
    assert r2["n_done"] == 0 and r2["n_skipped"] == 3
    assert len(processed) == 3

    # simulate a failed shard: remove one manifest -> only that one reruns
    os.remove(os.path.join(out, "shard1", state.MANIFEST))
    r3 = state.process_shards(shards, process, out)
    assert r3["n_done"] == 1 and r3["n_skipped"] == 2
    assert processed.count(shards[1]) == 2

    # union of outputs is complete and transformed
    total = state.read_shard_outputs(out)
    rows = total.take_all()
    assert len(rows) == 15
    assert all(r["v2"] == r["v"] * 2 for r in rows)


def test_checkpoint_atomic_overwrite(ray_session, tmp_path):
    p = str(tmp_path / "ck")
    state.checkpoint(ray.data.from_arrow(pa.table({"x": [1]})), p)
    # overwrite with new content is atomic (tmp + rename)
    out = state.checkpoint(ray.data.from_arrow(pa.table({"x": [7, 8]})), p)
    assert out.count() == 2
    assert state.read_manifest(p)["n_rows"] == 2


# ----------------------------------------------------------------- sources
def test_read_records_parquet_csv_json(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mismo_ray.sources import read_records

    tbl = pa.table(
        {
            "key": ["a", "b", "c"],
            "n": pa.array([1, 2, 3], type=pa.int32()),
            "extra": [1.0, 2.0, 3.0],
        }
    )
    pq.write_table(tbl, tmp_path / "t.parquet")
    with open(tmp_path / "t.csv", "w") as f:
        f.write("key,n,extra\na,1,1.0\nb,2,2.0\nc,3,3.0\n")
    with open(tmp_path / "t.jsonl", "w") as f:
        f.write('{"key":"a","n":1}\n{"key":"b","n":2}\n{"key":"c","n":3}\n')

    for name in ("t.parquet", "t.csv", "t.jsonl"):
        ds = read_records(
            str(tmp_path / name),
            columns=["key", "n"],
            casts={"n": pa.int64()},
            record_id=["key"],
        )
        rows = sorted(ds.take_all(), key=lambda r: r["key"])
        assert [r["key"] for r in rows] == ["a", "b", "c"]
        assert ds.schema().base_schema.field("n").type == pa.int64()
        assert "extra" not in ds.schema().base_schema.names
        # hash-derived ids: deterministic and distinct
        ids = {r["record_id"] for r in rows}
        assert len(ids) == 3
    # numeric id column path
    ds = read_records(
        str(tmp_path / "t.parquet"), columns=["key", "n"], record_id="n"
    )
    assert {r["record_id"] for r in ds.take_all()} == {1, 2, 3}


# -------------------------------------------------- streaming dedup index
def test_streaming_dedup_index(ray_session, tmp_path):
    import pyarrow as pa

    from mismo_ray.state.dedup_index import StreamingDedupIndex

    idx = StreamingDedupIndex(n_shards=4)
    monday = ray.data.from_arrow(
        pa.table(
            {
                "record_id": [0, 1, 2, 3],
                "text": ["aaa", "bbb", "aaa", None],  # internal dup + null
            }
        )
    )
    kept1 = monday.take_all()  # no-op consume guard
    out1 = idx.filter_new(monday, "text").take_all()
    texts1 = sorted(r["text"] for r in out1 if r["text"] is not None)
    assert texts1 == ["aaa", "bbb"]  # internal dup dropped
    assert any(r["text"] is None for r in out1)  # nulls pass through
    assert idx.n_seen() == 2

    tuesday = ray.data.from_arrow(
        pa.table(
            {
                "record_id": [10, 11, 12],
                "text": ["bbb", "ccc", "ddd"],  # bbb seen on monday
            }
        )
    )
    out2 = idx.filter_new(tuesday, "text").take_all()
    assert sorted(r["text"] for r in out2) == ["ccc", "ddd"]
    assert idx.n_seen() == 4

    # snapshot -> new index -> restore -> history still filters
    snap = str(tmp_path / "index.parquet")
    idx.snapshot(snap)
    idx2 = StreamingDedupIndex(n_shards=8).restore(snap)
    out3 = idx2.filter_new(tuesday, "text").take_all()
    assert out3 == []  # everything already seen


def test_incremental_filter_new_e2e(ray_session, tmp_path):
    """Two-'day' ingest: intra-run keeps one representative per content
    (same partition of rows as exact_dedupe), cross-run drops everything a
    restored snapshot already saw."""
    import numpy as np
    import pyarrow as pa

    from mismo_ray.dedupe import exact_dedupe
    from mismo_ray.state.dedup_index import incremental_filter_new

    day1 = ray.data.from_arrow(
        pa.table(
            {
                "record_id": np.arange(8, dtype=np.int64),
                "text": ["a", "b", "a", "c", "b", "d", "e", "a"],
            }
        )
    ).repartition(3)
    snap = str(tmp_path / "idx.parquet")
    kept1 = incremental_filter_new(day1, "text", snapshot_out=snap)
    kept_texts = sorted(r["text"] for r in kept1.take_all())
    # intra-run semantics: one survivor per distinct content, same groups as
    # exact_dedupe (winner is arrival order, not necessarily min id)
    groups = exact_dedupe(day1, "text").take_all()
    assert kept_texts == ["a", "b", "c", "d", "e"]
    assert len(groups) == len(kept_texts)
    assert sum(g["n_dups"] for g in groups) == 8

    # consuming the materialized result again must NOT change it (the map
    # task mutates shared state; filter_new materializes to guard this)
    assert sorted(r["text"] for r in kept1.take_all()) == kept_texts

    day2 = ray.data.from_arrow(
        pa.table(
            {
                "record_id": np.arange(100, 105, dtype=np.int64),
                "text": ["b", "f", "e", "g", "f"],
            }
        )
    ).repartition(2)
    kept2 = incremental_filter_new(day2, "text", snapshot_in=snap)
    assert sorted(r["text"] for r in kept2.take_all()) == ["f", "g"]
