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
