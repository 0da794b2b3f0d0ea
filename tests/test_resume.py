"""state.resume: partition-level checkpoint/resume semantics in isolation."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray.data

from mismo_ray.state.resume import (
    PART_COL,
    is_complete,
    n_partitions,
    resume_map_partitions,
    write_partitioned,
)


def _input(tmp_path, n_rows=100, n_parts=4):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "k": np.arange(n_rows, dtype=np.int64),
                "v": np.arange(n_rows, dtype=np.int64) * 10,
            }
        )
    ).repartition(3)
    path = str(tmp_path / "input")
    write_partitioned(ds, path, key_columns=["k"], n_parts=n_parts)
    return path


def test_write_partitioned_roundtrip(ray_session, tmp_path):
    path = _input(tmp_path)
    assert is_complete(path)
    assert n_partitions(path) == 4
    # every row lands in exactly one partition; union reproduces the input
    rows = []
    for p in range(4):
        d = os.path.join(path, f"{PART_COL}={p}")
        if os.path.exists(d):
            rows += ray.data.read_parquet(d).take_all()
    assert sorted(r["k"] for r in rows) == list(range(100))


def test_resume_skips_done_partitions(ray_session, tmp_path):
    path = _input(tmp_path)
    out = str(tmp_path / "out")
    calls = []

    def double(ds):
        calls.append(1)

        def fn(t: pa.Table) -> pa.Table:
            cols = {"k": t["k"], "v2": pa.array(np.asarray(t["v"]) * 2)}
            return pa.table(cols)

        return ds.map_batches(fn, batch_format="pyarrow")

    c1: dict = {}
    r1 = resume_map_partitions(path, out, double, counters=c1)
    assert c1 == {"partitions_computed": 4, "partitions_skipped": 0}
    assert sorted(r["v2"] for r in r1.take_all()) == [i * 20 for i in range(100)]

    # second run: everything skipped, map_fn never called, same result
    calls.clear()
    c2: dict = {}
    r2 = resume_map_partitions(path, out, double, counters=c2)
    assert c2 == {"partitions_computed": 0, "partitions_skipped": 4}
    assert calls == []
    assert sorted(r["v2"] for r in r2.take_all()) == [i * 20 for i in range(100)]

    # kill simulation: drop one marker (partial output stays) -> exactly one
    # partition recomputed, partial output replaced
    os.unlink(os.path.join(out, "part_2", "_DONE"))
    c3: dict = {}
    r3 = resume_map_partitions(path, out, double, counters=c3)
    assert c3 == {"partitions_computed": 1, "partitions_skipped": 3}
    assert sorted(r["v2"] for r in r3.take_all()) == [i * 20 for i in range(100)]


def test_resume_handles_empty_partition(ray_session, tmp_path):
    # 2 rows into 8 partitions: most partitions have no input directory at
    # all — they must still be marked done and excluded from the read
    ds = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2], type=pa.int64())})
    )
    path = str(tmp_path / "inp")
    write_partitioned(ds, path, key_columns=["k"], n_parts=8)
    out = str(tmp_path / "o")
    r = resume_map_partitions(path, out, lambda d: d, counters={})
    assert sorted(x["k"] for x in r.take_all()) == [1, 2]
    c: dict = {}
    resume_map_partitions(path, out, lambda d: d, counters=c)
    assert c["partitions_skipped"] == 8
