"""Partition-level checkpoint/resume for expensive map stages.

north_rule: "checkpointed per partition to Parquet ... so runs resume
mid-pipeline". Stage-level resume (skip a whole completed stage) is handled
by Linkage.to_parquets manifests; this module adds the finer grain: a stage's
INPUT is written once as hash-partitioned parquet, its OUTPUT is produced one
partition at a time with a per-partition ``_DONE`` marker, and a re-run after
a mid-stage kill recomputes only the unfinished partitions.

Scale notes: each partition is itself a multi-file parquet directory
processed by a parallel Ray Data pipeline, so n_parts needs only to be large
enough that losing one partition's work is cheap (16-256), not
cluster-width. Partial output from a killed partition is deleted before
recompute (the marker is written only after a complete write), so output
directories are always all-or-nothing.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable

import numpy as np
import pyarrow as pa
import ray.data

from mismo_ray._util import hash64

PART_COL = "__part__"


def write_partitioned(
    ds: ray.data.Dataset,
    path: str,
    *,
    key_columns: list[str],
    n_parts: int = 16,
    seed: int = 0,
) -> None:
    """Write ``ds`` as hive-partitioned parquet split by a deterministic
    key hash, then mark the whole write complete with ``_DONE``."""

    def add_part(t: pa.Table) -> pa.Table:
        h = np.zeros(len(t), dtype=np.uint64)
        for i, c in enumerate(key_columns):
            h ^= hash64(t[c], seed=seed + i)
        part = (h % np.uint64(n_parts)).astype(np.int64)
        return t.append_column(PART_COL, pa.array(part))

    if os.path.exists(path):
        shutil.rmtree(path)
    ds.map_batches(add_part, batch_format="pyarrow").write_parquet(
        path, partition_cols=[PART_COL]
    )
    with open(os.path.join(path, "_DONE"), "w") as f:
        f.write(str(n_parts))


def is_complete(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_DONE"))


def n_partitions(path: str) -> int:
    with open(os.path.join(path, "_DONE")) as f:
        return int(f.read().strip())


def resume_map_partitions(
    input_dir: str,
    out_dir: str,
    map_fn: Callable[[ray.data.Dataset], ray.data.Dataset],
    *,
    counters: dict | None = None,
) -> ray.data.Dataset:
    """Apply ``map_fn`` (Dataset -> Dataset, map-only) to each partition of a
    ``write_partitioned`` directory, skipping partitions whose output already
    carries a ``_DONE`` marker. Returns the union of all partition outputs
    (read back from parquet — resumable and spill-free).

    ``counters`` (optional) receives ``partitions_computed`` /
    ``partitions_skipped``.
    """
    n_parts = n_partitions(input_dir)
    computed = skipped = 0
    out_dirs: list[str] = []
    for p in range(n_parts):
        part_in = os.path.join(input_dir, f"{PART_COL}={p}")
        part_out = os.path.join(out_dir, f"part_{p}")
        marker = os.path.join(part_out, "_DONE")
        if os.path.exists(marker):
            skipped += 1
        else:
            if os.path.exists(part_out):
                # partial output from a killed run — recompute from scratch
                shutil.rmtree(part_out)
            os.makedirs(part_out, exist_ok=True)
            if os.path.exists(part_in):
                out = map_fn(ray.data.read_parquet(part_in))
                out.write_parquet(part_out)
            with open(marker, "w") as f:
                f.write("done")
            computed += 1
        if any(
            name.endswith(".parquet")
            for name in os.listdir(part_out)
        ):
            out_dirs.append(part_out)
    if counters is not None:
        counters["partitions_computed"] = (
            counters.get("partitions_computed", 0) + computed
        )
        counters["partitions_skipped"] = (
            counters.get("partitions_skipped", 0) + skipped
        )
    # explicit file list: the _DONE markers living next to the data files
    # would otherwise confuse the path resolver
    files = [
        os.path.join(d, name)
        for d in out_dirs
        for name in sorted(os.listdir(d))
        if name.endswith(".parquet")
    ]
    if not files:
        return ray.data.from_items([])
    return ray.data.read_parquet(files)
