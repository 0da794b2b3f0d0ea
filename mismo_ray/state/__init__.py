"""Checkpointing and resumable partitioned output.

The resume discipline of the brief (and north_rule): lay outputs out so a
rerun can skip finished work — one output directory per input shard / key
range, written atomically (tmp dir + rename), plus a manifest of completed
partitions with lineage + counters. ``Linkage.to_parquets`` gives stage-level
checkpoints; this module gives the generic building blocks:

- ``checkpoint`` / ``resume_or_compute``: stage-level memoization of any
  Dataset to a parquet directory with a manifest;
- ``process_shards``: shard-level pipeline driver — each input shard is
  processed independently, written atomically, and skipped on rerun if its
  manifest says done. Shards are dispatched through Ray Data so the
  per-shard transforms still stream; the skip logic is deliberately
  driver-side and filesystem-backed (it must survive driver crashes).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from collections.abc import Callable, Sequence

import ray.data

MANIFEST = "manifest.json"


def _write_manifest(path: str, payload: dict) -> None:
    tmp = os.path.join(path, MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=2, default=str)
    os.replace(tmp, os.path.join(path, MANIFEST))


def is_complete(path: str) -> bool:
    return os.path.exists(os.path.join(path, MANIFEST))


def read_manifest(path: str) -> dict:
    with open(os.path.join(path, MANIFEST)) as f:
        return json.load(f)


def checkpoint(
    ds: ray.data.Dataset,
    path: str,
    *,
    counters: dict | None = None,
    lineage: dict | None = None,
) -> ray.data.Dataset:
    """Write ``ds`` to ``path`` atomically (tmp dir + rename) with a manifest;
    returns a Dataset reading the checkpoint (lineage truncated)."""
    tmp = path + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp, exist_ok=True)
    ds.write_parquet(os.path.join(tmp, "data"))
    n_rows = ray.data.read_parquet(os.path.join(tmp, "data")).count()
    _write_manifest(
        tmp,
        {
            "created_unix": time.time(),
            "n_rows": n_rows,
            "counters": counters or {},
            "lineage": lineage or {},
        },
    )
    if os.path.exists(path):
        shutil.rmtree(path)
    os.replace(tmp, path)
    return ray.data.read_parquet(os.path.join(path, "data"))


def resume_or_compute(
    path: str,
    fn: Callable[[], ray.data.Dataset],
    *,
    counters: dict | None = None,
    lineage: dict | None = None,
) -> tuple[ray.data.Dataset, bool]:
    """(dataset, resumed): read the checkpoint if complete, else compute,
    checkpoint, and read back."""
    if is_complete(path):
        return ray.data.read_parquet(os.path.join(path, "data")), True
    return checkpoint(fn(), path, counters=counters, lineage=lineage), False


def process_shards(
    shards: Sequence[str],
    process_fn: Callable[[str], ray.data.Dataset],
    out_dir: str,
    *,
    shard_name: Callable[[str], str] | None = None,
) -> dict:
    """Process input shards resumably: each shard's output goes to
    ``out_dir/<shard_name>/`` atomically; completed shards are skipped on
    rerun. Returns {shard: "done"|"skipped"} plus totals."""
    os.makedirs(out_dir, exist_ok=True)
    name_of = shard_name or (lambda s: os.path.splitext(os.path.basename(s))[0])
    status: dict = {}
    n_done = n_skipped = 0
    for shard in shards:
        dest = os.path.join(out_dir, name_of(shard))
        if is_complete(dest):
            status[shard] = "skipped"
            n_skipped += 1
            continue
        ds = process_fn(shard)
        checkpoint(ds, dest, lineage={"input_shard": shard})
        status[shard] = "done"
        n_done += 1
    _write_manifest(
        out_dir,
        {
            "created_unix": time.time(),
            "shards": {name_of(s): status[s] for s in shards},
            "n_done": n_done,
            "n_skipped": n_skipped,
        },
    )
    return {"status": status, "n_done": n_done, "n_skipped": n_skipped}


def read_shard_outputs(out_dir: str) -> ray.data.Dataset:
    """Read the union of all completed shard outputs."""
    manifest = read_manifest(out_dir)
    files: list[str] = []
    for name, st in manifest["shards"].items():
        if st not in ("done", "skipped"):
            continue
        d = os.path.join(out_dir, name, "data")
        files.extend(
            os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".parquet")
        )
    return ray.data.read_parquet(files)
