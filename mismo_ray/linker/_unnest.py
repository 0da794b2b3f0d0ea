"""UnnestLinker: link records sharing ANY element of an array key
(reference: /root/reference/mismo/linker/_unnest.py:12-99).

Ray mapping (SURVEY §2.3): explode the array column to (record_id, token)
rows inside ``map_batches`` (distinct per row, so duplicate tokens in one
record don't self-inflate), reuse the pair-generation core keyed on the
token (inheriting the max_pairs hot-token drop + salting), then one distinct
on the pair ids (a pair sharing k tokens is produced k times).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from mismo_ray._joins import distinct
from mismo_ray.keys import KeySpec, resolve_keys
from mismo_ray.linker._common import Task, infer_task
from mismo_ray.linker._pairgen import generate_pairs
from mismo_ray.types import Linkage


def _explode(ds: ray.data.Dataset, key: KeySpec, side: str) -> ray.data.Dataset:
    def fn(t: pa.Table) -> pa.Table:
        arr = key(t, side)
        ids = t["record_id"].to_pylist()
        out_ids, out_tokens = [], []
        for rid, row in zip(ids, arr.to_pylist()):
            if row is None:
                continue
            for tok in set(row):
                if tok is None:
                    continue
                out_ids.append(rid)
                out_tokens.append(tok)
        return pa.table(
            {
                "record_id": pa.array(out_ids, type=t.schema.field("record_id").type),
                "token": pa.array(out_tokens, type=arr.type.value_type),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


class UnnestLinker:
    def __init__(
        self,
        key,
        *,
        max_pairs: int | None = None,
        salt_rows: int | None = 2048,
        task: Task | None = None,
    ):
        keys = resolve_keys(key)
        if len(keys) != 1:
            raise ValueError("UnnestLinker takes exactly one array key")
        self.key: KeySpec = keys[0]
        self.max_pairs = max_pairs
        self.salt_rows = salt_rows
        self.task = task
        self.last_counters: dict = {}

    def __call__(
        self, left: ray.data.Dataset, right: ray.data.Dataset
    ) -> Linkage:
        task = infer_task(task=self.task, left=left, right=right)
        ex_left = _explode(left, self.key, "left")
        ex_right = ex_left if right is left else _explode(right, self.key, "right")
        links, counters = generate_pairs(
            ex_left,
            ex_right,
            resolve_keys("token"),
            task=task,
            max_pairs=self.max_pairs,
            salt_rows=self.salt_rows,
        )
        self.last_counters = counters
        deduped = distinct(links, ["record_id_l", "record_id_r"])
        lbase = left.schema().base_schema
        rbase = right.schema().base_schema if task == "link" else lbase
        schema = pa.schema(
            [
                pa.field("record_id_l", lbase.field("record_id").type),
                pa.field("record_id_r", rbase.field("record_id").type),
            ]
        )
        return Linkage(left=left, right=right, links=deduped, links_schema=schema)
