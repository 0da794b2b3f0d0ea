"""Sorted-neighborhood blocking: pair each record with its ``window``
successors in global sort order of a key.

The reference has no SN linker (the north_star names it; SURVEY §7.2 step 4:
compose from ``ds.sort`` + windowed map over adjacent rows with boundary
overlap). Distributed design:

1. project to (record_id, __snkey__), global ``sort`` on (key, record_id) —
   a range shuffle producing ordered, range-disjoint blocks;
2. each sorted block emits its within-block sliding-window pairs, plus its
   first/last ``window`` rows as tagged boundary rows (2w rows per block);
3. the boundary rows (tiny: 2w x n_blocks) are collected, re-sorted on the
   driver, and cross-block window pairs are enumerated there — exact as long
   as every block holds at least ``window`` rows (guaranteed for real block
   sizes; degenerate tiny blocks are handled because boundary rows then cover
   whole blocks and the final distinct removes duplicates);
4. union + one distinct on the pair ids.

Dedupe task only (two-table SN would interleave both sides; not needed by the
reference surface).
"""

from __future__ import annotations

import uuid

import numpy as np
import pyarrow as pa
import ray.data

from mismo_ray._joins import distinct
from mismo_ray._util import base_schema_or, linker_fallback_schema
from mismo_ray.keys import KeySpec, resolve_keys
from mismo_ray.types import Linkage


class SortedNeighborhoodLinker:
    def __init__(self, key, *, window: int = 3):
        keys = resolve_keys(key)
        if len(keys) != 1:
            raise ValueError("SortedNeighborhoodLinker takes exactly one key")
        self.key: KeySpec = keys[0]
        if window < 1:
            raise ValueError("window must be >= 1")
        self.window = window
        self.last_counters: dict = {}

    def __call__(
        self, left: ray.data.Dataset, right: ray.data.Dataset
    ) -> Linkage:
        if right is not left:
            raise NotImplementedError(
                "SortedNeighborhoodLinker supports the dedupe task only"
            )
        w = self.window
        key = self.key

        def project(t: pa.Table) -> pa.Table:
            arr = key(t, "left")
            out = pa.table({"record_id": t["record_id"], "__snkey__": arr})
            return out.filter(pa.compute.is_valid(out["__snkey__"]))

        proj = left.map_batches(project, batch_format="pyarrow")
        sorted_ds = proj.sort(["__snkey__", "record_id"])

        def block_pairs(t: pa.Table) -> pa.Table:
            n = len(t)
            rid = t["record_id"].to_numpy(zero_copy_only=False)
            pairs_l, pairs_r = [], []
            for d in range(1, w + 1):
                if n > d:
                    pairs_l.append(np.arange(0, n - d))
                    pairs_r.append(np.arange(d, n))
            if pairs_l:
                il = np.concatenate(pairs_l)
                ir = np.concatenate(pairs_r)
                a, b = rid[il], rid[ir]
                swap = a > b
                lo = np.where(swap, b, a)
                hi = np.where(swap, a, b)
            else:
                lo = hi = np.array([], dtype=rid.dtype)
            block_id = uuid.uuid4().hex
            head = min(w, n)
            bidx = np.concatenate([np.arange(head), np.arange(max(0, n - head), n)])
            bidx = np.unique(bidx)
            boundary_pos = np.where(bidx < head, bidx + 1, bidx - n)  # +1..w head, -w..-1 tail
            pair_part = pa.table(
                {
                    "kind": pa.array(np.zeros(len(lo), dtype=np.int8)),
                    "record_id_l": pa.array(lo),
                    "record_id_r": pa.array(hi),
                    "b_record_id": pa.nulls(len(lo), t.schema.field("record_id").type),
                    "b_key": pa.nulls(len(lo), t.schema.field("__snkey__").type),
                    "b_pos": pa.nulls(len(lo), pa.int32()),
                    "b_block": pa.nulls(len(lo), pa.string()),
                }
            )
            btake = pa.array(bidx, type=pa.int64())
            boundary_part = pa.table(
                {
                    "kind": pa.array(np.ones(len(bidx), dtype=np.int8)),
                    "record_id_l": pa.nulls(len(bidx), pair_part.schema.field("record_id_l").type),
                    "record_id_r": pa.nulls(len(bidx), pair_part.schema.field("record_id_r").type),
                    "b_record_id": pa.compute.take(t["record_id"], btake),
                    "b_key": pa.compute.take(t["__snkey__"], btake),
                    "b_pos": pa.array(boundary_pos.astype(np.int32)),
                    "b_block": pa.array([block_id] * len(bidx), type=pa.string()),
                }
            )
            return pa.concat_tables([pair_part, boundary_part], promote_options="default")

        mixed = sorted_ds.map_batches(block_pairs, batch_format="pyarrow").materialize()

        import pyarrow.compute as pc

        within = mixed.map_batches(
            lambda t: t.filter(pc.equal(t["kind"], 0)).select(
                ["record_id_l", "record_id_r"]
            ),
            batch_format="pyarrow",
        )
        boundary = mixed.map_batches(
            lambda t: t.filter(pc.equal(t["kind"], 1)).select(
                ["b_record_id", "b_key", "b_pos", "b_block"]
            ),
            batch_format="pyarrow",
        ).to_pandas()

        cross_l, cross_r = [], []
        if len(boundary):
            boundary = boundary.sort_values(
                ["b_key", "b_record_id"], kind="mergesort"
            ).reset_index(drop=True)
            ids = boundary["b_record_id"].to_numpy()
            blocks = boundary["b_block"].to_numpy()
            pos = boundary["b_pos"].to_numpy()
            n = len(boundary)
            for i in range(n):
                # only rows within w of a block edge can have cross-block
                # successors; scan forward up to w rows
                steps = 0
                j = i + 1
                while j < n and steps < w:
                    if blocks[j] != blocks[i]:
                        # cross-block: the global rank distance equals the
                        # boundary-set distance because every row between a
                        # block edge and a row within w of it is itself a
                        # boundary row.
                        a, b = ids[i], ids[j]
                        cross_l.append(min(a, b))
                        cross_r.append(max(a, b))
                    steps += 1
                    j += 1
        if cross_l:
            cross = ray.data.from_arrow(
                pa.table(
                    {
                        "record_id_l": pa.array(cross_l),
                        "record_id_r": pa.array(cross_r),
                    }
                )
            )
            within = within.union(cross)
        links = distinct(within, ["record_id_l", "record_id_r"])
        self.last_counters = {"window": w}
        rid_t = base_schema_or(left, linker_fallback_schema()).field("record_id").type
        schema = pa.schema(
            [pa.field("record_id_l", rid_t), pa.field("record_id_r", rid_t)]
        )
        return Linkage(left=left, right=right, links=links, links_schema=schema)
