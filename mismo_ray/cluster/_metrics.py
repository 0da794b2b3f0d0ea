"""Graph metrics (reference: /root/reference/mismo/cluster/_metrics.py:28-69)."""

from __future__ import annotations

import pyarrow as pa
import ray.data
from ray.data.aggregate import Count

from mismo_ray._joins import distinct


def degree(links: ray.data.Dataset) -> ray.data.Dataset:
    """Per-node distinct-neighbor count: union of both link directions,
    distinct, then groupby-count. Columns: (record_id, degree)."""

    def both_dirs(t: pa.Table) -> pa.Table:
        l = t["record_id_l"].combine_chunks()
        r = t["record_id_r"].combine_chunks()
        return pa.table(
            {
                "record_id": pa.concat_arrays([l, r]),
                "neighbor": pa.concat_arrays([r, l]),
            }
        )

    sym = links.map_batches(both_dirs, batch_format="pyarrow")
    dedup = distinct(sym, ["record_id", "neighbor"])
    return dedup.groupby("record_id").aggregate(Count(alias_name="degree"))
