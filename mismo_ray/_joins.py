"""Join helpers over ray.data.Dataset.

Two families, chosen by side size (SURVEY §4 / ray_guide "Joins and lookups"):

- ``hash_join``: both sides large -> Ray Data's hash-partitioned
  ``Dataset.join`` (an all-to-all shuffle on the key).
- ``broadcast_*``: small side collected once, shipped via ``ray.put``, applied
  inside ``map_batches`` (no shuffle). Used for key sets (semi/anti) and
  dimension lookups (term->idf, id->component at test scale).
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pyarrow as pa
import ray
import ray.data


def default_num_partitions() -> int:
    try:
        n = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        n = 8
    return max(2, min(200, n * 2))


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str | Sequence[str],
    *,
    right_on: str | Sequence[str] | None = None,
    how: str = "inner",
    num_partitions: int | None = None,
    left_suffix: str | None = None,
    right_suffix: str | None = "_r",
) -> ray.data.Dataset:
    """Hash-partitioned equi-join (wraps Dataset.join)."""
    on = (on,) if isinstance(on, str) else tuple(on)
    if right_on is not None:
        right_on = (right_on,) if isinstance(right_on, str) else tuple(right_on)
    return left.join(
        right,
        join_type=how,
        num_partitions=num_partitions or default_num_partitions(),
        on=on,
        right_on=right_on,
        left_suffix=left_suffix,
        right_suffix=right_suffix,
    )


def broadcast_isin(
    ds: ray.data.Dataset,
    column: str,
    values,
    *,
    invert: bool = False,
) -> ray.data.Dataset:
    """Semi (or anti, invert=True) join against a broadcast key set."""
    ref = ray.put(frozenset(values))

    def fn(batch: pa.Table) -> pa.Table:
        keys = ray.get(ref)
        col = batch[column].to_pylist()
        mask = np.fromiter((v in keys for v in col), dtype=bool, count=len(col))
        if invert:
            mask = ~mask
        return batch.filter(pa.array(mask))

    return ds.map_batches(fn, batch_format="pyarrow")


def broadcast_lookup(
    ds: ray.data.Dataset,
    column: str,
    mapping: dict,
    *,
    result_name: str,
    default=None,
    result_type: pa.DataType | None = None,
) -> ray.data.Dataset:
    """Add a column by looking ``column`` up in a broadcast dict (dimension join
    without a shuffle)."""
    ref = ray.put(mapping)

    def fn(batch: pa.Table) -> pa.Table:
        m = ray.get(ref)
        vals = [m.get(v, default) for v in batch[column].to_pylist()]
        arr = pa.array(vals, type=result_type) if result_type else pa.array(vals)
        return batch.append_column(result_name, arr)

    return ds.map_batches(fn, batch_format="pyarrow")
