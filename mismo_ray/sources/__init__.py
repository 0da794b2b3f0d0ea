"""Sources: format-dispatched reads with column pruning + schema normalization.

The engine consumes any ``ray.data.Dataset``; these helpers wrap the Ray
readers (SURVEY §2.1 "read_csv + cast": the reference's examples read CSVs
and cast columns, e.g. the patents loader) so every record table enters the
pipelines in canonical form:

- ``read_records``: parquet/csv/json(l) by extension, ``columns=`` pushed to
  the reader where supported (parquet prunes at the row-group level — the
  "prune at the read" rule), explicit per-column casts, and a guaranteed
  int64 ``record_id`` (cast from an id column, or derived as a deterministic
  hash of one or more key columns when no numeric id exists).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

import numpy as np
import pyarrow as pa
import ray.data

from mismo_ray._util import combine_hash_columns


def _cast_batch(casts: Mapping[str, pa.DataType]):
    def fn(t: pa.Table) -> pa.Table:
        for name, typ in casts.items():
            idx = t.schema.get_field_index(name)
            t = t.set_column(idx, name, t[name].combine_chunks().cast(typ))
        return t

    return fn


def read_records(
    path: str | Sequence[str],
    *,
    columns: Sequence[str] | None = None,
    casts: Mapping[str, pa.DataType] | None = None,
    record_id: str | Sequence[str] | None = None,
    **reader_kwargs,
) -> ray.data.Dataset:
    """Read a record table in canonical form.

    ``record_id``: an existing column to cast to int64 ``record_id``, or a
    list of key columns hashed into a deterministic int64 id (for sources
    with no numeric key — the hash is splitmix-finalized siphash, stable
    across runs/processes).
    """
    paths = [path] if isinstance(path, str) else list(path)
    ext = paths[0].rsplit(".", 1)[-1].lower()
    if ext in ("parquet", "pq"):
        ds = ray.data.read_parquet(paths, columns=list(columns) if columns else None,
                                   **reader_kwargs)
    elif ext == "csv":
        ds = ray.data.read_csv(paths, **reader_kwargs)
        if columns:
            ds = ds.select_columns(list(columns))
    elif ext in ("json", "jsonl"):
        ds = ray.data.read_json(paths, **reader_kwargs)
        if columns:
            ds = ds.select_columns(list(columns))
    else:
        raise ValueError(f"unsupported source extension: {ext}")
    if casts:
        ds = ds.map_batches(_cast_batch(dict(casts)), batch_format="pyarrow")
    if record_id is not None:
        if isinstance(record_id, str):
            src = record_id

            def add_id(t: pa.Table) -> pa.Table:
                rid = t[src].combine_chunks().cast(pa.int64())
                if "record_id" in t.column_names:
                    return t.set_column(
                        t.schema.get_field_index("record_id"), "record_id", rid
                    )
                return t.append_column("record_id", rid)

        else:
            keys = list(record_id)

            def add_id(t: pa.Table) -> pa.Table:
                h = combine_hash_columns(t, keys).astype(np.int64)
                return t.append_column("record_id", pa.array(h))

        ds = ds.map_batches(add_id, batch_format="pyarrow")
    return ds
