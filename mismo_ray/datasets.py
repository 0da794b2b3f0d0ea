"""Datasets: an ordered dict of named record tables + the Dimension protocol.

Reference:
- ``Datasets`` (mismo/_datasets.py:11-149): abstracts dedupe-one-table vs
  link-two-tables; ``unioned()`` concatenates over the shared columns with a
  dataset-name tag.
- Dimension convention (SURVEY §2.8): per-domain featurization classes with
  the 3 hooks ``prepare_for_fast_linking`` / ``prepare_for_blocking`` /
  ``compare`` (mismo/lib/name/_dimension.py:8-73 etc.) — here each hook is a
  ``Dataset -> Dataset`` function and ``compare`` returns a LevelComparer.
"""

from __future__ import annotations

from collections.abc import Iterator, Mapping
from typing import Protocol, runtime_checkable

import pyarrow as pa
import ray.data


class Datasets(Mapping[str, ray.data.Dataset]):
    """Ordered, named collection of record tables (each with ``record_id``)."""

    def __init__(self, tables: Mapping[str, ray.data.Dataset] | ray.data.Dataset):
        if isinstance(tables, ray.data.Dataset):
            tables = {"left": tables}
        self._tables = dict(tables)

    def __getitem__(self, name: str) -> ray.data.Dataset:
        return self._tables[name]

    def __iter__(self) -> Iterator[str]:
        return iter(self._tables)

    def __len__(self) -> int:
        return len(self._tables)

    def map(self, fn) -> "Datasets":
        """fn(name, ds) -> ds applied to every member."""
        return Datasets({k: fn(k, v) for k, v in self._tables.items()})

    def unioned(self, *, tag_column: str = "dataset") -> ray.data.Dataset:
        """Non-distinct union over the SHARED columns, tagged with the
        source dataset name (reference _datasets.py unioned())."""
        names = list(self._tables)
        shared: list[str] | None = None
        for ds in self._tables.values():
            s = ds.schema(fetch_if_missing=True)
            if s is None:
                continue  # empty member: contributes no rows, constrains nothing
            cols = s.base_schema.names
            shared = cols if shared is None else [c for c in shared if c in cols]
        shared = shared or []

        def tag(name):
            def fn(t: pa.Table) -> pa.Table:
                t = t.select(shared)
                return t.append_column(
                    tag_column, pa.array([name] * len(t), type=pa.string())
                )

            return fn

        parts = [
            self._tables[n].map_batches(tag(n), batch_format="pyarrow")
            for n in names
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.union(p)
        return out

    def all_record_ids(self) -> ray.data.Dataset:
        parts = [
            ds.select_columns(["record_id"]) for ds in self._tables.values()
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.union(p)
        return out


@runtime_checkable
class Dimension(Protocol):
    """Per-domain featurization pipeline step (the user-extension surface)."""

    name: str

    def prepare_for_fast_linking(self, ds: ray.data.Dataset) -> ray.data.Dataset:
        """Cheap normalization applied to every record."""
        ...

    def prepare_for_blocking(self, ds: ray.data.Dataset) -> ray.data.Dataset:
        """Derive blocking keys / heavier features."""
        ...

    def compare(self):
        """Return the LevelComparer scoring this dimension on pairs."""
        ...
