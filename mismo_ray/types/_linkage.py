"""Core pipeline currency: LinksTable and Linkage.

Reference:
- LinksTable: /root/reference/mismo/types/_links_table.py:15-44 (pairs table
  with >= columns record_id_l, record_id_r plus per-pair feature columns;
  ``with_both`` attaches ``_l``/``_r`` record columns).
- Linkage: /root/reference/mismo/linkage/_linkage.py:17-132 (dataclass of
  {left, right, links}; persists as three parquet directories — our natural
  per-stage checkpoint unit, with a JSON manifest carrying lineage + counters).
- link_counts / with_n_links: /root/reference/mismo/types/_linked_table.py:192-303
  (per-record link count incl. the zero bucket).

Ray-Data mapping: each member is a ``ray.data.Dataset``; attaching ``_l``/``_r``
columns is two hash equi-joins keyed on the record ids; counts are
groupby-aggregates over the links only (never over the record corpus).
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Sequence

import pyarrow as pa
import ray.data
from ray.data.aggregate import Count

from mismo_ray._joins import broadcast_lookup, default_num_partitions, hash_join


def _prune_rename(
    ds: ray.data.Dataset, columns: Sequence[str] | None, suffix: str
) -> tuple[ray.data.Dataset, pa.Schema]:
    """Project to (record_id, columns...) and suffix everything, so the join
    ships only the needed columns (prune-at-the-read discipline).
    Returns (dataset, schema) so joins need no schema inference."""
    _s = ds.schema(fetch_if_missing=True)
    base = _s.base_schema if _s is not None else pa.schema(
        [pa.field("record_id", pa.int64())]
        + [pa.field(c, pa.null()) for c in (columns or [])]
    )  # empty side: zero rows, types never meet data

    def fn(t: pa.Table) -> pa.Table:
        cols = list(columns) if columns is not None else [
            c for c in t.column_names if c != "record_id"
        ]
        t = t.select(["record_id", *cols])
        return t.rename_columns([f"{c}{suffix}" for c in t.column_names])

    cols = list(columns) if columns is not None else [
        c for c in base.names if c != "record_id"
    ]
    schema = pa.schema(
        [pa.field(f"{c}{suffix}", base.field(c).type) for c in ["record_id", *cols]]
    )
    return ds.map_batches(fn, batch_format="pyarrow"), schema


class LinksTable:
    """A Dataset of candidate/confirmed pairs + handles to both record tables."""

    def __init__(
        self,
        links: ray.data.Dataset,
        *,
        left: ray.data.Dataset,
        right: ray.data.Dataset,
        schema: pa.Schema | None = None,
    ):
        self.ds = links
        self.left = left
        self.right = right
        self.schema = schema  # known links schema (avoids plan execution)

    def with_left(
        self, columns: Sequence[str] | None = None, *, num_partitions: int | None = None
    ) -> ray.data.Dataset:
        left, lsch = _prune_rename(self.left, columns, "_l")
        return hash_join(
            self.ds, left, on="record_id_l", num_partitions=num_partitions,
            left_schema=self.schema, right_schema=lsch,
        )

    def with_right(
        self, columns: Sequence[str] | None = None, *, num_partitions: int | None = None
    ) -> ray.data.Dataset:
        right, rsch = _prune_rename(self.right, columns, "_r")
        return hash_join(
            self.ds, right, on="record_id_r", num_partitions=num_partitions,
            left_schema=self.schema, right_schema=rsch,
        )

    def with_both(
        self,
        columns_l: Sequence[str] | None = None,
        columns_r: Sequence[str] | None = None,
        *,
        num_partitions: int | None = None,
        broadcast_threshold: int = 200_000,
    ) -> ray.data.Dataset:
        """links + ``<col>_l`` and ``<col>_r`` columns.

        Small record tables (<= broadcast_threshold rows) are collected once
        and broadcast via ``ray.put`` — one map over the links, no shuffle.
        Larger tables fall back to two hash joins (the scale path).
        """
        try:
            n_left = self.left.count()
            n_right = n_left if self.right is self.left else self.right.count()
        except Exception:
            n_left = n_right = broadcast_threshold + 1
        if max(n_left, n_right) <= broadcast_threshold:
            return self._with_both_broadcast(columns_l, columns_r)
        n = num_partitions or default_num_partitions()
        left, lsch = _prune_rename(self.left, columns_l, "_l")
        right, rsch = _prune_rename(self.right, columns_r, "_r")
        sch1 = None
        if self.schema is not None:
            merged = [f for f in self.schema] + [
                f for f in lsch if f.name != "record_id_l"
            ]
            sch1 = pa.schema(merged)
        out = hash_join(
            self.ds, left, on="record_id_l", num_partitions=n,
            left_schema=self.schema, right_schema=lsch,
        )
        return hash_join(
            out, right, on="record_id_r", num_partitions=n,
            left_schema=sch1, right_schema=rsch,
        )

    def _with_both_broadcast(
        self,
        columns_l: Sequence[str] | None,
        columns_r: Sequence[str] | None,
    ) -> ray.data.Dataset:
        import ray as _ray

        def collect(ds: ray.data.Dataset, columns) -> tuple[dict, list, list]:
            base_s = ds.schema(fetch_if_missing=True)
            if base_s is None:  # empty side: nothing to attach
                cols = list(columns) if columns is not None else []
                return {}, cols, [pa.null()] * len(cols)
            base = base_s.base_schema
            cols = list(columns) if columns is not None else [
                c for c in base.names if c != "record_id"
            ]
            types = [base.field(c).type for c in cols]
            m: dict = {}
            for b in ds.select_columns(["record_id", *cols]).iter_batches(
                batch_format="pyarrow"
            ):
                ids = b["record_id"].to_pylist()
                vals = [b[c].to_pylist() for c in cols]
                for i, rid in enumerate(ids):
                    m[rid] = tuple(v[i] for v in vals)
            return m, cols, types

        lmap, lcols, ltypes = collect(self.left, columns_l)
        if self.right is self.left and (columns_r or None) == (columns_l or None):
            rmap, rcols, rtypes = lmap, lcols, ltypes
        else:
            rmap, rcols, rtypes = collect(self.right, columns_r)
        ref = _ray.put((lmap, rmap))

        def attach(t: pa.Table) -> pa.Table:
            lm, rm = _ray.get(ref)
            lids = t["record_id_l"].to_pylist()
            rids = t["record_id_r"].to_pylist()
            lrows = [lm.get(x) for x in lids]
            rrows = [rm.get(x) for x in rids]
            for j, c in enumerate(lcols):
                t = t.append_column(
                    f"{c}_l",
                    pa.array(
                        [None if r is None else r[j] for r in lrows], type=ltypes[j]
                    ),
                )
            for j, c in enumerate(rcols):
                t = t.append_column(
                    f"{c}_r",
                    pa.array(
                        [None if r is None else r[j] for r in rrows], type=rtypes[j]
                    ),
                )
            return t

        return self.ds.map_batches(attach, batch_format="pyarrow")

    def count(self) -> int:
        return self.ds.count()


class Linkage:
    """{left, right, links} — the central unit passed between pipeline stages."""

    def __init__(
        self,
        *,
        left: ray.data.Dataset,
        right: ray.data.Dataset,
        links: ray.data.Dataset,
        links_schema: pa.Schema | None = None,
    ):
        self.left = left
        self.right = right
        self._links = links
        self._links_schema = links_schema

    @property
    def links(self) -> LinksTable:
        return LinksTable(
            self._links, left=self.left, right=self.right,
            schema=self._links_schema,
        )

    @property
    def links_ds(self) -> ray.data.Dataset:
        return self._links

    # ------------------------------------------------------------ persistence
    def to_parquets(self, directory: str, *, counters: dict | None = None) -> None:
        """Checkpoint: left/ right/ links/ parquet dirs + manifest.json."""
        os.makedirs(directory, exist_ok=True)
        for name, ds in (("left", self.left), ("right", self.right), ("links", self._links)):
            ds.write_parquet(os.path.join(directory, name))
        manifest = {
            "format": "mismo_ray.Linkage",
            "created_unix": time.time(),
            "counters": counters or {},
        }
        with open(os.path.join(directory, "manifest.json"), "w") as f:
            json.dump(manifest, f, indent=2)

    @classmethod
    def from_parquets(cls, directory: str) -> "Linkage":
        return cls(
            left=ray.data.read_parquet(os.path.join(directory, "left")),
            right=ray.data.read_parquet(os.path.join(directory, "right")),
            links=ray.data.read_parquet(os.path.join(directory, "links")),
        )

    # ------------------------------------------------------------ diagnostics
    def _n_links_ds(self, side: str) -> ray.data.Dataset:
        key = "record_id_l" if side == "left" else "record_id_r"
        # links are already distinct pairs by construction (linkers dedup);
        # count links per record on this side.
        return (
            self._links.groupby(key)
            .aggregate(Count(alias_name="n_links"))
            .map_batches(
                lambda t: t.rename_columns(
                    ["record_id" if c == key else c for c in t.column_names]
                ),
                batch_format="pyarrow",
            )
        )

    def with_n_links(
        self, side: str = "left", *, broadcast_threshold: int = 5_000_000
    ) -> ray.data.Dataset:
        """Records of ``side`` with an ``n_links`` column (0 for unlinked).

        When the per-record counts table is small it is broadcast into a map
        over the records (no shuffle); above ``broadcast_threshold`` rows it
        falls back to a hash left-outer join.
        """
        counts_ds = self._n_links_ds(side)
        records = self.left if side == "left" else self.right
        if counts_ds.count() <= broadcast_threshold:
            counts = counts_ds.to_pandas()
            mapping = (
                dict(zip(counts["record_id"], counts["n_links"]))
                if len(counts)
                else {}  # no links: every record gets the 0 default
            )
            return broadcast_lookup(
                records,
                "record_id",
                mapping,
                result_name="n_links",
                default=0,
                result_type=pa.int64(),
            )
        joined = hash_join(records, counts_ds, on="record_id", how="left_outer")

        def fill_zero(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            n = pc.fill_null(t["n_links"], 0)
            return t.set_column(t.schema.get_field_index("n_links"), "n_links", n)

        return joined.map_batches(fill_zero, batch_format="pyarrow")

    def link_counts(self, side: str = "left") -> ray.data.Dataset:
        """Histogram: n_links -> n_records, including the zero bucket
        (reference _linked_table.py:247-303)."""
        with_n = self.with_n_links(side)
        return with_n.groupby("n_links").aggregate(Count(alias_name="n_records"))
