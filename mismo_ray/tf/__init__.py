"""Term-frequency weighting and lookup filterers
(reference: /root/reference/mismo/tf/).

- ``column_stats``: value -> (count, frequency) lookup for one column
  (_tf.py:17-49);
- ``TermFrequencyModel``: per-record product of per-column value frequencies,
  unseen values defaulting to 1/N (_tf.py:51-144);
- ``RareLookupFilterer``: drop needles whose key combination is too common in
  the haystack (_filterer.py:14-85);
- ``AmbiguousHaystackFilterer``: drop haystack records whose key appears more
  than once (_filterer.py:88-127).

Ray mapping: frequency tables are groupby-counts; vocabularies up to
``broadcast_threshold`` are collected + broadcast via ``ray.put`` (one
map_batches to apply), larger ones stay Datasets and are applied with
bucketed lookup joins — corpus-sized vocabularies never touch the driver.
The ambiguity filterer is a distributed bucketed window filter (no dup-set
collect).
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Count


def column_stats(ds: ray.data.Dataset, column: str) -> ray.data.Dataset:
    """(value, n, frequency) lookup Dataset for one column."""
    n_total = ds.count()
    counts = ds.groupby(column).aggregate(Count(alias_name="n"))

    def add_freq(t: pa.Table) -> pa.Table:
        n = np.asarray(t["n"], dtype=np.float64)
        return t.append_column("frequency", pa.array(n / n_total))

    return counts.map_batches(add_freq, batch_format="pyarrow")


class TermFrequencyModel:
    """Per-column value->frequency lookups fit on a corpus; applied as the
    product of frequencies across columns (unseen value -> 1/N).

    Vocabularies up to ``broadcast_threshold`` distinct values apply via a
    broadcast dict (one map, no shuffle); larger vocabularies stay Datasets
    and apply via bucketed lookup joins (one keyed shuffle per column)."""

    def __init__(self, columns: Sequence[str], *, broadcast_threshold: int = 2_000_000):
        self.columns = list(columns)
        self.broadcast_threshold = broadcast_threshold
        self._freqs: dict[str, dict | None] = {}
        self._count_ds: dict[str, ray.data.Dataset] = {}
        self._n_total = 0

    def fit(self, ds: ray.data.Dataset) -> "TermFrequencyModel":
        self._n_total = ds.count()
        for c in self.columns:
            counts = ds.groupby(c).aggregate(Count(alias_name="n")).materialize()
            self._count_ds[c] = counts
            if counts.count() <= self.broadcast_threshold:
                pdf = counts.to_pandas()
                self._freqs[c] = {
                    v: int(n) / self._n_total for v, n in zip(pdf[c], pdf["n"])
                }
            else:
                self._freqs[c] = None  # corpus-sized vocab: join path
        return self

    def add_term_frequencies(
        self,
        ds: ray.data.Dataset,
        *,
        name_as: str = "frequency",
        columns: dict[str, str] | None = None,
    ) -> ray.data.Dataset:
        """Append the product-of-frequencies column. ``columns`` maps the
        fitted column names to the names in ``ds`` (defaults to identity)."""
        if not self._freqs:
            raise RuntimeError("call fit() first")
        colmap = columns or {c: c for c in self.columns}
        default = 1.0 / max(self._n_total, 1)
        n_total = max(self._n_total, 1)

        bcast_cols = {f: d for f, d in colmap.items() if self._freqs[f] is not None}
        join_cols = {f: d for f, d in colmap.items() if self._freqs[f] is None}

        out = ds
        tmp_cols = []
        if join_cols:
            from mismo_ray.cluster._connected_components import (
                bucketed_lookup_join,
            )

            for fit_col, ds_col in join_cols.items():
                tmp = f"__tfn_{fit_col}"
                tmp_cols.append(tmp)
                out = bucketed_lookup_join(
                    out,
                    ds_col,
                    self._count_ds[fit_col],
                    key_name=fit_col,
                    val_name="n",
                    out_type=pa.int64(),
                    result_name=tmp,
                    on_missing=lambda missing: pa.array(
                        [0] * len(missing), type=pa.int64()
                    ),
                )

        ref = ray.put({f: self._freqs[f] for f in bcast_cols})

        def fn(t: pa.Table) -> pa.Table:
            freqs = ray.get(ref)
            prod = np.ones(len(t), dtype=np.float64)
            for fit_col, ds_col in bcast_cols.items():
                lookup = freqs[fit_col]
                vals = t[ds_col].to_pylist()
                prod *= np.array([lookup.get(v, default) for v in vals])
            for tmp in tmp_cols:
                n = np.asarray(t[tmp], dtype=np.float64)
                prod *= np.where(n > 0, n / n_total, default)
            if tmp_cols:
                t = t.drop_columns(tmp_cols)
            return t.append_column(name_as, pa.array(prod))

        return out.map_batches(fn, batch_format="pyarrow")


class RareLookupFilterer:
    """Keep only needles whose key-combination frequency in the haystack is
    <= max_frequency."""

    def __init__(self, columns: Sequence[str], *, max_frequency: float):
        self.columns = list(columns)
        self.max_frequency = float(max_frequency)

    def rare_needle(
        self, *, haystack: ray.data.Dataset, needle: ray.data.Dataset
    ) -> ray.data.Dataset:
        model = TermFrequencyModel(self.columns).fit(haystack)
        with_freq = model.add_term_frequencies(needle, name_as="__freq__")
        thresh = self.max_frequency

        def keep(t: pa.Table) -> pa.Table:
            f = np.asarray(t["__freq__"], dtype=np.float64)
            return t.filter(pa.array(f <= thresh)).drop_columns(["__freq__"])

        return with_freq.map_batches(keep, batch_format="pyarrow")


class AmbiguousHaystackFilterer:
    """Drop haystack records whose key combination appears more than once
    (an ambiguous lookup target)."""

    def __init__(self, columns: Sequence[str]):
        self.columns = list(columns)

    def unambiguous_haystack(self, haystack: ray.data.Dataset) -> ray.data.Dataset:
        """Distributed bucketed window filter (hash(key) % ~2xCPUs shuffle,
        vectorized duplicated-mask per bucket) — the ambiguous-key set is
        never collected to the driver."""
        from mismo_ray._joins import default_num_partitions
        from mismo_ray._util import combine_hash_columns

        cols = self.columns
        B = default_num_partitions()

        def bucketize(t: pa.Table) -> pa.Table:
            h = (combine_hash_columns(t, cols) % np.uint64(B)).astype(np.int64)
            return t.append_column("__abkt__", pa.array(h))

        def per_bucket(g: pa.Table) -> pa.Table:
            import pandas as pd

            df = pd.DataFrame({c: g[c].to_numpy(zero_copy_only=False) for c in cols})
            keep = ~df.duplicated(keep=False).to_numpy()
            return g.filter(pa.array(keep)).drop_columns(["__abkt__"])

        return (
            haystack.map_batches(bucketize, batch_format="pyarrow")
            .groupby("__abkt__")
            .map_groups(per_bucket, batch_format="pyarrow")
        )
