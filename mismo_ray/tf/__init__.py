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

Ray mapping: frequency tables are groupby-counts collected + broadcast via
``ray.put`` (vocabulary-sized); application is one ``map_batches``.
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
    product of frequencies across columns (unseen value -> 1/N)."""

    def __init__(self, columns: Sequence[str]):
        self.columns = list(columns)
        self._freqs: dict[str, dict] = {}
        self._n_total = 0

    def fit(self, ds: ray.data.Dataset) -> "TermFrequencyModel":
        self._n_total = ds.count()
        for c in self.columns:
            pdf = (
                ds.groupby(c).aggregate(Count(alias_name="n")).to_pandas()
            )
            self._freqs[c] = {
                v: int(n) / self._n_total for v, n in zip(pdf[c], pdf["n"])
            }
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
        ref = ray.put(self._freqs)

        def fn(t: pa.Table) -> pa.Table:
            freqs = ray.get(ref)
            out = np.ones(len(t), dtype=np.float64)
            for fit_col, ds_col in colmap.items():
                lookup = freqs[fit_col]
                vals = t[ds_col].to_pylist()
                out *= np.array([lookup.get(v, default) for v in vals])
            return t.append_column(name_as, pa.array(out))

        return ds.map_batches(fn, batch_format="pyarrow")


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
        counts = (
            haystack.groupby(self.columns)
            .aggregate(Count(alias_name="__n__"))
            .to_pandas()
        )
        dupes = frozenset(
            tuple(r) for r in counts[counts["__n__"] > 1][self.columns].itertuples(
                index=False, name=None
            )
        )
        ref = ray.put(dupes)
        cols = self.columns

        def keep(t: pa.Table) -> pa.Table:
            d = ray.get(ref)
            vals = list(zip(*(t[c].to_pylist() for c in cols)))
            mask = np.fromiter((v not in d for v in vals), dtype=bool, count=len(vals))
            return t.filter(pa.array(mask))

        return haystack.map_batches(keep, batch_format="pyarrow")
