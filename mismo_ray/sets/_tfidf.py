"""TF-IDF over array columns (reference: /root/reference/mismo/sets/_tfidf.py).

Pinned semantics (reference doctests):

- ``document_counts``: term -> number of records whose array contains the term
  (a term twice in one record counts once) (_tfidf.py:11-73).
- ``term_idf``: idf = ln(N / df) with N = number of non-null rows (_tfidf.py:76-117).
- ``add_array_value_counts``: per-row multiset -> map<term, count>; null -> null,
  ``[]`` -> {} (_tfidf.py:122-190).
- ``add_tfidf``: L2-normalized count vector x idf (normalize=True default)
  (_tfidf.py:193-274).
- ``rare_terms``: terms with df <= n or df/N <= frac (_tfidf.py:277-315).

Ray-Data mapping: the per-row parts are plain ``map_batches``; the df
aggregation is a partial-aggregate inside each batch (one (term, df_partial)
row per batch) followed by a small ``groupby(term).sum`` — the only shuffle is
over the vocabulary, not the corpus. The idf table is then broadcast via
``ray.put`` into the per-batch tfidf computation (no corpus-side join).
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Sum


def _terms_column(batch: pa.Table, column: str) -> list:
    return batch[column].to_pylist()


def document_counts(ds: ray.data.Dataset, column: str) -> ray.data.Dataset:
    """term -> n_records lookup Dataset with columns (term, n_records)."""

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for row in _terms_column(batch, column):
            if row is None:
                continue
            for t in set(row):
                c[t] += 1
        return pa.table(
            {"term": list(c.keys()), "n_records": list(c.values())}
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return (
        partials.groupby("term")
        .aggregate(Sum("n_records", alias_name="n_records"))
    )


def _count_non_null(ds: ray.data.Dataset, column: str) -> int:
    def partial(batch: pa.Table) -> pa.Table:
        return pa.table({"n": [len(batch) - batch[column].null_count]})

    import pyarrow.compute as pc

    return sum(
        pc.sum(b["n"]).as_py() or 0
        for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    )


def term_idf(ds: ray.data.Dataset, column: str) -> ray.data.Dataset:
    """term -> idf Dataset with columns (term, idf); idf = ln(N / df)."""
    n_total = _count_non_null(ds, column)
    dc = document_counts(ds, column)

    def to_idf(batch: pa.Table) -> pa.Table:
        df = np.asarray(batch["n_records"], dtype=np.float64)
        return pa.table({"term": batch["term"], "idf": np.log(n_total / df)})

    return dc.map_batches(to_idf, batch_format="pyarrow")


def _value_counts_row(row) -> list | None:
    if row is None:
        return None
    return [
        {"key": k, "value": v} for k, v in Counter(row).items()
    ]


def add_array_value_counts(
    ds: ray.data.Dataset, column: str, *, result_name: str = "{name}_counts"
) -> ray.data.Dataset:
    """Per-row term multiset as map<term, int64> (list<struct<key,value>> layout)."""
    name = result_name.format(name=column)

    def fn(batch: pa.Table) -> pa.Table:
        rows = _terms_column(batch, column)
        counts = [_value_counts_row(r) for r in rows]
        term_type = batch.schema.field(column).type.value_type
        arr = pa.array(
            counts,
            type=pa.list_(
                pa.struct([("key", term_type), ("value", pa.int64())])
            ),
        )
        return batch.append_column(name, arr)

    return ds.map_batches(fn, batch_format="pyarrow")


def add_tfidf(
    ds: ray.data.Dataset,
    column: str,
    *,
    result_name: str = "{name}_tfidf",
    normalize: bool = True,
    max_broadcast_vocab: int = 20_000_000,
) -> ray.data.Dataset:
    """Add a map<term, float64> TF-IDF column.

    The idf lookup is computed distributed, collected (it is vocabulary-sized),
    and broadcast to workers with ``ray.put`` — a broadcast join, not a shuffle.
    Vocabularies beyond ``max_broadcast_vocab`` raise instead of silently
    exhausting the driver: at that scale, compute ``term_idf(ds, column)``
    (stays a Dataset), explode the documents to (record_id, term) rows,
    attach idf with ``cluster.bucketed_lookup_join`` and re-group per record
    — the per-document map column then never needs a global broadcast.
    """
    name = result_name.format(name=column)
    idf_ds = term_idf(ds, column).materialize()
    n_vocab = idf_ds.count()
    if n_vocab > max_broadcast_vocab:
        raise ValueError(
            f"vocabulary has {n_vocab} distinct terms (> max_broadcast_vocab="
            f"{max_broadcast_vocab}); use the explode + bucketed_lookup_join "
            "recipe in this docstring instead of the broadcast path"
        )
    idf_tbl = idf_ds.to_pandas()
    idf_map = dict(zip(idf_tbl["term"], idf_tbl["idf"]))
    idf_ref = ray.put(idf_map)

    def fn(batch: pa.Table) -> pa.Table:
        idf = ray.get(idf_ref)
        out = []
        for row in _terms_column(batch, column):
            if row is None:
                out.append(None)
                continue
            c = Counter(row)
            if normalize and c:
                nrm = math.sqrt(sum(v * v for v in c.values()))
                tf = {k: v / nrm for k, v in c.items()}
            else:
                tf = dict(c)
            out.append(
                [
                    {"key": k, "value": tf[k] * idf.get(k, 0.0)}
                    for k in c.keys()
                ]
            )
        term_type = batch.schema.field(column).type.value_type
        arr = pa.array(
            out,
            type=pa.list_(pa.struct([("key", term_type), ("value", pa.float64())])),
        )
        return batch.append_column(name, arr)

    return ds.map_batches(fn, batch_format="pyarrow")


def rare_terms(
    ds: ray.data.Dataset,
    column: str,
    *,
    max_records_n: int | None = None,
    max_records_frac: float | None = None,
) -> ray.data.Dataset:
    """Terms appearing in few records; Dataset with one column ``term``."""
    if (max_records_n is None) == (max_records_frac is None):
        raise ValueError(
            "Exactly one of max_records_n or max_records_frac must be set"
        )
    dc = document_counts(ds, column)
    if max_records_n is not None:
        thresh = max_records_n

        def keep(batch: pa.Table) -> pa.Table:
            mask = np.asarray(batch["n_records"]) <= thresh
            return batch.filter(pa.array(mask)).select(["term"])
    else:
        n_total = _count_non_null(ds, column)

        def keep(batch: pa.Table) -> pa.Table:
            frac = np.asarray(batch["n_records"], dtype=np.float64) / n_total
            return batch.filter(pa.array(frac <= max_records_frac)).select(["term"])

    return dc.map_batches(keep, batch_format="pyarrow")
