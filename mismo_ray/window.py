"""Row-window functions over partitions: lag/lead, running and rolling
aggregates, per-partition row numbers.

SQL's ``<fn>() OVER (PARTITION BY key ORDER BY ts)`` family — the piece of
the windowed-aggregate surface that time-window ops (streaming.py's
tumbling/sliding/sessionize) don't cover: per-ROW results that depend on the
ordered neighbors within a key.

Ray-Data design (same rule as streaming.sessionize): ONE shuffle over a
COARSE bucket — ``hash(partition_by) % ~2x CPUs`` — never a per-key
``map_groups`` (millions of keys would mean millions of task invocations).
Inside each bucket one mergesort by (key, order) and vectorized pandas
groupby transforms (shift / cumsum / cumcount) compute every requested
window column in one pass; no Python loop touches rows. Null handling
matches SQL window semantics: running/rolling sums skip nulls and are NULL
only while the (window's) non-null count is zero.

Determinism contract: results are bit-identical at any parallelism iff
(partition_by, *order_by) is a unique key of the input — pass a tie-break
column (e.g. an id) as the last order_by element otherwise.

Scale note: rows cross the shuffle with every column they carry; project to
(ids, partition, order, value) first and join results back when the payload
is wide (the repo-wide projected-triple rule).
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

__all__ = ["window_over"]

_KINDS = (
    "lag",
    "lead",
    "cumsum",
    "cummax",
    "cummin",
    "rolling_sum",
    "row_number",
)


def window_over(
    ds: ray.data.Dataset,
    *,
    partition_by: str,
    order_by: str | Sequence[str],
    specs: Sequence[tuple],
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Append window columns to ``ds``.

    ``specs`` is a sequence of ``(kind, column, result_name[, param])``:

    - ``("lag", col, name, n)`` / ``("lead", col, name, n)`` — the value n
      rows before/after within the partition (default n=1), null at edges;
    - ``("cumsum", col, name)`` — running sum in order, nulls skipped
      (SQL ``SUM(col) OVER (... ROWS UNBOUNDED PRECEDING)``);
    - ``("cummax", col, name)`` / ``("cummin", col, name)`` — running
      max/min, nulls skipped (NULL only while every value so far is null
      — SQL ``MAX/MIN OVER`` semantics, NOT pandas' NaN-at-null-rows);
    - ``("rolling_sum", col, name, w)`` — trailing w-row sum including the
      current row (SQL ``ROWS BETWEEN w-1 PRECEDING AND CURRENT ROW``);
    - ``("row_number", None, name)`` — 1-based position in order
      (SQL ``ROW_NUMBER()``).

    Integer columns stay exact end to end (nullable Int64 through pandas);
    use integer fixed-point (cents / e6) for money-style floats when
    cross-engine hash equality matters.
    """
    order_cols = [order_by] if isinstance(order_by, str) else list(order_by)
    norm = []
    for spec in specs:
        if len(spec) == 3:
            kind, col, name = spec
            param = 1
        elif len(spec) == 4:
            kind, col, name, param = spec
        else:
            raise ValueError(f"spec must have 3 or 4 elements: {spec!r}")
        if kind not in _KINDS:
            raise ValueError(f"unknown window kind {kind!r}; one of {_KINDS}")
        if kind == "rolling_sum" and (len(spec) < 4 or int(param) < 1):
            raise ValueError("rolling_sum needs a window size >= 1")
        norm.append((kind, col, name, int(param)))
    # result-name collisions silently overwrite the partition key, an order
    # column, or an input a LATER spec still reads — reject up front (the
    # same collision class asof._check_suffix_collisions rejects)
    reserved = {partition_by, *order_cols}
    seen_names: set = set()
    for i, (kind, col, name, _param) in enumerate(norm):
        if name in reserved:
            raise ValueError(
                f"window result name {name!r} collides with the partition/"
                "order columns"
            )
        if name in seen_names:
            raise ValueError(f"duplicate window result name {name!r}")
        if any(later_col == name for _k, later_col, _n, _p in norm[i + 1 :]):
            raise ValueError(
                f"window result name {name!r} is read as an input column by "
                "a later spec; reorder or rename"
            )
        seen_names.add(name)

    from mismo_ray._joins import default_num_partitions
    from mismo_ray._util import hash64

    B = int(num_buckets) if num_buckets else default_num_partitions()

    def bucketize(t: pa.Table) -> pa.Table:
        h = hash64(t[partition_by]) % np.uint64(B)
        return t.append_column("__wbkt__", pa.array(h.astype(np.int64)))

    def _as_nullable(s: pd.Series) -> pd.Series:
        # integer columns -> nullable Int64 so shifts/masks stay exact ints;
        # floats stay float64 (NaN is their native null)
        if pd.api.types.is_integer_dtype(s.dtype):
            return s.astype("Int64")
        return s

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["__wbkt__"]).sort_values(
            [partition_by, *order_cols], kind="mergesort"
        )
        # SQL's PARTITION BY treats NULL keys as ONE partition (they all
        # land in the hash64(null)-sentinel bucket, so the whole null
        # partition is co-resident here).  Factorize the key column ONCE —
        # use_na_sentinel=False gives nulls a real shared code — and group
        # every derived Series by the cached integer codes: a fresh
        # groupby(gkeys) per call would re-hash the key objects up to 4x
        # per spec inside this hot per-bucket kernel
        codes, _ = pd.factorize(g[partition_by], use_na_sentinel=False)
        grp = g.groupby(codes, sort=False)

        def by_key(s: pd.Series):
            return s.groupby(codes, sort=False)

        for kind, col, name, param in norm:
            if kind == "row_number":
                g[name] = (grp.cumcount() + 1).astype("int64")
                continue
            x = _as_nullable(g[col])
            if kind == "lag":
                g[name] = by_key(x).shift(param)
            elif kind == "lead":
                g[name] = by_key(x).shift(-param)
            elif kind in ("cummax", "cummin"):
                # SQL running MAX/MIN skips nulls (result at a null row is
                # the running extreme so far); pandas cummax leaves NaN at
                # null rows — fill with the dtype's identity, then null out
                # rows before the first non-null value
                nn = x.notna()
                if pd.api.types.is_integer_dtype(x.dtype):
                    ident = (
                        np.iinfo(np.int64).min
                        if kind == "cummax"
                        else np.iinfo(np.int64).max
                    )
                else:
                    ident = -np.inf if kind == "cummax" else np.inf
                filled = x.fillna(ident)
                run = (
                    by_key(filled).cummax()
                    if kind == "cummax"
                    else by_key(filled).cummin()
                )
                cnt = by_key(nn).cumsum()
                g[name] = run.mask(cnt == 0)
            else:
                nn = x.notna()
                cs = by_key(x.fillna(0)).cumsum()
                cnt = by_key(nn).cumsum()
                if kind == "cumsum":
                    g[name] = cs.mask(cnt == 0)
                else:  # rolling_sum over the trailing `param` rows
                    cs_prev = by_key(cs).shift(param)
                    cnt_prev = by_key(cnt).shift(param)
                    roll = cs - cs_prev.fillna(0)
                    rcnt = cnt - cnt_prev.fillna(0)
                    g[name] = roll.mask(rcnt == 0)
        return g

    # batch_format="pandas" audit: the window kernels (groupby shift/cumsum/
    # cumcount) are pandas-only; callers project to the scalar columns they
    # need before calling (docstring contract), so wide payloads never convert
    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("__wbkt__")
        .map_groups(per_bucket, batch_format="pandas")
    )
