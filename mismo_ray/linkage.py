"""Link filtering, incl. window predicates
(reference: /root/reference/mismo/linkage/_linkage.py:206-301).

Row predicates are vectorized batch functions; window predicates (best per
group, unambiguous-only, min-agreement) are grouped filters implemented with
the coarse-bucket shuffle pattern (hash(group) % B buckets, per-bucket
vectorized pandas) so millions of groups don't become millions of tasks.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from mismo_ray._joins import default_num_partitions
from mismo_ray._util import hash64
from mismo_ray.types import Linkage


def filter_links(links, predicate: Callable[[pa.Table], np.ndarray]):
    """Filter links by a vectorized row predicate fn(batch) -> bool mask."""
    if isinstance(links, Linkage):
        return Linkage(
            left=links.left,
            right=links.right,
            links=filter_links(links.links_ds, predicate),
        )

    def fn(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(np.asarray(predicate(t), dtype=bool)))

    return links.map_batches(fn, batch_format="pyarrow")


def _grouped_filter(
    links: ray.data.Dataset,
    group_cols: list[str],
    keep_fn: Callable[[pd.DataFrame], np.ndarray],
) -> ray.data.Dataset:
    """Keep rows per group where keep_fn(group_df) -> bool mask; bucketed."""
    B = default_num_partitions()

    def bucketize(t: pa.Table) -> pa.Table:
        h = hash64(t[group_cols[0]])
        for c in group_cols[1:]:
            h = h ^ hash64(t[c])
        return t.append_column(
            "__wbkt__", pa.array((h % np.uint64(B)).astype(np.int64))
        )

    def per_bucket(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        keep = np.zeros(len(df), dtype=bool)
        for _, idx in df.groupby(group_cols, sort=False, dropna=False).indices.items():
            keep[idx] = keep_fn(df.iloc[idx])
        return t.filter(pa.array(keep)).drop_columns(["__wbkt__"])

    return (
        links.map_batches(bucketize, batch_format="pyarrow")
        .groupby("__wbkt__")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def keep_best_per(
    links: ray.data.Dataset,
    *,
    group: str = "record_id_r",
    score: str = "score",
    tie_breaker: str = "record_id_l",
    keep_ties: bool = True,
) -> ray.data.Dataset:
    """Keep row(s) with the max score per group (reference doctest: score ==
    score.max() over group). With ``keep_ties=False`` exactly one row per
    group survives: max score, ties broken by min ``tie_breaker`` (SQL
    ``ROW_NUMBER() OVER (PARTITION BY group ORDER BY score DESC, tie)``=1).
    """

    def keep(g: pd.DataFrame) -> np.ndarray:
        best = (g[score] == g[score].max()).to_numpy()
        if keep_ties:
            return best
        tb = g[tie_breaker].to_numpy()
        out = np.zeros(len(g), dtype=bool)
        idx = np.flatnonzero(best)
        out[idx[np.argmin(tb[idx])]] = True
        return out

    return _grouped_filter(links, [group], keep)


def keep_unambiguous(
    links: ray.data.Dataset,
    *,
    group: str = "record_id_r",
    distinct: str = "record_id_l",
) -> ray.data.Dataset:
    """Keep groups whose ``distinct`` column has exactly one unique value
    (reference doctest: nunique == 1 over group)."""

    def keep(g: pd.DataFrame) -> np.ndarray:
        ok = g[distinct].nunique() == 1
        return np.full(len(g), ok)

    return _grouped_filter(links, [group], keep)


def keep_min_agreement(
    links: ray.data.Dataset,
    *,
    n: int = 2,
    group_cols: tuple[str, str] = ("record_id_l", "record_id_r"),
) -> ray.data.Dataset:
    """Keep pairs produced at least n times (>= n rules agree; reference
    doctest: count() >= n over (record_id_l, record_id_r))."""

    def keep(g: pd.DataFrame) -> np.ndarray:
        return np.full(len(g), len(g) >= n)

    return _grouped_filter(links, list(group_cols), keep)
