"""Stream-shaped operators over an ordered, partitioned event log.

The reference has NO streaming operators (SURVEY §2.10 — strictly batch), so
these are additive capabilities for the events-log shape (ray_guide
"Streaming-shaped workloads"): treat the input as a log partitioned by key,
implement windows as ``groupby(key)`` + per-group sorting + vectorized window
assignment. Ordering assumption: windows are computed per key after an
in-group sort on ``ts`` — no global order required.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum


def tumbling_window_agg(
    events: ray.data.Dataset,
    *,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
    window_s: int = 3600,
) -> ray.data.Dataset:
    """Per (key, tumbling window): event count + value sum.

    Window assignment is a stateless per-batch map (epoch // window); the
    aggregation is a pre-aggregated groupby — one shuffle over
    (key, window_start) partials.
    """

    def assign(t: pa.Table) -> pa.Table:
        tcol = t[ts]
        if isinstance(tcol, pa.ChunkedArray):
            tcol = tcol.combine_chunks()
        if tcol.null_count:
            # an event without a timestamp has no window: dropped (SQL
            # would put them in one NULL-window group, but a null groupby
            # key crashes Ray's sort-based shuffle — documented divergence)
            t = t.filter(tcol.is_valid())
            tcol = t[ts]
            if isinstance(tcol, pa.ChunkedArray):
                tcol = tcol.combine_chunks()
        epoch_us = tcol.cast(pa.int64())
        win = np.asarray(epoch_us) // (window_s * 1_000_000)
        # arrow cast (NOT np.asarray): null values STAY null so the Sum
        # aggregate skips them like SQL SUM — a NaN float would poison the
        # whole window's sum
        vals = t[value].combine_chunks().cast(pa.float64())
        return pa.table(
            {
                key: t[key],
                "window_start": pa.array(win * window_s),  # seconds since epoch
                "n": pa.array(np.ones(len(t), dtype=np.int64)),
                "value_sum": vals,
            }
        )

    partials = events.map_batches(assign, batch_format="pyarrow")
    return partials.groupby([key, "window_start"]).aggregate(
        Sum("n", alias_name="n_events"), Sum("value_sum", alias_name="value_sum")
    )


def sliding_window_agg(
    events: ray.data.Dataset,
    *,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
    window_s: int = 3600,
    hop_s: int = 900,
) -> ray.data.Dataset:
    """Per (key, sliding/hopping window): event count + value sum.

    Each event belongs to ``window_s / hop_s`` hops — assignment is a
    stateless per-batch REPLICATION map (vectorized np.repeat), then the
    same single pre-aggregated groupby shuffle as the tumbling window.
    Windows are aligned to hop boundaries: starts = hop * floor(t/hop) - k*hop
    for k in 0..(window/hop - 1), keeping only windows that contain t.
    """
    if window_s % hop_s:
        raise ValueError("window_s must be a multiple of hop_s")
    n_hops = window_s // hop_s

    def assign(t: pa.Table) -> pa.Table:
        tcol = t[ts]
        if isinstance(tcol, pa.ChunkedArray):
            tcol = tcol.combine_chunks()
        if tcol.null_count:
            # no timestamp -> no windows (same documented rule as tumbling)
            t = t.filter(tcol.is_valid())
            tcol = t[ts]
            if isinstance(tcol, pa.ChunkedArray):
                tcol = tcol.combine_chunks()
        epoch_s = np.asarray(tcol.cast(pa.int64())) // 1_000_000
        base = (epoch_s // hop_s) * hop_s
        n = len(t)
        idx = np.repeat(np.arange(n, dtype=np.int64), n_hops)
        starts = np.repeat(base, n_hops) - np.tile(
            np.arange(n_hops, dtype=np.int64) * hop_s, n
        )
        keep = starts + window_s > np.repeat(epoch_s, n_hops)
        rep = t.take(pa.array(idx[keep]))
        # arrow cast keeps null values null (SQL SUM-skips-nulls semantics)
        vals = rep[value].combine_chunks().cast(pa.float64())
        return pa.table(
            {
                key: rep[key],
                "window_start": pa.array(starts[keep]),
                "n": pa.array(np.ones(len(rep), dtype=np.int64)),
                "value_sum": vals,
            }
        )

    partials = events.map_batches(assign, batch_format="pyarrow")
    return partials.groupby([key, "window_start"]).aggregate(
        Sum("n", alias_name="n_events"), Sum("value_sum", alias_name="value_sum")
    )


def sessionize(
    events: ray.data.Dataset,
    *,
    key: str = "user_id",
    ts: str = "ts",
    gap_s: int = 1800,
) -> ray.data.Dataset:
    """Gap-based sessions per key: a new session starts when the time since
    the previous event of the same key exceeds ``gap_s``.

    One shuffle over a COARSE bucket (hash(key) % ~2xCPUs), not over the raw
    key — per-group ``map_groups`` calls would mean one task invocation per
    user at millions of keys (the repo-wide bucketing rule, see linkage.py).
    Inside each bucket everything is vectorized: one sort by (key, ts), one
    cumsum of session breaks across the whole bucket, one pandas groupby-agg.
    Output: (key, session_id, session_start_s, session_end_s, n_events) with
    session_id numbered per key in ts order.
    """
    from mismo_ray._joins import default_num_partitions
    from mismo_ray._util import hash64

    B = default_num_partitions()

    def bucketize(t: pa.Table) -> pa.Table:
        h = hash64(t[key]) % np.uint64(B)
        return t.append_column("__sbkt__", pa.array(h.astype(np.int64)))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # events with no timestamp cannot sessionize (same rule as the
        # window aggs); a NULL KEY is one partition (SQL PARTITION BY
        # semantics, like window.py) — achieved below by comparing
        # factorize codes (NaN/None -> one shared -1 code), never raw
        # values (float NaN != NaN would make per-event sessions)
        g = g.dropna(subset=[ts]).sort_values([key, ts], kind="mergesort")
        kv = g[key].to_numpy()
        codes, _ = pd.factorize(g[key], use_na_sentinel=True)
        t_us = g[ts].astype("int64").to_numpy()  # microseconds
        t_s = t_us // 1_000_000  # seconds (output granularity)
        new_key = np.ones(len(g), dtype=bool)
        brk = np.zeros(len(g), dtype=np.int64)
        if len(g) > 1:
            new_key[1:] = codes[1:] != codes[:-1]
            # gap comparison in exact microseconds (sub-second gaps matter)
            brk[1:] = (
                (np.diff(t_us) > gap_s * 1_000_000) & ~new_key[1:]
            ).astype(np.int64)
        # global session index across the bucket; per-key numbering recovered
        # below (sessions of one key are contiguous after the sort)
        gsid = (new_key.astype(np.int64) | brk).cumsum() - 1
        agg = (
            pd.DataFrame(
                {key: kv, "__code__": codes, "__gsid__": gsid, "t": t_s}
            )
            .groupby("__gsid__", sort=True)
            .agg(
                **{
                    key: (key, "first"),
                    "__code__": ("__code__", "first"),
                    "session_start_s": ("t", "min"),
                    "session_end_s": ("t", "max"),
                    "n_events": ("t", "size"),
                }
            )
            .reset_index(drop=True)
        )
        # number sessions per key via the null-safe integer codes (a raw-key
        # groupby would drop NaN keys and emit float NaN session ids)
        agg["session_id"] = agg.groupby("__code__", sort=False).cumcount()
        return agg[[key, "session_id", "session_start_s", "session_end_s", "n_events"]]

    return (
        # batch_format="pandas" audit: only (key, ts) — two scalar columns —
        # ever reach the pandas conversion (select_columns runs FIRST), and
        # the gap/cumsum session logic is a pandas-only kernel. Payload
        # columns (text etc.) never convert.
        events.select_columns([key, ts])
        .map_batches(bucketize, batch_format="pyarrow")
        .groupby("__sbkt__")
        .map_groups(
            lambda g: per_bucket(g.drop(columns=["__sbkt__"])),
            batch_format="pandas",
        )
    )
