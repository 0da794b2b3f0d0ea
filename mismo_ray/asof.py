"""As-of and interval (range) joins — operators Ray Data lacks natively,
expressed as keyed-bucket shuffles + vectorized in-bucket kernels
(task-brief "custom operators"; the reference's ibis backends get these from
the engine, /root/reference/mismo/joins/_core.py:14-26 exposes plain joins
only).

Partitioning assumptions (documented per the brief):

- ``asof_join``: partitioned by the ``by`` key — all rows of one key must
  fit one task (keys are hashed into ~2x-CPUs coarse buckets; within a
  bucket the match runs as ONE sorted ``pandas.merge_asof`` across all its
  keys, C-speed). A single key whose rows exceed one task's memory needs a
  time-range pre-partitioning instead (not implemented).
- ``interval_join``: values/intervals are binned into fixed-width buckets;
  an interval is replicated into every bucket it overlaps, so per-task cost
  is bounded by (rows per bucket) x (intervals overlapping the bucket).
  Pick ``bucket_width`` ~ the typical interval length; degenerate giant
  intervals replicate O(span/width) times.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from mismo_ray._joins import default_num_partitions
from mismo_ray._util import base_schema_or, hash64


def _check_suffix_collisions(
    left_names, suffixed_right_cols, right_suffix: str
) -> None:
    """A left column named like a suffixed right output (e.g. left ``v_r``
    with right value column ``v`` and suffix ``_r``) would collide in the
    merged frame and corrupt or crash the in-bucket merge — reject up front."""
    lset = set(left_names)
    clash = sorted(
        f"{c}{right_suffix}" for c in suffixed_right_cols
        if f"{c}{right_suffix}" in lset
    )
    if clash:
        raise ValueError(
            f"left columns {clash} collide with suffixed right output columns "
            f"(right_suffix={right_suffix!r}); rename them or pass a different "
            "right_suffix"
        )


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    on: str,
    by: str,
    direction: str = "backward",
    tolerance: int | float | None = None,
    right_suffix: str = "_r",
) -> ray.data.Dataset:
    """For each left row, attach the nearest right row within the same ``by``
    key: backward = latest right with right.on <= left.on (SQL ASOF JOIN
    ``l.on >= r.on``), forward = earliest right with right.on >= left.on.
    Unmatched left rows keep nulls (left join semantics). ``on`` must be a
    numeric/epoch column; right (by, on) pairs should be unique for a
    deterministic match.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    B = default_num_partitions()
    _ls = left.schema(fetch_if_missing=True)
    if _ls is None:
        return left  # empty left: left-join result is empty
    lschema = _ls.base_schema
    rschema = base_schema_or(right)
    rvals = [c for c in rschema.names if c not in (by, on)]
    _check_suffix_collisions(lschema.names, rvals + [on], right_suffix)
    out_names = list(lschema.names) + [f"{c}{right_suffix}" for c in rvals] + [
        f"{on}{right_suffix}"
    ]
    # merge keys stay int64 when BOTH sides are integer/timestamp — a
    # float64 detour silently rounds |on| > 2^53 (ns-epoch scale), merging
    # rows 100ns apart onto one key
    _int_on = all(
        pa.types.is_integer(s.field(on).type)
        or pa.types.is_temporal(s.field(on).type)
        for s in (lschema, rschema)
    )
    _on_type = pa.int64() if _int_on else pa.float64()

    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            cols: dict = {
                "__by__": t[by].combine_chunks(),
                "__on__": t[on].combine_chunks().cast(_on_type),
                "__side__": pa.array(np.full(len(t), side, dtype=np.int8)),
            }
            for c in lschema.names:
                cols[f"__l_{c}"] = (
                    t[c] if side == 0 else pa.nulls(len(t), lschema.field(c).type)
                )
            for c in rvals:
                cols[f"__r_{c}"] = (
                    t[c] if side == 1 else pa.nulls(len(t), rschema.field(c).type)
                )
            out = pa.table(cols)
            bkt = (hash64(out["__by__"]) % np.uint64(B)).astype(np.int64)
            return out.append_column("__bkt__", pa.array(bkt))

        return fn

    tagged = left.map_batches(tag(0), batch_format="pyarrow").union(
        right.map_batches(tag(1), batch_format="pyarrow")
    )

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lpart = g[g["__side__"] == 0]
        rpart = g[g["__side__"] == 1]
        # null `on` values: pd.merge_asof raises ValueError on null merge
        # keys, where SQL ASOF (l.on >= r.on) simply never matches them —
        # segregate them: left null-on rows come back unmatched below,
        # right null-on rows can never be anyone's match
        lnull = lpart[lpart["__on__"].isna()]
        lpart = lpart[lpart["__on__"].notna()]
        rpart = rpart[rpart["__on__"].notna()]
        _np_on = "int64" if _int_on else "float64"
        ldf = pd.DataFrame(
            {
                "__by__": lpart["__by__"],
                "__on__": lpart["__on__"].astype(_np_on),
                **{c: lpart[f"__l_{c}"] for c in lschema.names},
            }
        ).sort_values("__on__", kind="mergesort")
        rdf = pd.DataFrame(
            {
                "__by__": rpart["__by__"],
                "__on__": rpart["__on__"].astype(_np_on),
                "__r_on__": rpart["__on__"].astype(_np_on),
                **{f"{c}{right_suffix}": rpart[f"__r_{c}"] for c in rvals},
            }
        ).sort_values("__on__", kind="mergesort")
        merged = pd.merge_asof(
            ldf,
            rdf,
            on="__on__",
            by="__by__",
            direction=direction,
            tolerance=tolerance,
        )
        merged = merged.rename(columns={"__r_on__": f"{on}{right_suffix}"})
        if len(lnull):
            unmatched = pd.DataFrame(
                {c: lnull[f"__l_{c}"].to_numpy() for c in lschema.names}
            )
            for c in rvals:
                unmatched[f"{c}{right_suffix}"] = None
            unmatched[f"{on}{right_suffix}"] = None
            merged = pd.concat([merged, unmatched], ignore_index=True)
        # rebuild EXACT arrow types: the pandas detour coerces int columns
        # that saw NaN to float64 (NaN -> null on the way back)
        out_types = {c: lschema.field(c).type for c in lschema.names}
        for c in rvals:
            out_types[f"{c}{right_suffix}"] = rschema.field(c).type
        out_types[f"{on}{right_suffix}"] = rschema.field(on).type

        def col(series, typ) -> pa.Array:
            if series.dtype == object:
                # all-null / mixed object columns (e.g. an EMPTY right side)
                # — numpy conversion can't handle them; go via python
                vals = [
                    None
                    if v is None or (isinstance(v, float) and np.isnan(v))
                    else v
                    for v in series
                ]
                return pa.array(vals, type=typ)
            return pa.array(series, type=typ, from_pandas=True)

        return pa.table({c: col(merged[c], out_types[c]) for c in out_names})

    return (
        # batch_format="pandas" audit: pandas.merge_asof is the only
        # sorted-asof kernel in the stack (no Arrow equivalent); the bucket
        # groups it sees carry just the join keys + carried output columns,
        # already pruned upstream of the bucket shuffle.
        tagged.groupby("__bkt__")
        .map_groups(
            lambda g: merge_bucket(g.drop(columns=["__bkt__"])),
            batch_format="pandas",
        )
    )


def interval_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    left_value: str,
    right_lo: str,
    right_hi: str,
    bucket_width: float,
    right_suffix: str = "_r",
) -> ray.data.Dataset:
    """Inner range join: every (left, right) pair with
    ``right_lo <= left_value <= right_hi``.

    Banded: left rows go to bucket floor(v/w); right intervals are
    replicated into every bucket [lo//w, hi//w]; each pair meets in exactly
    the left row's bucket (no dedup needed); exact containment is verified
    vectorized in-bucket.
    """
    B_hash = default_num_partitions()
    w = float(bucket_width)
    _ls = left.schema(fetch_if_missing=True)
    if _ls is None:
        return left  # empty left: no bands, empty result
    lschema = _ls.base_schema
    rschema = base_schema_or(right)
    rcols = list(rschema.names)
    _check_suffix_collisions(lschema.names, rcols, right_suffix)
    out_names = list(lschema.names) + [f"{c}{right_suffix}" for c in rcols]

    def tag_left(t: pa.Table) -> pa.Table:
        vcol = t[left_value].combine_chunks()
        if vcol.null_count:
            # null value: lo <= v <= hi is never true in SQL; also guards
            # the undefined NaN -> int64 band cast (platform-dependent)
            t = t.filter(vcol.is_valid())
        v = np.asarray(t[left_value], dtype=np.float64)
        cols: dict = {"__band__": pa.array(np.floor(v / w).astype(np.int64))}
        cols["__side__"] = pa.array(np.zeros(len(t), dtype=np.int8))
        for c in lschema.names:
            cols[f"__l_{c}"] = t[c]
        for c in rcols:
            cols[f"__r_{c}"] = pa.nulls(len(t), rschema.field(c).type)
        return pa.table(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        locol = t[right_lo].combine_chunks()
        hicol = t[right_hi].combine_chunks()
        if locol.null_count or hicol.null_count:
            # a null bound never contains anything (SQL BETWEEN semantics);
            # and NaN -> int64 is undefined — on platforms casting NaN to 0
            # a null lo with a big hi would replicate O(hi/width) rows
            import pyarrow.compute as _pc

            t = t.filter(_pc.and_(locol.is_valid(), hicol.is_valid()))
        lo = np.asarray(t[right_lo], dtype=np.float64)
        hi = np.asarray(t[right_hi], dtype=np.float64)
        b0 = np.floor(lo / w).astype(np.int64)
        b1 = np.floor(hi / w).astype(np.int64)
        reps = np.maximum(b1 - b0 + 1, 0)
        idx = np.repeat(np.arange(len(t), dtype=np.int64), reps)
        bands = np.concatenate(
            [np.arange(a, a + r, dtype=np.int64) for a, r in zip(b0, reps)]
            or [np.array([], dtype=np.int64)]
        )
        rep = t.take(pa.array(idx))
        cols: dict = {"__band__": pa.array(bands)}
        cols["__side__"] = pa.array(np.ones(len(rep), dtype=np.int8))
        for c in lschema.names:
            cols[f"__l_{c}"] = pa.nulls(len(rep), lschema.field(c).type)
        for c in rcols:
            cols[f"__r_{c}"] = rep[c]
        return pa.table(cols)

    tagged = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )

    def hash_bucket(t: pa.Table) -> pa.Table:
        band = np.asarray(t["__band__"], dtype=np.int64)
        from mismo_ray._util import splitmix64

        bkt = (splitmix64(band.astype(np.uint64)) % np.uint64(B_hash)).astype(
            np.int64
        )
        return t.append_column("__bkt__", pa.array(bkt))

    def join_bucket(g: pa.Table) -> pa.Table:
        side = np.asarray(g["__side__"].to_numpy(zero_copy_only=False))
        band = np.asarray(g["__band__"], dtype=np.int64)
        li = np.flatnonzero(side == 0)
        ri = np.flatnonzero(side == 1)
        out_l: list[np.ndarray] = []
        out_r: list[np.ndarray] = []
        if len(li) and len(ri):
            lv = np.asarray(
                g[f"__l_{left_value}"].to_numpy(zero_copy_only=False),
                dtype=np.float64,
            )
            rlo = np.asarray(
                g[f"__r_{right_lo}"].to_numpy(zero_copy_only=False),
                dtype=np.float64,
            )
            rhi = np.asarray(
                g[f"__r_{right_hi}"].to_numpy(zero_copy_only=False),
                dtype=np.float64,
            )
            # a hash bucket holds several bands; match within band only —
            # fully vectorized: sort right rows by band, range-lookup every
            # left row's candidate slice at once, verify containment
            order_r = ri[np.argsort(band[ri], kind="stable")]
            rbands = band[order_r]
            starts = np.searchsorted(rbands, band[li])
            ends = np.searchsorted(rbands, band[li], side="right")
            cnt = ends - starts
            tot = int(cnt.sum())
            if tot:
                li_rep = np.repeat(li, cnt)
                pos = (
                    np.arange(tot, dtype=np.int64)
                    - np.repeat(np.cumsum(cnt) - cnt, cnt)
                    + np.repeat(starts, cnt)
                )
                cand = order_r[pos]
                ok = (rlo[cand] <= lv[li_rep]) & (lv[li_rep] <= rhi[cand])
                out_l.append(li_rep[ok])
                out_r.append(cand[ok])
        il = (
            pa.array(np.concatenate(out_l), type=pa.int64())
            if out_l
            else pa.array([], type=pa.int64())
        )
        ir = (
            pa.array(np.concatenate(out_r), type=pa.int64())
            if out_r
            else pa.array([], type=pa.int64())
        )
        cols = {}
        for c in lschema.names:
            cols[c] = g[f"__l_{c}"].take(il)
        for c in rcols:
            cols[f"{c}{right_suffix}"] = g[f"__r_{c}"].take(ir)
        return pa.table(cols)

    return (
        tagged.map_batches(hash_bucket, batch_format="pyarrow")
        .groupby("__bkt__")
        .map_groups(join_bucket, batch_format="pyarrow")
    )
