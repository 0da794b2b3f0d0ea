"""Misc reference utilities re-expressed Ray-first.

- ``cases``: vectorized first-match-wins CASE WHEN
  (reference mismo/_util.py:95-112);
- ``re_extract_struct``: named-group regex -> struct column
  (reference mismo/text/_re_extract.py:14-72);
- ``sample_table``: row sampling with deterministic "hash" method
  (reference mismo/_util.py:196-269);
- ``n_naive_comparisons`` (reference mismo/_n_naive.py:9-32).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import ray.data

from mismo_ray._util import hash64


def cases(*cond_value_pairs, else_=None, length: int | None = None):
    """Vectorized CASE WHEN: pairs of (bool ndarray, scalar-or-array); first
    match wins; unmatched rows get ``else_``."""
    if not cond_value_pairs:
        raise ValueError("need at least one (condition, value) pair")
    conds = [np.asarray(c, dtype=bool) for c, _ in cond_value_pairs]
    vals = [v for _, v in cond_value_pairs]
    return np.select(conds, vals, default=else_)


def re_extract_struct(arr, pattern: str) -> pa.Array:
    """Extract named regex groups into a struct column; non-matching rows and
    nulls -> null struct."""
    rx = re.compile(pattern)
    names = list(rx.groupindex.keys())
    if not names:
        raise ValueError("pattern must contain named groups")
    vals = arr.to_pylist() if isinstance(arr, (pa.Array, pa.ChunkedArray)) else arr
    out = []
    for v in vals:
        if v is None:
            out.append(None)
            continue
        m = rx.search(v)
        out.append(None if m is None else {n: m.group(n) for n in names})
    return pa.array(
        out, type=pa.struct([(n, pa.string()) for n in names])
    )


def sample_table(
    ds: ray.data.Dataset,
    n: int,
    *,
    method: str = "hash",
    seed: int = 0,
    total: int | None = None,
) -> ray.data.Dataset:
    """~n rows: "hash" = deterministic per-record threshold on
    hash(record_id) (stable across runs/parallelism; the reference's
    cross-platform-deterministic method), "random" = ds.random_sample."""
    if total is None:
        total = ds.count()
    if total == 0 or n >= total:
        return ds
    if method == "random":
        return ds.random_sample(n / total, seed=seed)
    if method != "hash":
        raise ValueError(f"unknown method {method}")
    thresh = np.uint64(int(min(1.0, n / total) * 2**64))

    def fn(t: pa.Table) -> pa.Table:
        h = hash64(t["record_id"], seed=seed or 0xD1CE)
        return t.filter(pa.array(h < thresh))

    return ds.map_batches(fn, batch_format="pyarrow")


def n_naive_comparisons(left, right=None) -> int:
    """n(n-1)/2 for dedupe, n*m for linking."""
    n = left if isinstance(left, int) else left.count()
    if right is None:
        return n * (n - 1) // 2
    m = right if isinstance(right, int) else right.count()
    return n * m


def explain(ds, *, analyze: bool = False) -> str:
    """Plan introspection (reference mismo/_explain.py:9-23 semantics: the
    EXPLAIN / EXPLAIN ANALYZE of the engine in use).

    analyze=False: the lazy logical operator tree (no execution).
    analyze=True: EXECUTES the plan (materialize) and returns Ray Data's
    per-operator stats — task counts, wall/CPU/UDF time, output sizes.
    """
    if analyze:
        return ds.materialize().stats()
    return str(ds)


def _group_bucket_ids(t: "pa.Table", group_keys: list, B: int) -> "np.ndarray":
    """hash(group)%B bucket id per row — the ONE bucketing rule every
    per-group operator here shares (top_k_per_group, budget_per_group);
    change it in one place only or co-grouping silently diverges."""
    h = np.zeros(len(t), dtype=np.uint64)
    for i, c in enumerate(group_keys):
        h ^= hash64(t[c], seed=0x7E + i)
    return (h % np.uint64(B)).astype(np.int64)


def _rebuild_arrow(pdf, schema: "pa.Schema") -> "pa.Table":
    """pandas -> arrow with the ORIGINAL column types (pandas coerces
    null-ints to float; rebuild each column against the source schema)."""
    cols = {}
    for name in pdf.columns:
        cols[name] = pa.array(pdf[name], type=schema.field(name).type)
    return pa.table(cols)


def top_k_per_group(
    ds: "ray.data.Dataset",
    group_keys,
    order_by,
    k: int,
) -> "ray.data.Dataset":
    """Top-k rows per group — the generic per-entity selection operator
    (best-candidate-per-record, top-docs-per-language, ...).

    ``order_by``: list of (column, "asc"|"desc") applied in order; append a
    unique column as the last key for deterministic ties. One coarse-bucketed
    shuffle: groups land whole in hash(group)%B buckets and each bucket runs
    a vectorized sort + per-group head (no python per row or per group) —
    the same partitioning contract as the window link filters in linkage.py.
    """
    from mismo_ray._joins import default_num_partitions

    group_keys = [group_keys] if isinstance(group_keys, str) else list(group_keys)
    order_by = [
        (c, "asc") if isinstance(c, str) else (c[0], c[1]) for c in order_by
    ]
    B = default_num_partitions()

    def bucketize(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__bkt__", pa.array(_group_bucket_ids(t, group_keys, B))
        )

    def head_per_group(g) -> "pa.Table":
        # pandas inside the bucket: C-speed multi-key sort + groupby-head
        schema = None
        if isinstance(g, pa.Table):
            schema = g.schema
            pdf = g.to_pandas()
        else:
            pdf = g
        pdf = pdf.drop(columns=["__bkt__"])
        pdf = pdf.sort_values(
            [c for c, _ in order_by],
            ascending=[d == "asc" for _, d in order_by],
            kind="mergesort",
        )
        out = pdf.groupby(group_keys, sort=False, dropna=False).head(k)
        if schema is not None:
            return _rebuild_arrow(out, schema)
        return out

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("__bkt__")
        .map_groups(head_per_group, batch_format="pyarrow")
    )


def stratified_sample(
    ds: "ray.data.Dataset",
    group_keys,
    n_per_group: int,
    *,
    id_column: str = "record_id",
    seed: int = 0,
) -> "ray.data.Dataset":
    """Deterministic per-group sample: up to ``n_per_group`` rows per group,
    chosen by seeded hash order of ``id_column`` (stable across runs and
    partitionings — no runtime RNG). The training-data use case: balance a
    corpus across languages/sources (cap pages per host) before expensive
    downstream stages.

    Integer ids rank by ``splitmix64(id + seed)`` — exactly reproducible in
    SQL (same 128-bit modular arithmetic as the :func:`hash_split` oracle),
    so the selection is auditable bit-for-bit; other id types hash through
    siphash-based ``hash64``. Unique ids make the hash order a total order
    (splitmix64 is a bijection) — no tie column needed.

    One bucketed shuffle via :func:`top_k_per_group` ordered by the hash.
    """
    import numpy as np
    import pyarrow as pa

    def add_rank(t: pa.Table) -> pa.Table:
        h = _id_mix64(t[id_column], seed)  # uint64: order matches SQL UBIGINT
        return t.append_column("__sample_rank__", pa.array(h))

    out = top_k_per_group(
        ds.map_batches(add_rank, batch_format="pyarrow"),
        group_keys,
        [("__sample_rank__", "asc")],
        n_per_group,
    )
    return out.drop_columns(["__sample_rank__"])


def budget_per_group(
    ds: "ray.data.Dataset",
    group_keys,
    budget: int,
    weight_column: str,
    *,
    id_column: str = "record_id",
    seed: int = 0,
) -> "ray.data.Dataset":
    """Deterministic per-group WEIGHT budget cap — the token-budget variant
    of :func:`stratified_sample`. Training-data mixtures are specified in
    tokens, not documents ("at most N tokens per host/source"): rows rank
    within their group by seeded hash of ``id_column`` and the kept set is
    the longest RANK-PREFIX whose running ``weight_column`` sum stays
    <= ``budget`` (the first overflowing row and everything ranked after it
    drop, even if a later smaller row would still fit — prefix semantics,
    exactly ``SUM(w) OVER (PARTITION BY g ORDER BY rank) <= budget`` in
    SQL, which is the driver oracle).

    Selection is a pure (id, seed) function plus one bucketed shuffle
    (groups land whole in hash(group)%B buckets; vectorized sort + cumsum
    per bucket — no python per row). Adding rows later never evicts a kept
    row ranked before the cut, same auditability story as
    :func:`stratified_sample` / :func:`hash_split`.
    """
    from mismo_ray._joins import default_num_partitions

    group_keys = [group_keys] if isinstance(group_keys, str) else list(group_keys)
    B = default_num_partitions()

    def bucketize(t: pa.Table) -> pa.Table:
        rank = _id_mix64(t[id_column], seed)
        return t.append_column(
            "__bkt__", pa.array(_group_bucket_ids(t, group_keys, B))
        ).append_column("__budget_rank__", pa.array(rank))

    def prefix_filter(g: pa.Table) -> pa.Table:
        schema = g.schema
        pdf = g.to_pandas().drop(columns=["__bkt__"])
        pdf = pdf.sort_values(
            group_keys + ["__budget_rank__"], kind="mergesort"
        )
        # null weight counts 0 toward the running sum (row still occupies
        # its rank slot); fill BEFORE cumsum so accumulation flows through
        pdf["__budget_w__"] = pdf[weight_column].fillna(0).astype(np.float64)
        run = pdf.groupby(group_keys, sort=False, dropna=False)[
            "__budget_w__"
        ].cumsum()
        out = pdf[run.to_numpy(dtype=np.float64) <= float(budget)]
        out = out.drop(columns=["__budget_rank__", "__budget_w__"])
        return _rebuild_arrow(out, schema)

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("__bkt__")
        .map_groups(prefix_filter, batch_format="pyarrow")
    )


def hash_split(
    ds: "ray.data.Dataset",
    fractions: dict[str, float],
    *,
    id_column: str = "record_id",
    seed: int = 0,
    label_as: str = "split",
    buckets: int = 1_000_000,
) -> "ray.data.Dataset":
    """Deterministic train/val/test assignment by hash of the record id.

    Every row gets a ``label_as`` column with one of ``fractions``' keys;
    boundaries are ``round(cumfrac * buckets)`` over
    ``bucket = mix(id + seed) % buckets``. Assignment is a pure function of
    (id, seed) — stable across runs, partitionings and cluster sizes, and
    rows added later keep every existing row's split (the property that
    makes hash splits the standard for growing corpora). One stateless
    ``map_batches``; nothing shuffles.

    Integer ids use splitmix64 directly (exactly reproducible in SQL via
    128-bit modular arithmetic — see the driver oracle); other types hash
    through ``hash64`` first.

    ``fractions`` must sum to ~1.0; order determines boundary layout.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1.0, got {total}")
    if any(f < 0 for f in fractions.values()):
        # negative fractions make the cumulative bounds non-monotonic and
        # searchsorted silently garbage — reject up front
        raise ValueError("fractions must be >= 0")
    names = list(fractions)
    bounds = np.round(np.cumsum([fractions[n] for n in names]) * buckets)
    bounds[-1] = buckets  # guard float drift: last bucket always labeled

    def fn(t: pa.Table) -> pa.Table:
        h = _id_mix64(t[id_column], seed)
        bucket = (h % np.uint64(buckets)).astype(np.int64)
        lab = np.searchsorted(bounds, bucket, side="right")
        labels = pa.array(np.array(names, dtype=object)[lab])
        return t.append_column(label_as, labels.cast(pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow")


def _id_mix64(col, seed: int) -> np.ndarray:
    """splitmix64(id + seed) for integer id columns (the SQL-reproducible
    path), hash64 otherwise — uint64 per row.

    Type is decided per batch (no driver-side ds.schema(), which can force
    partial execution of a lazy plan). Integer columns with nulls are
    REJECTED rather than silently routed through float64 (numpy widens
    int-with-null to float64, which loses ids > 2^53 and maps null to
    platform-dependent garbage — and batch-dependent labels would break the
    stable-across-partitionings guarantee)."""
    from mismo_ray._util import hash64, splitmix64

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_integer(col.type):
        if col.null_count:
            raise ValueError(
                "id column contains nulls; deterministic hash assignment "
                "needs non-null ids"
            )
        ids = np.asarray(col).astype(np.uint64)
        with np.errstate(over="ignore"):
            return splitmix64(ids + np.uint64(seed & 0xFFFFFFFFFFFFFFFF))
    return hash64(col, seed=seed)


def mixture_sample(
    ds: "ray.data.Dataset",
    rates: dict[str, float],
    *,
    group_column: str = "source",
    id_column: str = "record_id",
    seed: int = 0,
    default_rate: float = 1.0,
    copy_as: str | None = None,
    buckets: int = 1_000_000,
) -> "ray.data.Dataset":
    """Deterministic per-group resampling to training-mixture weights.

    ``rates[group]`` is the expected number of copies each row of that group
    contributes (DoReMi/Llama-style domain weights): ``0.25`` keeps a
    deterministic quarter of the group, ``1.0`` passes it through, ``2.5``
    emits two full copies of every row plus a hash-chosen half. Groups not
    in ``rates`` get ``default_rate``. Selection is a pure function of
    (id, seed) — stable across runs, partitionings and cluster sizes, and
    the kept subset at a lower rate is a SUBSET of the kept rows at any
    higher rate (nested samples, same splitmix64 bucket as
    :func:`hash_split`). One stateless ``map_batches``; nothing shuffles —
    the scale path for reweighting a 100 TB corpus is exactly one pass.

    With ``copy_as`` (or whenever some rate > 1), each emitted duplicate
    carries a copy index 0..k-1 in that column (default ``n_copy``) so
    downstream shuffles can tell copies apart.

    No reference analog (mismo is record linkage); this is the
    LLM-training-data mixing op alongside ``hash_split``.
    """
    import numpy as np
    import pyarrow as pa

    if any(r < 0 for r in rates.values()) or default_rate < 0:
        raise ValueError("rates must be >= 0")
    if copy_as is None and (
        any(r > 1 for r in rates.values()) or default_rate > 1
    ):
        copy_as = "n_copy"

    def fn(t: pa.Table) -> pa.Table:
        h = _id_mix64(t[id_column], seed)
        bucket = (h % np.uint64(buckets)).astype(np.int64)
        # per-group rate via dictionary encoding: the python dict lookup
        # runs once per DISTINCT group in the batch, not once per row
        de = t[group_column].combine_chunks().dictionary_encode()
        urates = np.array(
            [rates.get(g, default_rate) for g in de.dictionary.to_pylist()]
            # null group values dict-encode to null indices; they get the
            # default rate via a sentinel slot appended past the dictionary
            + [rates.get(None, default_rate)],
            dtype=np.float64,
        )
        idx = de.indices.fill_null(len(urates) - 1)
        rate = (
            urates[np.asarray(idx, dtype=np.int64)]
            if len(t)
            else np.array([], dtype=np.float64)
        )
        whole = np.floor(rate).astype(np.int64)
        frac_bound = np.round((rate - whole) * buckets).astype(np.int64)
        copies = whole + (bucket < frac_bound).astype(np.int64)
        if copy_as is None:
            return t.filter(pa.array(copies > 0))
        idx = np.repeat(np.arange(len(t), dtype=np.int64), copies)
        out = t.take(pa.array(idx))
        pos = np.arange(len(idx), dtype=np.int64) - np.repeat(
            np.cumsum(copies) - copies, copies
        )
        return out.append_column(copy_as, pa.array(pos))

    return ds.map_batches(fn, batch_format="pyarrow")


def _f64_to_key(v: np.ndarray) -> np.ndarray:
    """Order-preserving float64 -> uint64 (IEEE-754 total order trick):
    negative floats get bitwise-NOT, non-negative get the sign bit set.
    Exact integer binning on keys dodges every float-edge rounding hazard."""
    bits = v.view(np.uint64)
    neg = bits >> np.uint64(63) == 1
    out = np.where(neg, ~bits, bits | np.uint64(1 << 63))
    return out.astype(np.uint64)


def _key_to_f64(k: int) -> float:
    ku = np.uint64(k)
    if ku >> np.uint64(63) == np.uint64(1):
        bits = ku ^ np.uint64(1 << 63)  # was non-negative: clear the tag bit
    else:
        bits = ~ku  # was negative: undo the bitwise NOT
    return float(np.array([bits], dtype=np.uint64).view(np.float64)[0])


def quantiles(
    ds: "ray.data.Dataset",
    column: str,
    qs,
    *,
    n_bins: int = 4096,
    max_collect: int = 1_000_000,
) -> dict[float, float]:
    """EXACT discrete quantiles of a numeric column, distributed.

    Semantics match DuckDB ``quantile_disc``: the value at 0-indexed rank
    ``max(0, ceil(q*n) - 1)`` of the ascending sort, nulls and NaNs
    excluded. The training-data use is cut-point selection ("keep the top
    30% by quality score") where an approximate sketch would move the
    boundary; here the answer is an element of the column, exactly.

    Distributed radix selection on the ORDER-PRESERVING uint64 view of
    float64: each round one ``map_batches`` pass histograms every
    outstanding key range into ``n_bins`` integer-width bins (driver holds
    n_bins ints per range, never values), each rank narrows to its bin, and
    a range that collapses to one key IS the answer. Integer bin edges make
    membership exact, so ranks never drift; the key space is 64 bits, so at
    n_bins=4096 every quantile resolves in <= ceil(64/12) = 6 passes
    regardless of data size or skew. A range whose population drops to
    <= ``max_collect`` keys short-circuits with one exact ranged collect
    (integer bounds, so membership matches the histogram bit-exactly) —
    in practice 3 passes total: count, one histogram, one collect.
    """
    import pyarrow as pa

    qs = [float(q) for q in qs]
    if not qs or any(q < 0 or q > 1 for q in qs):
        raise ValueError("qs must be non-empty, each in [0, 1]")

    # integer columns keep an EXACT integer key space (offset-binary
    # uint64): the float64 detour rounds |v| > 2^53 (snowflake-scale ids),
    # so the returned "exact element of the column" could be a value the
    # column never contained. Answers for integer columns come back as
    # python ints (exact at any magnitude).
    _schema = ds.schema(fetch_if_missing=True)
    _int_col = _schema is not None and pa.types.is_integer(
        _schema.base_schema.field(column).type
    )
    _SIGN_BIT = np.uint64(1 << 63)

    def keys_of(t: pa.Table) -> np.ndarray:
        col = t[column].combine_chunks()
        if _int_col:
            ok = ~np.asarray(col.is_null(), dtype=bool)
            iv = np.asarray(col.cast(pa.int64())).astype(np.int64)[ok]
            return iv.astype(np.uint64) ^ _SIGN_BIT
        v = np.asarray(col.cast(pa.float64(), safe=False), dtype=np.float64)
        ok = ~np.asarray(col.is_null(), dtype=bool) & ~np.isnan(v)
        return _f64_to_key(v[ok])

    def _decode(key: int):
        if _int_col:
            return int(np.int64(np.uint64(key) ^ _SIGN_BIT))
        return _key_to_f64(key)

    # pass 1: count (bounds come free from the first histogram round)
    def p1(t: pa.Table) -> pa.Table:
        return pa.table({"n": pa.array([len(keys_of(t))], type=pa.int64())})

    n_total = sum(
        int(np.asarray(b["n"]).sum())
        for b in ds.map_batches(p1, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    )
    if n_total == 0:
        return {q: float("nan") for q in qs}
    # state per q: (key_lo, key_hi inclusive, rank within range)
    full = (0, int(np.uint64(0xFFFFFFFFFFFFFFFF)))
    state = {
        q: (full[0], full[1], max(0, int(np.ceil(q * n_total)) - 1)) for q in qs
    }
    out: dict[float, float] = {}

    while any(q not in out for q in qs):
        pending = {q: s for q, s in state.items() if q not in out}
        ranges = sorted({(s[0], s[1]) for s in pending.values()})
        # integer bin width; bin i of range (a,b) = [a+i*w, min(a+(i+1)*w-1, b)]
        widths = [max(1, ((b - a) // n_bins) + 1) for a, b in ranges]

        def hist(t: pa.Table) -> pa.Table:
            k = keys_of(t)
            rows = []
            for (a, b), w in zip(ranges, widths):
                sub = k[(k >= np.uint64(a)) & (k <= np.uint64(b))]
                binned = ((sub - np.uint64(a)) // np.uint64(w)).astype(np.int64)
                rows.append(np.bincount(binned, minlength=n_bins)[:n_bins])
            flat = np.concatenate(rows)
            return pa.table(
                {
                    "i": pa.array(
                        np.repeat(np.arange(len(ranges)), n_bins).astype(np.int64)
                    ),
                    "b": pa.array(
                        np.tile(np.arange(n_bins), len(ranges)).astype(np.int64)
                    ),
                    "c": pa.array(flat.astype(np.int64)),
                }
            )

        counts = np.zeros((len(ranges), n_bins), dtype=np.int64)
        for b in ds.map_batches(hist, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        ):
            np.add.at(
                counts,
                (
                    np.asarray(b["i"], dtype=np.int64),
                    np.asarray(b["b"], dtype=np.int64),
                ),
                np.asarray(b["c"], dtype=np.int64),
            )
        csum = np.cumsum(counts, axis=1)
        range_idx = {r: i for i, r in enumerate(ranges)}
        collect: dict[tuple[int, int], list[tuple[float, int]]] = {}
        for q, (a, b, r) in pending.items():
            i = range_idx[(a, b)]
            w = widths[i]
            binpos = int(np.searchsorted(csum[i], r + 1))
            before = int(csum[i][binpos - 1]) if binpos else 0
            nlo = a + binpos * w
            nhi = min(a + (binpos + 1) * w - 1, b)
            if nlo == nhi or w == 1:
                out[q] = _decode(nlo)
            elif int(counts[i][binpos]) <= max_collect:
                collect.setdefault((nlo, nhi), []).append((q, r - before))
            else:
                state[q] = (nlo, nhi, r - before)
        if collect:
            # one exact ranged collect resolves all small bins: integer key
            # bounds, so membership == the histogram's binning bit-exactly
            c_ranges = sorted(collect)
            c_lo = np.array([r[0] for r in c_ranges], dtype=np.uint64)
            c_hi = np.array([r[1] for r in c_ranges], dtype=np.uint64)

            def grab(t: pa.Table) -> pa.Table:
                k = keys_of(t)
                ridx, kk = [], []
                for i in range(len(c_lo)):
                    sub = k[(k >= c_lo[i]) & (k <= c_hi[i])]
                    ridx.append(np.full(len(sub), i, dtype=np.int64))
                    kk.append(sub)
                return pa.table(
                    {
                        "i": pa.array(np.concatenate(ridx)),
                        "k": pa.array(
                            np.concatenate(kk).astype(np.uint64), type=pa.uint64()
                        ),
                    }
                )

            got: dict[int, list[np.ndarray]] = {}
            for b_ in ds.map_batches(grab, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"
            ):
                ii = np.asarray(b_["i"], dtype=np.int64)
                kk = np.asarray(b_["k"], dtype=np.uint64)
                for i in np.unique(ii):
                    got.setdefault(int(i), []).append(kk[ii == i])
            for i, (rng_key, group) in enumerate(
                (r, collect[r]) for r in c_ranges
            ):
                ks = np.sort(
                    np.concatenate(got.get(i, [np.array([], dtype=np.uint64)]))
                )
                for q, rr in group:
                    out[q] = _decode(int(ks[min(rr, len(ks) - 1)]))
    return {q: out[q] for q in qs}


def hash_split_datasets(
    ds: "ray.data.Dataset",
    fractions: dict[str, float],
    **kwargs,
) -> dict[str, "ray.data.Dataset"]:
    """:func:`hash_split`, returned as one lazy filtered Dataset per split
    (each consumer pays one pass; labels are recomputed, not shuffled)."""
    label_as = kwargs.get("label_as", "split")
    labeled = hash_split(ds, fractions, **kwargs)

    def keep(name: str):
        # vectorized batch filter, not an expr string: split/label names are
        # user data and must not be interpolated into the expression language
        def fn(t: pa.Table) -> pa.Table:
            mask = pa.compute.equal(t[label_as].combine_chunks(), name)
            return t.filter(mask).drop_columns([label_as])

        return fn

    return {
        name: labeled.map_batches(keep(name), batch_format="pyarrow")
        for name in fractions
    }


def describe(
    ds: "ray.data.Dataset",
    columns: "list[str] | None" = None,
    *,
    distinct: str | None = "approx",
    qs=None,
) -> "pa.Table":
    """Distributed column profile — the pre-pipeline "what is in this
    corpus" answer: one row per column with row/null counts, distinct
    counts, min/max and (numeric) mean.

    Cost model at 100 TB: ONE ``map_batches`` pass emits a single partial
    row per block (typed min/max/sum/counts per column — a few hundred
    bytes however many rows the block has); the driver folds <= blocks
    rows. ``distinct="approx"`` adds one HyperLogLog pass (bounded
    register rows through a groupby-max, ~1.6% error); ``distinct="exact"``
    adds one exact distinct-count shuffle per column (small tables only);
    ``distinct=None`` skips it. ``qs=(0.25, 0.5, 0.75)`` adds exact radix
    quantiles (:func:`quantiles`) per numeric column, ~3 passes each.

    min/max/mean are computed in the column's own type and FORMATTED to
    strings only in the final table (so "10" < "9" string traps never
    touch the fold); mean is integer micro-units (``mean_e6``), exact for
    |sum * 1e6| < 2^53.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from mismo_ray._util import collect_table

    if qs:
        # same guard as quantiles_by: q values that round to the same integer
        # percent (0.333 vs 0.334) would silently overwrite each other's
        # q{pct} column, last writer winning
        _qnames = [f"q{int(round(float(q) * 100))}" for q in qs]
        if len(set(_qnames)) != len(_qnames):
            raise ValueError("quantiles collide at integer-percent names")
    schema = ds.schema(fetch_if_missing=True)
    if schema is None:
        raise ValueError("dataset is empty with unknown schema; nothing to profile")
    base = schema.base_schema
    cols = list(columns) if columns else list(base.names)
    types = {c: base.field(c).type for c in cols}
    numeric = {
        c
        for c in cols
        if pa.types.is_integer(types[c]) or pa.types.is_floating(types[c])
    }
    orderable = {
        c
        for c in cols
        if c in numeric
        or pa.types.is_string(types[c])
        or pa.types.is_large_string(types[c])
        or pa.types.is_temporal(types[c])
        or pa.types.is_boolean(types[c])
    }

    def partials(t: pa.Table) -> pa.Table:
        row: dict = {}
        for c in cols:
            col = t[c].combine_chunks()
            n_null = col.null_count
            row[f"__n_{c}"] = pa.array([len(col) - n_null], type=pa.int64())
            row[f"__nn_{c}"] = pa.array([n_null], type=pa.int64())
            if c in orderable:
                mm = pc.min_max(col)
                row[f"__min_{c}"] = pa.array([mm["min"].as_py()], type=types[c])
                row[f"__max_{c}"] = pa.array([mm["max"].as_py()], type=types[c])
            if c in numeric:
                s = pc.sum(col.cast(pa.float64(), safe=False))
                row[f"__sum_{c}"] = pa.array(
                    [s.as_py() if s.is_valid else None], type=pa.float64()
                )
        return pa.table(row)

    folded = collect_table(ds.map_batches(partials, batch_format="pyarrow"))

    n_distinct: dict[str, int | None] = {c: None for c in cols}
    if distinct == "approx":
        # ONE pass for every column: each block emits (col_idx, register,
        # rho) rows for all profiled columns together — 20 columns cost one
        # corpus scan, not twenty (the HLL register key already composes
        # with a column index through the same groupby-max)
        from mismo_ray._util import hash64
        from mismo_ray.sketch import _HLL_SEED, _bit_length_u64, _hll_estimate
        from ray.data.aggregate import Max

        p = 12
        m = 1 << p
        shift = np.uint64(64 - p)
        # nested (list/struct) columns are not hashable by the row hash;
        # their n_distinct stays None rather than crashing the profile
        prof_cols = [c for c in cols if not pa.types.is_nested(types[c])]

        def regs_all(t: pa.Table) -> pa.Table:
            ci, ii, rr = [], [], []
            for cidx, c in enumerate(prof_cols):
                col = t[c].combine_chunks()
                col = col.filter(col.is_valid())
                if len(col) == 0:
                    continue
                h = hash64(col, _HLL_SEED)
                idx = (h >> shift).astype(np.int64)
                w = h & ((np.uint64(1) << shift) - np.uint64(1))
                rho = (64 - p - _bit_length_u64(w) + 1).astype(np.int64)
                regs = np.zeros(m, dtype=np.int64)
                np.maximum.at(regs, idx, rho)
                nz = np.nonzero(regs)[0]
                ci.append(np.full(len(nz), cidx, dtype=np.int64))
                ii.append(nz)
                rr.append(regs[nz])
            if not ci:
                return pa.table(
                    {
                        "c": pa.array([], type=pa.int64()),
                        "i": pa.array([], type=pa.int64()),
                        "r": pa.array([], type=pa.int64()),
                    }
                )
            return pa.table(
                {
                    "c": pa.array(np.concatenate(ci)),
                    "i": pa.array(np.concatenate(ii)),
                    "r": pa.array(np.concatenate(rr)),
                }
            )

        from mismo_ray._util import collect_table as _collect

        merged = _collect(
            ds.map_batches(regs_all, batch_format="pyarrow")
            .groupby(["c", "i"])
            .aggregate(Max("r", alias_name="r"))
        )
        if len(merged):
            mc = np.asarray(merged["c"], dtype=np.int64)
            mi = np.asarray(merged["i"], dtype=np.int64)
            mr = np.asarray(merged["r"], dtype=np.int64)
            for cidx, c in enumerate(prof_cols):
                sel = mc == cidx
                regs = np.zeros(m, dtype=np.int64)
                regs[mi[sel]] = mr[sel]
                n_distinct[c] = (
                    int(round(_hll_estimate(regs))) if regs.any() else 0
                )
        else:
            for c in prof_cols:
                n_distinct[c] = 0
    elif distinct == "exact":
        from ray.data.aggregate import Count

        def block_unique(c):
            def fn(t: pa.Table) -> pa.Table:
                u = t[c].combine_chunks().unique()
                return pa.table({"v": u.filter(u.is_valid())})

            return fn

        for c in cols:
            if pa.types.is_nested(types[c]):
                continue  # arrow unique/groupby cannot key nested types
            # per-block unique first (map-side combine), then the group count
            # IS the distinct count — no driver collect of the values
            n_distinct[c] = (
                ds.select_columns([c])
                .map_batches(block_unique(c), batch_format="pyarrow")
                .groupby("v")
                .aggregate(Count())
                .count()
            )
    elif distinct is not None:
        raise ValueError("distinct must be 'approx', 'exact', or None")

    q_results: dict[str, dict] = {}
    if qs:
        for c in cols:
            if c in numeric:
                q_results[c] = quantiles(ds, c, qs)

    out_rows = {
        "column": [],
        "dtype": [],
        "n": [],
        "n_null": [],
        "n_distinct": [],
        "min": [],
        "max": [],
        "mean_e6": [],
    }
    for q in qs or ():
        out_rows[f"q{int(round(q * 100))}"] = []
    for c in cols:
        n = int(pc.sum(folded[f"__n_{c}"]).as_py() or 0) if len(folded) else 0
        nn = int(pc.sum(folded[f"__nn_{c}"]).as_py() or 0) if len(folded) else 0
        out_rows["column"].append(c)
        out_rows["dtype"].append(str(types[c]))
        out_rows["n"].append(n)
        out_rows["n_null"].append(nn)
        out_rows["n_distinct"].append(n_distinct[c])
        if c in orderable and len(folded):
            mn = pc.min(folded[f"__min_{c}"])
            mx = pc.max(folded[f"__max_{c}"])
            out_rows["min"].append(str(mn.as_py()) if mn.is_valid else None)
            out_rows["max"].append(str(mx.as_py()) if mx.is_valid else None)
        else:
            out_rows["min"].append(None)
            out_rows["max"].append(None)
        if c in numeric and n > 0 and len(folded):
            total = float(pc.sum(folded[f"__sum_{c}"]).as_py() or 0.0)
            out_rows["mean_e6"].append(int(np.floor(total * 1e6 / n + 0.5)))
        else:
            out_rows["mean_e6"].append(None)
        for q in qs or ():
            v = q_results.get(c, {}).get(q)
            out_rows[f"q{int(round(q * 100))}"].append(
                None if v is None or (isinstance(v, float) and np.isnan(v)) else float(v)
            )
    return pa.table(
        {
            "column": pa.array(out_rows["column"], type=pa.string()),
            "dtype": pa.array(out_rows["dtype"], type=pa.string()),
            "n": pa.array(out_rows["n"], type=pa.int64()),
            "n_null": pa.array(out_rows["n_null"], type=pa.int64()),
            "n_distinct": pa.array(out_rows["n_distinct"], type=pa.int64()),
            "min": pa.array(out_rows["min"], type=pa.string()),
            "max": pa.array(out_rows["max"], type=pa.string()),
            "mean_e6": pa.array(out_rows["mean_e6"], type=pa.int64()),
            **{
                f"q{int(round(q * 100))}": pa.array(
                    out_rows[f"q{int(round(q * 100))}"], type=pa.float64()
                )
                for q in qs or ()
            },
        }
    )


def quantiles_by(
    ds: "ray.data.Dataset",
    key: str,
    column: str,
    qs,
    *,
    num_buckets: int | None = None,
) -> "ray.data.Dataset":
    """EXACT per-group discrete quantiles: one row per ``key`` with a
    ``q<percent>`` column per requested quantile.

    Semantics match DuckDB ``quantile_disc(col, q) GROUP BY key`` (the value
    at 0-indexed rank ``max(0, ceil(q*n) - 1)`` of the group's ascending
    sort, nulls excluded; a group whose values are all null keeps its row
    with null quantiles; NULL keys form their own group) — and
    :func:`quantiles`, its global-scope sibling.

    One shuffle over a COARSE bucket (hash(key) % ~2x CPUs, the repo-wide
    bucketing rule — never a per-key ``map_groups``); inside each bucket one
    arrow sort by (key, value) and vectorized rank gathers per quantile.
    Key and value columns keep their own arrow types end to end (rank
    gathers are arrow ``take`` calls, never numpy round-trips).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from mismo_ray._joins import default_num_partitions
    from mismo_ray._util import hash64

    qs = [float(q) for q in qs]
    if not qs or any(q < 0 or q > 1 for q in qs):
        raise ValueError("qs must be non-empty, each in [0, 1]")
    qnames = [f"q{int(round(q * 100))}" for q in qs]
    if len(set(qnames)) != len(qnames):
        raise ValueError("quantiles collide at integer-percent names")
    B = int(num_buckets) if num_buckets else default_num_partitions()

    def bucketize(t: pa.Table) -> pa.Table:
        t = t.select([key, column])
        # null keys keep their rows: hash64 sends them all to one sentinel
        # bucket, so the NULL group is co-resident like any other group
        h = hash64(t[key]) % np.uint64(B)
        return t.append_column("__qbkt__", pa.array(h.astype(np.int64)))

    def per_bucket(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["__qbkt__"])
        # key asc + value asc, nulls last: within each key group the first
        # n_valid slots are exactly the ascending non-null values
        idx = pc.sort_indices(
            t,
            sort_keys=[(key, "ascending"), (column, "ascending")],
            null_placement="at_end",
        )
        st = t.take(idx)
        kcol = st[key].combine_chunks()
        n = len(kcol)
        if n == 0:
            return pa.table(
                {
                    key: pa.chunked_array([kcol]),
                    **{qn: st[column] for qn in qnames},
                }
            ).select([key, *qnames])
        # group boundaries via dictionary CODES, not a pandas round-trip:
        # int64 keys with any null would convert to float64 there, so
        # distinct keys above 2^53 could compare equal and silently merge
        # adjacent groups.  Codes are small ints; nulls all take code -1
        # (and sort contiguously, so they still form exactly one group).
        codes = (
            pc.dictionary_encode(kcol)
            .indices.fill_null(-1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        starts = np.ones(n, dtype=bool)
        starts[1:] = codes[1:] != codes[:-1]
        start_idx = np.nonzero(starts)[0]
        ends = np.append(start_idx[1:], n)
        valid = np.asarray(st[column].combine_chunks().is_valid())
        vcum = np.concatenate([[0], np.cumsum(valid)])
        n_valid = vcum[ends] - vcum[start_idx]
        cols = {key: kcol.take(pa.array(start_idx, type=pa.int64()))}
        vchunk = st[column].combine_chunks()
        for q, qn in zip(qs, qnames):
            rank = np.maximum(0, np.ceil(q * n_valid).astype(np.int64) - 1)
            pos = start_idx + np.minimum(rank, np.maximum(n_valid - 1, 0))
            take_idx = pa.array(
                np.where(n_valid > 0, pos, -1), type=pa.int64(),
                mask=n_valid == 0,
            )
            cols[qn] = vchunk.take(take_idx)  # null index -> null quantile
        return pa.table(cols)

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("__qbkt__")
        .map_groups(per_bucket, batch_format="pyarrow")
    )
