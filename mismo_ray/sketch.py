"""Distributed sketches: exact heavy hitters and HyperLogLog distinct counts.

The 100 TB curation jobs in this repo repeatedly need two corpus-profile
questions answered WITHOUT an all-to-all shuffle of the raw column:

- "which keys are hot?" — blocking-key skew (KeyLinker salting decisions),
  boilerplate hosts, dominant tokens. :func:`heavy_hitters` answers it
  EXACTLY in two linear passes: a mergeable Misra-Gries candidate sketch
  (bounded rows per block through one tiny groupby), then one exact
  verification count of the <= O(k) candidates. The result is provably the
  true top-k whenever the data is skewed enough to have one (the returned
  ``guaranteed`` flag is the proof check, not a heuristic).
- "how many distinct values?" — distinct URLs/hosts/content hashes per
  corpus or per group, where the exact answer costs a full shuffle of the
  values. :func:`approx_distinct` / :func:`add_approx_distinct` answer it
  with HyperLogLog registers (2^p bytes per block through the shuffle,
  ~1.04/sqrt(2^p) relative error) built on the repo's deterministic
  ``hash64`` — estimates are bit-identical at any parallelism.

Reference parity note: the reference engine (mismo) computes key/pair counts
exactly via its backend's groupby (mismo/block/_counts.py); these sketches are
the additive scale path for when the key column itself is too wide to shuffle.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Max, Sum

from mismo_ray._util import base_schema_or, collect_table, hash64

__all__ = [
    "HeavyHitters",
    "heavy_hitters",
    "approx_distinct",
    "add_approx_distinct",
]


# --------------------------------------------------------------- heavy hitters
@dataclass
class HeavyHitters:
    """Result of :func:`heavy_hitters`.

    ``table`` holds the top-``k`` values with EXACT counts, sorted by
    (n desc, value asc). ``guaranteed`` is True iff the two-pass proof
    obligation held: every value outside the candidate set has true count
    <= ``boundary + error_bound`` < the k-th returned count, so the returned
    set provably IS the global top-k. When False the counts are still exact
    for the returned values; only completeness of the set is unproven (the
    data was too flat for the requested candidate_cap — raise it).
    """

    table: pa.Table
    guaranteed: bool
    n_total: int
    error_bound: int
    boundary: int


def heavy_hitters(
    ds: ray.data.Dataset,
    column: str,
    k: int = 10,
    *,
    candidate_cap: int | None = None,
    result_name: str | None = None,
) -> HeavyHitters:
    """Exact top-``k`` most frequent values of ``column``, distributed,
    without shuffling the raw column.

    Pass 1 (candidates): each block reduces to a mergeable Misra-Gries
    summary of ``cap`` rows — exact block counts minus the (cap+1)-th
    largest block count (the classic offset trick: per-block underestimate
    is exactly that offset, so the summed underestimate E is known, not
    bounded). One groupby-sum over the bounded summaries plus a per-block
    local top-(4k+1) brings <= O(blocks * k) tiny rows to the driver.

    Pass 2 (verify): the <= 4k candidate values are broadcast into one
    ``map_batches`` count pass; a second bounded groupby-sum yields their
    EXACT global counts.

    Proof: for any value v, summed(v) <= true(v) <= summed(v) + E. Any
    value outside the candidate set has summed <= boundary (the (4k+1)-th
    summed count), hence true <= boundary + E. If the k-th exact count
    exceeds that, the returned set is provably the true top-k.

    Nulls are ignored. Ties break by value ascending on both passes.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    cap = int(candidate_cap) if candidate_cap is not None else max(64, 8 * k)
    if cap < k:
        raise ValueError("candidate_cap must be >= k")
    out_name = result_name or column
    if out_name == "n":
        # pa.table({out_name: ..., "n": ...}) is a dict literal — a value
        # column named "n" would silently vanish under the count column
        raise ValueError(
            "heavy_hitters result column collides with the count column "
            "'n'; pass result_name="
        )

    def mg_summary(t: pa.Table) -> pa.Table:
        col = t[column].combine_chunks()
        col = col.filter(col.is_valid())
        n_b = len(col)
        vtype = col.type
        if n_b == 0:
            return pa.table(
                {
                    "v": pa.array([None], type=vtype),
                    "c": pa.array([0], type=pa.int64()),
                    "n": pa.array([0], type=pa.int64()),
                    "e": pa.array([0], type=pa.int64()),
                }
            )
        vc = col.value_counts()
        vals = vc.field("values")
        cnts = np.asarray(vc.field("counts"), dtype=np.int64)
        if len(cnts) > cap:
            order = np.lexsort((np.arange(len(cnts)), -cnts))  # count desc
            keep = order[:cap]
            offset = int(cnts[order[cap]])
            adj = cnts[keep] - offset
            pos = keep[adj > 0]
            vals = vals.take(pa.array(pos, type=pa.int64()))
            cnts = cnts[pos] - offset
        else:
            offset = 0
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        stats_v = pa.array([None], type=vtype)
        return pa.table(
            {
                "v": pa.concat_arrays([vals, stats_v]),
                "c": pa.array(np.concatenate([cnts, [0]]).astype(np.int64)),
                "n": pa.array([0] * len(cnts) + [n_b], type=pa.int64()),
                "e": pa.array([0] * len(cnts) + [offset], type=pa.int64()),
            }
        )

    # The summary table is the SKETCH (<= blocks * (cap+1) tiny rows), so a
    # materialize here is bounded by construction — it lets the stats rows
    # (block totals/offsets) and the candidate groupby read one computed
    # copy instead of re-running the corpus pass, and keeps null v values
    # out of Ray's sort-based groupby (which rejects null keys).
    summ = ds.map_batches(mg_summary, batch_format="pyarrow").materialize()

    n_total = 0
    err = 0
    for b in summ.map_batches(
        lambda t: t.filter(t["v"].combine_chunks().is_null()).select(["n", "e"]),
        batch_format="pyarrow",
    ).iter_batches(batch_format="pyarrow"):
        n_total += int(pc.sum(b["n"]).as_py() or 0)
        err += int(pc.sum(b["e"]).as_py() or 0)

    agg = (
        summ.map_batches(
            lambda t: t.filter(t["v"].combine_chunks().is_valid()).select(
                ["v", "c"]
            ),
            batch_format="pyarrow",
        )
        .groupby("v")
        .aggregate(Sum("c", alias_name="c"))
    )

    top_n = 4 * k + 1

    def local_top(t: pa.Table) -> pa.Table:
        if len(t) > top_n:
            c = np.asarray(t["c"], dtype=np.int64)
            order = np.lexsort((np.arange(len(c)), -c))[:top_n]
            t = t.take(pa.array(np.sort(order), type=pa.int64()))
        return t

    data = collect_table(agg.map_batches(local_top, batch_format="pyarrow"))
    if len(data) == 0:
        fallback = pa.schema([pa.field("v", pa.string())])
        vtype = base_schema_or(summ, fallback).field("v").type
        schema = pa.schema([pa.field(out_name, vtype), pa.field("n", pa.int64())])
        return HeavyHitters(schema.empty_table(), err == 0, n_total, err, 0)
    # global (summed desc, value asc) order over the collected local tops
    sort_tbl = data.sort_by([("c", "descending"), ("v", "ascending")])
    boundary = int(sort_tbl["c"][4 * k].as_py()) if len(sort_tbl) > 4 * k else 0
    cand = sort_tbl.slice(0, 4 * k)["v"].combine_chunks()

    def exact_counts(t: pa.Table) -> pa.Table:
        col = t[column].combine_chunks()
        col = col.filter(col.is_valid())
        col = col.filter(pc.is_in(col, value_set=cand))
        if len(col) == 0:
            return pa.table(
                {"v": pa.array([], type=cand.type), "c": pa.array([], type=pa.int64())}
            )
        vc = col.value_counts()
        return pa.table(
            {"v": vc.field("values"), "c": vc.field("counts").cast(pa.int64())}
        )

    exact = collect_table(
        ds.map_batches(exact_counts, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Sum("c", alias_name="c"))
    )
    if len(exact) == 0:
        schema = pa.schema(
            [pa.field(out_name, cand.type), pa.field("n", pa.int64())]
        )
        return HeavyHitters(schema.empty_table(), err == 0, n_total, err, boundary)
    exact = exact.sort_by([("c", "descending"), ("v", "ascending")]).slice(0, k)
    kth = int(exact["c"][len(exact) - 1].as_py())
    guaranteed = kth > boundary + err if len(exact) >= k else (boundary + err) == 0
    table = pa.table({out_name: exact["v"], "n": exact["c"]})
    return HeavyHitters(table, guaranteed, n_total, err, boundary)


# ----------------------------------------------------------------- HyperLogLog
_HLL_SEED = 0x48_4C_4C  # "HLL"


def _bit_length_u64(w: np.ndarray) -> np.ndarray:
    """Exact bit length of uint64 values, vectorized. float64 frexp is only
    exact below 2^53, so split into 32-bit halves (each exact)."""
    hi = (w >> np.uint64(32)).astype(np.float64)
    lo = (w & np.uint64(0xFFFFFFFF)).astype(np.float64)
    _, e_hi = np.frexp(hi)
    _, e_lo = np.frexp(lo)
    return np.where(hi > 0, e_hi + 32, e_lo).astype(np.int64)


def _hll_rows(column: str, p: int, seed: int):
    """Per-block nonzero HLL registers as (i, r) rows — <= min(2^p, block
    distinct) rows of two small ints per block through the groupby-max."""
    m = 1 << p
    shift = np.uint64(64 - p)

    def fn(t: pa.Table) -> pa.Table:
        col = t[column].combine_chunks()
        col = col.filter(col.is_valid())
        if len(col) == 0:
            return pa.table(
                {"i": pa.array([], type=pa.int64()), "r": pa.array([], type=pa.int64())}
            )
        h = hash64(col, seed)
        idx = (h >> shift).astype(np.int64)  # top p bits -> register index
        w = h & ((np.uint64(1) << shift) - np.uint64(1))  # low 64-p bits
        # rho = leading zeros of w within (64-p) bits, +1 (exact bit length)
        rho = (64 - p - _bit_length_u64(w) + 1).astype(np.int64)
        regs = np.zeros(m, dtype=np.int64)
        np.maximum.at(regs, idx, rho)
        nz = np.nonzero(regs)[0]
        return pa.table(
            {"i": pa.array(nz, type=pa.int64()), "r": pa.array(regs[nz], type=pa.int64())}
        )

    return fn


def _hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator (Flajolet et al. 2007) with the small-range
    linear-counting correction; no large-range correction needed with a
    64-bit hash."""
    m = len(regs)
    alpha = 0.7213 / (1.0 + 1.079 / m) if m >= 128 else {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1.0 + 1.079 / m))
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int(np.sum(regs == 0))
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)
    return float(est)


def approx_distinct(
    ds: ray.data.Dataset, column: str, *, precision: int = 12, seed: int = _HLL_SEED
) -> int:
    """HyperLogLog approximate count of distinct non-null values.

    One ``map_batches`` pass emits each block's nonzero registers (<= 2^p
    rows of two ints — independent of value width); one groupby-max merges
    them (register max is associative + commutative, so the estimate is
    bit-identical at any parallelism); the driver folds <= 2^p rows.
    Relative error ~1.04/sqrt(2^p) (~1.6% at the default p=12).
    """
    if not 4 <= precision <= 18:
        raise ValueError("precision must be in [4, 18]")
    m = 1 << precision
    merged = collect_table(
        ds.map_batches(_hll_rows(column, precision, seed), batch_format="pyarrow")
        .groupby("i")
        .aggregate(Max("r", alias_name="r"))
    )
    regs = np.zeros(m, dtype=np.int64)
    if len(merged):
        regs[np.asarray(merged["i"], dtype=np.int64)] = np.asarray(
            merged["r"], dtype=np.int64
        )
    if not regs.any():
        return 0
    return int(round(_hll_estimate(regs)))


def add_approx_distinct(
    ds: ray.data.Dataset,
    group_key: str,
    column: str,
    *,
    precision: int = 10,
    seed: int = _HLL_SEED,
    result_name: str = "approx_distinct",
) -> ray.data.Dataset:
    """Per-group HyperLogLog distinct counts: (group_key, approx_distinct).

    The scale path for "distinct texts per host" style profiling where the
    exact answer (``host_stats``'s two-level distinct) shuffles a 16-byte
    hash per ROW: this shuffles <= min(2^p, group-block distinct) register
    rows per (group, block) — bounded by the sketch size however many
    duplicate rows a group has. Groups never need to co-reside with their
    raw values; only (group, register, rho) triples move.
    """
    if result_name == group_key:
        raise ValueError(
            "add_approx_distinct result_name collides with the group key; "
            "the estimate column would silently overwrite it"
        )
    m = 1 << precision
    shift = np.uint64(64 - precision)

    def rows(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            t[group_key].combine_chunks().is_valid(),
            t[column].combine_chunks().is_valid(),
        )
        t = t.filter(keep)
        if len(t) == 0:
            return pa.table(
                {
                    group_key: pa.array([], type=t.schema.field(group_key).type),
                    "i": pa.array([], type=pa.int64()),
                    "r": pa.array([], type=pa.int64()),
                }
            )
        h = hash64(t[column], seed)
        idx = (h >> shift).astype(np.int64)
        w = h & ((np.uint64(1) << shift) - np.uint64(1))
        rho = (64 - precision - _bit_length_u64(w) + 1).astype(np.int64)
        # dense per-(group-in-block, register) max via lexsort dedupe
        gcol = t[group_key].combine_chunks()
        codes = pc.dictionary_encode(gcol)
        gidx = np.asarray(codes.indices, dtype=np.int64)
        order = np.lexsort((-rho, idx, gidx))
        gi, ii, rr = gidx[order], idx[order], rho[order]
        first = np.ones(len(gi), dtype=bool)
        first[1:] = (gi[1:] != gi[:-1]) | (ii[1:] != ii[:-1])
        gdict = codes.dictionary
        return pa.table(
            {
                group_key: gdict.take(pa.array(gi[first], type=pa.int64())),
                "i": pa.array(ii[first], type=pa.int64()),
                "r": pa.array(rr[first], type=pa.int64()),
            }
        )

    merged = (
        ds.map_batches(rows, batch_format="pyarrow")
        .groupby([group_key, "i"])
        .aggregate(Max("r", alias_name="r"))
    )

    def finish(g: pa.Table) -> pa.Table:
        regs = np.zeros(m, dtype=np.int64)
        regs[np.asarray(g["i"], dtype=np.int64)] = np.asarray(g["r"], dtype=np.int64)
        return pa.table(
            {
                group_key: g[group_key].slice(0, 1),
                result_name: pa.array([int(round(_hll_estimate(regs)))], type=pa.int64()),
            }
        )

    return merged.groupby(group_key).map_groups(finish, batch_format="pyarrow")
