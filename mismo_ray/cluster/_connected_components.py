"""Connected components: transitive clustering of linked records.

Reference: /root/reference/mismo/cluster/_connected_components.py:39-314 —
iterative min-label propagation (drmaciver.com SQL-CC algorithm), linear in
the diameter of the largest component; non-int record ids are factorized to
int64 first (:266-286, mismo/_factorizer.py:12-41); unlinked records get
fresh labels above the max existing label (:305-314).

Two execution paths:

- **distributed** (the 10^12-row path): the exact reference round structure as
  Ray Data ops — per round 2 hash joins (edges x labels on each endpoint)
  -> distinct component-equivalence pairs -> union of both directions ->
  ``groupby(component_old).min`` -> relabel, with labels materialized per
  round (lineage truncation) and optionally checkpointed to parquet;
  convergence = count of changed labels == 0.
- **driver union-find** (automatic below ``driver_threshold`` edges): the
  guide's sanctioned shortcut when the edge set is provably small — collect
  edge ids, numpy/dict union-find, broadcast labels back.

Component label = the minimum int64 code over the component's members
(identical to the reference's fixpoint). Singletons use their own id/code as
the fresh label (unique, disjoint from min-member propagated labels; the
reference numbers them ``max_label + row_number`` — same semantics,
different arbitrary values, and no int64 overflow on hash-derived ids).

Upgrade paths beyond plain min-label propagation (not needed for reference
parity; rounds ~ cluster diameter, which is small for dup clusters):
large-star/small-star contraction (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14 — the arXiv:1802.09478 survey the reference
cites) and load-balanced distributed union-find (BTS, ICDE'24, PAPERS.md).
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Min

from mismo_ray._joins import broadcast_lookup, distinct, hash_join
from mismo_ray._util import hash64

logger = logging.getLogger(__name__)

# update maps up to this many rows are broadcast (map-only relabel);
# larger maps fall back to the left-outer hash join (the extreme-scale path)
_UPDATE_MAP_BCAST = 2_000_000


# --------------------------------------------------------------- factorizer
def bucketed_lookup_join(
    ds: ray.data.Dataset,
    column: str,
    mapping_ds: ray.data.Dataset,
    *,
    key_name: str,
    val_name: str,
    out_type: pa.DataType,
    result_name: str | None = None,
    on_missing=None,
    ds_schema: pa.Schema | None = None,
) -> ray.data.Dataset:
    """Distributed key -> value lookup where the mapping is itself a Dataset
    (corpus-sized — NEVER collected to the driver).

    One keyed shuffle: both sides get ``__bkt__ = hash(key) % B``, are tagged
    and unioned, and each bucket resolves its rows against its slice of the
    mapping — ``pc.index_in`` + ``take`` for scalar key types, a python dict
    keyed on ``_hashable`` for nested (struct/list) keys. ``result_name=None``
    replaces ``column`` in place, else appends. Missing keys raise unless
    ``on_missing(missing_key_array) -> fill value Array`` is given.
    """
    import pyarrow.compute as pc

    from mismo_ray._joins import default_num_partitions

    from mismo_ray._util import base_schema_or

    B = default_num_partitions()
    schema = ds_schema or base_schema_or(ds)  # clear error on empty-unknown
    key_type = schema.field(column).type
    data_cols = list(schema.names)
    nested = pa.types.is_nested(key_type)

    def proj_map(t: pa.Table) -> pa.Table:
        cols = {
            "__key__": t[key_name].combine_chunks().cast(key_type),
            "__val__": t[val_name].combine_chunks().cast(out_type),
        }
        for c in data_cols:
            cols[f"__d_{c}"] = pa.nulls(len(t), schema.field(c).type)
        cols["__side__"] = pa.array(np.zeros(len(t), dtype=np.int8))
        out = pa.table(cols)
        bkt = (hash64(out["__key__"]) % np.uint64(B)).astype(np.int64)
        return out.append_column("__bkt__", pa.array(bkt))

    def proj_data(t: pa.Table) -> pa.Table:
        cols = {
            "__key__": t[column].combine_chunks(),
            "__val__": pa.nulls(len(t), out_type),
        }
        for c in data_cols:
            cols[f"__d_{c}"] = t[c]
        cols["__side__"] = pa.array(np.ones(len(t), dtype=np.int8))
        out = pa.table(cols)
        bkt = (hash64(out["__key__"]) % np.uint64(B)).astype(np.int64)
        return out.append_column("__bkt__", pa.array(bkt))

    tagged = mapping_ds.map_batches(proj_map, batch_format="pyarrow").union(
        ds.map_batches(proj_data, batch_format="pyarrow")
    )

    def resolve(g: pa.Table) -> pa.Table:
        side = np.asarray(g["__side__"].to_numpy(zero_copy_only=False))
        mrows = g.filter(pa.array(side == 0))
        drows = g.filter(pa.array(side == 1))
        keys = drows["__key__"].combine_chunks()
        if nested:
            local = {
                _hashable(k): v
                for k, v in zip(
                    mrows["__key__"].to_pylist(), mrows["__val__"].to_pylist()
                )
            }
            sentinel = object()
            raw = [local.get(_hashable(k), sentinel) for k in keys.to_pylist()]
            miss = np.fromiter((v is sentinel for v in raw), dtype=bool, count=len(raw))
            vals = pa.array(
                [None if v is sentinel else v for v in raw], type=out_type
            )
        else:
            idx = pc.index_in(keys, value_set=mrows["__key__"].combine_chunks())
            vals = pc.take(mrows["__val__"].combine_chunks(), idx)
            miss = np.asarray(idx.is_null())
        if miss.any():
            if on_missing is None:
                raise KeyError(
                    f"{int(miss.sum())} keys of '{column}' missing from mapping"
                )
            fill = on_missing(keys.filter(pa.array(miss)))
            vals_np = vals.to_pylist()
            fill_l = fill.to_pylist() if isinstance(fill, pa.Array) else list(fill)
            j = 0
            for i in np.flatnonzero(miss):
                vals_np[i] = fill_l[j]
                j += 1
            vals = pa.array(vals_np, type=out_type)
        cols = {}
        for c in data_cols:
            if c == column and result_name is None:
                cols[c] = vals
            else:
                cols[c] = drows[f"__d_{c}"]
        if result_name is not None:
            cols[result_name] = vals
        return pa.table(cols)

    return tagged.groupby("__bkt__").map_groups(resolve, batch_format="pyarrow")


class Factorizer:
    """record_id <-> dense-ish unique int64 codes.

    Int ids pass through unchanged (reference Factorizer noop,
    _factorizer.py:43-60). Other types get a unique int64 via bucketed dense
    assignment: code = bucket + n_buckets * rank_within_bucket — sort-free,
    deterministic, distributed (SURVEY §2.9).

    The id<->code mapping stays a (materialized) Dataset; encode/decode run
    as bucketed lookup joins, so record-id vocabularies as large as the
    corpus never touch the driver. Only when the vocabulary is provably small
    (<= broadcast_threshold) is it collected into a broadcast dict fast path.
    """

    def __init__(
        self,
        ids_ds: ray.data.Dataset,
        *,
        n_buckets: int = 1024,
        broadcast_threshold: int = 2_000_000,
    ):
        self.n_buckets = n_buckets
        _s = ids_ds.schema(fetch_if_missing=True)
        schema = _s.base_schema if _s is not None else pa.schema(
            [pa.field("record_id", pa.int64())]  # empty ids: type is moot
        )
        self.id_type = schema.field("record_id").type
        self.is_int = pa.types.is_integer(self.id_type)
        self.mapping = None
        self._decode = None
        if self.is_int:
            return
        # ids -> hash bucket; batch-local pre-dedupe cuts the shuffle volume,
        # the authoritative dedupe happens inside each bucket group. A
        # groupby on the raw id column would be wrong here: Ray's sort-based
        # shuffle cannot compare nested (struct/list) keys — the int bucket
        # is the only shuffle key this path ever sorts on.
        import pyarrow.compute as pc

        nested = pa.types.is_nested(self.id_type)

        def assign(t: pa.Table) -> pa.Table:
            ids = t["record_id"].combine_chunks()
            if nested:
                seen: dict = {}
                for v in ids.to_pylist():
                    seen.setdefault(_hashable(v), v)
                ids = pa.array(list(seen.values()), type=self.id_type)
            else:
                ids = pc.unique(ids)
            bucket = (hash64(ids) % np.uint64(n_buckets)).astype(np.int64)
            return pa.table({"record_id": ids, "bucket": pa.array(bucket)})

        bucketed = ids_ds.map_batches(assign, batch_format="pyarrow")

        def code_group(g: pa.Table) -> pa.Table:
            b = g["bucket"][0].as_py()
            arr = g["record_id"].combine_chunks()
            if nested:
                seen: dict = {}
                for v in arr.to_pylist():
                    seen.setdefault(_hashable(v), v)
                vals = list(seen.values())
                order = np.argsort(hash64(vals), kind="stable")
                uniq = pa.array([vals[i] for i in order], type=self.id_type)
            else:
                uniq = pc.unique(arr)
                order = np.argsort(hash64(uniq), kind="stable")
                uniq = uniq.take(pa.array(order, type=pa.int64()))
            # rank within bucket ordered by id hash: deterministic across
            # runs and parallelism levels (group row order is not)
            codes = b + n_buckets * np.arange(len(uniq), dtype=np.int64)
            return pa.table({"record_id": uniq, "code": pa.array(codes)})

        self.coded = (
            bucketed.groupby("bucket")
            .map_groups(code_group, batch_format="pyarrow")
            .materialize()
        )
        self.coded_schema = pa.schema(
            [pa.field("record_id", self.id_type), pa.field("code", pa.int64())]
        )
        self.n_codes = self.coded.count()
        if self.n_codes <= broadcast_threshold:
            pdf = self.coded.to_pandas()
            self.mapping = dict(zip(pdf["record_id"].map(_hashable), pdf["code"]))
            self._decode = {v: k for k, v in self.mapping.items()}

    def encode_column(
        self,
        ds: ray.data.Dataset,
        column: str,
        *,
        ds_schema: pa.Schema | None = None,
    ) -> ray.data.Dataset:
        if self.is_int:
            return ds
        if self.mapping is not None:
            mapping = self.mapping

            def fn(t: pa.Table) -> pa.Table:
                vals = [mapping[_hashable(v)] for v in t[column].to_pylist()]
                idx = t.schema.get_field_index(column)
                return t.set_column(idx, column, pa.array(vals, type=pa.int64()))

            return ds.map_batches(fn, batch_format="pyarrow")
        return bucketed_lookup_join(
            ds,
            column,
            self.coded,
            key_name="record_id",
            val_name="code",
            out_type=pa.int64(),
            ds_schema=ds_schema,
        )

    def decode_column(
        self,
        ds: ray.data.Dataset,
        column: str,
        *,
        ds_schema: pa.Schema | None = None,
    ) -> ray.data.Dataset:
        if self.is_int:
            return ds
        if self._decode is not None:
            decode = self._decode
            id_type = self.id_type

            def fn(t: pa.Table) -> pa.Table:
                vals = [decode[v] for v in t[column].to_pylist()]
                idx = t.schema.get_field_index(column)
                return t.set_column(idx, column, pa.array(vals, type=id_type))

            return ds.map_batches(fn, batch_format="pyarrow")
        # join on the code side: swap key/val roles of the coded mapping
        return bucketed_lookup_join(
            ds,
            column,
            self.coded,
            key_name="code",
            val_name="record_id",
            out_type=self.id_type,
            ds_schema=ds_schema,
        )


def _hashable(v):
    if isinstance(v, dict):
        return tuple(sorted(v.items()))
    if isinstance(v, list):
        return tuple(v)
    return v


# ------------------------------------------------------------------- driver path
def _cc_driver(edges: ray.data.Dataset) -> dict:
    """Union-find over collected edges -> {record_id(or hashable): min-code}."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    def union(a, b):
        for v in (a, b):
            if v not in parent:
                parent[v] = v
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for b in edges.iter_batches(batch_format="pyarrow"):
        ll = b["record_id_l"].to_pylist()
        rr = b["record_id_r"].to_pylist()
        for a, c in zip(ll, rr):
            union(_hashable(a), _hashable(c))
    return {x: find(x) for x in parent}


# -------------------------------------------------------------- distributed path
def _cc_star(
    edges: ray.data.Dataset,
    *,
    max_iter: int | None = None,
    checkpoint_dir: str | None = None,
) -> ray.data.Dataset:
    """Alternating large-star / small-star rounds (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14 — the paper the
    reference's CC docs point at): converges in O(log n) rounds vs plain
    min-propagation's O(diameter), so it is the mode for long-chain graphs.

    Each half-round is one bucketed groupby shuffle (all rows of a node land
    in hash(node)%B's bucket; per-node neighborhoods are processed with
    vectorized sort + minimum.reduceat inside the bucket — no python per
    node) followed by an edge-distinct. Both operations only re-point nodes
    at smaller members of their own component, so the component minimum is
    invariant and the converged stars are rooted at it — the SAME labels
    min-propagation produces.
    """
    import pyarrow.compute as pc

    from mismo_ray._joins import default_num_partitions
    from mismo_ray._util import splitmix64

    # the edge set is consumed more than once (the star rounds AND the
    # final identity-labels union); pin it so a lazy upstream pair-gen
    # lineage does not re-execute — mode="auto" pins before routing, but
    # an explicit mode="star" call arrives lazy (_cc_distributed does the
    # same pin internally)
    edges = edges.materialize()
    B = default_num_partitions()
    _EMPTY = pa.table(
        {"u": pa.array([], type=pa.int64()), "v": pa.array([], type=pa.int64())}
    )

    def canon(t: pa.Table) -> pa.Table:
        a = t["record_id_l"].combine_chunks().cast(pa.int64())
        b = t["record_id_r"].combine_chunks().cast(pa.int64())
        hi = pc.max_element_wise(a, b)
        lo = pc.min_element_wise(a, b)
        keep = pc.not_equal(hi, lo)
        return pa.table({"u": hi.filter(keep), "v": lo.filter(keep)})

    E = distinct(
        edges.map_batches(canon, batch_format="pyarrow"), ["u", "v"]
    ).materialize()

    def bucketize(col: str):
        def fn(t: pa.Table) -> pa.Table:
            src = np.asarray(t[col], dtype=np.int64)
            bkt = (src.astype(np.uint64) % np.uint64(B)).astype(np.int64)
            return t.append_column("__b__", pa.array(bkt))

        return fn

    def large_star_bucket(g: pa.Table) -> pa.Table:
        # emit (v, min(N+(u))) for every neighbor v > u of each node u
        src = np.asarray(g["src"], dtype=np.int64)
        dst = np.asarray(g["dst"], dtype=np.int64)
        if len(src) == 0:
            return _EMPTY
        order = np.lexsort((dst, src))
        src, dst = src[order], dst[order]
        starts = np.flatnonzero(np.r_[True, src[1:] != src[:-1]])
        counts = np.diff(np.r_[starts, len(src)])
        m = np.minimum(np.minimum.reduceat(dst, starts), src[starts])
        m_rep = np.repeat(m, counts)
        big = dst > src
        return pa.table({"u": pa.array(dst[big]), "v": pa.array(m_rep[big])})

    def small_star_bucket(g: pa.Table) -> pa.Table:
        # edges are directed u > v here; per u: m = min neighbor, emit
        # (u, m) and (v, m) for the other small neighbors
        u = np.asarray(g["u"], dtype=np.int64)
        v = np.asarray(g["v"], dtype=np.int64)
        if len(u) == 0:
            return _EMPTY
        order = np.lexsort((v, u))
        u, v = u[order], v[order]
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        counts = np.diff(np.r_[starts, len(u)])
        m = np.minimum.reduceat(v, starts)
        m_rep = np.repeat(m, counts)
        keep = v != m_rep
        out_u = np.concatenate([v[keep], u[starts]])
        out_v = np.concatenate([m_rep[keep], m])
        return pa.table({"u": pa.array(out_u), "v": pa.array(out_v)})

    def checksum(e: ray.data.Dataset) -> tuple[int, int]:
        # order-insensitive content hash: sum of mixed pair hashes + count
        def h(t: pa.Table) -> pa.Table:
            u = np.asarray(t["u"], dtype=np.int64).astype(np.uint64)
            v = np.asarray(t["v"], dtype=np.int64).astype(np.uint64)
            with np.errstate(over="ignore"):
                s = splitmix64(u * np.uint64(1000003) ^ v).sum(dtype=np.uint64)
            return pa.table(
                {
                    "s": pa.array([int(s.astype(np.int64))]),
                    "n": pa.array([len(t)]),
                }
            )

        tot_s, tot_n = 0, 0
        for bt in e.map_batches(h, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        ):
            tot_s = (tot_s + sum(bt["s"].to_pylist())) & 0xFFFFFFFFFFFFFFFF
            tot_n += sum(bt["n"].to_pylist())
        return tot_s, tot_n

    prev = checksum(E)
    i = 0
    while True:
        i += 1
        sym = E.map_batches(
            lambda t: pa.table(
                {
                    "src": pa.concat_arrays(
                        [t["u"].combine_chunks(), t["v"].combine_chunks()]
                    ),
                    "dst": pa.concat_arrays(
                        [t["v"].combine_chunks(), t["u"].combine_chunks()]
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        after_large = (
            sym.map_batches(bucketize("src"), batch_format="pyarrow")
            .groupby("__b__")
            .map_groups(large_star_bucket, batch_format="pyarrow")
        )
        # no distinct between the half-rounds: duplicate edges cannot change
        # any per-node minimum (they at most double small-star's input), and
        # skipping it saves one full shuffle per round; the post-small-star
        # distinct restores the canonical edge set
        after_small = (
            after_large.map_batches(bucketize("u"), batch_format="pyarrow")
            .groupby("__b__")
            .map_groups(small_star_bucket, batch_format="pyarrow")
        )
        E = distinct(after_small, ["u", "v"]).materialize()
        if checkpoint_dir is not None:
            E.write_parquet(f"{checkpoint_dir}/star_edges_round_{i}")
        cur = checksum(E)
        logger.info("CC star round %d: %d edges", i, cur[1])
        if cur == prev or (max_iter is not None and i >= max_iter):
            break
        prev = cur

    # converged: E is a forest of stars rooted at each component's min node
    def stars_to_labels(t: pa.Table) -> pa.Table:
        u = t["u"].combine_chunks()
        v = t["v"].combine_chunks()
        return pa.table(
            {
                "record_id": pa.concat_arrays([u, v]),
                "component": pa.concat_arrays([v, v]),
            }
        )

    # identity rows cover nodes canon dropped (self-loop-only nodes) and
    # make every endpoint labeled, like min-propagation's initial labels
    def identity_labels(t: pa.Table) -> pa.Table:
        ids = pa.concat_arrays(
            [
                t["record_id_l"].combine_chunks().cast(pa.int64()),
                t["record_id_r"].combine_chunks().cast(pa.int64()),
            ]
        )
        return pa.table({"record_id": ids, "component": ids})

    labels = E.map_batches(stars_to_labels, batch_format="pyarrow").union(
        edges.map_batches(identity_labels, batch_format="pyarrow")
    )
    # min per node: keeps the star root where one exists (root = component
    # min <= own id), resolves a max_iter-truncated run's multiple candidates
    return labels.groupby("record_id").aggregate(
        Min("component", alias_name="component")
    )


def _cc_distributed(
    edges: ray.data.Dataset,
    *,
    max_iter: int | None,
    checkpoint_dir: str | None = None,
) -> ray.data.Dataset:
    """Min-label propagation rounds over int64 edges -> labels Dataset
    (record_id, component)."""
    import pyarrow.compute as pc

    def initial_labels(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "record_id": pa.concat_arrays(
                    [
                        t["record_id_l"].combine_chunks().cast(pa.int64()),
                        t["record_id_r"].combine_chunks().cast(pa.int64()),
                    ]
                )
            }
        )

    from mismo_ray._joins import default_num_partitions

    n_blocks = default_num_partitions()
    nodes = distinct(
        edges.map_batches(initial_labels, batch_format="pyarrow"), "record_id"
    )
    labels = (
        nodes.map_batches(
            lambda t: t.append_column("component", t["record_id"]),
            batch_format="pyarrow",
        )
        .repartition(n_blocks)
        .materialize()
    )

    edges = edges.materialize()
    label_schema = pa.schema(
        [pa.field("record_id", pa.int64()), pa.field("component", pa.int64())]
    )
    edge_schema = pa.schema(
        [pa.field("record_id_l", pa.int64()), pa.field("record_id_r", pa.int64())]
    )
    n_nodes = labels.count()
    # label tables up to this many rows are broadcast per round (two
    # ``pc.index_in`` lookups in ONE map over the edges — no join shuffles).
    # Keep this SMALL: index_in rebuilds a value-set hash table per task, so
    # broadcasting a large label table costs more than the two hash joins
    # (measured: 1.3M labels broadcast = 92 s vs 70 s joined on the 1M-edge
    # benchmark); bigger graphs take the joins (also the 10^12-row path).
    bcast_nodes = 200_000

    i = 0
    while True:
        i += 1
        if n_nodes <= bcast_nodes:
            ka_list, va_list = [], []
            for bt in labels.iter_batches(batch_format="pyarrow"):
                ka_list.append(bt["record_id"].combine_chunks().cast(pa.int64()))
                va_list.append(bt["component"].combine_chunks().cast(pa.int64()))
            ka = pa.concat_arrays(ka_list) if ka_list else pa.array([], type=pa.int64())
            va = pa.concat_arrays(va_list) if va_list else pa.array([], type=pa.int64())
            lref = ray.put((ka, va))

            def attach_both(t: pa.Table) -> pa.Table:
                ka, va = ray.get(lref)
                l_ids = t["record_id_l"].combine_chunks().cast(pa.int64())
                r_ids = t["record_id_r"].combine_chunks().cast(pa.int64())
                cl = pc.take(va, pc.index_in(l_ids, value_set=ka))
                cr = pc.take(va, pc.index_in(r_ids, value_set=ka))
                return pa.table(
                    {
                        "record_id_l": l_ids,
                        "record_id_r": r_ids,
                        "component_l": cl,
                        "component_r": cr,
                    }
                )

            j2 = edges.map_batches(attach_both, batch_format="pyarrow")
        else:
            # component_l / component_r per edge (2 hash joins)
            j1 = hash_join(
                edges,
                labels.map_batches(
                    lambda t: t.rename_columns(["record_id_l", "component_l"]),
                    batch_format="pyarrow",
                ),
                on="record_id_l",
                left_schema=edge_schema,
                right_schema=pa.schema(
                    [pa.field("record_id_l", pa.int64()), pa.field("component_l", pa.int64())]
                ),
            )
            j2 = hash_join(
                j1,
                labels.map_batches(
                    lambda t: t.rename_columns(["record_id_r", "component_r"]),
                    batch_format="pyarrow",
                ),
                on="record_id_r",
                left_schema=pa.schema(
                    [
                        pa.field("record_id_l", pa.int64()),
                        pa.field("record_id_r", pa.int64()),
                        pa.field("component_l", pa.int64()),
                    ]
                ),
                right_schema=pa.schema(
                    [pa.field("record_id_r", pa.int64()), pa.field("component_r", pa.int64())]
                ),
            )

        def equiv(t: pa.Table) -> pa.Table:
            cl = t["component_l"].combine_chunks().cast(pa.int64())
            cr = t["component_r"].combine_chunks().cast(pa.int64())
            return pa.table(
                {
                    "component_old": pa.concat_arrays([cl, cr]),
                    "component": pa.concat_arrays([cr, cl]),
                }
            )

        update_map = (
            j2.map_batches(equiv, batch_format="pyarrow")
            .groupby("component_old")
            .aggregate(Min("component", alias_name="component"))
            .materialize()
        )
        n_updates_map = update_map.count()

        # apply the update map to the labels: the map holds one row per
        # component that appeared on an edge this round — usually FAR smaller
        # than the label table, so a broadcast dict apply (map-only, no
        # shuffle) beats the left-outer hash join; corpus-sized maps (early
        # rounds at extreme scale) keep the join path.
        if n_updates_map <= _UPDATE_MAP_BCAST:
            m: dict = {}
            for bt in update_map.iter_batches(batch_format="pyarrow"):
                m.update(
                    zip(
                        bt["component_old"].to_pylist(),
                        bt["component"].to_pylist(),
                    )
                )
            keys_arr = pa.array(list(m.keys()), type=pa.int64())
            vals_arr = pa.array(list(m.values()), type=pa.int64())
            mref = ray.put((keys_arr, vals_arr))

            def bcast_relabel(t: pa.Table) -> pa.Table:
                ka, va = ray.get(mref)
                old = t["component"].combine_chunks().cast(pa.int64())
                idx = pc.index_in(old, value_set=ka)
                return pa.table(
                    {
                        "record_id": t["record_id"],
                        "component_old": old,
                        "component": pc.take(va, idx),  # miss -> null
                    }
                )

            relabeled = labels.map_batches(bcast_relabel, batch_format="pyarrow")
        else:
            relabeled = hash_join(
                labels.map_batches(
                    lambda t: t.rename_columns(["record_id", "component_old"]),
                    batch_format="pyarrow",
                ),
                update_map,
                on="component_old",
                how="left_outer",
                left_schema=pa.schema(
                    [pa.field("record_id", pa.int64()), pa.field("component_old", pa.int64())]
                ),
                right_schema=pa.schema(
                    [pa.field("component_old", pa.int64()), pa.field("component", pa.int64())]
                ),
            )

        def finish(t: pa.Table) -> pa.Table:
            comp = pc.min_element_wise(
                pc.fill_null(t["component"], np.int64(2**62)),
                t["component_old"].combine_chunks().cast(pa.int64()),
            )
            changed = pc.not_equal(comp, t["component_old"])
            return pa.table(
                {
                    "record_id": t["record_id"],
                    "component": comp,
                    "__changed__": changed,
                }
            )

        # repartition bounds the per-round block count: the union/sort ops in
        # each round roughly TRIPLE the label block count otherwise, and task
        # counts (and round wall time) grow geometrically with rounds.
        new_labels = (
            relabeled.map_batches(finish, batch_format="pyarrow")
            .repartition(n_blocks)
            .materialize()
        )
        n_updates = new_labels.sum("__changed__")
        labels = new_labels.drop_columns(["__changed__"]).materialize()
        if checkpoint_dir is not None:
            labels.write_parquet(f"{checkpoint_dir}/labels_round_{i}")
        logger.info("CC round %d: %s updates", i, n_updates)
        if not n_updates:
            return labels
        if max_iter is not None and i >= max_iter:
            return labels


# ------------------------------------------------------------------ public API
def connected_components(
    *,
    links: ray.data.Dataset,
    records: ray.data.Dataset | None = None,
    max_iter: int | None = None,
    label_as: str = "component",
    mode: str = "auto",
    driver_threshold: int = 2_000_000,
    factorize_broadcast_threshold: int = 2_000_000,
    checkpoint_dir: str | None = None,
) -> ray.data.Dataset:
    """Label records by connected component of the link graph.

    Returns (record_id, <label_as>) when ``records`` is None, else ``records``
    with a <label_as> column appended (singletons included).

    ``mode``: "auto" (driver union-find for small edge sets, else
    distributed min-propagation), "driver", "distributed", or "star" —
    alternating large-star/small-star rounds (O(log n) rounds instead of
    O(graph diameter); pick it for long-chain graphs, e.g. temporal or
    near-duplicate chains; identical labels, min member id per component).
    """
    if mode not in ("auto", "driver", "distributed", "star"):
        raise ValueError(
            f"mode must be auto/driver/distributed/star, got {mode!r}"
        )
    if records is not None:
        _rs0 = records.schema(fetch_if_missing=True)
        if _rs0 is not None and label_as in _rs0.base_schema.names:
            # append_column would emit a DUPLICATE column name on the
            # broadcast path and the lookup join would silently overwrite
            # the records' original column on the coded path
            raise ValueError(
                f"records already have a column named {label_as!r}; pass a "
                "different label_as"
            )
    edges = links.select_columns(["record_id_l", "record_id_r"])
    if mode == "auto":
        # Materialize the pruned 2-col edge set BEFORE the routing count:
        # count() would otherwise execute the full upstream pair-gen lineage
        # (ngram/LSH shuffles) once for the count and AGAIN for the chosen
        # CC path. Both distributed paths materialize edges internally
        # anyway (they iterate the edge set over rounds), so this only
        # moves the pin earlier; 16 B/edge, spills past the store budget.
        edges = edges.materialize()
        mode = "driver" if edges.count() <= driver_threshold else "distributed"

    _es = edges.schema(fetch_if_missing=True)
    # empty edge set (zero blocks): any id type is consistent; int64 keeps
    # the singleton-labeling path typed
    id_type = _es.base_schema.field("record_id_l").type if _es is not None else pa.int64()
    if pa.types.is_list(id_type) or pa.types.is_large_list(id_type):
        # the Factorizer's hash64/pandas-key machinery handles scalars and
        # struct ids; LIST ids would crash three layers deep (2-D object
        # hash arrays, unhashable ndarray keys) — fail with intent
        raise ValueError(
            "list-typed record ids are not supported by "
            "connected_components; use a struct or scalar id column"
        )
    int_ids = pa.types.is_integer(id_type)

    if mode == "driver":
        comp = _cc_driver(edges)
        if not int_ids:
            # factorize: min-code semantics need int codes; order by first-seen
            codes = {k: i for i, k in enumerate(sorted(comp.keys(), key=repr))}
            roots = {k: codes[v] for k, v in comp.items()}
            # component = min code within component
            min_per_root: dict = {}
            for k, r in roots.items():
                c = codes[k]
                if r not in min_per_root or c < min_per_root[r]:
                    min_per_root[r] = c
            comp = {k: min_per_root[r] for k, r in roots.items()}
        labels_map = comp
        if records is None:
            keys = list(labels_map.keys())
            rid_arr = (
                pa.array(keys, type=id_type)
                if not isinstance(keys[0] if keys else None, tuple)
                else pa.array([dict(k) for k in keys], type=id_type)
            )
            return ray.data.from_arrow(
                pa.table(
                    {
                        "record_id": rid_arr,
                        label_as: pa.array(
                            [labels_map[k] for k in keys], type=pa.int64()
                        ),
                    }
                )
            )
        return _attach_labels_broadcast(records, labels_map, label_as)

    # distributed path: ids must be int64 (factorize otherwise)
    if not int_ids:
        both = edges.map_batches(
            lambda t: pa.table(
                {
                    "record_id": pa.concat_arrays(
                        [
                            t["record_id_l"].combine_chunks(),
                            t["record_id_r"].combine_chunks(),
                        ]
                    )
                }
            ),
            batch_format="pyarrow",
        )
        if records is not None:
            # factorize over link endpoints UNION record ids: every record —
            # singletons included — gets a dense code, so singleton labels
            # can be own-code (collision-free) instead of a 62-bit hash
            # (birthday-colliding at ~1e9 singletons)
            both = both.union(records.select_columns(["record_id"]))
        f = Factorizer(both, broadcast_threshold=factorize_broadcast_threshold)
        edges = f.encode_column(
            edges.map_batches(
                lambda t: t.rename_columns(["record_id", "record_id_r"]),
                batch_format="pyarrow",
            ),
            "record_id",
            ds_schema=pa.schema(
                [pa.field("record_id", id_type), pa.field("record_id_r", id_type)]
            ),
        ).map_batches(
            lambda t: t.rename_columns(["record_id_l", "record_id_r"]),
            batch_format="pyarrow",
        )
        edges = f.encode_column(
            edges.map_batches(
                lambda t: t.rename_columns(["record_id_l", "record_id"]),
                batch_format="pyarrow",
            ),
            "record_id",
            ds_schema=pa.schema(
                [pa.field("record_id_l", pa.int64()), pa.field("record_id", id_type)]
            ),
        ).map_batches(
            lambda t: t.rename_columns(["record_id_l", "record_id_r"]),
            batch_format="pyarrow",
        )
    cc_fn = _cc_star if mode == "star" else _cc_distributed
    labels = cc_fn(edges, max_iter=max_iter, checkpoint_dir=checkpoint_dir)
    if not int_ids and records is not None:
        # attach in CODE space: the factorizer covered record ids too, so a
        # singleton's own code is its fresh label — unique by construction
        # and disjoint from linked min-code component labels
        return _attach_labels_coded(records, labels, f, label_as, id_type)
    if not int_ids:
        labels = f.decode_column(
            labels,
            "record_id",
            ds_schema=pa.schema(
                [pa.field("record_id", pa.int64()), pa.field("component", pa.int64())]
            ),
        )
    if records is None:
        return labels.map_batches(
            lambda t: t.rename_columns(
                [label_as if c == "component" else c for c in t.column_names]
            ),
            batch_format="pyarrow",
        )
    if labels.count() <= driver_threshold:
        pdf = labels.to_pandas()
        labels_map = (
            dict(zip(pdf["record_id"].map(_hashable), pdf["component"]))
            if len(pdf)
            else {}  # no labeled records: every record is a singleton
        )
        return _attach_labels_broadcast(records, labels_map, label_as)
    return _attach_labels_join(records, labels, label_as)


def _attach_labels_coded(
    records: ray.data.Dataset,
    labels: ray.data.Dataset,
    f: "Factorizer",
    label_as: str,
    id_type: pa.DataType,
) -> ray.data.Dataset:
    """Attach component labels to non-int-id records via factorized codes.

    ``labels`` is still in code space (record_id = code). Each record's id is
    encoded with the SAME factorizer (which covered records at build time),
    then labels are looked up by code; a record missing from the labels —
    a singleton — takes its own code as the label. Own-codes are unique and
    belong to unlinked records, so they cannot collide with any linked
    component's min-code label (unlike the previous 62-bit id-hash scheme,
    which had non-negligible birthday collisions at ~1e9 singletons)."""
    _bs = records.schema(fetch_if_missing=True)
    base = _bs.base_schema if _bs is not None else pa.schema(
        [pa.field("record_id", id_type)]  # empty records: nothing to attach
    )

    def dup(t: pa.Table) -> pa.Table:
        return t.append_column("__cc_code__", t["record_id"].combine_chunks())

    rec2 = f.encode_column(
        records.map_batches(dup, batch_format="pyarrow"),
        "__cc_code__",
        ds_schema=base.append(pa.field("__cc_code__", id_type)),
    )
    out = bucketed_lookup_join(
        rec2,
        "__cc_code__",
        labels,
        key_name="record_id",
        val_name="component",
        out_type=pa.int64(),
        result_name=label_as,
        ds_schema=base.append(pa.field("__cc_code__", pa.int64())),
        on_missing=lambda missing: missing.cast(pa.int64()),
    )
    return out.drop_columns(["__cc_code__"])


def _attach_labels_join(
    records: ray.data.Dataset, labels: ray.data.Dataset, label_as: str
) -> ray.data.Dataset:
    """Scale path: join records x labels without collecting either side.

    Int ids: hash left-outer join; singletons (null component) use their own
    record_id as a fresh label (unique, disjoint from min-member-id component
    labels). Non-int ids: bucketed lookup join; singleton fresh labels come
    from the id hash in the >= 2^62 range, disjoint from factorized codes."""
    import pyarrow.compute as pc

    _rs = records.schema(fetch_if_missing=True)
    id_type = (
        _rs.base_schema.field("record_id").type if _rs is not None else pa.int64()
    )  # empty records: type is moot
    if pa.types.is_integer(id_type):
        # join the labels under an INTERNAL name: a records table that
        # already carries a column named "component" would otherwise force
        # hash_join's suffix onto the labels side and fill() would read the
        # records' unrelated column — silent wrong labels
        def rename_label(t: pa.Table) -> pa.Table:
            return pa.table(
                {"record_id": t["record_id"], "__cc_label__": t["component"]}
            )

        lab = labels.map_batches(rename_label, batch_format="pyarrow")
        joined = hash_join(records, lab, on="record_id", how="left_outer")

        def fill(t: pa.Table) -> pa.Table:
            rid = t["record_id"].combine_chunks().cast(pa.int64())
            comp = pc.coalesce(t["__cc_label__"], rid)
            out = t.drop_columns(["__cc_label__"])
            return out.append_column(label_as, comp)

        return joined.map_batches(fill, batch_format="pyarrow")

    def fresh(missing_keys: pa.Array) -> pa.Array:
        h = (hash64(missing_keys) >> np.uint64(2)) | np.uint64(1 << 62)
        return pa.array(h.astype(np.int64))

    return bucketed_lookup_join(
        records,
        "record_id",
        labels,
        key_name="record_id",
        val_name="component",
        out_type=pa.int64(),
        result_name=label_as,
        on_missing=fresh,
    )


def _attach_labels_broadcast(
    records: ray.data.Dataset, labels_map: dict, label_as: str
) -> ray.data.Dataset:
    """Attach component labels; singleton records (no links) get fresh
    unique labels (own-id / id-hash — see the branch comments; the
    reference's max_label+row_number numbering is deliberately not used)."""
    import ray

    ref = ray.put(labels_map)

    _rs = records.schema(fetch_if_missing=True)
    id_type = (
        _rs.base_schema.field("record_id").type if _rs is not None else pa.int64()
    )  # empty records: type is moot
    int_ids = pa.types.is_integer(id_type)

    def fn(t: pa.Table) -> pa.Table:
        m = ray.get(ref)
        ids = t["record_id"].to_pylist()
        out = []
        for i, v in enumerate(ids):
            k = _hashable(v)
            if k in m:
                out.append(int(m[k]))
            elif int_ids:
                # component labels are min-member ids of LINKED records; a
                # singleton's own id is unique and disjoint from those, so it
                # is itself a valid fresh label (and cannot overflow, unlike
                # the reference's max_label + row_number numbering).
                out.append(int(v))
            else:
                # unique fresh label from the id hash; the high bit-range
                # (>= 2^62) cannot collide with factorized codes.
                out.append(
                    int((hash64([k])[0] >> np.uint64(2)) | np.uint64(1 << 62))
                )
        return t.append_column(label_as, pa.array(out, type=pa.int64()))

    return records.map_batches(fn, batch_format="pyarrow")
