"""Pair-generation core: the blocking shuffle.

This is the engine behind KeyLinker / UnnestLinker / MinhashLshLinker /
CoordinateLinker (SURVEY §2.3, §7.3-7.5). Reference semantics from
/root/reference/mismo/linker/_key_linker.py:

- records block together when ALL key values are equal (null keys never match);
- dedupe task emits each unordered pair once with record_id_l < record_id_r
  (_key_linker.py:190-193);
- ``max_pairs`` drops every pair of any key whose pair count (nl*nr, computed
  with the same table on both sides for dedupe — reference quirk,
  _key_linker.py:195-222) exceeds the cap.

Ray-Data mapping — one keyed shuffle, skew handled explicitly:

1. project each side to (record_id, key columns, carried columns) in
   ``map_batches`` and hash the key tuple to a uint64 ``__block__``;
2. pre-pass ``groupby(__block__).count()`` over the projection; keys over
   ``max_pairs`` are collected (tiny) and broadcast as a drop set; keys whose
   groups exceed ``salt_rows`` are broadcast as a {block: n} salt map;
3. **salting**: a group of n rows is split into s = ceil(n / salt_rows)
   sub-blocks by record-id hash; each unordered pair of sub-blocks (i <= j)
   becomes its own shuffle group, so no single task ever enumerates more than
   ~salt_rows^2 pairs. Rows are replicated s times (2·npairs/salt_rows total) —
   the price of bounding per-task memory;
4. ``groupby(__grp__).map_groups`` enumerates pairs vectorized
   (numpy triu / meshgrid), with an exact key-tuple sub-group inside each hash
   group to guard against 64-bit hash collisions.

Determinism: sub-block assignment is hash(record_id, seed=block) — stable
across runs and parallelism levels.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Count

from mismo_ray._util import base_schema_or, hash64, linker_fallback_schema, splitmix64
from mismo_ray.keys import KeySpec

_ROLE_BOTH = 0  # unsalted dedupe group: triangle among all rows
_ROLE_L = 1  # left of a cross product
_ROLE_R = 2


def _key_col(name: str) -> str:
    return f"__key_{name}"


def _combine_key_hash(arrays: list[pa.Array]) -> np.ndarray:
    # shared fold (see _util.combine_hash_arrays): keeps the blocking hash
    # bit-identical with every other module's bucketing
    from mismo_ray._util import combine_hash_arrays

    return combine_hash_arrays(arrays, len(arrays[0]))


def project_keyed(
    ds: ray.data.Dataset,
    keys: Sequence[KeySpec],
    side: str,
    carry: Sequence[str] | None,
) -> ray.data.Dataset:
    """(record_id, __key_*, carry..., __block__) with null-key rows dropped."""
    carry = list(carry or [])

    def fn(batch: pa.Table) -> pa.Table:
        key_arrays = [k(batch, side) for k in keys]
        null_mask = np.zeros(len(batch), dtype=bool)
        for arr in key_arrays:
            null_mask |= np.asarray(arr.is_null())
        block = _combine_key_hash(key_arrays)
        cols = {"record_id": batch["record_id"]}
        for k, arr in zip(keys, key_arrays):
            cols[_key_col(k.name)] = arr
        for c in carry:
            cols[c] = batch[c]
        cols["__block__"] = pa.array(block.astype(np.int64))
        out = pa.table(cols)
        if null_mask.any():
            out = out.filter(pa.array(~null_mask))
        return out

    return ds.map_batches(fn, batch_format="pyarrow")


def _block_counts(keyed: ray.data.Dataset) -> ray.data.Dataset:
    return keyed.groupby("__block__").aggregate(Count(alias_name="n"))


def _collect_filtered(counts: ray.data.Dataset, pred) -> pd.DataFrame:
    """Filter the (small-ish) per-key counts distributed, collect the survivors."""

    def fn(t: pa.Table) -> pa.Table:
        n = np.asarray(t["n"], dtype=np.int64)
        return t.filter(pa.array(pred(n)))

    pdf = counts.map_batches(fn, batch_format="pyarrow").to_pandas()
    if "__block__" not in pdf.columns:
        pdf = pd.DataFrame({"__block__": [], "n": []})
    return pdf


def _expand_salt(
    keyed: ray.data.Dataset,
    *,
    drop_ref,
    salt_ref,
    salt_rows: int,
    link: bool,
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """Assign shuffle groups; replicate rows of salted blocks.

    Unsalted: grp = block, role = BOTH (dedupe) or L/R by side (link).
    Salted dedupe (salt[b] = n rows): row in sub-block b joins the triangle
    group (b,b) with role BOTH, and every cross group (i,j), i<j, with role L
    for i-rows and role R for j-rows.
    Salted link (salt[b] = (n_left, n_right)): BOTH sides are sub-blocked —
    sl = ceil(nl/salt_rows) left blocks, sr = ceil(nr/salt_rows) right — and
    every (i, j) cross group gets its left rows (role L, replicated sr times)
    and right rows (role R, replicated sl times), so per-task enumeration is
    bounded by ~salt_rows^2 under skew on EITHER side.
    """

    def grp_ids(block: np.ndarray, i: np.ndarray, j: np.ndarray) -> np.ndarray:
        """Vectorized sub-group id: mix (block, i, j) into one int64."""
        with np.errstate(over="ignore"):
            x = block.astype(np.uint64) ^ (
                i.astype(np.uint64) * np.uint64(1000003)
                + (j.astype(np.uint64) + np.uint64(1))
            )
        return splitmix64(x).astype(np.int64)

    def fn(batch: pa.Table) -> pa.Table:
        drop: frozenset = ray.get(drop_ref) if drop_ref is not None else frozenset()
        salt: dict = ray.get(salt_ref) if salt_ref is not None else {}
        block = np.asarray(batch["__block__"], dtype=np.int64)
        # membership via np.isin against the (tiny) hot-key arrays — a
        # per-ROW python set probe here costs ~100ns x every corpus row
        if drop:
            drop_arr = np.fromiter(drop, dtype=np.int64, count=len(drop))
            keep = ~np.isin(block, drop_arr)
            batch = batch.filter(pa.array(keep))
            block = block[keep]
        side = (
            np.asarray(batch["__side__"], dtype=np.int8) if link else None
        )
        if salt:
            salt_arr = np.fromiter(salt.keys(), dtype=np.int64, count=len(salt))
            is_salted = np.isin(block, salt_arr)
        else:
            is_salted = np.zeros(len(block), dtype=bool)
        # fast path: unsalted rows, vectorized
        plain = batch.filter(pa.array(~is_salted))
        pblock = block[~is_salted]
        if link:
            proles = np.where(side[~is_salted] == 0, _ROLE_L, _ROLE_R).astype(np.int8)
        else:
            proles = np.full(len(pblock), _ROLE_BOTH, dtype=np.int8)
        tables = []
        if len(plain):
            tables.append(
                plain.append_column("__grp__", pa.array(pblock))
                .append_column("__role__", pa.array(proles))
            )
        # salted rows: fully vectorized replication (np.repeat + a replica
        # position index) — this is the skew path, so a hot key with millions
        # of rows x s replicas must not run a python loop
        if is_salted.any():
            hot = batch.filter(pa.array(is_salted))
            hblock = block[is_salted]
            rid = np.asarray(hot["record_id"])
            subh = hash64(rid, seed=0xBEEF)  # raw sub-block hash; mod per side
            # per-row salt params via unique-block factorization (few hot blocks)
            ub, inv = np.unique(hblock, return_inverse=True)
            if link:
                usl = np.array(
                    [max(1, math.ceil(salt[b][0] / salt_rows)) for b in ub],
                    dtype=np.int64,
                )
                usr = np.array(
                    [max(1, math.ceil(salt[b][1] / salt_rows)) for b in ub],
                    dtype=np.int64,
                )
                sl, sr = usl[inv], usr[inv]
                is_l = side[is_salted] == 0
                # a left row sits in one left sub-block and meets every right
                # sub-block (sr replicas); symmetric for right rows
                own = np.where(
                    is_l,
                    (subh % sl.astype(np.uint64)).astype(np.int64),
                    (subh % sr.astype(np.uint64)).astype(np.int64),
                )
                c = np.where(is_l, sr, sl)
                idx = np.repeat(np.arange(len(hblock), dtype=np.int64), c)
                p = np.arange(int(c.sum()), dtype=np.int64) - np.repeat(
                    np.cumsum(c) - c, c
                )
                isl_rep = np.repeat(is_l, c)
                own_rep = np.repeat(own, c)
                i_arr = np.where(isl_rep, own_rep, p)
                j_arr = np.where(isl_rep, p, own_rep)
                roles = np.where(isl_rep, _ROLE_L, _ROLE_R).astype(np.int8)
            else:
                us = np.array(
                    [max(1, math.ceil(salt[b] / salt_rows)) for b in ub],
                    dtype=np.int64,
                )
                s = us[inv]
                bsub = (subh % s.astype(np.uint64)).astype(np.int64)
                c = s
                idx = np.repeat(np.arange(len(hblock), dtype=np.int64), c)
                p = np.arange(int(c.sum()), dtype=np.int64) - np.repeat(
                    np.cumsum(c) - c, c
                )
                # replica p covers sub-pair (bsub,bsub) BOTH at p==bsub,
                # (bsub,p) L for p>bsub, (p,bsub) R for p<bsub — same set of
                # (i,j) groups the reference triangle enumeration produces
                bs_rep = np.repeat(bsub, c)
                i_arr = np.where(p < bs_rep, p, bs_rep)
                j_arr = np.where(p > bs_rep, p, bs_rep)
                roles = np.where(
                    p == bs_rep,
                    _ROLE_BOTH,
                    np.where(p > bs_rep, _ROLE_L, _ROLE_R),
                ).astype(np.int8)
            if len(idx):
                grp = grp_ids(np.repeat(hblock, c), i_arr, j_arr)
                rep = hot.take(pa.array(idx, type=pa.int64()))
                tables.append(
                    rep.append_column("__grp__", pa.array(grp))
                    .append_column("__role__", pa.array(roles))
                )
        if not tables:
            schema = (
                batch.schema.append(pa.field("__grp__", pa.int64()))
                .append(pa.field("__role__", pa.int8()))
                .append(pa.field("__bkt__", pa.int64()))
            )
            return schema.empty_table()
        out = pa.concat_tables(tables, promote_options="default")
        # coarse shuffle bucket: the groupby shuffles on ~n_buckets groups and
        # each reduce task enumerates MANY key groups vectorized — per-group
        # map_groups calls would dominate wall time at millions of keys
        grp = np.asarray(out["__grp__"], dtype=np.int64)
        bkt = (splitmix64(grp.astype(np.uint64)) % np.uint64(n_buckets)).astype(
            np.int64
        )
        return out.append_column("__bkt__", pa.array(bkt))

    return keyed.map_batches(fn, batch_format="pyarrow")


def _make_enumerator(
    key_cols: list[str],
    carry_l: list[str],
    carry_r: list[str],
    link: bool,
    inline_max_pairs: int | None = None,
):
    """Vectorized within-group pair enumeration, arrow in / arrow out
    (arrow ``take`` preserves column types exactly; a pandas detour would
    coerce nullable ints to float)."""

    def sub_group_indices(g: pa.Table) -> list[np.ndarray]:
        # one bucket holds MANY key groups; split by (__grp__, exact key
        # tuple) with a single C-speed pandas groupby. Including the real key
        # values guards the 1-in-2^64 hash collision.
        cols = ["__grp__", *key_cols]
        kdf = pd.DataFrame(
            {c: g[c].to_numpy(zero_copy_only=False) for c in cols}
        )
        return list(kdf.groupby(cols, dropna=False, sort=False).indices.values())

    def enumerate_pairs(g: pa.Table) -> pa.Table:
        role = np.asarray(g["__role__"].to_numpy(zero_copy_only=False))
        ids = g["record_id"].to_numpy(zero_copy_only=False)
        all_l: list[np.ndarray] = []
        all_r: list[np.ndarray] = []
        for idx in sub_group_indices(g):
            srole = role[idx]
            if link:
                li = idx[srole == _ROLE_L]
                ri = idx[srole == _ROLE_R]
                if inline_max_pairs is not None and len(li) * len(ri) > inline_max_pairs:
                    continue  # in-task hot-key drop (no count pre-pass mode)
                if len(li) and len(ri):
                    il, ir = np.meshgrid(li, ri, indexing="ij")
                    all_l.append(il.ravel())
                    all_r.append(ir.ravel())
            else:
                both = idx[srole == _ROLE_BOTH]
                if (
                    inline_max_pairs is not None
                    and len(both) * len(both) > inline_max_pairs
                ):
                    continue  # n*n quirk parity (reference _key_linker.py:195-222)
                if len(both) > 1:
                    order = both[np.argsort(ids[both], kind="stable")]
                    a, b = np.triu_indices(len(order), k=1)
                    all_l.append(order[a])
                    all_r.append(order[b])
                li = idx[srole == _ROLE_L]
                ri = idx[srole == _ROLE_R]
                if len(li) and len(ri):
                    il, ir = np.meshgrid(li, ri, indexing="ij")
                    il, ir = il.ravel(), ir.ravel()
                    swap = ids[il] > ids[ir]
                    all_l.append(np.where(swap, ir, il))
                    all_r.append(np.where(swap, il, ir))
        if all_l:
            il = pa.array(np.concatenate(all_l), type=pa.int64())
            ir = pa.array(np.concatenate(all_r), type=pa.int64())
        else:
            il = ir = pa.array([], type=pa.int64())
        import pyarrow.compute as pc

        rid = g["record_id"]
        cols = {
            "record_id_l": pc.take(rid, il),
            "record_id_r": pc.take(rid, ir),
        }
        for c in carry_l:
            src = f"{c}__cl" if link else c
            cols[f"{c}_l"] = pc.take(g[src], il)
        for c in carry_r:
            src = f"{c}__cr" if link else c
            cols[f"{c}_r"] = pc.take(g[src], ir)
        return pa.table(cols)

    return enumerate_pairs


def generate_pairs(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    keys: Sequence[KeySpec],
    *,
    task: str,
    max_pairs: int | None = None,
    salt_rows: int | None = 2048,
    carry_l: Sequence[str] | None = None,
    carry_r: Sequence[str] | None = None,
    count_prepass: bool = True,
) -> tuple[ray.data.Dataset, dict]:
    """Generate candidate pairs for records sharing ALL keys.

    Returns (links Dataset, counters dict). Links schema:
    record_id_l, record_id_r [, carried columns suffixed _l/_r].

    ``count_prepass=False`` skips the per-key count pre-pass (one fewer
    barrier + no pinned keyed projection): the ``max_pairs`` hot-key drop is
    enforced INSIDE each reduce task instead, and no salting happens. Only
    correct when every key group's ROWS fit one task (pair count is still
    bounded by max_pairs; row count is not) — use for keys whose group size
    is bounded by construction.
    """
    carry_l = list(carry_l or [])
    carry_r = list(carry_r or [])
    key_cols = [_key_col(k.name) for k in keys]
    counters: dict = {"task": task, "n_keys": len(keys)}
    link = task == "link"

    if not link:
        keyed = project_keyed(left, keys, "left", carry_l)
        if (max_pairs is not None or salt_rows is not None) and count_prepass:
            # the count pre-pass and the pair-gen pass both consume the keyed
            # projection; pin it once instead of re-running the key functions
            # (and any upstream transforms) per consumption. At extreme scale
            # with heavy carried columns, prefer carry=None + a later join so
            # the pinned projection stays narrow.
            keyed = keyed.materialize()
        drop_ref = salt_ref = None
        hot: set = set()
        salt: dict = {}
        # ONE collect pass for both the hot-key drop set and the salt map
        # (two separate passes would re-run the counts groupby) — and NO
        # pass at all when neither cap is set (bounded-group pipelines opt
        # out of the pre-pass entirely)
        if (max_pairs is not None or salt_rows is not None) and count_prepass:
            counts = _block_counts(keyed)
            mp = max_pairs if max_pairs is not None else (1 << 62)
            sr = salt_rows if salt_rows is not None else (1 << 62)
            cpdf = _collect_filtered(counts, lambda n: (n * n > mp) | (n > sr))
        else:
            cpdf = pd.DataFrame({"__block__": [], "n": []})
        if max_pairs is not None and count_prepass:
            # npairs per key uses n*n for dedupe — reference parity quirk
            # (_key_linker.py:195-222 computes nleft*nright on the same table).
            # float64 square: int64 n**2 wraps negative past ~3.04e9 rows and
            # a wrapped hot key would be SALTED into millions of sub-blocks
            # instead of dropped
            hot_mask = cpdf["n"].to_numpy(dtype=np.float64) ** 2 > max_pairs
            hot = set(int(b) for b in cpdf["__block__"][hot_mask])
            counters["hot_keys_dropped"] = len(hot)
            counters["hot_records_dropped"] = (
                int(cpdf["n"][hot_mask].sum()) if len(cpdf) else 0
            )
        if salt_rows is not None and count_prepass:
            spdf = cpdf[cpdf["n"].to_numpy() > salt_rows]
            salt = {
                int(b): int(n)
                for b, n in zip(spdf["__block__"], spdf["n"])
                if int(b) not in hot
            }
        counters["salted_keys"] = len(salt)
        drop_ref = ray.put(frozenset(hot)) if hot else None
        salt_ref = ray.put(salt) if salt else None
        from mismo_ray._joins import default_num_partitions

        expanded = _expand_salt(
            keyed,
            drop_ref=drop_ref,
            salt_ref=salt_ref,
            salt_rows=salt_rows or (1 << 62),
            link=False,
            n_buckets=default_num_partitions(),
        )
        enum = _make_enumerator(
            key_cols, carry_l, carry_r or carry_l, link=False,
            inline_max_pairs=None if count_prepass else max_pairs,
        )
    else:
        keyed_l = project_keyed(left, keys, "left", carry_l)
        keyed_r = project_keyed(right, keys, "right", carry_r)
        if (max_pairs is not None or salt_rows is not None) and count_prepass:
            keyed_l = keyed_l.materialize()
            keyed_r = keyed_r.materialize()
        # carried-column arrow types, needed to fill nulls on the other side
        # so the two tagged projections union with one schema
        _fb = linker_fallback_schema([*carry_l, *carry_r])
        ltypes = {f.name: f.type for f in base_schema_or(left, _fb)}
        rtypes = {f.name: f.type for f in base_schema_or(right, _fb)}

        def tag(side_val: int):
            def fn(t: pa.Table) -> pa.Table:
                n = len(t)
                cols = {"record_id": t["record_id"], "__block__": t["__block__"]}
                for k in key_cols:
                    cols[k] = t[k]
                for c in carry_l:
                    cols[f"{c}__cl"] = t[c] if side_val == 0 else pa.nulls(n, ltypes[c])
                for c in carry_r:
                    cols[f"{c}__cr"] = t[c] if side_val == 1 else pa.nulls(n, rtypes[c])
                cols["__side__"] = pa.array(np.full(n, side_val, dtype=np.int8))
                return pa.table(cols)

            return fn

        tl = keyed_l.map_batches(tag(0), batch_format="pyarrow")
        tr = keyed_r.map_batches(tag(1), batch_format="pyarrow")
        keyed = tl.union(tr)
        drop_ref = salt_ref = None
        if (max_pairs is not None or salt_rows is not None) and count_prepass:
            from mismo_ray._joins import hash_join

            cl = _block_counts(keyed_l)
            cr = _block_counts(keyed_r)
            counts_schema = pa.schema(
                [pa.field("__block__", pa.int64()), pa.field("n", pa.int64())]
            )
            # explicit schemas: an empty side's aggregate output has no
            # inferable schema (ds.schema() is None) and empty corpora are
            # legal inputs
            # FULL OUTER: an inner join would silently skip blocks present
            # on one side only — a one-sided hot key then lands unsalted
            # and undropped in a single reduce group (OOM/straggler) even
            # though it can produce zero pairs
            joined = hash_join(
                cl,
                cr,
                on="__block__",
                how="full_outer",
                right_suffix="_r",
                left_schema=counts_schema,
                right_schema=counts_schema,
            )
            # ONE collect pass over the joined per-block counts serves both
            # the hot-key drop set and the TWO-SIDED salt map: a block is
            # salted when EITHER side exceeds salt_rows (left-only salting
            # would leave right-skewed blocks with salt_rows * n_right pair
            # enumeration in one task).
            mp = max_pairs if max_pairs is not None else (1 << 62)
            sr_t = salt_rows if salt_rows is not None else (1 << 62)

            import pyarrow.compute as pc

            def hot_or_salt(t: pa.Table) -> pa.Table:
                # fill the outer join's nulls with 0 (block on one side
                # only); float64 products so a pathological count cannot
                # wrap int64 and dodge the drop
                nl = np.asarray(pc.fill_null(t["n"], 0), dtype=np.float64)
                nr = np.asarray(pc.fill_null(t["n_r"], 0), dtype=np.float64)
                t = t.set_column(
                    t.schema.get_field_index("n"),
                    "n",
                    pa.array(nl.astype(np.int64)),
                ).set_column(
                    t.schema.get_field_index("n_r"),
                    "n_r",
                    pa.array(nr.astype(np.int64)),
                )
                return t.filter(
                    pa.array((nl * nr > mp) | (nl > sr_t) | (nr > sr_t))
                )

            jpdf = joined.map_batches(hot_or_salt, batch_format="pyarrow").to_pandas()
            if "__block__" not in jpdf.columns:
                jpdf = pd.DataFrame({"__block__": [], "n": [], "n_r": []})
            nl_all = jpdf["n"].to_numpy(dtype=np.float64) if len(jpdf) else np.array([])
            nr_all = jpdf["n_r"].to_numpy(dtype=np.float64) if len(jpdf) else np.array([])
            hot = set()
            if max_pairs is not None:
                hot_mask = nl_all * nr_all > max_pairs
                hot = set(int(b) for b in jpdf["__block__"][hot_mask])
            # a block that exists on ONE side only produces zero pairs but
            # would otherwise shuffle all its rows into a single group (or
            # be pointlessly salted) — drop it outright when oversized
            if len(jpdf):
                one_sided = ((nl_all == 0) | (nr_all == 0)) & (
                    (nl_all > sr_t) | (nr_all > sr_t)
                )
                n_one_sided = int(one_sided.sum())
                if n_one_sided:
                    hot |= set(int(b) for b in jpdf["__block__"][one_sided])
                counters["one_sided_keys_dropped"] = n_one_sided
            counters["hot_keys_dropped"] = len(hot)
            salt = {}
            if salt_rows is not None:
                salt = {
                    int(b): (int(nl), int(nr))
                    for b, nl, nr in zip(jpdf["__block__"], jpdf["n"], jpdf["n_r"])
                    if int(b) not in hot
                    and (int(nl) > salt_rows or int(nr) > salt_rows)
                }
            counters["salted_keys"] = len(salt)
            drop_ref = ray.put(frozenset(hot)) if hot else None
            salt_ref = ray.put(salt) if salt else None
        from mismo_ray._joins import default_num_partitions

        expanded = _expand_salt(
            keyed,
            drop_ref=drop_ref,
            salt_ref=salt_ref,
            salt_rows=salt_rows or (1 << 62),
            link=True,
            n_buckets=default_num_partitions(),
        )
        enum = _make_enumerator(
            key_cols, carry_l, carry_r, link=True,
            inline_max_pairs=None if count_prepass else max_pairs,
        )

    links = expanded.groupby("__bkt__").map_groups(enum, batch_format="pyarrow")
    return links, counters
