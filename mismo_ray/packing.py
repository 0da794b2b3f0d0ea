"""Sequence packing — concat-and-chunk shard assignment for pretraining.

Pretraining dataloaders concatenate documents in a fixed (usually shuffled)
order and slice the token stream into fixed-length sequences. The batch
boundary a document lands in is therefore a pure function of the GLOBAL
prefix sum of token counts in that order — an operation Ray Data has no
primitive for. This module computes it distributed:

1. Order key: ``splitmix64(id + seed)`` — a deterministic pseudo-shuffle of
   the corpus (``order="hash"``), or the id itself (``order="id"``). With
   the hash order, keys are uniform in [0, 2^64), so the top ``b`` bits form
   equal-width, balanced range buckets BY CONSTRUCTION — no count pre-pass,
   no skew, at any corpus size.
2. Pass 1 (one map + a tiny collect): per-bucket token sums — at most
   ``n_buckets`` rows reach the driver, which exclusive-prefix-sums them
   into per-bucket global offsets (broadcast once via ``ray.put``).
3. Pass 2 (one groupby shuffle): within each bucket, sort by (key, id),
   local cumulative sum + the bucket's offset = the document's global
   token offset. ``seq_id = offset // budget``, ``seq_pos = offset %
   budget``.

The result is identical across runs, partitionings and cluster sizes, and
matches the single-threaded definition bit-exactly (the driver oracle is a
SQL window function over the same order).

No reference analog (mismo is record linkage); this is an LLM-training-data
addition: the missing step between a cleaned corpus and the token-shard
writer.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from mismo_ray._util import hash64, splitmix64


def pack_sequences(
    ds: ray.data.Dataset,
    tokens_column: str,
    *,
    budget: int,
    id_column: str = "record_id",
    seed: int = 0,
    order: str = "hash",
    n_buckets: int | None = None,
) -> ray.data.Dataset:
    """Assign every document its global token offset and training-sequence
    slot under concat-and-chunk packing.

    Output: the input columns plus ``global_offset`` (tokens before this doc
    in the packing order), ``seq_id`` (= offset // budget: the fixed-length
    sequence the doc STARTS in) and ``seq_pos`` (= offset % budget). A doc
    whose tokens cross a boundary continues into the next sequence(s);
    consumers derive the straddle from offset + tokens.

    ``order="hash"``: packing order is the deterministic pseudo-shuffle
    ``splitmix64(id + seed)`` (ties broken by id) — the order you want for
    training. ``order="id"``: plain id order (useful for testing/oracles).
    Null token counts count as 0.

    ``ds`` is consumed twice (bucket-sums pass + the packing shuffle): pass
    a materialized/checkpointed dataset for expensive upstreams.
    """
    from mismo_ray._joins import default_num_partitions

    if order not in ("hash", "id"):
        raise ValueError("order must be 'hash' or 'id'")
    if budget <= 0:
        raise ValueError("budget must be positive")
    B = n_buckets or default_num_partitions()
    shift = np.uint64(64 - max(1, int(np.ceil(np.log2(B)))))
    boundaries: np.ndarray | None = None  # set below for order="id"

    def ids_of(col) -> np.ndarray:
        """Non-null integer ids as uint64 (hash64 for other types). Type is
        decided per batch; int-with-null is rejected rather than silently
        widened to float64 (loses ids > 2^53, batch-dependent)."""
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_integer(col.type):
            if col.null_count:
                raise ValueError("id column contains nulls")
            return np.asarray(col).astype(np.int64).astype(np.uint64)
        return hash64(col, seed=0x1D5)

    _SIGN = np.uint64(1 << 63)

    def key_of(t: pa.Table) -> np.ndarray:
        """uint64 order key for a batch. order="id" uses the OFFSET-BINARY
        form (sign bit flipped): a raw two's-complement uint64 view would
        sort negative ids AFTER positive ones, diverging from the documented
        id order and any SQL ORDER BY oracle. order="hash" mixes the raw
        ids (a bijection — numeric order is irrelevant, only determinism)."""
        ids = ids_of(t[id_column])
        if order == "hash":
            with np.errstate(over="ignore"):
                return splitmix64(ids + np.uint64(seed & 0xFFFFFFFFFFFFFFFF))
        return ids ^ _SIGN

    def toks_of(t: pa.Table) -> np.ndarray:
        v = t[tokens_column].combine_chunks()
        return np.asarray(
            v.fill_null(0).cast(pa.int64(), safe=False), dtype=np.int64
        )

    def bucket_of(key: np.ndarray) -> np.ndarray:
        if boundaries is None:  # hash order: keys uniform, high bits balance
            return (key >> shift).astype(np.int64)
        return np.searchsorted(boundaries, key, side="right").astype(np.int64)

    if order == "id":
        # id keys are NOT uniform (dense small ids would all share the top
        # bucket's high bits -> one giant map_groups group); range-partition
        # on exact global [min, max] instead. Linspace boundaries assume
        # roughly uniform id DENSITY — the docstring points skewed-id
        # corpora at order="hash" (the training default, always uniform).
        def key_range(t: pa.Table) -> pa.Table:
            k = key_of(t)
            if len(k) == 0:
                return pa.table(
                    {"__lo__": pa.array([], pa.uint64()),
                     "__hi__": pa.array([], pa.uint64())}
                )
            return pa.table(
                {
                    "__lo__": pa.array([k.min()], pa.uint64()),
                    "__hi__": pa.array([k.max()], pa.uint64()),
                }
            )

        from mismo_ray._util import collect_table

        rng = collect_table(ds.map_batches(key_range, batch_format="pyarrow"))
        if rng.num_columns and len(rng):
            lo = np.asarray(rng["__lo__"], dtype=np.uint64).min()
            hi = np.asarray(rng["__hi__"], dtype=np.uint64).max()
            if hi > lo:
                edges = np.linspace(float(lo), float(hi), B, endpoint=False)[1:]
                boundaries = edges.astype(np.uint64)

    # pass 1: per-bucket token sums -> driver (<= n_buckets rows/block,
    # zero-copy arrow collect) -> exclusive prefix in bucket (= key range)
    # order -> broadcast
    def bucket_sums(t: pa.Table) -> pa.Table:
        bkt = bucket_of(key_of(t))
        toks = toks_of(t)
        u, inv = np.unique(bkt, return_inverse=True)
        s = np.zeros(len(u), dtype=np.int64)
        np.add.at(s, inv, toks)
        return pa.table({"__pbkt__": pa.array(u), "__sum__": pa.array(s)})

    from mismo_ray._util import collect_table as _collect

    partial = _collect(ds.map_batches(bucket_sums, batch_format="pyarrow"))
    sums: dict[int, int] = {}
    if partial.num_columns:
        for b, s in zip(
            np.asarray(partial["__pbkt__"], dtype=np.int64),
            np.asarray(partial["__sum__"], dtype=np.int64),
        ):
            sums[int(b)] = sums.get(int(b), 0) + int(s)
    offsets: dict[int, int] = {}
    acc = 0
    for b in sorted(sums):
        offsets[b] = acc
        acc += sums[b]
    off_ref = ray.put(offsets)

    # the key crosses the shuffle as uint64 (an int64 cast would flip the
    # order at the sign bit)
    def add_bucket_u(t: pa.Table) -> pa.Table:
        key = key_of(t)
        bkt = bucket_of(key)
        return t.append_column("__pkey__", pa.array(key, type=pa.uint64())).append_column(
            "__pbkt__", pa.array(bkt)
        )

    def pack(g: pa.Table) -> pa.Table:
        offs = ray.get(off_ref)
        bkt = int(g["__pbkt__"][0].as_py())
        key = np.asarray(g["__pkey__"], dtype=np.uint64)
        ids = ids_of(g[id_column])
        toks = toks_of(g)
        o = np.lexsort((ids, key))
        csum = np.cumsum(toks[o])
        before = np.empty(len(o), dtype=np.int64)
        before[o] = offs.get(bkt, 0) + csum - toks[o]
        g = g.drop_columns(["__pkey__", "__pbkt__"])
        return (
            g.append_column("global_offset", pa.array(before))
            .append_column("seq_id", pa.array(before // budget))
            .append_column("seq_pos", pa.array(before % budget))
        )

    return (
        ds.map_batches(add_bucket_u, batch_format="pyarrow")
        .groupby("__pbkt__")
        .map_groups(pack, batch_format="pyarrow")
    )


def add_row_number(
    ds: ray.data.Dataset,
    *,
    id_column: str = "record_id",
    seed: int = 0,
    order: str = "id",
    row_number_as: str = "row_number",
    n_buckets: int | None = None,
) -> ray.data.Dataset:
    """Global 0-based row number in a deterministic total order — the
    distributed ``ROW_NUMBER() OVER (ORDER BY ...)``.

    ``order="id"``: ordered by id. ``order="hash"``: ordered by the
    splitmix64 pseudo-shuffle of the id (a deterministic global shuffle —
    assign-once example ordering for training). Same two-pass prefix-sum
    machinery as :func:`pack_sequences` with a unit weight per row; see its
    docstring for the scale analysis (consumes ``ds`` twice).
    """
    unit = "__one__"

    def add_one(t: pa.Table) -> pa.Table:
        return t.append_column(unit, pa.array(np.ones(len(t), dtype=np.int64)))

    packed = pack_sequences(
        ds.map_batches(add_one, batch_format="pyarrow"),
        unit,
        budget=1,
        id_column=id_column,
        seed=seed,
        order=order,
        n_buckets=n_buckets,
    )

    def finish(t: pa.Table) -> pa.Table:
        t = t.drop_columns([unit, "seq_id", "seq_pos"])
        idx = t.schema.get_field_index("global_offset")
        return t.set_column(
            idx, row_number_as, t.column("global_offset")
        )

    return packed.map_batches(finish, batch_format="pyarrow")


def write_training_shards(
    ds: ray.data.Dataset,
    out_dir: str,
    *,
    tokens_column: str,
    budget: int,
    seqs_per_shard: int = 1024,
    id_column: str = "record_id",
    seed: int = 0,
    order: str = "hash",
) -> dict:
    """Pack the corpus and write it as resumable, training-ready shards.

    :func:`pack_sequences` assigns seq_id/seq_pos; docs are then written as
    hive-partitioned parquet keyed by ``shard = seq_id // seqs_per_shard``
    (consecutive sequences stay physically together, so a dataloader reads
    one shard = one contiguous slice of the token stream), each shard sorted
    by (seq_id, seq_pos). The directory carries the ``_DONE`` marker
    convention of ``state.resume`` so a killed export is detected and
    re-run, never half-read. Returns counters (docs, tokens, n_seqs,
    n_shards).
    """
    import os
    import shutil

    packed = pack_sequences(
        ds,
        tokens_column,
        budget=budget,
        id_column=id_column,
        seed=seed,
        order=order,
    )

    def add_shard(t: pa.Table) -> pa.Table:
        seq = np.asarray(t["seq_id"], dtype=np.int64)
        return t.append_column("shard", pa.array(seq // seqs_per_shard))

    # materialize once: the write, the stats and the counters all read the
    # same computed blocks (pack_sequences already documented its two passes)
    with_shard = (
        packed.map_batches(add_shard, batch_format="pyarrow")
        .sort(["seq_id", "seq_pos"])
        .materialize()
    )
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    with_shard.write_parquet(out_dir, partition_cols=["shard"])
    # per-shard stats double as the lineage counters
    stats = with_shard.groupby("shard").count().to_pandas()
    toks = int(
        with_shard.map_batches(
            lambda t: pa.table(
                {
                    "s": pa.array(
                        [
                            int(
                                np.asarray(
                                    t[tokens_column]
                                    .combine_chunks()
                                    .fill_null(0)
                                    .cast(pa.int64(), safe=False),
                                    dtype=np.int64,
                                ).sum()
                            )
                        ]
                    )
                }
            ),
            batch_format="pyarrow",
        ).sum("s")
        or 0  # Dataset.sum returns None on an empty corpus (e.g. a quality
        # gate dropped every doc); the export must still terminate cleanly
    )
    counters = {
        # empty groupby -> zero-column frame: no "count()" key to read
        "docs": int(stats["count()"].sum()) if "count()" in stats else 0,
        "tokens": toks,
        "n_seqs": int(np.ceil(toks / budget)) if toks else 0,
        "n_shards": int(len(stats)),
    }
    os.makedirs(out_dir, exist_ok=True)  # empty corpus: write_parquet made nothing
    with open(os.path.join(out_dir, "_DONE"), "w") as f:
        f.write(str(counters["n_shards"]))
    return counters
