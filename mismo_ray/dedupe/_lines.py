"""Line-level exact dedup — C4/RefinedWeb-style boilerplate-line removal.

Whole-document dedup misses the navigation bars, cookie banners and footer
lines that repeat across a crawl; ``substring_dup_stats`` finds arbitrary
duplicated runs but rewrites at character granularity. This module works at
the natural web-text unit: the line (or any delimiter-separated segment).
A line whose exact content occurs in >= ``min_docs`` distinct documents is
flagged (``dup_line_stats``) or removed (``drop_dup_lines``), as in C4's
repeated-lines filter (Raffel et al., JMLR 2020, §2.2) and RefinedWeb's
line-wise corrections.

Design (Ray-Data-first, same shape as ``_substring``):

1. A STATS pass splits each doc into lines with the vectorized Arrow
   ``split_pattern`` kernel, hashes each line twice (two seeded 64-bit
   content hashes — 128 bits total, collisions negligible) and COMBINES
   map-side: one row per distinct line hash per block, carrying the
   block-partial distinct-doc count and the block-min (doc, idx). A doc
   lives in exactly one block, so partial distinct-doc counts sum exactly.
   The shuffle that finds duplicated lines therefore moves one ~40 B row
   per *distinct line per block*, compressed by the intra-block
   duplication factor — not one row per line occurrence. The line TEXT
   never leaves its batch.
2. The duplicated-hash set (total distinct docs >= min_docs) is small by
   construction; when it fits ``max_broadcast`` it ships once via
   ``ray.put`` and a second scan filters line occurrences MAP-SIDE
   (sorted-array probes, no shuffle). Above the threshold the occurrences
   take a bucketed hash-join against the set instead (the graceful path
   when the boilerplate universe itself is huge).
3. ``dup_line_stats``: one groupby over a doc-id bucket aggregates per-doc
   counts. ``drop_dup_lines``: per-doc dropped-line indices are packed into
   a compact string and hash-joined back to the documents, where one
   vectorized split → mask → ``binary_join`` pass rewrites the text.

At 100 TB the stats shuffle moves ~40 B per distinct line per block and
the doc-bucket shuffle ~32 B per duplicated occurrence; the full text
crosses a shuffle once, in the unavoidable rewrite join of
``drop_dup_lines``.

No reference analog: mismo's dedup surface is record-level (SURVEY §2.7);
this is an LLM-training-data addition alongside MinHash/SimHash/substring.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from mismo_ray._util import hash64, int64_ids

_SEED1 = 0xA11CE
_SEED2 = 0x0B0B5


def _int64_ids(col):
    return int64_ids(col, "line-level dedupe")


def _line_hits(
    ds: ray.data.Dataset,
    column: str,
    id_column: str,
    min_docs: int,
    delimiter: str,
    min_chars: int,
    keep_first: bool,
    n_buckets: int,
    scope_column: str | None = None,
    max_broadcast: int = 5_000_000,
) -> ray.data.Dataset:
    """(id, __idx__, __chars__, __dbkt__) of every line occurrence whose
    exact content appears in >= min_docs distinct docs. With keep_first,
    the occurrence at the smallest (doc id, line index) per distinct line
    is exempted (the canonical copy survives). With scope_column, lines
    only count as duplicates of each other within the same scope value
    (e.g. the page's domain — RefinedWeb removes boilerplate per-site, not
    globally): the scope's hash is mixed into both line-content hashes, so
    the distinct-doc count, keep_first survivor choice and every later
    stage are scope-local with zero extra shuffle payload.

    ``ds`` is scanned TWICE (combined stats pass, then the occurrence
    pass); pass a materialized input. The duplicated-hash set broadcasts
    when <= ``max_broadcast`` rows (occurrences filter map-side, zero
    extra shuffle); above it, occurrences hash-join against the set."""
    from mismo_ray._joins import hash_join

    def occurrences(t: pa.Table):
        """-> (h1, h2, doc, idx, chars) int64 arrays for one batch."""
        texts = t[column].combine_chunks()
        ids = _int64_ids(t[id_column])
        lines = pc.split_pattern(texts, pattern=delimiter)
        offsets = np.asarray(lines.offsets, dtype=np.int64)
        flat = lines.values
        counts = np.diff(offsets)
        doc = np.repeat(ids, counts)
        idx = np.arange(len(flat), dtype=np.int64) - np.repeat(
            offsets[:-1], counts
        )
        chars = np.asarray(pc.utf8_length(flat), dtype=np.int64)
        keep = chars >= min_chars
        flat, doc, idx, chars = flat.filter(pa.array(keep)), doc[keep], idx[keep], chars[keep]
        # one object-siphash pass, two seed folds (hash64_base's documented
        # two-line-hashes call site) — hash64 twice would pay the dominant
        # per-line hashing cost twice on every corpus scan
        from mismo_ray._util import hash64_base, hash64_fold

        base = hash64_base(flat)
        h1 = hash64_fold(base, _SEED1)
        h2 = hash64_fold(base, _SEED2)
        if scope_column is not None:
            scope = pc.fill_null(t[scope_column].combine_chunks(), "")
            sh = np.repeat(hash64(scope, seed=_SEED1 ^ _SEED2), counts)[keep]
            # odd-constant multiplies keep the two 64-bit mixes independent
            with np.errstate(over="ignore"):
                h1 = h1 ^ (sh * np.uint64(0x9E3779B97F4A7C15))
                h2 = h2 ^ (sh * np.uint64(0xC2B2AE3D27D4EB4F))
        return h1.astype(np.int64), h2.astype(np.int64), doc, idx, chars

    def emit_stats(t: pa.Table) -> pa.Table:
        # map-side combine: one row per distinct (h1, h2) in this block,
        # with the partial distinct-doc count and the block-min (doc, idx).
        # A doc's text is one row of one block, so partials sum exactly.
        h1, h2, doc, idx, _ = occurrences(t)
        order = np.lexsort((idx, doc, h2, h1))
        h1, h2, doc, idx = h1[order], h2[order], doc[order], idx[order]
        n = len(h1)
        if n == 0:
            e = pa.array([], type=pa.int64())
            return pa.table(
                {"__h1__": e, "__h2__": e, "__nd__": e, "__mdoc__": e,
                 "__midx__": e, "__bkt__": e}
            )
        new_key = np.ones(n, dtype=bool)
        new_key[1:] = (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])
        new_doc = new_key.copy()
        new_doc[1:] |= doc[1:] != doc[:-1]
        gid = np.cumsum(new_key) - 1
        firsts = np.nonzero(new_key)[0]
        nd = np.bincount(gid[new_doc], minlength=len(firsts))
        kh1 = h1[firsts]
        return pa.table(
            {
                "__h1__": pa.array(kh1),
                "__h2__": pa.array(h2[firsts]),
                "__nd__": pa.array(nd.astype(np.int64)),
                "__mdoc__": pa.array(doc[firsts]),
                "__midx__": pa.array(idx[firsts]),
                "__bkt__": pa.array(
                    (kh1.astype(np.uint64) % np.uint64(n_buckets)).astype(np.int64)
                ),
            }
        )

    def reduce_stats(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["__h1__", "__h2__", "__mdoc__", "__midx__"], kind="mergesort"
        )
        agg = g.groupby(["__h1__", "__h2__"], sort=False).agg(
            __nd__=("__nd__", "sum"),
            __mdoc__=("__mdoc__", "first"),
            __midx__=("__midx__", "first"),
        )
        out = agg[agg["__nd__"] >= min_docs].reset_index()
        return out[["__h1__", "__h2__", "__mdoc__", "__midx__"]]

    dupset = (
        ds.map_batches(emit_stats, batch_format="pyarrow")
        .groupby("__bkt__")
        .map_groups(
            lambda g: reduce_stats(g.drop(columns=["__bkt__"])),
            batch_format="pandas",
        )
        .materialize()
    )

    hit_cols_schema = pa.table(
        {
            id_column: pa.array([], type=pa.int64()),
            "__idx__": pa.array([], type=pa.int64()),
            "__chars__": pa.array([], type=pa.int64()),
            "__dbkt__": pa.array([], type=pa.int64()),
        }
    )

    def hits_table(doc, idx, chars) -> pa.Table:
        return pa.table(
            {
                id_column: pa.array(doc),
                "__idx__": pa.array(idx),
                "__chars__": pa.array(chars),
                "__dbkt__": pa.array(
                    (doc.astype(np.uint64) % np.uint64(n_buckets)).astype(np.int64)
                ),
            }
        )

    if dupset.count() <= max_broadcast:
        # broadcast path: ship the set once, probe map-side (sorted-array
        # binary search; h1 runs of length > 1 — 64-bit collisions inside
        # the set — are vanishingly rare and take a scalar path)
        from mismo_ray._util import collect_table

        parts = collect_table(dupset)
        if parts.num_rows:
            d1 = np.asarray(parts["__h1__"], dtype=np.int64)
            d2 = np.asarray(parts["__h2__"], dtype=np.int64)
            dmd = np.asarray(parts["__mdoc__"], dtype=np.int64)
            dmi = np.asarray(parts["__midx__"], dtype=np.int64)
        else:
            d1 = d2 = dmd = dmi = np.array([], dtype=np.int64)
        order = np.lexsort((d2, d1))
        ref = ray.put((d1[order], d2[order], dmd[order], dmi[order]))

        def emit_hits(t: pa.Table) -> pa.Table:
            D1, D2, DMD, DMI = ray.get(ref)
            h1, h2, doc, idx, chars = occurrences(t)
            if len(h1) == 0 or len(D1) == 0:
                return hit_cols_schema
            lo = np.searchsorted(D1, h1, side="left")
            hi = np.searchsorted(D1, h1, side="right")
            pos = np.minimum(lo, len(D1) - 1)
            found = (hi - lo == 1) & (D2[pos] == h2)
            multi = np.nonzero(hi - lo > 1)[0]
            for i in multi:  # cold path: h1 collision inside the set
                j = lo[i] + np.searchsorted(D2[lo[i] : hi[i]], h2[i])
                if j < hi[i] and D2[j] == h2[i]:
                    found[i] = True
                    pos[i] = j
            if keep_first:
                found &= ~((doc == DMD[pos]) & (idx == DMI[pos]))
            return hits_table(doc[found], idx[found], chars[found])

        return ds.map_batches(emit_hits, batch_format="pyarrow")

    # join path: the duplicated-line universe itself is too big to ship —
    # bucketed hash-join of occurrences against it (the occurrence rows
    # cross one keyed shuffle, as the pre-combine design always paid)
    def emit_occ(t: pa.Table) -> pa.Table:
        h1, h2, doc, idx, chars = occurrences(t)
        return pa.table(
            {
                "__h1__": pa.array(h1),
                "__h2__": pa.array(h2),
                id_column: pa.array(doc),
                "__idx__": pa.array(idx),
                "__chars__": pa.array(chars),
            }
        )

    occ_schema = pa.schema(
        [
            pa.field("__h1__", pa.int64()),
            pa.field("__h2__", pa.int64()),
            pa.field(id_column, pa.int64()),
            pa.field("__idx__", pa.int64()),
            pa.field("__chars__", pa.int64()),
        ]
    )
    dup_schema = pa.schema(
        [
            pa.field("__h1__", pa.int64()),
            pa.field("__h2__", pa.int64()),
            pa.field("__mdoc__", pa.int64()),
            pa.field("__midx__", pa.int64()),
        ]
    )
    joined = hash_join(
        ds.map_batches(emit_occ, batch_format="pyarrow"),
        dupset,
        on=["__h1__", "__h2__"],
        how="inner",
        left_schema=occ_schema,
        right_schema=dup_schema,
    )

    def finish(t: pa.Table) -> pa.Table:
        doc = _int64_ids(t[id_column])
        idx = np.asarray(t["__idx__"], dtype=np.int64)
        chars = np.asarray(t["__chars__"], dtype=np.int64)
        if keep_first:
            mdoc = np.asarray(t["__mdoc__"], dtype=np.int64)
            midx = np.asarray(t["__midx__"], dtype=np.int64)
            m = ~((doc == mdoc) & (idx == midx))
            doc, idx, chars = doc[m], idx[m], chars[m]
        return hits_table(doc, idx, chars)

    return joined.map_batches(finish, batch_format="pyarrow")


def dup_line_stats(
    ds: ray.data.Dataset,
    column: str = "text",
    *,
    id_column: str = "record_id",
    min_docs: int = 2,
    delimiter: str = "\n",
    min_chars: int = 1,
    scope_column: str | None = None,
    max_broadcast: int = 5_000_000,
) -> ray.data.Dataset:
    """Per-document duplicated-line counts: one row per document owning at
    least one line (>= ``min_chars`` chars) whose exact content occurs in
    >= ``min_docs`` distinct documents — (id, n_dup_lines, dup_line_chars).
    Intra-document repeats alone do not qualify (distinct-doc count).
    ``scope_column`` restricts duplicate counting to documents sharing that
    value (RefinedWeb-style per-domain boilerplate detection). ``ds`` is
    scanned twice (combined stats pass + occurrence pass) — pass a
    materialized input; ``max_broadcast`` bounds the duplicated-hash set
    broadcast (see ``_line_hits``)."""
    from mismo_ray._joins import default_num_partitions

    n_buckets = default_num_partitions()
    hits = _line_hits(
        ds, column, id_column, min_docs, delimiter, min_chars, False, n_buckets,
        scope_column, max_broadcast,
    )

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(id_column, sort=True).agg(
            n_dup_lines=("__idx__", "size"), dup_line_chars=("__chars__", "sum")
        )
        return out.reset_index()

    return hits.groupby("__dbkt__").map_groups(
        lambda g: agg(g.drop(columns=["__dbkt__"])), batch_format="pandas"
    )


def drop_dup_lines(
    ds: ray.data.Dataset,
    column: str = "text",
    *,
    id_column: str = "record_id",
    min_docs: int = 2,
    delimiter: str = "\n",
    min_chars: int = 1,
    keep_first: bool = False,
    out_column: str | None = None,
    scope_column: str | None = None,
    max_broadcast: int = 5_000_000,
) -> ray.data.Dataset:
    """Remove every line whose exact content occurs in >= ``min_docs``
    distinct documents; remaining lines are rejoined with ``delimiter`` in
    original order. ``keep_first=True`` exempts one canonical occurrence
    (smallest doc id, then line index) per distinct line, C4-style. Docs
    with no duplicated lines pass through byte-identical. Writes
    ``out_column`` (default: replaces ``column``). ``scope_column`` makes
    duplication scope-local (e.g. per domain): the same line on two
    different domains is NOT boilerplate.

    ``ds`` is consumed THREE times (the combined stats pass, the occurrence
    pass, and the rewrite join's document side): pass a materialized /
    checkpointed dataset, or an expensive lazy upstream will re-execute.
    ``max_broadcast`` bounds the duplicated-hash set broadcast (above it
    the occurrences hash-join against the set instead)."""
    from mismo_ray._joins import default_num_partitions, hash_join

    n_buckets = default_num_partitions()
    out_column = out_column or column
    hits = _line_hits(
        ds, column, id_column, min_docs, delimiter, min_chars, keep_first, n_buckets,
        scope_column, max_broadcast,
    )

    def pack(t: pa.Table) -> pa.Table:
        doc = _int64_ids(t[id_column])
        idx = np.asarray(t["__idx__"], dtype=np.int64)
        order = np.lexsort((idx, doc))
        doc, idx = doc[order], idx[order]
        if not len(doc):
            return pa.table(
                {
                    id_column: pa.array([], type=pa.int64()),
                    "__drop__": pa.array([], type=pa.string()),
                }
            )
        boundary = np.ones(len(doc), dtype=bool)
        boundary[1:] = doc[1:] != doc[:-1]
        bounds = np.concatenate([np.nonzero(boundary)[0], [len(doc)]])
        packed = [
            ",".join(map(str, idx[i:j])) for i, j in zip(bounds[:-1], bounds[1:])
        ]
        return pa.table(
            {
                id_column: pa.array(doc[boundary]),
                "__drop__": pa.array(packed, type=pa.string()),
            }
        )

    packed = (
        hits.map_batches(
            lambda t: t.select([id_column, "__idx__", "__dbkt__"]),
            batch_format="pyarrow",
        )
        .groupby("__dbkt__")
        .map_groups(
            lambda g: pack(g.drop_columns(["__dbkt__"])), batch_format="pyarrow"
        )
    )
    in_schema = ds.schema(fetch_if_missing=True)
    if in_schema is None:
        # empty input (zero blocks -> schema unobservable): nothing to rewrite
        return ds
    joined = hash_join(
        ds,
        packed,
        on=id_column,
        how="left_outer",
        left_schema=in_schema.base_schema,
        right_schema=pa.schema(
            [pa.field(id_column, pa.int64()), pa.field("__drop__", pa.string())]
        ),
    )

    def rewrite(t: pa.Table) -> pa.Table:
        texts = t[column].combine_chunks()
        drop_col = t["__drop__"].to_pylist()
        lines = pc.split_pattern(texts, pattern=delimiter)
        offsets = np.asarray(lines.offsets, dtype=np.int64)
        flat = lines.values
        drop = np.zeros(len(flat), dtype=bool)
        for i, packed_s in enumerate(drop_col):
            if packed_s:
                idxs = np.array(packed_s.split(","), dtype=np.int64)
                drop[offsets[i] + idxs] = True
        keep = ~drop
        kept = flat.filter(pa.array(keep))
        csum = np.concatenate([[0], np.cumsum(keep.astype(np.int64))])
        new_offsets = csum[offsets]
        rebuilt = pa.ListArray.from_arrays(
            pa.array(new_offsets, type=pa.int32()), kept
        )
        joined_text = pc.binary_join(rebuilt, delimiter)
        # null texts pass through as null (split_pattern maps null -> null,
        # but rebuilt loses validity -> reapply the original null mask)
        if texts.null_count:
            joined_text = pc.if_else(texts.is_valid(), joined_text, None)
        out_arr = pc.if_else(
            pc.is_valid(t["__drop__"].combine_chunks()), joined_text, texts
        )
        t = t.drop_columns(["__drop__"])
        idx2 = t.schema.get_field_index(out_column)
        if idx2 == -1:
            return t.append_column(out_column, out_arr)
        return t.set_column(idx2, out_column, out_arr)

    return joined.map_batches(rewrite, batch_format="pyarrow")
