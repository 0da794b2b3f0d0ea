"""Exact duplicate-substring detection & removal — the training-data dedup
stage that exact whole-document and MinHash near-dup both miss: boilerplate
runs (headers, license blocks, templated paragraphs) duplicated INSIDE
otherwise distinct documents.

The reference's dedup surface is record-level (SURVEY §2.7); this is the
span-level complement, the scalable stand-in for suffix-array
exact-substring dedup (Lee et al. 2021, arXiv:2107.06499 — a true
distributed suffix array over 100 TB is its own project).

Design (Ray-Data-first, two linear shuffles, no all-pairs anywhere):

1. **Anchor sampling is content-defined, not stride-based.** Windows sampled
   every S characters from each document CANNOT be compared across
   documents: the same shared run sits at different offsets in each doc, so
   the two docs' stride grids are phase-shifted and their sampled windows
   almost never coincide. Instead a window starts at every *anchor*: a
   position whose PREVIOUS character is a word separator (space/newline),
   optionally subsampled by the anchor character's codepoint modulus
   (winnowing-style — Schleimer et al., SIGMOD'03). Anchors depend only on
   content, so two occurrences of the same run anchor at the same in-run
   offsets regardless of where the run sits. A duplicated run of length
   >= window + (distance to its first qualifying anchor) is always caught.
2. `map_batches`: per doc, decode to UTF-32 codepoints (one vectorized
   `np.frombuffer`), find anchors, hash every anchored window with two
   independently-seeded polynomial hashes over the codepoints (128 bits
   total — window equality whp; the same trick exact_dedupe uses). Emit
   ~len/rate small rows (h1, h2, doc, pos, len): the shuffle carries ~40 B
   per window, never the text.
3. One groupby over a COARSE hash bucket of h1 (repo-wide bucketing rule —
   per-window groups would be one task per window): inside each bucket a
   C-speed pandas groupby counts distinct docs per (h1, h2) and keeps
   windows present in >= min_docs docs.
4. One groupby over a coarse bucket of doc id: per doc, sort hit positions
   and merge overlapping [pos, pos+window) intervals vectorized — either to
   coverage stats (``substring_dup_stats``) or to the merged spans
   themselves (``substring_dup_spans``), which ``strip_dup_spans`` then
   removes from the text via one hash join back to the documents.

At 100 TB: both shuffles move O(total_chars / anchor_rate) fixed-width rows;
`anchor_mod` tunes the rate (anchor_mod=m keeps ~1/m of word starts).
Boilerplate windows occurring in millions of docs are just large groups
inside step-3 buckets (handled vectorized), not hot single-key tasks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from mismo_ray._util import int64_ids, splitmix64

_B1 = np.uint64(1000003)
_B2 = np.uint64(999983)


def _int64_ids(col):
    return int64_ids(col, "substring dedupe")


def _window_hashes(codes: np.ndarray, anchors: np.ndarray, window: int):
    """Two seeded polynomial hashes (mod 2^64 + splitmix finalizer) of each
    length-``window`` codepoint slice starting at ``anchors``; fully
    vectorized ((n_anchors, window) gather + matvec)."""
    wins = codes[anchors[:, None] + np.arange(window)[None, :]].astype(np.uint64)
    with np.errstate(over="ignore"):
        p1 = np.empty(window, dtype=np.uint64)
        p2 = np.empty(window, dtype=np.uint64)
        p1[0] = p2[0] = 1
        for j in range(1, window):  # O(window) setup, not per-row
            p1[j] = p1[j - 1] * _B1
            p2[j] = p2[j - 1] * _B2
        h1 = splitmix64((wins * p1).sum(axis=1) ^ np.uint64(0x5D))
        h2 = splitmix64((wins * p2).sum(axis=1) ^ np.uint64(0xA7))
    return h1.astype(np.int64), h2.astype(np.int64)


def _dup_window_hits(
    ds: ray.data.Dataset,
    column: str,
    id_column: str,
    window: int,
    min_docs: int,
    anchor_prev: str,
    anchor_mod: int,
    anchor_rem: int,
    n_buckets: int,
) -> ray.data.Dataset:
    """(id, __pos__, __len__, __dbkt__) of every anchored-window occurrence
    whose exact content appears in >= min_docs distinct docs (steps 1-3)."""
    prev_codes = np.array([ord(c) for c in anchor_prev], dtype=np.uint32)

    def emit_windows(t: pa.Table) -> pa.Table:
        h1s, h2s, docs, poss, lens = [], [], [], [], []
        ids = _int64_ids(t[id_column])
        for rid, s in zip(ids, t[column].to_pylist()):
            if s is None or len(s) < window + 1:
                continue
            codes = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
            at = np.isin(codes[:-1], prev_codes)
            if anchor_mod > 1:
                at &= codes[1:] % np.uint32(anchor_mod) == np.uint32(anchor_rem)
            anchors = np.nonzero(at)[0] + 1
            anchors = anchors[anchors <= len(codes) - window]
            if not len(anchors):
                continue
            h1, h2 = _window_hashes(codes, anchors, window)
            h1s.append(h1)
            h2s.append(h2)
            docs.append(np.full(len(anchors), rid, dtype=np.int64))
            poss.append(anchors.astype(np.int64))
            lens.append(np.full(len(anchors), len(codes), dtype=np.int64))
        if not h1s:
            h1s = h2s = docs = poss = lens = [np.empty(0, dtype=np.int64)]
        doc_col = np.concatenate(docs)
        h1_col = np.concatenate(h1s)
        out = pa.table(
            {
                "__h1__": pa.array(h1_col),
                "__h2__": pa.array(np.concatenate(h2s)),
                id_column: pa.array(doc_col),
                "__pos__": pa.array(np.concatenate(poss)),
                "__len__": pa.array(np.concatenate(lens)),
                "__bkt__": pa.array(
                    (h1_col.astype(np.uint64) % np.uint64(n_buckets)).astype(
                        np.int64
                    )
                ),
                "__dbkt__": pa.array(
                    (doc_col.astype(np.uint64) % np.uint64(n_buckets)).astype(
                        np.int64
                    )
                ),
            }
        )
        return out

    def keep_duplicated(g: pd.DataFrame) -> pd.DataFrame:
        # distinct-doc count per 128-bit window hash, all C-speed
        nd = (
            g.drop_duplicates(["__h1__", "__h2__", id_column])
            .groupby(["__h1__", "__h2__"], sort=False)
            .size()
        )
        keep = nd[nd >= min_docs].index
        if not len(keep):
            return g.iloc[0:0][[id_column, "__pos__", "__len__", "__dbkt__"]]
        idx = pd.MultiIndex.from_frame(g[["__h1__", "__h2__"]])
        out = g[idx.isin(keep)]
        return out[[id_column, "__pos__", "__len__", "__dbkt__"]]

    windows = ds.map_batches(emit_windows, batch_format="pyarrow")
    return windows.groupby("__bkt__").map_groups(
        lambda g: keep_duplicated(g.drop(columns=["__bkt__"])),
        batch_format="pandas",
    )


def substring_dup_stats(
    ds: ray.data.Dataset,
    column: str = "text",
    *,
    id_column: str = "record_id",
    window: int = 40,
    min_docs: int = 2,
    anchor_prev: str = " \n",
    anchor_mod: int = 1,
    anchor_rem: int = 0,
) -> ray.data.Dataset:
    """Per-document duplicated-substring coverage.

    Returns one row per document that shares at least one exact
    length-``window`` anchored substring with >= ``min_docs`` distinct
    documents (itself included): (id, doc_len, n_dup_windows, dup_chars,
    dup_frac) where dup_chars is the merged coverage of all duplicated
    windows and dup_frac = dup_chars / doc_len.

    A window starts at every position whose previous character is in
    ``anchor_prev`` and whose own codepoint satisfies
    ``codepoint % anchor_mod == anchor_rem`` (anchor_mod=1 keeps every word
    start; raise it to subsample the shuffle at corpus scale).
    """
    from mismo_ray._joins import default_num_partitions

    n_buckets = default_num_partitions()

    def coverage(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([id_column, "__pos__"], kind="mergesort")
        doc = g[id_column].to_numpy()
        pos = g["__pos__"].to_numpy()
        new = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            new[1:] = doc[1:] != doc[:-1]
        delta = np.empty(len(g), dtype=np.int64)
        delta[0] = window
        if len(g) > 1:
            delta[1:] = np.where(new[1:], window, np.minimum(window, np.diff(pos)))
        agg = (
            pd.DataFrame(
                {
                    id_column: doc,
                    "doc_len": g["__len__"].to_numpy(),
                    "cov": delta,
                }
            )
            .groupby(id_column, sort=False)
            .agg(
                doc_len=("doc_len", "first"),
                n_dup_windows=("cov", "size"),
                dup_chars=("cov", "sum"),
            )
            .reset_index()
        )
        agg["dup_frac"] = agg["dup_chars"] / agg["doc_len"]
        return agg

    hits = _dup_window_hits(
        ds, column, id_column, window, min_docs,
        anchor_prev, anchor_mod, anchor_rem, n_buckets,
    )
    return hits.groupby("__dbkt__").map_groups(
        lambda g: coverage(g.drop(columns=["__dbkt__"])),
        batch_format="pandas",
    )


def substring_dup_spans(
    ds: ray.data.Dataset,
    column: str = "text",
    *,
    id_column: str = "record_id",
    window: int = 40,
    min_docs: int = 2,
    anchor_prev: str = " \n",
    anchor_mod: int = 1,
    anchor_rem: int = 0,
) -> ray.data.Dataset:
    """Merged duplicated spans per document, long format: one row per
    maximal run of overlapping duplicated windows — (id, span_start,
    span_end), 0-indexed character offsets, end exclusive. Feed to
    ``strip_dup_spans`` to remove the boilerplate from the text."""
    from mismo_ray._joins import default_num_partitions

    n_buckets = default_num_partitions()

    def merge_spans(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([id_column, "__pos__"], kind="mergesort")
        doc = g[id_column].to_numpy()
        pos = g["__pos__"].to_numpy()
        new = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            new[1:] = (doc[1:] != doc[:-1]) | (np.diff(pos) > window)
        sid = new.cumsum() - 1
        agg = (
            pd.DataFrame({id_column: doc, "__sid__": sid, "p": pos})
            .groupby("__sid__", sort=True)
            .agg(
                **{
                    id_column: (id_column, "first"),
                    "span_start": ("p", "min"),
                    "span_end": ("p", "max"),
                }
            )
            .reset_index(drop=True)
        )
        agg["span_end"] += window
        return agg

    hits = _dup_window_hits(
        ds, column, id_column, window, min_docs,
        anchor_prev, anchor_mod, anchor_rem, n_buckets,
    )
    return hits.groupby("__dbkt__").map_groups(
        lambda g: merge_spans(g.drop(columns=["__dbkt__"])),
        batch_format="pandas",
    )


def strip_dup_spans(
    ds: ray.data.Dataset,
    spans: ray.data.Dataset,
    column: str = "text",
    *,
    id_column: str = "record_id",
    out_column: str | None = None,
    joiner: str = " ",
) -> ray.data.Dataset:
    """Remove duplicated spans from the text: documents left-joined against
    the (id, span_start, span_end) table from ``substring_dup_spans``;
    surviving fragments are rejoined with ``joiner``. Docs without spans
    pass through unchanged. Writes ``out_column`` (default: replaces
    ``column``).

    One bucketed groupby to pack each doc's spans into list columns + one
    hash join — the full text crosses the join shuffle once, which is
    unavoidable for a rewrite; run this only on the (usually small) subset
    of docs that need cleaning if the spans table is sparse.

    If ``spans`` was derived lazily from this same ``ds``, the shared
    upstream executes once per consumer — materialize ``ds`` (or the spans)
    first when the upstream is expensive.
    """
    from mismo_ray._joins import default_num_partitions, hash_join

    n_buckets = default_num_partitions()
    out_column = out_column or column

    def pack(t: pa.Table) -> pa.Table:
        # acero hash join rejects list<> payload columns, so each doc's
        # sorted spans ride as one compact "s:e,s:e" string
        doc = _int64_ids(t[id_column])
        st = np.asarray(t["span_start"], dtype=np.int64)
        en = np.asarray(t["span_end"], dtype=np.int64)
        order = np.lexsort((st, doc))
        doc, st, en = doc[order], st[order], en[order]
        if not len(doc):
            return pa.table(
                {
                    id_column: pa.array([], type=pa.int64()),
                    "__spans__": pa.array([], type=pa.string()),
                }
            )
        boundary = np.ones(len(doc), dtype=bool)
        boundary[1:] = doc[1:] != doc[:-1]
        bounds = np.concatenate([np.nonzero(boundary)[0], [len(doc)]])
        packed = [
            ",".join(f"{a}:{b}" for a, b in zip(st[i:j], en[i:j]))
            for i, j in zip(bounds[:-1], bounds[1:])
        ]
        return pa.table(
            {
                id_column: pa.array(doc[boundary]),
                "__spans__": pa.array(packed, type=pa.string()),
            }
        )

    packed = (
        spans.map_batches(
            lambda t: t.append_column(
                "__dbkt__",
                pa.array(
                    (
                        _int64_ids(t[id_column]).astype(np.uint64)
                        % np.uint64(n_buckets)
                    ).astype(np.int64)
                ),
            ),
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
            [
                pa.field(id_column, pa.int64()),
                pa.field("__spans__", pa.string()),
            ]
        ),
    )

    def strip(t: pa.Table) -> pa.Table:
        texts = t[column].to_pylist()
        spans_col = t["__spans__"].to_pylist()
        out = []
        for s, packed in zip(texts, spans_col):
            if s is None or not packed:
                out.append(s)
                continue
            frags = []
            prev = 0
            for se in packed.split(","):
                a_s, b_s = se.split(":")
                a, b = int(a_s), int(b_s)
                if a > prev:
                    frags.append(s[prev:a])
                prev = max(prev, b)
            if prev < len(s):
                frags.append(s[prev:])
            out.append(joiner.join(f for f in (x.strip() for x in frags) if f))
        t = t.drop_columns(["__spans__"])
        idx = t.schema.get_field_index(out_column)
        col = pa.array(out, type=pa.string())
        if idx == -1:
            return t.append_column(out_column, col)
        return t.set_column(idx, out_column, col)

    return joined.map_batches(strip, batch_format="pyarrow")
