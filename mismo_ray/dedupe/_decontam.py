"""Benchmark decontamination — word-n-gram overlap against an eval set.

Training corpora must not contain the benchmarks they are evaluated on.
The standard rule (GPT-3 appendix C; Brown et al. 2020) marks a training
document as contaminated when any of its word n-grams (n≈13) also occurs
in the benchmark set; milder variants drop a document only when the
contaminated fraction of its grams exceeds a threshold.

Design (Ray-Data-first):

1. Benchmark side: one ``map_batches`` splits each benchmark doc into
   words and emits the two seeded 64-bit hashes of each distinct word
   n-gram; a distinct over the hash pair is the benchmark gram set. Eval
   sets are tiny next to the corpus, so the default path collects the gram
   hashes to the driver (gated by ``max_broadcast_grams``) and broadcasts
   them ONCE with ``ray.put`` — every corpus task reads the same
   object-store copy; no shuffle touches the corpus.
2. Corpus side: a stateful actor pool (``_Contaminator``) fetches the
   broadcast once per actor in ``__init__`` (sorted arrays), then scores
   each batch vectorized: n-gram construction is ``n`` shifted ``take``s +
   one ``binary_join_element_wise``, membership is one ``searchsorted``
   against the sorted benchmark hashes with an h2 confirmation — no Python
   loop over rows or grams.
3. Above the broadcast gate, a join path: per-doc distinct corpus grams
   (doc_id, h1, h2) inner-join the benchmark grams on both hash columns,
   then a per-doc groupby-count. Two shuffles moving ~24 B per gram.

Membership is confirmed on both independent 64-bit hashes (h1 sorted, h2
checked at the matched slot), so a false accept needs a 128-bit collision;
if two distinct benchmark grams ever collided on h1 (probability ~G²/2⁶⁴)
one of them is dropped from the set — a miss, never a false drop of the
corpus doc... the corpus side is unaffected.

No reference analog: mismo's surface is record linkage (SURVEY §2.7);
decontamination is an LLM-training-data addition alongside the line/
substring/MinHash dedup family.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from mismo_ray._util import hash64

_SEED1 = 0xDECAF
_SEED2 = 0xC0FFEE


def _emit_grams(
    t: pa.Table, column: str, id_column: str | None, n: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized word-n-gram extraction for one batch.

    Returns (doc_ids_per_gram, h1, h2, n_grams_per_doc). Words are the
    non-empty segments of a single-space split (matches SQL
    ``string_split(text, ' ')`` + empty filter); docs shorter than ``n``
    words contribute zero grams. Grams are NOT yet distinct-per-doc.
    """
    texts = t[column].combine_chunks()
    words = pc.split_pattern(texts, pattern=" ")
    flat = words.values
    offsets = np.asarray(words.offsets, dtype=np.int64)
    nonempty = np.asarray(pc.not_equal(flat, ""), dtype=bool)
    nonempty &= np.asarray(flat.is_valid(), dtype=bool)
    flat = flat.filter(pa.array(nonempty))
    # per-doc word counts after the empty filter
    csum = np.concatenate([[0], np.cumsum(nonempty.astype(np.int64))])
    new_offsets = csum[offsets]
    wc = np.diff(new_offsets)
    gc = np.maximum(wc - n + 1, 0)  # grams per doc
    total = int(gc.sum())
    if id_column is None:
        doc = np.repeat(np.arange(len(t), dtype=np.int64), gc)
    else:
        doc = np.repeat(np.asarray(t[id_column], dtype=np.int64), gc)
    if total == 0:
        e = np.array([], dtype=np.uint64)
        return doc, e, e, gc
    # gram start index into flat: per-doc arange + doc word offset
    starts = (
        np.arange(total, dtype=np.int64)
        - np.repeat(np.cumsum(gc) - gc, gc)
        + np.repeat(new_offsets[:-1], gc)
    )
    parts = [flat.take(pa.array(starts + j)) for j in range(n)]
    grams = pc.binary_join_element_wise(*parts, " ")
    h1 = hash64(grams, seed=_SEED1)
    h2 = hash64(grams, seed=_SEED2)
    return doc, h1, h2, gc


def _distinct_per_doc(
    doc: np.ndarray, h1: np.ndarray, h2: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Keep one occurrence of each (doc, gram) — vectorized lexsort+mask."""
    if not len(h1):
        return doc[:0], h1, h2
    order = np.lexsort((h2, h1, doc))
    doc, h1, h2 = doc[order], h1[order], h2[order]
    first = np.ones(len(doc), dtype=bool)
    first[1:] = (doc[1:] != doc[:-1]) | (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])
    return doc[first], h1[first], h2[first]


def benchmark_grams(
    benchmark: ray.data.Dataset, column: str = "text", *, n: int = 13
) -> ray.data.Dataset:
    """Distinct word-n-gram hash set of the benchmark: (``__h1__``,
    ``__h2__``) rows, one per distinct gram across the whole set."""
    from mismo_ray._joins import distinct

    def emit(t: pa.Table) -> pa.Table:
        _, h1, h2, _ = _emit_grams(t, column, None, n)
        if len(h1):
            # pre-shrink: batch-level distinct before the global distinct
            pair = np.stack([h1, h2], axis=1)
            pair = np.unique(pair, axis=0)
            h1, h2 = pair[:, 0], pair[:, 1]
        return pa.table(
            {
                "__h1__": pa.array(h1.astype(np.int64)),
                "__h2__": pa.array(h2.astype(np.int64)),
            }
        )

    return distinct(
        benchmark.map_batches(emit, batch_format="pyarrow"), ["__h1__", "__h2__"]
    )


class _Contaminator:
    """Actor-pool stage: holds the sorted benchmark gram hashes (fetched
    once per actor) and scores batches vectorized."""

    def __init__(self, bm_ref, column: str, id_column: str, n: int):
        bm_h1, bm_h2 = ray.get(bm_ref)
        order = np.argsort(bm_h1, kind="stable")
        h1s, h2s = bm_h1[order], bm_h2[order]
        # drop any h1 duplicate (two distinct grams colliding on h1 — see
        # module docstring; keeps searchsorted membership exact-by-slot)
        if len(h1s):
            keep = np.ones(len(h1s), dtype=bool)
            keep[1:] = h1s[1:] != h1s[:-1]
            h1s, h2s = h1s[keep], h2s[keep]
        self._h1 = h1s
        self._h2 = h2s
        self._column = column
        self._id = id_column
        self._n = n

    def __call__(self, t: pa.Table) -> pa.Table:
        doc, h1, h2, gc = _emit_grams(t, self._column, self._id, self._n)
        doc, h1, h2 = _distinct_per_doc(doc, h1, h2)
        hit = np.zeros(len(h1), dtype=bool)
        if len(h1) and len(self._h1):
            pos = np.minimum(
                np.searchsorted(self._h1, h1), len(self._h1) - 1
            )
            hit = (self._h1[pos] == h1) & (self._h2[pos] == h2)
        ids = np.asarray(t[self._id], dtype=np.int64)
        # distinct grams per doc / contaminated grams per doc
        n_grams = np.zeros(len(t), dtype=np.int64)
        n_cont = np.zeros(len(t), dtype=np.int64)
        if len(doc):
            # map gram doc ids back to batch row positions (vectorized:
            # doc values are exactly this batch's ids)
            id_order = np.argsort(ids, kind="stable")
            rows = id_order[np.searchsorted(ids[id_order], doc)]
            np.add.at(n_grams, rows, 1)
            np.add.at(n_cont, rows, hit.astype(np.int64))
        return pa.table(
            {
                self._id: pa.array(ids),
                "n_grams": pa.array(n_grams),
                "n_contaminated": pa.array(n_cont),
            }
        )


def contamination_stats(
    ds: ray.data.Dataset,
    benchmark: ray.data.Dataset,
    column: str = "text",
    *,
    id_column: str = "record_id",
    n: int = 13,
    max_broadcast_grams: int = 5_000_000,
    concurrency: int | None = None,
) -> ray.data.Dataset:
    """Per-document benchmark-overlap counts: (id, ``n_grams``,
    ``n_contaminated``) for every document with at least one word n-gram.
    ``n_grams`` counts the document's DISTINCT word n-grams;
    ``n_contaminated`` those that also occur anywhere in ``benchmark``.

    Benchmark gram sets up to ``max_broadcast_grams`` are broadcast (one
    object-store copy, zero corpus shuffles — the 100 TB path for real eval
    sets); larger ones fall back to a distributed gram join (two shuffles
    of ~24 B/gram).
    """
    bg = benchmark_grams(benchmark, column, n=n).materialize()
    n_bm = bg.count()
    if n_bm <= max_broadcast_grams:
        if n_bm == 0:
            # empty benchmark: zero gram hashes, every doc uncontaminated
            bm_ref = ray.put(
                (np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.uint64))
            )
        else:
            bm = bg.to_pandas()
            bm_ref = ray.put(
                (
                    bm["__h1__"].to_numpy().astype(np.uint64),
                    bm["__h2__"].to_numpy().astype(np.uint64),
                )
            )
        return ds.map_batches(
            _Contaminator,
            fn_constructor_args=(bm_ref, column, id_column, n),
            batch_format="pyarrow",
            concurrency=concurrency or (1, 8),
        ).filter(expr="n_grams > 0")
    return _contamination_stats_join(ds, bg, column, id_column, n)


def _contamination_stats_join(
    ds: ray.data.Dataset,
    bg: ray.data.Dataset,
    column: str,
    id_column: str,
    n: int,
) -> ray.data.Dataset:
    """Join path for corpus-scale benchmark sets: distinct per-doc corpus
    grams ⨝ benchmark grams on (h1, h2), then a per-doc count."""
    from mismo_ray._joins import default_num_partitions, hash_join

    n_buckets = default_num_partitions()

    def emit(t: pa.Table) -> pa.Table:
        doc, h1, h2, gc = _emit_grams(t, column, id_column, n)
        doc, h1, h2 = _distinct_per_doc(doc, h1, h2)
        return pa.table(
            {
                id_column: pa.array(doc),
                "__h1__": pa.array(h1.astype(np.int64)),
                "__h2__": pa.array(h2.astype(np.int64)),
            }
        )

    grams = ds.map_batches(emit, batch_format="pyarrow")
    gram_schema = pa.schema(
        [
            pa.field(id_column, pa.int64()),
            pa.field("__h1__", pa.int64()),
            pa.field("__h2__", pa.int64()),
        ]
    )
    hits = hash_join(
        grams,
        bg,
        on=["__h1__", "__h2__"],
        how="inner",
        num_partitions=n_buckets,
        left_schema=gram_schema,
        right_schema=pa.schema(
            [pa.field("__h1__", pa.int64()), pa.field("__h2__", pa.int64())]
        ),
    )

    def count_per_doc(name: str):
        def fn(t: pa.Table) -> pa.Table:
            ids = np.asarray(t[id_column], dtype=np.int64)
            u, c = np.unique(ids, return_counts=True)
            return pa.table(
                {
                    id_column: pa.array(u),
                    name: pa.array(c.astype(np.int64)),
                    "__dbkt__": pa.array(
                        (u.astype(np.uint64) % np.uint64(n_buckets)).astype(
                            np.int64
                        )
                    ),
                }
            )

        return fn

    def merge(name: str):
        def fn(t: pa.Table) -> pa.Table:
            ids = np.asarray(t[id_column], dtype=np.int64)
            vals = np.asarray(t[name], dtype=np.int64)
            u, inv = np.unique(ids, return_inverse=True)
            out = np.zeros(len(u), dtype=np.int64)
            np.add.at(out, inv, vals)
            return pa.table({id_column: pa.array(u), name: pa.array(out)})

        return fn

    totals = (
        grams.map_batches(count_per_doc("n_grams"), batch_format="pyarrow")
        .groupby("__dbkt__")
        .map_groups(
            lambda t: merge("n_grams")(t.drop_columns(["__dbkt__"])),
            batch_format="pyarrow",
        )
    )
    contaminated = (
        hits.map_batches(count_per_doc("n_contaminated"), batch_format="pyarrow")
        .groupby("__dbkt__")
        .map_groups(
            lambda t: merge("n_contaminated")(t.drop_columns(["__dbkt__"])),
            batch_format="pyarrow",
        )
    )
    joined = hash_join(
        totals,
        contaminated,
        on=id_column,
        how="left_outer",
        left_schema=pa.schema(
            [pa.field(id_column, pa.int64()), pa.field("n_grams", pa.int64())]
        ),
        right_schema=pa.schema(
            [pa.field(id_column, pa.int64()), pa.field("n_contaminated", pa.int64())]
        ),
    )

    def fill(t: pa.Table) -> pa.Table:
        idx = t.schema.get_field_index("n_contaminated")
        return t.set_column(
            idx,
            "n_contaminated",
            pc.fill_null(t["n_contaminated"].combine_chunks(), 0),
        )

    return joined.map_batches(fill, batch_format="pyarrow")


def drop_contaminated(
    ds: ray.data.Dataset,
    benchmark: ray.data.Dataset,
    column: str = "text",
    *,
    id_column: str = "record_id",
    n: int = 13,
    max_contaminated_frac: float = 0.0,
    max_broadcast_grams: int = 5_000_000,
) -> ray.data.Dataset:
    """Remove documents whose contaminated-gram fraction exceeds
    ``max_contaminated_frac`` (default 0.0: any benchmark n-gram drops the
    document — the GPT-3 rule). Documents with fewer than ``n`` words have
    no grams and always survive.

    ``ds`` is consumed twice (stats pass + the filter's anti side): pass a
    materialized / checkpointed dataset for expensive upstreams.
    """
    from mismo_ray._joins import hash_join

    stats = contamination_stats(
        ds,
        benchmark,
        column,
        id_column=id_column,
        n=n,
        max_broadcast_grams=max_broadcast_grams,
    )
    frac = float(max_contaminated_frac)

    def pick_bad(t: pa.Table) -> pa.Table:
        nc = np.asarray(t["n_contaminated"], dtype=np.float64)
        ng = np.asarray(t["n_grams"], dtype=np.float64)
        return t.select([id_column]).filter(pa.array(nc > frac * ng))

    # ids to drop: small side in every realistic run, but stay join-based
    bad = stats.map_batches(pick_bad, batch_format="pyarrow")
    in_schema = ds.schema(fetch_if_missing=True)
    if in_schema is None:
        return ds  # empty corpus: nothing to drop
    return hash_join(
        ds,
        bad,
        on=id_column,
        how="left_anti",
        left_schema=in_schema.base_schema,
        right_schema=pa.schema([pa.field(id_column, pa.int64())]),
    )


def semantic_contamination(
    ds: ray.data.Dataset,
    benchmark: ray.data.Dataset,
    *,
    vector_column: str = "embedding",
    id_column: str = "record_id",
    tau: float = 0.95,
    method: str = "auto",
    **linker_kwargs,
) -> ray.data.Dataset:
    """Embedding-space decontamination stats: corpus documents whose
    embedding has cosine >= ``tau`` to ANY benchmark/eval document.

    The semantic counterpart of the n-gram rule (`contamination_stats`):
    paraphrased or reformatted eval material shares no 13-gram but still
    sits next to its source in embedding space. Routing follows
    :class:`~mismo_ray.linker.EmbeddingLinker`: exact chunk-pair join at
    small scale (recall 1), banded hyperplane LSH + exact verify at corpus
    scale (``method="lsh"``, the 100 TB path).

    Returns (id_column, n_hits) — one row per contaminated corpus doc with
    the number of benchmark neighbors at or above ``tau``.
    """
    from ray.data.aggregate import Count

    from mismo_ray.linker import EmbeddingLinker

    linker = EmbeddingLinker(
        vector_column,
        tau=tau,
        id_column=id_column,
        method=method,
        task="link",
        **linker_kwargs,
    )
    links = linker(ds, benchmark).links_ds

    def project(t: pa.Table) -> pa.Table:
        return pa.table({id_column: t["record_id_l"]})

    return (
        links.map_batches(project, batch_format="pyarrow")
        .groupby(id_column)
        .aggregate(Count(alias_name="n_hits"))
    )


def drop_semantic_contaminated(
    ds: ray.data.Dataset,
    benchmark: ray.data.Dataset,
    *,
    vector_column: str = "embedding",
    id_column: str = "record_id",
    tau: float = 0.95,
    method: str = "auto",
    **linker_kwargs,
) -> ray.data.Dataset:
    """Remove corpus documents with embedding cosine >= ``tau`` to any
    benchmark document (see :func:`semantic_contamination`).

    ``ds`` is consumed twice (the pair join + the filter's anti side): pass
    a materialized / checkpointed dataset for expensive upstreams.
    """
    from mismo_ray._joins import keyed_filter

    bad = semantic_contamination(
        ds,
        benchmark,
        vector_column=vector_column,
        id_column=id_column,
        tau=tau,
        method=method,
        **linker_kwargs,
    )
    # keyed_filter, not hash_join: the corpus carries a list<float> payload
    # column, which acero rejects as a join field; the bucketed is_in filter
    # shuffles it untouched
    return keyed_filter(
        ds, bad.select_columns([id_column]), id_column, invert=True
    )
