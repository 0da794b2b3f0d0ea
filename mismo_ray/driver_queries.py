"""Driver correctness battery: one entry per operator family of SURVEY.md §2,
each as a Ray Data pipeline over /root/testdata tables plus (where
SQL-expressible) a DuckDB oracle producing identical columns/values.

Conventions for exact hash-matching against the oracle:
- float columns that survive to the output are either produced by IDENTICAL
  per-row arithmetic on both sides (safe) or converted to integers via
  ``round(x * 1e6)``;
- aggregate money sums are per-row rounded to integer cents first so the
  summation is exact-integer on both engines;
- all outputs carry explicit column names matching the SQL aliases.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ray.data.aggregate import Count, Sum


# ------------------------------------------------------------------ helpers
def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _with_record_id(ds: ray.data.Dataset, source_col: str) -> ray.data.Dataset:
    def fn(t: pa.Table) -> pa.Table:
        return t.append_column("record_id", t[source_col].combine_chunks().cast(pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow")


def _e6(arr: np.ndarray) -> pa.Array:
    # floor(x*1e6 + 0.5): half-up rounding, matching DuckDB ROUND (np.round
    # would use banker's rounding and disagree on exact .5 boundaries)
    return pa.array(np.floor(arr * 1e6 + 0.5).astype(np.int64))


def _part_records(sf_dir: str) -> ray.data.Dataset:
    return _with_record_id(
        _read(sf_dir, "part", ["p_partkey", "p_name", "p_brand", "p_type", "p_size"]),
        "p_partkey",
    )


def _part_linkage(sf_dir: str, carry=None):
    from mismo_ray.linker import KeyLinker

    parts = _part_records(sf_dir)
    linker = KeyLinker(["p_brand", "p_size"], carry=carry, salt_rows=4096)
    return linker(parts, parts), linker, parts


_PAIR_SQL = (
    "SELECT a.p_partkey AS record_id_l, b.p_partkey AS record_id_r "
    "FROM part a JOIN part b ON a.p_brand = b.p_brand AND a.p_size = b.p_size "
    "AND a.p_partkey < b.p_partkey"
)

_TOKS_SQL = (
    "SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS toks "
    "FROM documents WHERE text IS NOT NULL"
)


# ------------------------------------------------------------------ queries
def q_key_counts(sf_dir: str):
    from mismo_ray.linker import KeyLinker

    parts = _part_records(sf_dir)
    return KeyLinker(["p_brand", "p_size"]).key_counts_left(parts)


def q_pair_counts(sf_dir: str):
    from mismo_ray.linker import KeyLinker

    parts = _part_records(sf_dir)
    return KeyLinker(["p_brand", "p_size"]).pair_counts(parts, parts)


def q_key_linker_pairs(sf_dir: str):
    linkage, _, _ = _part_linkage(sf_dir)
    return linkage.links_ds


def q_key_linker_link(sf_dir: str):
    from mismo_ray.linker import KeyLinker

    cust = _with_record_id(_read(sf_dir, "customer", ["c_custkey", "c_nationkey"]), "c_custkey")
    supp = _with_record_id(_read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]), "s_suppkey")
    return KeyLinker(("c_nationkey", "s_nationkey"), task="link")(cust, supp).links_ds


def q_unnest_linker(sf_dir: str):
    from mismo_ray.linker import UnnestLinker

    parts = _part_records(sf_dir)

    def name_tokens(batch: pa.Table) -> pa.Array:
        return pa.array(
            [None if v is None else v.split(" ") for v in batch["p_name"].to_pylist()],
            type=pa.list_(pa.string()),
        )

    name_tokens.__name__ = "name_tokens"
    return UnnestLinker(name_tokens, salt_rows=4096)(parts, parts).links_ds


def q_exact_dedupe(sf_dir: str):
    from mismo_ray.dedupe import exact_dedupe

    docs = _with_record_id(_read(sf_dir, "documents", ["doc_id", "text"]), "doc_id")
    # the oracle groups by text itself; the engine groups by a 128-bit content
    # hash — identical partitions, so (keep_id, n_dups) must match exactly
    return exact_dedupe(docs, "text").drop_columns(
        ["content_hash_1", "content_hash_2"]
    )


def q_fingerprint(sf_dir: str):
    from mismo_ray.textstats import add_fingerprint

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return add_fingerprint(docs, "text").select_columns(["doc_id", "fingerprint"])


def q_token_stats(sf_dir: str):
    from mismo_ray.textstats import add_token_stats

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    out = add_token_stats(docs, "text")

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars": t["n_chars"],
                "n_tokens": t["n_tokens"],
                "n_uniq_tokens": t["n_uniq_tokens"],
                "avg_token_len_e6": _e6(np.asarray(t["avg_token_len"], dtype=np.float64)),
                "stopword_ratio_e6": _e6(np.asarray(t["stopword_ratio"], dtype=np.float64)),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def q_quality_filter(sf_dir: str):
    """Composite training-data quality gate (the Common-Crawl-style filter
    chain): token stats -> keep docs with enough tokens, enough vocabulary
    diversity, and a natural-language stopword ratio. Filters compare only
    integers (raw counts + the e6-scaled ratio) so the oracle is exact."""
    from mismo_ray.textstats import add_token_stats

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    out = add_token_stats(docs, "text")

    def filt(t: pa.Table) -> pa.Table:
        n_tok = np.asarray(t["n_tokens"], dtype=np.int64)
        n_uniq = np.asarray(t["n_uniq_tokens"], dtype=np.int64)
        sw_e6 = np.floor(
            np.asarray(t["stopword_ratio"], dtype=np.float64) * 1e6 + 0.5
        ).astype(np.int64)
        keep = (n_tok >= 10) & (n_uniq * 2 >= n_tok) & (sw_e6 >= 100_000)
        t = t.filter(pa.array(keep))
        return t.select(["doc_id", "n_tokens", "n_uniq_tokens"])

    return out.map_batches(filt, batch_format="pyarrow")


def q_topk_per_group(sf_dir: str):
    """Top-3 documents per language by token count (deterministic doc_id
    tie-break) through the bucketed top_k_per_group operator; oracle =
    ROW_NUMBER window."""
    from mismo_ray.textstats import add_token_stats
    from mismo_ray.util_ops import top_k_per_group

    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    stats = add_token_stats(docs, "text")

    def slim(t: pa.Table) -> pa.Table:
        return t.select(["doc_id", "lang", "n_tokens"])

    out = top_k_per_group(
        stats.map_batches(slim, batch_format="pyarrow"),
        "lang",
        [("n_tokens", "desc"), ("doc_id", "asc")],
        3,
    )
    return out


def q_token_count_bpe(sf_dir: str):
    from mismo_ray.textstats import add_token_count

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return add_token_count(docs, "text").select_columns(["doc_id", "n_bpe_tokens"])


def q_term_idf(sf_dir: str):
    from mismo_ray.sets import term_idf

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def tok(t: pa.Table) -> pa.Table:
        toks = [
            None if v is None else v.strip().split()
            for v in t["text"].to_pylist()
        ]
        return pa.table(
            {"doc_id": t["doc_id"], "toks": pa.array(toks, type=pa.list_(pa.string()))}
        )

    idf = term_idf(docs.map_batches(tok, batch_format="pyarrow"), "toks")

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "term": t["term"],
                "idf_e6": _e6(np.asarray(t["idf"], dtype=np.float64)),
            }
        )

    return idf.map_batches(finish, batch_format="pyarrow")


def q_document_counts(sf_dir: str):
    from mismo_ray.sets import document_counts

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def tok(t: pa.Table) -> pa.Table:
        toks = [
            None if v is None else v.strip().split()
            for v in t["text"].to_pylist()
        ]
        return pa.table(
            {"doc_id": t["doc_id"], "toks": pa.array(toks, type=pa.list_(pa.string()))}
        )

    return document_counts(docs.map_batches(tok, batch_format="pyarrow"), "toks")


def q_rare_terms(sf_dir: str):
    from mismo_ray.sets import rare_terms

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def tok(t: pa.Table) -> pa.Table:
        toks = [
            None if v is None else v.strip().split()
            for v in t["text"].to_pylist()
        ]
        return pa.table({"toks": pa.array(toks, type=pa.list_(pa.string()))})

    return rare_terms(
        docs.map_batches(tok, batch_format="pyarrow"), "toks", max_records_n=100
    )


def q_connected_components(sf_dir: str):
    from mismo_ray.cluster import connected_components
    from mismo_ray.linker import KeyLinker, OrLinker

    parts = _part_records(sf_dir)
    blocker = OrLinker(
        [
            KeyLinker(["p_brand", "p_size"], salt_rows=4096),
            KeyLinker(["p_type", "p_size"], salt_rows=4096),
        ]
    )
    linkage = blocker(parts, parts)
    labeled = connected_components(
        links=linkage.links_ds, records=parts, label_as="component"
    )
    return labeled.select_columns(["record_id", "component"])


def q_connected_components_star(sf_dir: str):
    """Same graph as connected_components but labeled via the alternating
    large-star/small-star rounds (mode='star', O(log n) rounds) — the labels
    must be identical (component = min member id), checked against the same
    recursive-CTE oracle."""
    from mismo_ray.cluster import connected_components
    from mismo_ray.linker import KeyLinker, OrLinker

    parts = _part_records(sf_dir)
    blocker = OrLinker(
        [
            KeyLinker(["p_brand", "p_size"], salt_rows=4096),
            KeyLinker(["p_type", "p_size"], salt_rows=4096),
        ]
    )
    linkage = blocker(parts, parts)
    labeled = connected_components(
        links=linkage.links_ds, records=parts, label_as="component",
        mode="star",
    )
    return labeled.select_columns(["record_id", "component"])


def q_connected_components_str(sf_dir: str):
    """CC over STRING record ids through the corpus-scale path: Factorizer
    encode/decode and singleton attach all as bucketed lookup joins (no
    broadcast dict, no driver union-find). Output component label = min
    member record-id string (SQL-expressible, unlike raw factorized codes)."""
    from ray.data.aggregate import Min

    from mismo_ray._joins import hash_join
    from mismo_ray.cluster import connected_components
    from mismo_ray.linker import KeyLinker

    parts = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"])

    def with_sid(t: pa.Table) -> pa.Table:
        sid = [f"P{v}" for v in t["p_partkey"].to_pylist()]
        return t.append_column("record_id", pa.array(sid, type=pa.string()))

    recs = parts.map_batches(with_sid, batch_format="pyarrow")
    linkage = KeyLinker(["p_brand", "p_size"], salt_rows=4096)(recs, recs)
    labeled = connected_components(
        links=linkage.links_ds,
        records=recs.select_columns(["record_id"]),
        mode="distributed",
        driver_threshold=0,
        factorize_broadcast_threshold=0,
    )
    mins = labeled.groupby("component").aggregate(
        Min("record_id", alias_name="component_id")
    )
    out = hash_join(
        labeled,
        mins,
        on="component",
        left_schema=pa.schema(
            [pa.field("record_id", pa.string()), pa.field("component", pa.int64())]
        ),
        right_schema=pa.schema(
            [pa.field("component", pa.int64()), pa.field("component_id", pa.string())]
        ),
    )
    return out.select_columns(["record_id", "component_id"])


def q_sorted_neighborhood(sf_dir: str):
    from mismo_ray.linker import SortedNeighborhoodLinker

    cust = _with_record_id(_read(sf_dir, "customer", ["c_custkey", "c_name"]), "c_custkey")
    return SortedNeighborhoodLinker("c_name", window=3)(cust, cust).links_ds


def _fs_comparers():
    from mismo_ray.compare import LevelComparer
    from mismo_ray.text import levenshtein_array

    def name_exact(t: pa.Table) -> np.ndarray:
        return pc.equal(t["p_name_l"], t["p_name_r"]).to_numpy(zero_copy_only=False)

    def name_close(t: pa.Table) -> np.ndarray:
        d = levenshtein_array(t["p_name_l"], t["p_name_r"]).to_numpy(
            zero_copy_only=False
        )
        return np.asarray(d) <= 3

    def type_exact(t: pa.Table) -> np.ndarray:
        return pc.equal(t["p_type_l"], t["p_type_r"]).to_numpy(zero_copy_only=False)

    name_cmp = LevelComparer(
        "name", ["exact", "close", "else"], [(name_exact, "exact"), (name_close, "close")]
    )
    type_cmp = LevelComparer("ptype", ["exact", "else"], [(type_exact, "exact")])
    return [name_cmp, type_cmp]


def _fs_weights():
    from mismo_ray.fs import ComparerWeights, LevelWeights, Weights

    return Weights(
        [
            ComparerWeights(
                "name",
                [
                    LevelWeights("exact", m=0.9, u=0.01),
                    LevelWeights("close", m=0.5, u=0.05),
                ],
            ),
            ComparerWeights("ptype", [LevelWeights("exact", m=0.8, u=0.1)]),
        ]
    )


def _scored_pairs(sf_dir: str):
    linkage, _, _ = _part_linkage(sf_dir, carry=["p_name", "p_type"])
    pairs = linkage.links_ds
    return _fs_weights().compare_and_score(pairs, _fs_comparers())


_FS_SQL_CORE = f"""
WITH pairs AS (
  SELECT a.p_partkey AS record_id_l, b.p_partkey AS record_id_r,
         a.p_name AS p_name_l, b.p_name AS p_name_r,
         a.p_type AS p_type_l, b.p_type AS p_type_r
  FROM part a JOIN part b ON a.p_brand = b.p_brand AND a.p_size = b.p_size
   AND a.p_partkey < b.p_partkey
), lvl AS (
  SELECT record_id_l, record_id_r,
    CAST(CASE WHEN p_name_l = p_name_r THEN 0
         WHEN levenshtein(p_name_l, p_name_r) <= 3 THEN 1 ELSE 2 END AS BIGINT) AS name,
    CAST(CASE WHEN p_type_l = p_type_r THEN 0 ELSE 1 END AS BIGINT) AS ptype
  FROM pairs
)
SELECT record_id_l, record_id_r, name, ptype,
  CAST(ROUND((CASE name WHEN 0 THEN 0.9/0.01 WHEN 1 THEN 0.5/0.05 ELSE 1.0 END
   * CASE ptype WHEN 0 THEN 0.8/0.1 ELSE 1.0 END) * 1000000) AS BIGINT) AS odds_e6
FROM lvl
"""


def q_fs_score(sf_dir: str):
    scored = _scored_pairs(sf_dir)

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "record_id_l": t["record_id_l"],
                "record_id_r": t["record_id_r"],
                "name": t["name"],
                "ptype": t["ptype"],
                "odds_e6": _e6(np.asarray(t["odds"], dtype=np.float64)),
            }
        )

    return scored.map_batches(finish, batch_format="pyarrow")


def q_filter_links_best(sf_dir: str):
    """Window predicate: best pair per record_id_r (max odds, tie -> min
    record_id_l) — reference filter_links window semantics
    (mismo/linkage/_linkage.py:206-301). Ranks by the half-up-rounded
    ``odds_e6`` (exactly what the oracle ranks by) and delegates the window
    filter to the bucketed library op ``linkage.keep_best_per``."""
    from mismo_ray.linkage import keep_best_per

    scored = _scored_pairs(sf_dir)

    def to_e6(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "record_id_l": t["record_id_l"],
                "record_id_r": t["record_id_r"],
                "odds_e6": _e6(np.asarray(t["odds"], dtype=np.float64)),
            }
        )

    return keep_best_per(
        scored.map_batches(to_e6, batch_format="pyarrow"),
        group="record_id_r",
        score="odds_e6",
        tie_breaker="record_id_l",
        keep_ties=False,
    )


def q_with_n_links(sf_dir: str):
    linkage, _, _ = _part_linkage(sf_dir)
    return linkage.with_n_links("left").select_columns(["record_id", "n_links"])


def q_link_counts(sf_dir: str):
    linkage, _, _ = _part_linkage(sf_dir)
    return linkage.link_counts("left")


def q_degree(sf_dir: str):
    from mismo_ray.cluster import degree

    linkage, _, _ = _part_linkage(sf_dir)
    return degree(linkage.links_ds)


def q_ann_topk(sf_dir: str):
    from mismo_ray.ann import brute_force_topk

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    head = emb.filter(expr="vec_id < 20").to_pandas()
    if len(head):  # null embeddings cannot be query vectors
        head = head[head["embedding"].notna()]
    if len(head) == 0:  # empty input: no query vectors, empty result
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
                "rk": pa.array([], pa.int64()),
            }
        )
    queries = np.stack(head["embedding"].to_numpy())
    qids = head["vec_id"].to_numpy()
    out = brute_force_topk(
        emb, queries, k=3, id_column="vec_id", query_ids=qids, exclude_self=True
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "query_id": t["query_id"],
                "neighbor_id": t["neighbor_id"],
                "rk": t["rank"],
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def q_embedding_neardup(sf_dir: str):
    from mismo_ray.dedupe import embedding_neardup_pairs

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    # explicit exact: the oracle needs recall 1 (auto would also pick exact
    # at battery sizes, but the intent belongs in the code)
    return embedding_neardup_pairs(
        emb, tau=0.40, id_column="vec_id", vector_column="embedding",
        method="exact",
    ).links_ds


def q_embedding_linker_link(sf_dir: str):
    """Cross-corpus cosine blocking through the Linker protocol
    (linker.EmbeddingLinker, exact two-relation 1-Bucket-Theta join): left
    = embeddings with vec_id < 250, right = the rest, pairs with cosine
    >= 0.40, sides preserved. SQL-oracled via list_cosine_similarity.
    chunk_rows=64 forces a real multi-chunk-pair shuffle at battery size."""
    from mismo_ray.linker import EmbeddingLinker

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    left = emb.filter(expr="vec_id < 250")
    right = emb.filter(expr="vec_id >= 250")
    linker = EmbeddingLinker(
        "embedding", tau=0.40, id_column="vec_id", method="exact",
        chunk_rows=64,
    )
    return linker(left, right).links_ds


def q_semdedup(sf_dir: str):
    """SemDedup within-cluster prune with a deterministic modulo clustering
    (so the SQL oracle can reproduce the cluster assignment exactly); the
    k-means path is covered by tests/test_semdedup.py."""
    from mismo_ray.dedupe import semdedup

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = semdedup(
        emb,
        tau=0.40,
        cluster_fn=lambda t: np.asarray(t["vec_id"], dtype=np.int64) % 16,
    )
    return out.select_columns(["vec_id", "cluster"])


def q_hash_split(sf_dir: str):
    """Deterministic train/val/test split by splitmix64(id + seed); the SQL
    oracle reproduces the mixer bit-exactly with 128-bit modular arithmetic."""
    from mismo_ray.util_ops import hash_split

    part = _read(sf_dir, "part", ["p_partkey"])
    out = hash_split(
        part,
        {"train": 0.8, "val": 0.1, "test": 0.1},
        id_column="p_partkey",
        seed=42,
    )
    return out.map_batches(
        lambda t: pa.table({"record_id": t["p_partkey"], "split": t["split"]}),
        batch_format="pyarrow",
    )


def q_groupby_agg(sf_dir: str):
    li = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(t: pa.Table) -> pa.Table:
        qty = np.asarray(t["l_quantity"], dtype=np.float64)
        price = np.asarray(t["l_extendedprice"], dtype=np.float64)
        disc = np.asarray(t["l_discount"], dtype=np.float64)
        # floor(x+0.5) = DuckDB ROUND (half-up); np.round would use
        # banker's rounding and differ on exact half-cent boundaries
        qty_i = np.floor(qty * 100 + 0.5).astype(np.int64)
        rev_i = np.floor(price * (1 - disc) * 100 + 0.5).astype(np.int64)
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "qty_c": pa.array(qty_i),
                "rev_c": pa.array(rev_i),
            }
        )

    return (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(
            Sum("qty_c", alias_name="sum_qty_cents"),
            Sum("rev_c", alias_name="sum_rev_cents"),
            Count(alias_name="n"),
        )
    )


def q_tf_lookup(sf_dir: str):
    """Term-frequency lookup (reference mismo/tf/_tf.py:51-144): per record,
    the frequency of its c_mktsegment value."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    counts = cust.groupby("c_mktsegment").aggregate(Count(alias_name="n"))
    pdf = counts.to_pandas()
    n_total = int(pdf["n"].sum()) if len(pdf) else 0
    freq = (
        {s: int(c) for s, c in zip(pdf["c_mktsegment"], pdf["n"])}
        if len(pdf)
        else {}
    )
    import ray

    ref = ray.put(freq)

    def fn(t: pa.Table) -> pa.Table:
        import ray

        m = ray.get(ref)
        segs = t["c_mktsegment"].to_pylist()
        fr = np.array([m[s] / n_total for s in segs], dtype=np.float64)
        return pa.table(
            {
                "record_id": t["c_custkey"].combine_chunks().cast(pa.int64()),
                "c_mktsegment": t["c_mktsegment"],
                "tf_e6": _e6(fr),
            }
        )

    return cust.map_batches(fn, batch_format="pyarrow")


_ADDR_NAMES = ["MAPLE", "OAK", "CEDAR", "ELM", "PINE", "WALNUT", "SPRUCE", "BIRCH"]
_ADDR_SUFS = ["ST", "AVENUE", "RD"]
_ADDR_SUF_CANON = ["street", "avenue", "road"]
_ADDR_CITIES = ["SPRINGFIELD", "RIVERSIDE", "FRANKLIN", "NEW HAVEN", "CLINTON", "SALEM"]
_ADDR_STATES_IN = ["IL", "CALIFORNIA", "TX", "NEW YORK", "OH", "FLORIDA"]
_ADDR_STATES_OUT = ["IL", "CA", "TX", "NY", "OH", "FL"]


def q_postal_parse(sf_dir: str):
    """Full-address tagger + libpostal-style near-dupe fingerprints
    (mismo_ray.lib.postal; reference mismo/lib/geo/_postal.py:26-172): the
    address string is synthesized deterministically from c_custkey, parsed by
    the rule tagger, and the oracle recomputes every expected field (and the
    first fingerprint key) from the same components — a true inversion check."""
    from mismo_ray.lib.postal import fingerprint_address_array, tag_address_array

    cust = _read(sf_dir, "customer", ["c_custkey"])

    def build_and_parse(t: pa.Table) -> pa.Table:
        keys = np.asarray(t["c_custkey"], dtype=np.int64)
        addrs = []
        for k in keys:
            house = 100 + k % 899
            name = _ADDR_NAMES[k % 8]
            suf = _ADDR_SUFS[k % 3]
            city = _ADDR_CITIES[k % 6]
            state = _ADDR_STATES_IN[(k // 6) % 6]
            zipc = 10000 + (k * 7) % 89999
            addrs.append(f"{house} {name} {suf}, {city}, {state} {zipc}")
        parsed = tag_address_array(addrs)
        fps = fingerprint_address_array(parsed)
        # structs.struct_select/struct_unpack (reference _structs.py family)
        # project the tagger's struct straight into the output columns
        from mismo_ray.structs import struct_select, struct_unpack

        picked = struct_select(
            parsed, "street1", "city", "state", "postal_code"
        )
        base = pa.table(
            {
                "record_id": pa.array(keys),
                "__addr__": picked,
                "fp0": pa.array([v[0] if v else None for v in fps.to_pylist()]),
                "n_fp": pa.array(
                    [len(v) if v is not None else None for v in fps.to_pylist()],
                    type=pa.int64(),
                ),
            }
        )
        return struct_unpack(base, "__addr__")

    return cust.map_batches(build_and_parse, batch_format="pyarrow")


def q_keep_unambiguous(sf_dir: str):
    """Window link filter: keep links whose record_id_r has exactly one
    distinct record_id_l (reference filter_links nunique==1 window)."""
    from mismo_ray.linkage import keep_unambiguous

    linkage, _, _ = _part_linkage(sf_dir)
    return keep_unambiguous(
        linkage.links_ds, group="record_id_r", distinct="record_id_l"
    )


def q_with_linked_values(sf_dir: str):
    """LinkedTable enrichment: every left part + the p_name values of its
    linked records (distributed bucket-collect; compared order-insensitively
    via a sorted joined string)."""
    from mismo_ray.types import with_linked_values

    linkage, _, _ = _part_linkage(sf_dir)
    wlv = with_linked_values(linkage, ["p_name"], side="left")

    def finish(t: pa.Table) -> pa.Table:
        names = [
            "|".join(sorted(v)) for v in t["p_name_linked"].to_pylist()
        ]
        return pa.table(
            {
                "record_id": t["record_id"],
                "linked_names": pa.array(names, type=pa.string()),
            }
        )

    return wlv.map_batches(finish, batch_format="pyarrow")


def q_keep_min_agreement(sf_dir: str):
    """Window link filter: keep pairs produced by BOTH blocking rules
    (keep_min_agreement n=2 over the concatenated rule outputs)."""
    from mismo_ray.linkage import keep_min_agreement
    from mismo_ray.linker import KeyLinker

    parts = _part_records(sf_dir)
    a = KeyLinker(["p_brand", "p_size"], salt_rows=4096)(parts, parts).links_ds
    b = KeyLinker(["p_type", "p_size"], salt_rows=4096)(parts, parts).links_ds
    return keep_min_agreement(a.union(b), n=2)


def q_upset_counts(sf_dir: str):
    """Distributed UpSet intersection counts over two linkers' pair sets
    (viz.upset_counts core); oracle recomputes the exact-subset masks with
    outer-join SQL."""
    from mismo_ray.linker import KeyLinker
    from mismo_ray.viz import upset_counts

    parts = _part_records(sf_dir)
    a = KeyLinker(["p_brand", "p_size"], salt_rows=4096)(parts, parts).links_ds
    b = KeyLinker(["p_type", "p_size"], salt_rows=4096)(parts, parts).links_ds
    counts = upset_counts({"brand": a, "ptype": b})

    def label(v: list[str]) -> str:
        return "+".join(v)

    return pa.table(
        {
            "intersection": pa.array(
                [label(v) for v in counts["intersection"].to_pylist()],
                type=pa.string(),
            ),
            "n_pairs": counts["n_pairs"],
        }
    )


def q_diff_updates(sf_dir: str):
    """Diff/Updates: before=part, after=deterministic modification
    (reference mismo/types/_diff.py)."""
    from mismo_ray.types import Diff

    before = _read(sf_dir, "part", ["p_partkey", "p_name"])

    def mk_before(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "record_id": t["p_partkey"].combine_chunks().cast(pa.int64()),
                "p_name": t["p_name"],
            }
        )

    before_ds = before.map_batches(mk_before, batch_format="pyarrow")

    def mk_after(t: pa.Table) -> pa.Table:
        keys = np.asarray(t["p_partkey"], dtype=np.int64)
        names = t["p_name"].to_pylist()
        out_ids, out_names = [], []
        for k, nm in zip(keys, names):
            if k % 10 == 0:
                continue  # deletions
            out_ids.append(int(k))
            # null p_name: the "updated" variant of a null is still null
            out_names.append(nm + "X" if k % 10 == 1 and nm is not None else nm)
        for k, nm in zip(keys, names):
            if k % 10 == 2:
                out_ids.append(int(k) + 1_000_000)  # insertions
                out_names.append(nm)
        return pa.table(
            {
                "record_id": pa.array(out_ids, type=pa.int64()),
                "p_name": pa.array(out_names, type=pa.string()),
            }
        )

    after_ds = before.map_batches(mk_after, batch_format="pyarrow")
    d = Diff(before=before_ds, after=after_ds)

    def flatten(kind):
        def fn(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            st = t["p_name"].combine_chunks()
            return pa.table(
                {
                    "kind": pa.array([kind] * len(t), type=pa.string()),
                    "record_id": t["record_id"],
                    "name_before": st.field("before"),
                    "name_after": st.field("after"),
                }
            )

        return fn

    ins = d.insertions().map_batches(flatten("insert"), batch_format="pyarrow")
    dels = d.deletions().map_batches(flatten("delete"), batch_format="pyarrow")
    ups = d.updates().map_batches(flatten("update"), batch_format="pyarrow")
    return ins.union(dels).union(ups)


def q_events_tumbling(sf_dir: str):
    from mismo_ray.streaming import tumbling_window_agg

    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])
    out = tumbling_window_agg(ev, window_s=3600)

    def finish(t: pa.Table) -> pa.Table:
        vs = np.asarray(t["value_sum"], dtype=np.float64)
        return pa.table(
            {
                "user_id": t["user_id"].combine_chunks().cast(pa.int64()),
                "window_start": t["window_start"],
                "n_events": t["n_events"],
                "value_sum_e6": _e6(vs),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def q_events_sliding(sf_dir: str):
    from mismo_ray.streaming import sliding_window_agg

    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])
    out = sliding_window_agg(ev, window_s=3600, hop_s=900)

    def finish(t: pa.Table) -> pa.Table:
        vs = np.asarray(t["value_sum"], dtype=np.float64)
        return pa.table(
            {
                "user_id": t["user_id"].combine_chunks().cast(pa.int64()),
                "window_start": t["window_start"],
                "n_events": t["n_events"],
                "value_sum_e6": _e6(vs),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def q_events_sessionize(sf_dir: str):
    from mismo_ray.streaming import sessionize

    ev = _read(sf_dir, "events", ["user_id", "ts"])
    return sessionize(ev, gap_s=1800)


def q_asof_join(sf_dir: str):
    """Keyed as-of join (mismo_ray.asof.asof_join): even-microsecond events
    match the latest odd-microsecond event of the same user at or before
    them (oracle: DuckDB ASOF LEFT JOIN)."""
    from ray.data.aggregate import Max

    from mismo_ray.asof import asof_join

    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def to_us(t: pa.Table) -> pa.Table:
        tus = t["ts"].combine_chunks().cast(pa.int64())
        return pa.table(
            {
                "user_id": t["user_id"].combine_chunks().cast(pa.int64()),
                "tus": tus,
                "value": t["value"],
            }
        )

    e = ev.map_batches(to_us, batch_format="pyarrow")

    def parity(p: int):
        def fn(t: pa.Table) -> pa.Table:
            tus = np.asarray(t["tus"], dtype=np.int64)
            return t.filter(pa.array(tus % 2 == p))

        return fn

    left = e.map_batches(parity(0), batch_format="pyarrow").select_columns(
        ["user_id", "tus"]
    )
    right = (
        e.map_batches(parity(1), batch_format="pyarrow")
        .groupby(["user_id", "tus"])
        .aggregate(Max("value", alias_name="rv"))
    )
    out = asof_join(left, right, on="tus", by="user_id", direction="backward")

    def finish(t: pa.Table) -> pa.Table:
        rv = np.asarray(
            t["rv_r"].to_numpy(zero_copy_only=False), dtype=np.float64
        )
        rv_e6 = [
            None if np.isnan(x) else int(np.floor(x * 1e6 + 0.5)) for x in rv
        ]
        # the pandas merge inside asof_join coerces int columns that saw NaN
        # to float64 — restore exact int64 types for the hash compare
        return pa.table(
            {
                "user_id": t["user_id"].combine_chunks().cast(pa.int64()),
                "tus": t["tus"].combine_chunks().cast(pa.int64()),
                "tus_r": t["tus_r"].combine_chunks().cast(pa.int64()),
                "rv_e6": pa.array(rv_e6, type=pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def q_range_join(sf_dir: str):
    """Banded interval join (mismo_ray.asof.interval_join): part retail
    prices against deterministic supplier price bands (oracle: BETWEEN join)."""
    from mismo_ray.asof import interval_join

    part = _read(sf_dir, "part", ["p_partkey", "p_retailprice"])
    supp = _read(sf_dir, "supplier", ["s_suppkey"])

    def mk_left(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_partkey": t["p_partkey"].combine_chunks().cast(pa.int64()),
                "v": t["p_retailprice"].combine_chunks().cast(pa.float64()),
            }
        )

    def mk_right(t: pa.Table) -> pa.Table:
        k = np.asarray(t["s_suppkey"], dtype=np.int64)
        lo = (900 + (k * 37) % 1100).astype(np.float64)
        return pa.table(
            {
                "s_suppkey": pa.array(k),
                "lo": pa.array(lo),
                "hi": pa.array(lo + 13.0),
            }
        )

    out = interval_join(
        part.map_batches(mk_left, batch_format="pyarrow"),
        supp.map_batches(mk_right, batch_format="pyarrow"),
        left_value="v",
        right_lo="lo",
        right_hi="hi",
        bucket_width=50.0,
    )

    def finish(t: pa.Table) -> pa.Table:
        v = np.asarray(t["v"], dtype=np.float64)
        return pa.table(
            {
                "p_partkey": t["p_partkey"],
                "s_suppkey": t["s_suppkey_r"],
                "price_c": pa.array(np.floor(v * 100 + 0.5).astype(np.int64)),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


# -------------------------------------------------- rows-only (non-SQL) ops
def q_minhash_lsh_dedupe(sf_dir: str):
    from mismo_ray.dedupe import minhash_lsh_pairs

    docs = _with_record_id(_read(sf_dir, "documents", ["doc_id", "text"]), "doc_id")
    return minhash_lsh_pairs(docs, "text", verify_jaccard=0.8).links_ds


def q_spelling_pairs(sf_dir: str):
    """SymSpell deletion-neighborhood typo blocking (linker.SpellingLinker):
    a typo corpus is derived deterministically from part-name first tokens
    (every third part gets one interior character deleted), then all pairs
    within Levenshtein distance 1 are found via hashed delete-variant
    blocking + the exact vectorized edit-distance verify.  The SQL oracle
    rebuilds the identical corpus with substr arithmetic and checks
    levenshtein(a,b) <= 1 over ALL pairs — blocking recall is therefore
    value-checked as COMPLETE, not sampled.  p_partkey < 1500 keeps the
    oracle's all-pairs comparison bounded at any scale factor."""
    from mismo_ray.linker import SpellingLinker

    parts = _read(sf_dir, "part", ["p_partkey", "p_name"]).filter(
        expr="p_partkey < 1500"
    )

    def synth_typos(t: pa.Table) -> pa.Table:
        keys = np.asarray(t["p_partkey"], dtype=np.int64)
        names = t["p_name"].to_pylist()
        out = []
        for k, nm in zip(keys, names):
            if nm is None:
                out.append(None)
                continue
            tok = nm.split(" ")[0]
            if k % 3 == 0 and len(tok) > 3:
                pos = int(k) % max(len(tok) - 2, 1) + 1
                tok = tok[:pos] + tok[pos + 1 :]
            out.append(tok)
        return pa.table(
            {
                "record_id": pa.array(keys),
                "name": pa.array(out, type=pa.string()),
            }
        )

    records = parts.map_batches(synth_typos, batch_format="pyarrow")
    return SpellingLinker("name", max_edits=1)(records, records).links_ds


def q_ngram_jaccard(sf_dir: str):
    """Character-3-gram jaccard near-dup pairs (dedupe.ngram_jaccard_pairs,
    no hot-gram drop so the SQL gram-join oracle is exact; text truncated to
    the first 80 chars on BOTH sides to keep the all-pairs-per-hot-gram
    oracle join tractable at battery time)."""
    from mismo_ray.dedupe import ngram_jaccard_pairs

    docs = _with_record_id(_read(sf_dir, "documents", ["doc_id", "text"]), "doc_id")

    def trunc(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"], dtype=np.int64)
        t = t.filter(pa.array(ids % 2 == 0))  # half the corpus
        idx = t.schema.get_field_index("text")
        return t.set_column(
            idx, "text", pc.utf8_slice_codeunits(t["text"].combine_chunks(), 0, 80)
        )

    return ngram_jaccard_pairs(
        docs.map_batches(trunc, batch_format="pyarrow"),
        "text",
        n=3,
        min_jaccard=0.8,
        max_pairs=None,
    ).links_ds


def _fixed_ivf_centroids(emb) -> np.ndarray | None:
    """16 SQL-derivable IVF centroids: the (non-null) embeddings of
    vec_id 100..115, ordered by vec_id.  Injecting these through the
    ``centroids=`` seam (the documented 100 TB train-on-a-sample path)
    makes the WHOLE ivf/ivfpq search machinery — assignment argmax,
    nprobe list selection, self-exclusion, exact scoring, (sim desc,
    neighbor_id) tie-break — value-checkable against a DuckDB oracle
    that derives the same centroids from the same table; k-means itself
    stays pytest-gated (tests/test_ivf.py recall vs brute force)."""
    head = emb.filter(expr="100 <= vec_id and vec_id <= 115").to_pandas()
    if len(head):
        head = head[head["embedding"].notna()]
    if len(head) == 0:  # degenerate fixture: fall back to learned centroids
        return None
    head = head.sort_values("vec_id")
    return np.stack(head["embedding"].to_numpy()).astype(np.float64)


def q_ivf_topk(sf_dir: str):
    """IVF approximate top-k (ann.ivf_topk): injected SQL-derivable
    centroids (see _fixed_ivf_centroids) + nprobe exact search.  The SQL
    oracle reproduces assignment, the 10 probed lists per query, and the
    exact top-3 within them — value-checking everything but k-means
    (pytest-gated in tests/test_ivf.py)."""
    from mismo_ray.ann import ivf_topk

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    head = emb.filter(expr="vec_id < 20").to_pandas()
    if len(head):  # null embeddings cannot be query vectors
        head = head[head["embedding"].notna()]
    if len(head) == 0:  # empty input: no query vectors, empty result
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
                "rk": pa.array([], pa.int64()),
            }
        )
    queries = np.stack(head["embedding"].to_numpy())
    qids = head["vec_id"].to_numpy()
    out = ivf_topk(
        emb,
        queries,
        k=3,
        n_centroids=16,
        nprobe=10,
        iters=5,
        centroids=_fixed_ivf_centroids(emb),
        id_column="vec_id",
        query_ids=qids,
    )
    return out.map_batches(
        lambda t: pa.table(
            {"query_id": t["query_id"], "neighbor_id": t["neighbor_id"], "rk": t["rank"]}
        ),
        batch_format="pyarrow",
    )


def q_ivfpq_topk(sf_dir: str):
    """IVFADC approximate top-k (ann.ivfpq_topk, Jegou et al. 2011):
    coarse k-means lists + product-quantized residual codes (m=8 uint8
    bytes/vector through the shuffle instead of 512 B of float64) + ADC
    lookup-table search + exact re-rank of the top candidates.  Injected
    SQL-derivable centroids (_fixed_ivf_centroids) + refine wider than any
    list make the output the EXACT top-3 within the probed lists, so the
    whole encode->ADC->refine->merge machinery is value-checked by the
    same restricted-exact-top-k oracle as ivf_topk; PQ quantization
    quality (partial refine) stays pytest-gated in tests/test_pq.py."""
    from mismo_ray.ann import ivfpq_topk

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    head = emb.filter(expr="vec_id < 20").to_pandas()
    if len(head):  # null embeddings cannot be query vectors
        head = head[head["embedding"].notna()]
    if len(head) == 0:  # empty input: no query vectors, empty result
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
                "rk": pa.array([], pa.int64()),
            }
        )
    queries = np.stack(head["embedding"].to_numpy())
    qids = head["vec_id"].to_numpy()
    out = ivfpq_topk(
        emb,
        queries,
        k=3,
        n_centroids=16,
        nprobe=10,
        m=8,
        ksub=64,
        # refine >= CORPUS size => wider than any list at every sf, so the
        # output is the exact restricted top-3 the oracle computes (a fixed
        # constant would silently break at a larger fixture)
        refine=max(2000, emb.count()),
        iters=5,
        centroids=_fixed_ivf_centroids(emb),
        id_column="vec_id",
        query_ids=qids,
    )
    return out.map_batches(
        lambda t: pa.table(
            {"query_id": t["query_id"], "neighbor_id": t["neighbor_id"], "rk": t["rank"]}
        ),
        batch_format="pyarrow",
    )


def q_dsir_sample(sf_dir: str):
    """DSIR importance resampling (textstats.fit_dsir / dsir_sample, Xie
    et al. 2023): target = the corpus's English docs, raw = everything;
    hashed unigram+bigram bucket models, per-doc log importance ratio,
    deterministic Gumbel top-k selection of 100 docs. Rows-only (the
    siphash bucket featurizer has no SQL expression); selection quality,
    determinism and partition invariance are pytest-gated in
    tests/test_dsir.py."""
    from mismo_ray.textstats import dsir_sample, fit_dsir

    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    target = docs.filter(expr="lang == 'en'")
    try:
        model = fit_dsir(target, docs, "text", buckets=4096)
    except ValueError:  # all-null/empty text or no English docs: no signal
        return pa.table({"doc_id": pa.array([], pa.int64())})
    out = dsir_sample(docs, model, "text", 100, id_column="doc_id", seed=3)
    return out.map_batches(lambda t: t.select(["doc_id"]), batch_format="pyarrow")


def q_fuzzy_dedupe(sf_dir: str):
    """Corpus-level fuzzy dedupe end to end (dedupe.fuzzy_dedupe): exact
    ngram-jaccard near-dup pairs -> connected components -> one canonical
    survivor (min doc_id) per duplicate cluster + member counts. Same corpus
    prep as ngram_jaccard (even doc_ids, text truncated to 80 chars) so the
    SQL oracle's gram join stays tractable; fully SQL-oracled (gram join +
    recursive-CTE components + survivor filter)."""
    from mismo_ray.dedupe import fuzzy_dedupe

    docs = _with_record_id(_read(sf_dir, "documents", ["doc_id", "text"]), "doc_id")

    def trunc(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"], dtype=np.int64)
        t = t.filter(pa.array(ids % 2 == 0))
        idx = t.schema.get_field_index("text")
        return t.set_column(
            idx, "text", pc.utf8_slice_codeunits(t["text"].combine_chunks(), 0, 80)
        )

    out = fuzzy_dedupe(
        docs.map_batches(trunc, batch_format="pyarrow"),
        "text",
        n=3,
        min_jaccard=0.8,
        max_pairs=None,
        with_counts=True,
    )
    return out.map_batches(
        lambda t: pa.table(
            {"keep_id": t["record_id"], "n_members": t["n_members"]}
        ),
        batch_format="pyarrow",
    )


def q_minhash_lsh_link(sf_dir: str):
    """Link task: cross-corpus near-dup between the even- and odd-doc_id
    halves of the documents table (rows-only check; hash-function op)."""
    from mismo_ray.dedupe import minhash_lsh_pairs

    docs = _with_record_id(_read(sf_dir, "documents", ["doc_id", "text"]), "doc_id")

    def half(parity: int):
        def fn(t: pa.Table) -> pa.Table:
            ids = np.asarray(t["doc_id"], dtype=np.int64)
            return t.filter(pa.array(ids % 2 == parity))

        return fn

    left = docs.map_batches(half(0), batch_format="pyarrow")
    right = docs.map_batches(half(1), batch_format="pyarrow")
    return minhash_lsh_pairs(
        left, "text", right=right, verify_jaccard=0.8
    ).links_ds


def q_simhash_pairs(sf_dir: str):
    """Simhash banding + exact-hamming verification (dedupe.simhash_pairs)
    over PRECOMPUTED signatures both engines can derive bit-exactly:
    sig(doc) = splitmix64(doc_id % 97 + 1) XOR low-bit prefix mask of
    min(doc_id // 97, 6) bits — so same-group replicas sit at exact known
    hamming distances and cross-group pairs are random 64-bit points.  The
    SQL oracle reproduces the signatures (same splitmix64 mixer as the
    hash_split oracle) and checks bit_count(xor()) <= 3 over all pairs —
    the banding/merge machinery is value-checked end to end.  The text
    simhash kernel itself is exercised rows-only by simhash_text below and
    bit-level by tests/test_dedupe.py."""
    from mismo_ray._util import splitmix64
    from mismo_ray.dedupe import simhash_pairs

    docs = _with_record_id(_read(sf_dir, "documents", ["doc_id"]), "doc_id")

    def add_sig(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"], dtype=np.int64)
        base = splitmix64((ids % 97 + 1).astype(np.uint64))
        nbits = np.minimum(ids // 97, 6).astype(np.uint64)
        mask = (np.uint64(1) << nbits) - np.uint64(1)
        return t.append_column(
            "sig", pa.array((base ^ mask).astype(np.int64))
        )

    keyed = docs.map_batches(add_sig, batch_format="pyarrow")
    return simhash_pairs(
        keyed, None, max_hamming=3, signature_column="sig"
    ).links_ds


def q_simhash_text(sf_dir: str):
    """The text-kernel flavor of simhash_pairs: char-shingle simhash of the
    document text, banded + hamming-verified. Rows-only (the siphash
    shingle fold has no SQL expression); kernel parity is pytest-gated."""
    from mismo_ray.dedupe import simhash_pairs

    docs = _with_record_id(_read(sf_dir, "documents", ["doc_id", "text"]), "doc_id")
    return simhash_pairs(docs, "text", max_hamming=3).links_ds


def _band_sig_batch(t: pa.Table) -> pa.Table:
    """The injected minhash signature scheme shared by q_minhash_band_pairs
    / q_minhash_band_link and their SQL oracles (via _BAND_SIG_Z0_SQL):
    component k of doc d is splitmix64((d % 97)*1000003 + k + 1) for
    k >= min(d//97, 5), else splitmix64(d*2654435761 + k*97 + 13)."""
    from mismo_ray._util import splitmix64

    ids = np.asarray(t["doc_id"], dtype=np.int64).astype(np.uint64)
    k = np.arange(16, dtype=np.uint64)
    with np.errstate(over="ignore"):
        noise_n = np.minimum(ids // np.uint64(97), np.uint64(5))
        grp = (
            (ids % np.uint64(97))[:, None] * np.uint64(1000003)
            + k[None, :]
            + np.uint64(1)
        )
        nz = (
            ids[:, None] * np.uint64(2654435761)
            + k[None, :] * np.uint64(97)
            + np.uint64(13)
        )
        z0 = np.where(k[None, :] >= noise_n[:, None], grp, nz)
        sig = splitmix64(z0.reshape(-1)).reshape(z0.shape).astype(np.int64)
    return t.append_column(
        "sig", pa.array(sig.tolist(), type=pa.list_(pa.int64(), 16))
    )


def q_simhash_charhash(sf_dir: str):
    """Simhash of the REAL document text, value-checked end to end: the
    charhash kernel (dedupe.simhash64_charhash_batch — rolling polynomial
    hash over utf-32 codepoints, splitmix-finalized, 64-bit majority) is
    pure modular arithmetic, so the SQL oracle reproduces every signature
    bit-exactly (polynomial via HUGEINT hi/lo modmuls, the splitmix
    ladder, bit-majority via a (doc, bit) unnest) and checks
    bit_count(xor()) <= 3 over all pairs.  This closes the one kernel
    family the earlier oracles could not reach: simhash_pairs /
    simhash_text use the siphash fold (no SQL expression, rows-only);
    q_simhash_pairs value-checks banding over INJECTED signatures; here
    the text -> signature computation itself is value-checked.  Docs
    shorter than the shingle width are excluded on both sides (the
    whole-string fallback hash has a different power series per length)."""
    from mismo_ray.dedupe import simhash64_charhash_batch, simhash_pairs

    W = 6  # shingle width: keep filter, kernel, and oracle w= must agree

    docs = _with_record_id(
        _read(sf_dir, "documents", ["doc_id", "text"]), "doc_id"
    )

    def add_sig(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        keep = np.array(
            [s is not None and len(s) >= W for s in texts], dtype=bool
        )
        t = t.filter(pa.array(keep))
        sigs = simhash64_charhash_batch(
            [s for s, k in zip(texts, keep) if k], shingle_w=W, seed=7
        )
        return t.append_column("sig", pa.array(sigs, type=pa.int64()))

    keyed = docs.map_batches(add_sig, batch_format="pyarrow")
    return simhash_pairs(
        keyed, None, max_hamming=3, signature_column="sig"
    ).links_ds


def q_minhash_band_pairs(sf_dir: str):
    """MinHash-LSH banding + estimated-jaccard verification
    (dedupe.minhash_lsh_pairs) over PRECOMPUTED signatures both engines
    derive bit-exactly — the minhash sibling of q_simhash_pairs.  Component
    k of doc d's 16-long signature is

        splitmix64((d % 97) * 1000003 + k + 1)      for k >= min(d//97, 5)
        splitmix64(d * 2654435761 + k*97 + 13)      otherwise

    so the replicas of group d % 97 always agree on the last 16 -
    min(d//97, 5) components (sharing at least the last 5 of 8 two-wide
    bands -> every within-group pair is a band-collision candidate) while
    the doc-specific noisy prefix pushes pairs that involve late replicas
    below the 0.75 est-jaccard accept bar (>= 12 of 16 agreeing
    components).  The SQL oracle rebuilds the signatures with the same
    splitmix64 mixer, re-derives candidates from two-wide band-key
    equality, and re-counts component agreement — value-checking the whole
    band-explode / pair-gen / multi-band-duplicate-drop / est-verify
    machinery.  The text shingling path stays covered rows-only by
    minhash_lsh_dedupe/link and bit-level by tests/test_dedupe.py."""
    from mismo_ray.dedupe import minhash_lsh_pairs

    docs = _with_record_id(_read(sf_dir, "documents", ["doc_id"]), "doc_id")
    keyed = docs.map_batches(_band_sig_batch, batch_format="pyarrow")
    return minhash_lsh_pairs(
        keyed,
        None,
        signature_column="sig",
        num_hashes=16,
        n_bands=8,
        verify_jaccard=0.75,
        verify_mode="est",
    ).links_ds


def q_minhash_band_link(sf_dir: str):
    """The LINK-task flavor of q_minhash_band_pairs: the same injected
    splitmix64 signatures, but the corpus is split into even/odd doc_id
    halves and banded CROSS-corpus (minhash_lsh_pairs right=...), so the
    link-mode pair generation — cross-side-only band collisions, no
    in-corpus pairs, no l<r canonicalization — is what gets value-checked.
    The oracle re-derives band-key equality between the two halves and the
    >= 12-of-16 component-agreement accept."""
    from mismo_ray.dedupe import minhash_lsh_pairs

    docs = _with_record_id(_read(sf_dir, "documents", ["doc_id"]), "doc_id")
    # materialize the NARROW sketch table (id + 136 B sig) once: the two
    # parity branches below would otherwise each re-execute the read +
    # signature chain (Ray Data does not cache shared un-materialized
    # lineage across branches)
    keyed = docs.map_batches(_band_sig_batch, batch_format="pyarrow").materialize()

    def half(parity: int):
        def fn(t: pa.Table) -> pa.Table:
            ids = np.asarray(t["doc_id"], dtype=np.int64)
            return t.filter(pa.array(ids % 2 == parity))

        return fn

    left = keyed.map_batches(half(0), batch_format="pyarrow")
    right = keyed.map_batches(half(1), batch_format="pyarrow")
    return minhash_lsh_pairs(
        left,
        None,
        right=right,
        signature_column="sig",
        num_hashes=16,
        n_bands=8,
        verify_jaccard=0.75,
        verify_mode="est",
    ).links_ds


def q_mmr_select(sf_dir: str):
    """MMR diverse top-k (ann.mmr_select): greedy maximal-marginal-
    relevance selection of 8 items from the top-50 relevance pool around
    the query vector (= embedding of vec_id 0), lambda = 0.5.  The SQL
    oracle replays the EXACT greedy chain as 8 unrolled CTE steps —
    argmax of 0.5*rel - 0.5*max-sim-to-selected over the remaining pool,
    ties to min id — over DOUBLE-cast embeddings, which match the
    engine's float64 kernels to ~1e-16 (verified; the pool's relevance
    margins are >= 1e-6, so the argmax chain is engine-stable; both
    sides round scores to 12 decimals so TRUE ties — not float noise —
    fall to the min-id rule).  The query row itself is excluded from the
    candidates (with it included every step-1 score is identically zero:
    rel == sim-to-selected).  Output is integer-only (rank, vec_id)."""
    from mismo_ray.ann import mmr_select

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    qrow = emb.filter(expr="vec_id == 0").take(1)
    unusable = (
        not qrow
        or qrow[0]["embedding"] is None
        or not float(np.linalg.norm(np.asarray(qrow[0]["embedding"]))) > 0
    )
    if unusable:
        # empty / all-null / zero-norm query -> empty selection (the
        # oracle's isfinite(rel) pool filter yields the same empty chain)
        return ray.data.from_arrow(
            pa.table(
                {
                    "rank": pa.array([], type=pa.int64()),
                    "vec_id": pa.array([], type=pa.int64()),
                }
            )
        )
    out = mmr_select(
        emb.filter(expr="vec_id != 0"),
        qrow[0]["embedding"],
        k=8,
        pool_n=50,
        lambda_=0.5,
    )
    return ray.data.from_arrow(out)


def q_kcenter_select(sf_dir: str):
    """Greedy k-center / farthest-point diverse selection
    (ann.kcenter_select), the query-free sibling of mmr_select: candidate
    pool = the 50 smallest splitmix64(vec_id) ranks (a pure (id, seed)
    function both engines reproduce exactly), first pick = the pool's min
    id, then each pick minimizes the (12-decimal-rounded) max cosine to
    the selected set, ties to min id.  The SQL oracle rebuilds the ranks
    with the splitmix ladder and replays the greedy chain as unrolled
    MATERIALIZED CTE steps (ORDER BY score ASC); zero-norm embeddings are
    excluded on both sides (numpy: nan norm filter; SQL: self-cosine > 0
    — DuckDB yields -1.0 for the zero vector)."""
    from mismo_ray.ann import kcenter_select

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = kcenter_select(emb, k=8, pool_n=50, seed=0)
    return ray.data.from_arrow(out)


def q_chunk_documents(sf_dir: str):
    """Overlapping token-window chunking (textstats.chunk_documents): every
    document becomes ceil-many 16-token windows with 4 shared tokens
    between consecutive chunks, chunk text rejoined with single spaces.
    The SQL oracle re-derives every window with list slicing over the
    whitespace token array — doc ids, chunk ids, rebuilt chunk text and
    token counts all value-checked byte-exactly."""
    from mismo_ray.textstats import chunk_documents

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return chunk_documents(docs, "text", max_tokens=16, overlap=4)


def q_chunk_sentences(sf_dir: str):
    """Sentence-window chunking (chunk_documents(unit="sentence")): the
    word-list corpus is made multi-sentence by the SQL-reproducible
    literal rewrite ' value ' -> '. ' (both engines: left-to-right
    non-overlapping replace), then every document becomes 3-sentence
    windows sharing 1 sentence.  The oracle replays the marker-replace
    boundary rule (regexp_replace '([.!?])[\\t\\n\\f\\r ]+' -> '\\1'||chr(31),
    split, drop empties — the whitespace class is explicit ASCII because
    python \\s is Unicode-wide while RE2's is not, and RE2 has no
    lookbehind, so the marker IS the engine-independent sentence
    definition) and rebuilds every window."""
    from mismo_ray.textstats import chunk_documents

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def synth(t: pa.Table) -> pa.Table:
        import pandas as pd

        texts = pd.Series(t["text"].to_pylist(), dtype="object")
        out = texts.str.replace(" value ", ". ", regex=False)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "text": pa.array(out, type=pa.string()),
            }
        )

    ds2 = docs.map_batches(synth, batch_format="pyarrow")
    return chunk_documents(
        ds2,
        "text",
        max_tokens=3,
        overlap=1,
        unit="sentence",
        n_tokens_name="n_units",
    )


def q_lang_id(sf_dir: str):
    """Heuristic language ID (textstats.add_lang_id / LangId actor pool).
    SQL-oracled on this corpus: the synthetic documents are pure-ASCII, so
    the codepoint-range script detector can never fire (no codepoint >=
    0x80 exists) and the decision reduces to the marker-token argmax —
    count of per-language marker tokens, ties broken by marker-dict order,
    'und' when nothing matches — which the oracle replays with an unnest +
    marker-table join + window argmax over the IDENTICAL marker lists.
    The script-range path is pytest-gated (tests/test_crawl_pipeline.py,
    tests/test_adversarial_text.py)."""
    from mismo_ray.textstats import add_lang_id

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    # tiny corpus: a small explicit pool beats the corpus-scale CPUs-2
    # default (30 actors of startup for a few thousand rows)
    return add_lang_id(docs, concurrency=4).select_columns(["doc_id", "lang_pred"])


def q_repetition_stats(sf_dir: str):
    """Gopher-style repetition signals (textstats.add_repetition_stats):
    top-{2,3}-gram mass and duplicated-{2,3}-gram coverage per document.
    dup_ns=(2,3) here because the synthetic corpus's ~20-word vocabulary
    makes 5..10-grams (the library defaults) never repeat; integer char
    counts only so the oracle is exact."""
    from mismo_ray.textstats import add_repetition_stats

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    out = add_repetition_stats(docs, "text", top_ns=(2, 3), dup_ns=(2, 3))
    return out.select_columns(
        [
            "doc_id",
            "n_words",
            "word_chars",
            "top2gram_chars",
            "top3gram_chars",
            "dup2gram_chars",
            "dup3gram_chars",
        ]
    )


def q_fuzzy_dedupe_best(sf_dir: str):
    """fuzzy_dedupe with quality-based survivor selection: same near-dup
    clusters as q_fuzzy_dedupe, but the survivor is the LONGEST member
    (keep=("max", n80), ties to min doc_id) instead of the min-id member —
    the curation-grade choice. Oracle re-derives the clusters and picks the
    same argmax via a window function."""
    from mismo_ray.dedupe import fuzzy_dedupe

    docs = _with_record_id(_read(sf_dir, "documents", ["doc_id", "text"]), "doc_id")

    def trunc(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"], dtype=np.int64)
        t = t.filter(pa.array(ids % 2 == 0))
        idx = t.schema.get_field_index("text")
        txt = pc.utf8_slice_codeunits(t["text"].combine_chunks(), 0, 80)
        t = t.set_column(idx, "text", txt)
        n80 = pc.fill_null(pc.utf8_length(txt).cast(pa.int64()), 0)
        return t.append_column("n80", n80)

    out = fuzzy_dedupe(
        docs.map_batches(trunc, batch_format="pyarrow"),
        "text",
        n=3,
        min_jaccard=0.8,
        max_pairs=None,
        with_counts=True,
        keep=("max", "n80"),
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "keep_id": t["record_id"],
                "n80": t["n80"],
                "n_members": t["n_members"],
            }
        ),
        batch_format="pyarrow",
    )


def q_ccnet_buckets(sf_dir: str):
    """CCNet head/middle/tail corpus split: self-trained bigram-LM
    perplexity per doc (as lm_perplexity), quantized to e6 ints, then
    bucketed at the EXACT global terciles via the distributed quantiles op
    (quantile_disc semantics — boundaries are actual data values).
    Quantizing before bucketing makes the cut decision integer-exact on
    both engines (see perplexity_buckets tie note)."""
    from mismo_ray.textstats import add_perplexity, perplexity_buckets, train_bigram_lm

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    lm = train_bigram_lm(docs, "text")
    scored = add_perplexity(docs, lm, "text", concurrency=4).filter(
        expr="n_scored > 0"
    )

    def quantize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "lgq_e6": _e6(np.asarray(t["logppl"], dtype=np.float64)),
            }
        )

    quantized = scored.map_batches(quantize, batch_format="pyarrow").materialize()
    return perplexity_buckets(quantized, "lgq_e6").map_batches(
        lambda t: pa.table(
            {"doc_id": t["doc_id"], "bucket": t["ppl_bucket"]}
        ),
        batch_format="pyarrow",
    )


def q_dedupe_report(sf_dir: str):
    """Duplicate-cluster size distribution + savings (dedupe.dedupe_report):
    per cluster size, how many clusters, how many docs a min-id dedupe
    removes and how many chars that saves. Same corpus prep and clusters
    as fuzzy_dedupe; oracle re-derives sizes and survivor chars via the
    recursive-CTE components."""
    from mismo_ray.dedupe import dedupe_report

    docs = _with_record_id(_read(sf_dir, "documents", ["doc_id", "text"]), "doc_id")

    def trunc(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"], dtype=np.int64)
        t = t.filter(pa.array(ids % 2 == 0))
        idx = t.schema.get_field_index("text")
        return t.set_column(
            idx, "text", pc.utf8_slice_codeunits(t["text"].combine_chunks(), 0, 80)
        )

    out = dedupe_report(
        docs.map_batches(trunc, batch_format="pyarrow"),
        "text",
        n=3,
        min_jaccard=0.8,
        max_pairs=None,
    )
    return out.select_columns(
        ["cluster_size", "n_clusters", "n_dup_docs", "dup_chars"]
    )


def q_cap_per_host(sf_dir: str):
    """Per-host quota sampling (util_ops.stratified_sample): keep a
    deterministic cap of 10 docs per source, chosen by splitmix64(doc_id)
    order — the standard crawl-curation move (bound any one host's share of
    the corpus) as one bucketed shuffle. Bit-exact against the SQL window
    oracle because integer ids rank by the SQL-reproducible mixer."""
    from mismo_ray.util_ops import stratified_sample

    docs = _read(sf_dir, "documents", ["doc_id", "source"])
    out = stratified_sample(docs, "source", 10, id_column="doc_id", seed=0)
    return out.select_columns(["doc_id", "source"])


def q_token_budget(sf_dir: str):
    """Per-source WEIGHT-budget cap (util_ops.budget_per_group): training
    mixtures are specified in tokens, not documents — keep, per source, the
    longest splitmix64(doc_id)-rank prefix whose cumulative char count stays
    <= 2000 (prefix semantics: the overflowing row and everything after it
    drop). Bit-exact against the SQL running-sum window over the identical
    integer mixer."""
    from mismo_ray.util_ops import budget_per_group

    docs = _read(sf_dir, "documents", ["doc_id", "source", "text"])

    def add_w(t: pa.Table) -> pa.Table:
        w = pc.fill_null(pc.utf8_length(t["text"]), 0).cast(pa.int64())
        return pa.table(
            {"doc_id": t["doc_id"], "source": t["source"], "n_chars": w}
        )

    wds = docs.map_batches(add_w, batch_format="pyarrow")
    out = budget_per_group(
        wds, "source", 2000, "n_chars", id_column="doc_id", seed=0
    )
    return out.select_columns(["doc_id", "source", "n_chars"])


def q_gopher_quality(sf_dir: str):
    """Gopher quality rules (textstats.add_gopher_stats +
    gopher_quality_filter label_only): the canonical webtext document
    filter, every signal an integer count and every ratio rule an integer
    cross-multiplication — the oracle reproduces all nine counts and the
    keep verdict bit-exactly. (Tokenization here is ASCII-whitespace;
    the synthetic corpus is ASCII. Thresholds loosened to min_words=30 /
    min_stop_words=1 so the verdict varies on this corpus — its ~20-word
    database vocabulary contains only 'the' from the Gopher 8-list.)"""
    from mismo_ray.textstats import gopher_quality_filter

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    out = gopher_quality_filter(
        docs, "text", label_only=True, min_words=30, min_stop_words=1
    )
    return out.select_columns(
        [
            "doc_id",
            "n_words",
            "word_chars",
            "n_alpha_words",
            "n_stop8",
            "n_hash",
            "n_ellipsis",
            "n_lines",
            "n_bullet_lines",
            "n_ellipsis_end_lines",
            "gopher_keep",
        ]
    )


def q_c4_clean(sf_dir: str):
    """C4 line-level cleaning (textstats.c4_clean): terminal punctuation +
    min-words + javascript line rules, lorem-ipsum/'{' document rules,
    kept lines rejoined byte-exactly. Synthesized multi-line docs exercise
    every rule; oracle re-derives the full rewritten text."""
    from mismo_ray.textstats import c4_clean

    docs = _read(sf_dir, "documents", ["doc_id"])

    def synth(t: pa.Table) -> pa.Table:
        import pandas as pd

        did = np.asarray(t["doc_id"], dtype=np.int64)
        ds_ = pd.Series(did).astype(str)
        body = (
            "This is sentence number " + ds_ + ".\n"
            + "too short.\n"
            + "Please enable javascript now please.\n"
            + "Another good line with words!\n"
            + "no terminal punctuation here\n"
            + 'And a "quoted finale" number ' + pd.Series(did % 9).astype(str) + " works?"
        )
        body = body.where(pd.Series(did % 7 != 0), body + "\ncode { block.")
        body = body.where(
            pd.Series(did % 11 != 3), body + "\nSome Lorem Ipsum filler text."
        )
        return pa.table(
            {"doc_id": t["doc_id"], "text": pa.array(body, type=pa.string())}
        )

    pages = docs.map_batches(synth, batch_format="pyarrow")
    out = c4_clean(pages, "text")
    return out.select_columns(["doc_id", "text"])


def q_lm_perplexity(sf_dir: str):
    """CCNet-style LM quality scoring (textstats.train_bigram_lm +
    add_perplexity): fit an add-1 bigram LM on the documents corpus
    distributed (map-side partial counts, one vocab-sized shuffle), then
    score every doc's per-token log-perplexity through the broadcast model
    in an actor pool. Self-trained so the oracle can re-derive the exact
    counts; docs with < 2 tokens (no scorable pair) are filtered, matching
    the oracle's inner joins."""
    from mismo_ray.textstats import add_perplexity, train_bigram_lm

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    lm = train_bigram_lm(docs, "text")
    out = add_perplexity(docs, lm, "text", concurrency=4)  # tiny corpus
    out = out.filter(expr="n_scored > 0")

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_scored": t["n_scored"],
                "logppl_e6": _e6(np.asarray(t["logppl"], dtype=np.float64)),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def q_substring_dedupe(sf_dir: str):
    """Span-level exact-substring dedup (dedupe.substring_dup_stats): docs
    sharing any exact 40-char word-anchored window with >=2 distinct docs,
    with merged duplicated-span coverage. Integer columns only (dup_frac is
    dup_chars/doc_len, recomputable); oracle enumerates the same anchored
    windows by VALUE (the operator groups by a 128-bit content hash —
    identical results short of a hash collision, same as exact_dedupe)."""
    from mismo_ray.dedupe import substring_dup_stats

    docs = _with_record_id(_read(sf_dir, "documents", ["doc_id", "text"]), "doc_id")
    out = substring_dup_stats(docs, "text", window=40, min_docs=2)

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["record_id"],
                "doc_len": t["doc_len"],
                "n_dup_windows": t["n_dup_windows"],
                "dup_chars": t["dup_chars"],
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def q_substring_spans(sf_dir: str):
    """Merged duplicated-span intervals (dedupe.substring_dup_spans): one
    row per maximal run of overlapping duplicated 40-char anchored windows,
    0-indexed [span_start, span_end). Oracle merges the same by-VALUE window
    hits with a gaps-and-islands window function."""
    from mismo_ray.dedupe import substring_dup_spans

    docs = _with_record_id(_read(sf_dir, "documents", ["doc_id", "text"]), "doc_id")
    out = substring_dup_spans(docs, "text", window=40, min_docs=2)

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["record_id"],
                "span_start": t["span_start"],
                "span_end": t["span_end"],
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def q_substring_strip(sf_dir: str):
    """End-to-end boilerplate removal (substring_dup_spans +
    strip_dup_spans): duplicated spans cut out of the text, surviving
    fragments stripped and re-joined with a single space; docs without
    spans pass through byte-identical. Oracle reconstructs the fragments
    with lag()-windowed substrings."""
    from mismo_ray.dedupe import strip_dup_spans, substring_dup_spans

    docs = _with_record_id(_read(sf_dir, "documents", ["doc_id", "text"]), "doc_id")
    spans = substring_dup_spans(docs, "text", window=40, min_docs=2)
    out = strip_dup_spans(docs, spans, "text", out_column="text_clean")

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["record_id"], "text_clean": t["text_clean"]})

    return out.map_batches(finish, batch_format="pyarrow")


def _lined_documents(sf_dir: str):
    """documents with deterministic line structure: the synthetic corpus is
    single-line, so every occurrence of the word 'value' becomes a line
    break (vectorized replace; the SQL oracle applies the identical
    replace() — both scan left-to-right, non-overlapping)."""
    docs = _with_record_id(_read(sf_dir, "documents", ["doc_id", "text"]), "doc_id")

    def to_lines(t: pa.Table) -> pa.Table:
        lined = pc.replace_substring(
            t["text"].combine_chunks(), pattern=" value ", replacement="\n"
        )
        return pa.table({"record_id": t["record_id"], "text": lined})

    return docs.map_batches(to_lines, batch_format="pyarrow")


def q_dup_line_stats(sf_dir: str):
    """C4-style duplicated-line detection (dedupe.dup_line_stats) over the
    derived lined corpus: lines whose exact content occurs in >= 2 distinct
    docs, counted per doc."""
    from mismo_ray.dedupe import dup_line_stats

    out = dup_line_stats(_lined_documents(sf_dir), "text", min_docs=2)

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["record_id"],
                "n_dup_lines": t["n_dup_lines"],
                "dup_line_chars": t["dup_line_chars"],
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def q_drop_dup_lines(sf_dir: str):
    """C4-style duplicated-line removal (dedupe.drop_dup_lines) over the
    derived lined corpus: every occurrence of a cross-doc duplicated line
    dropped, remaining lines rejoined in order. Oracle anti-joins the
    duplicated-line set and string_agg-reconstructs per doc."""
    from mismo_ray.dedupe import drop_dup_lines

    out = drop_dup_lines(
        _lined_documents(sf_dir), "text", min_docs=2, out_column="text_clean"
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["record_id"], "text_clean": t["text_clean"]})

    return out.map_batches(finish, batch_format="pyarrow")


def q_drop_dup_lines_domain(sf_dir: str):
    """Domain-scoped (RefinedWeb-style) duplicated-line removal: the same
    line repeated across docs of the SAME source/domain is boilerplate and
    is dropped; the identical line on a different domain is kept. Exercises
    ``drop_dup_lines(scope_column=...)`` — scope hash mixed into the line
    keys, zero extra shuffle payload. Oracle groups the duplicated-line set
    by (source, line)."""
    from mismo_ray.dedupe import drop_dup_lines

    docs = _read(sf_dir, "documents", ["doc_id", "text", "source"])

    def to_lines(t: pa.Table) -> pa.Table:
        lined = pc.replace_substring(
            t["text"].combine_chunks(), pattern=" value ", replacement="\n"
        )
        return pa.table(
            {"record_id": t["doc_id"], "text": lined, "source": t["source"]}
        )

    lined = docs.map_batches(to_lines, batch_format="pyarrow")
    out = drop_dup_lines(
        lined, "text", min_docs=2, out_column="text_clean", scope_column="source"
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["record_id"], "text_clean": t["text_clean"]})

    return out.map_batches(finish, batch_format="pyarrow")


def q_extract_links(sf_dir: str):
    """href extraction + URL resolution (webgraph.extract_links) over
    deterministically synthesized page html: per doc an absolute link, a
    root-relative link, and a rotating third (protocol-relative / relative
    with fragment / mailto), plus one unterminated href that must be
    dropped. Oracle: unnest(regexp_extract_all(html, 'href=\"([^\"]*)\"'))
    + the same CASE resolution rules."""
    from mismo_ray.webgraph import extract_links

    docs = _read(sf_dir, "documents", ["doc_id", "lang", "source"])

    def synth(t: pa.Table) -> pa.Table:
        import pandas as pd

        did = np.asarray(t["doc_id"], dtype=np.int64)
        lang = pd.Series(t["lang"].to_pylist(), dtype="object").fillna("xx")
        source = pd.Series(t["source"].to_pylist(), dtype="object").fillna("s")
        url = "https://" + source + ".example.org/" + lang + "/idx/" + pd.Series(did).astype(str)
        third = pd.Series(
            np.select(
                [did % 3 == 0, did % 3 == 1],
                ["//cdn.example.net/lib.js", "mailto:spam@example.com"],
                default="",
            )
        )
        third = third.where(third != "", "rel/" + pd.Series(did % 9).astype(str) + "#frag")
        html = (
            '<html><body><a href="https://'
            + source
            + ".example.com/p/"
            + pd.Series(did).astype(str)
            + '">a</a><p>text</p><a href="/local/'
            + pd.Series(did % 7).astype(str)
            + '">b</a><a href="'
            + third
            + '">c</a><a href="broken'
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "url": pa.array(url, type=pa.string()),
                "html": pa.array(html, type=pa.string()).cast(pa.binary()),
            }
        )

    pages = docs.map_batches(synth, batch_format="pyarrow")
    out = extract_links(pages, keep_columns=["doc_id"])
    return out.map_batches(
        lambda t: t.select(["doc_id", "href", "link_url", "link_host"]),
        batch_format="pyarrow",
    )


def _synth_anchor_pages(t: pa.Table) -> pa.Table:
    """Deterministic anchor-test pages, shared by q_extract_anchors and
    q_anchor_stats (and mirrored by _ANCHOR_BASE_SQL): a plain anchor, a
    nested-markup anchor (null), an attribute-bearing tag, an unterminated
    href (dropped)."""
    import pandas as pd

    did = np.asarray(t["doc_id"], dtype=np.int64)
    ds_ = pd.Series(did).astype(str)
    html = (
        '<a href="https://ex.com/p/' + ds_ + '">a'
        + pd.Series(did % 5).astype(str)
        + '</a><a href="/local/' + pd.Series(did % 7).astype(str)
        + '"><b>bold</b></a>'
        + '<a href="/plain/' + pd.Series(did % 3).astype(str)
        + '" class="x">text here</a><a href="broken'
    )
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "url": pa.array("https://ex.com/p/" + ds_, type=pa.string()),
            "html": pa.array(html, type=pa.string()).cast(pa.binary()),
        }
    )


def q_html_text(sf_dir: str):
    """Generic html -> text (lib.html.add_text_from_html): tag strip +
    common-entity decode (&amp; last) + whitespace collapse, on the shared
    anchor-pages synthesis plus injected entities. Oracle chains the same
    regexp_replace / replace calls in the same order."""
    from mismo_ray.lib.html import add_text_from_html

    docs = _read(sf_dir, "documents", ["doc_id"])
    pages = docs.map_batches(_synth_anchor_pages, batch_format="pyarrow")

    def add_entities(t: pa.Table) -> pa.Table:
        import pandas as pd

        did = np.asarray(t["doc_id"], dtype=np.int64)
        extra = pd.Series(
            np.where(
                did % 2 == 0,
                " Fish &amp; Chips &lt;tag&gt; &amp;lt;keep&amp;gt; &nbsp;end",
                "  plain   spaced\ttext ",
            )
        )
        html = pd.Series(
            t["html"].combine_chunks().cast(pa.string()).to_pylist(), dtype="object"
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "html": pa.array(html + extra, type=pa.string()),
            }
        )

    out = add_text_from_html(
        pages.map_batches(add_entities, batch_format="pyarrow")
    )
    return out.select_columns(["doc_id", "text"])


def q_extract_anchors(sf_dir: str):
    """Anchor-text extraction (webgraph.extract_links with_anchor=True):
    per href occurrence the visible link text — valid only as a plain
    non-'<' run terminated by a literal '</a>' (nested markup -> null, the
    link row survives). Oracle mirrors the split semantics 1:1 with string
    functions (string_split + strpos + substr)."""
    from mismo_ray.webgraph import extract_links

    docs = _read(sf_dir, "documents", ["doc_id"])
    pages = docs.map_batches(_synth_anchor_pages, batch_format="pyarrow")
    out = extract_links(
        pages, resolve=False, keep_columns=["doc_id"], with_anchor=True
    )
    return out.select_columns(["doc_id", "href", "anchor"])


def q_registered_domain(sf_dir: str):
    """eTLD+1 extraction (lib.url.add_registered_domain): hosts rotating
    through plain TLDs, listed 2-label public suffixes (co.uk/com.au),
    deep subdomains, bare suffix hosts, single labels and IPv4 literals.
    Oracle mirrors the label-slice rules with string_split + CASE."""
    from mismo_ray.lib.url import add_registered_domain

    docs = _read(sf_dir, "documents", ["doc_id"])

    def synth(t: pa.Table) -> pa.Table:
        import pandas as pd

        did = np.asarray(t["doc_id"], dtype=np.int64)
        ds_ = pd.Series(did % 7).astype(str)
        host = pd.Series(
            np.select(
                [did % 6 == 0, did % 6 == 1, did % 6 == 2, did % 6 == 3, did % 6 == 4],
                [
                    "www.site" + ds_ + ".example.com",
                    "blog.site" + ds_ + ".co.uk",
                    "a.b.site" + ds_ + ".com.au",
                    "10.0.0." + ds_,
                    "localhost",
                ],
                default="site" + ds_ + ".org",
            )
        )
        return pa.table(
            {"doc_id": t["doc_id"], "host": pa.array(host, type=pa.string())}
        )

    hosts = docs.map_batches(synth, batch_format="pyarrow")
    out = add_registered_domain(hosts)
    return out.select_columns(["doc_id", "host", "domain"])


def q_blocked_hosts(sf_dir: str):
    """URL blocklist gate (lib.url.drop_blocked_hosts): drop docs whose
    host (or any parent domain — UT1 subdomain semantics) is on the list.
    Synthesis rotates hosts h0..h9.example.com plus a nested
    sub.h3.example.com (caught via its parent); blocklist = h3/h7."""
    from mismo_ray.lib.url import drop_blocked_hosts

    docs = _read(sf_dir, "documents", ["doc_id"])

    def synth(t: pa.Table) -> pa.Table:
        import pandas as pd

        did = np.asarray(t["doc_id"], dtype=np.int64)
        host = "h" + pd.Series(did % 10).astype(str) + ".example.com"
        host = host.where(did % 4 != 0, "sub.h" + pd.Series(did % 10).astype(str) + ".example.com")
        url = "https://" + host + "/p/" + pd.Series(did).astype(str)
        return pa.table(
            {"doc_id": t["doc_id"], "url": pa.array(url, type=pa.string())}
        )

    pages = docs.map_batches(synth, batch_format="pyarrow")
    out = drop_blocked_hosts(
        pages, ["h3.example.com", "h7.example.com"], id_column="doc_id"
    )
    return out.select_columns(["doc_id", "url"])


def q_robots_filter(sf_dir: str):
    """Crawl-politeness gate (lib.robots.apply_robots): drop pages a
    polite '*' crawler may not fetch, per-host robots.txt with RFC 9309
    longest-match semantics. Hosts rotate h0..h4.example.com; paths rotate
    /ok/, /private/, /private/open/, /logs/N.(log|txt). Robots bodies
    exercise: longest-match Allow overriding a shorter Disallow (h0),
    block-all (h1), historical empty-Disallow allow-all (h2), a wildcard
    '*.log' rule plus a non-'*' agent group that must be IGNORED (h3),
    and a host with no robots at all (h4). The SQL oracle re-derives every
    verdict with LIKE prefix/wildcard algebra over the identical
    synthesized urls."""
    from mismo_ray.lib.robots import apply_robots

    docs = _read(sf_dir, "documents", ["doc_id"])

    def synth(t: pa.Table) -> pa.Table:
        import pandas as pd

        did = np.asarray(t["doc_id"], dtype=np.int64)
        host = "h" + pd.Series(did % 5).astype(str) + ".example.com"
        sdid = pd.Series(did).astype(str)
        # (did // 4) parity, NOT did parity: the /logs/ class requires
        # did % 4 == 3 (odd), so a did-parity extension would make every
        # /logs/ path '.log' and leave the wildcard rule with no allowed
        # counter-case in either engine or oracle
        ext = pd.Series(np.where((did // 4) % 2 == 1, "log", "txt"))
        path = pd.Series(np.select(
            [did % 4 == 0, did % 4 == 1, did % 4 == 2],
            ["/ok/" + sdid, "/private/" + sdid, "/private/open/" + sdid],
            default="/logs/" + sdid + "." + ext,
        ))
        url = "https://" + host + path
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "url": pa.array(url, type=pa.string()),
            }
        )

    pages = docs.map_batches(synth, batch_format="pyarrow")
    robots = {
        "h0.example.com": (
            "User-agent: *\nDisallow: /private/\nAllow: /private/open\n"
        ),
        "h1.example.com": "User-agent: *\nDisallow: /\n",
        "h2.example.com": "User-agent: *\nDisallow:\n",
        "h3.example.com": (
            "User-agent: mybot\nDisallow: /\n\n"
            "User-agent: *\nDisallow: /logs/*.log\n"
        ),
        # h4: no robots entry -> everything allowed
    }
    out = apply_robots(pages, robots, id_column="doc_id")
    return out.select_columns(["doc_id", "url"])


def q_anchor_stats(sf_dir: str):
    """Inbound anchor-text profile per link target (webgraph.anchor_stats):
    n_links / n_anchored / most-frequent anchor with deterministic ties.
    Same synthesized pages as extract_anchors; targets exercise unique
    URLs (n=1), shared null-anchor targets (top_anchor null) and shared
    real-anchor targets."""
    from mismo_ray.webgraph import anchor_stats, extract_links

    docs = _read(sf_dir, "documents", ["doc_id"])
    pages = docs.map_batches(_synth_anchor_pages, batch_format="pyarrow")
    links = extract_links(pages, resolve=False, with_anchor=True)
    out = anchor_stats(links, target_column="href")
    return out.select_columns(
        ["href", "n_links", "n_anchored", "top_anchor", "top_anchor_count"]
    )


def q_host_stats(sf_dir: str):
    """Per-host curation table (the RefinedWeb/CCNet-style host prior):
    compose URL parsing + token stats + a two-level distinct count into
    (host, n_pages, n_distinct_texts, n_tokens_sum, n_chars_sum). The
    distinct-text count goes through a 128-bit content hash (two seeded
    hash64s) so only 16 B/doc crosses the extra shuffle — the 100 TB path;
    the SQL oracle counts DISTINCT text directly (collision probability
    ~n^2/2^129, negligible)."""
    from ray.data.aggregate import Count, Sum

    from mismo_ray._joins import distinct
    from mismo_ray._util import hash64
    from mismo_ray.lib.url import add_url_parts
    from mismo_ray.textstats import add_token_stats

    docs = _read(sf_dir, "documents", ["doc_id", "text", "source"])

    def synth(t: pa.Table) -> pa.Table:
        import pandas as pd

        did_s = pd.Series(np.asarray(t["doc_id"], dtype=np.int64)).astype(str)
        # fill null source: a null url would make the groupby key (host)
        # null, and Ray's sort-based groupby boundary sampling compares
        # group keys in python where None is unordered
        source = pd.Series(t["source"].to_pylist(), dtype="object").fillna("")
        url = "https://" + source + ".example.org/d/" + did_s
        return pa.table(
            {"url": pa.array(url, type=pa.string()), "text": t["text"]}
        )

    pages = add_token_stats(
        add_url_parts(docs.map_batches(synth, batch_format="pyarrow"), "url"),
        "text",
    )

    def project(t: pa.Table) -> pa.Table:
        texts = t["text"].combine_chunks()
        return pa.table(
            {
                "host": t["url_host"],
                "n_tokens": t["n_tokens"],
                "n_chars": t["n_chars"],
                "h1": pa.array(hash64(texts, seed=11).astype(np.int64)),
                "h2": pa.array(hash64(texts, seed=23).astype(np.int64)),
            }
        )

    slim = pages.map_batches(project, batch_format="pyarrow")
    agg = (
        slim.groupby("host")
        .aggregate(
            Count(alias_name="n_pages"),
            Sum("n_tokens", alias_name="n_tokens_sum"),
            Sum("n_chars", alias_name="n_chars_sum"),
        )
    )
    ndist = (
        distinct(slim, ["host", "h1", "h2"])
        .groupby("host")
        .aggregate(Count(alias_name="n_distinct_texts"))
    )
    from mismo_ray._joins import hash_join

    out = hash_join(
        agg,
        ndist,
        on="host",
        how="inner",
        left_schema=pa.schema(
            [
                pa.field("host", pa.string()),
                pa.field("n_pages", pa.int64()),
                pa.field("n_tokens_sum", pa.int64()),
                pa.field("n_chars_sum", pa.int64()),
            ]
        ),
        right_schema=pa.schema(
            [pa.field("host", pa.string()), pa.field("n_distinct_texts", pa.int64())]
        ),
    )
    return out.map_batches(
        lambda t: t.select(
            ["host", "n_pages", "n_distinct_texts", "n_tokens_sum", "n_chars_sum"]
        ),
        batch_format="pyarrow",
    )


def q_read_warc(sf_dir: str):
    """WARC source round-trip: documents -> spec-correct .warc.gz segments
    under /tmp (sources.warc.write_warc) -> read_warc -> canonical page
    table. Verifies the 100 TB ingest path end to end: per-segment parallel
    read, gzip members, warcinfo filtering, byte-exact html payloads.  The
    SQL oracle recomputes every row straight from `documents` (url template
    + html-escape byte arithmetic for n_bytes), so the container round-trip
    is value-checked even though SQL never touches the WARC bytes."""
    import os
    import tempfile

    from mismo_ray.pipelines._webpages import render_html
    from mismo_ray.sources.warc import read_warc, write_warc

    docs = _read(sf_dir, "documents", ["doc_id", "text"]).to_pandas()
    if len(docs) == 0:  # empty input: no WARC shards to write or read back
        return pa.table(
            {
                "url": pa.array([], pa.string()),
                "record_type": pa.array([], pa.string()),
                "n_bytes": pa.array([], pa.int64()),
            }
        )
    tmp = tempfile.mkdtemp(prefix="mismo_warc_", dir="/tmp")
    import datetime as dt

    paths = []
    for shard in range(4):
        part = docs[docs["doc_id"] % 4 == shard]
        pages = [
            {
                "url": f"https://w{int(r.doc_id) % 11}.example.org/d/{int(r.doc_id)}",
                "warc_ts": dt.datetime(2024, 1, 1)
                + dt.timedelta(seconds=int(r.doc_id) % 86400),
                "html": render_html(f"d{int(r.doc_id)}", r.text or ""),
            }
            for r in part.itertuples()
        ]
        p = os.path.join(tmp, f"seg-{shard}.warc.gz")
        write_warc(p, pages)
        paths.append(p)
    out = read_warc(paths)

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": t["url"],
                "record_type": t["record_type"],
                "n_bytes": pc.binary_length(t["html"]).cast(pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def q_host_pagerank(sf_dir: str):
    """Fixed-point integer PageRank (webgraph.pagerank, 3 iterations,
    damping 85/100, scale 1e12) over a deterministic host graph synthesized
    from doc_id arithmetic. Integer shares/sums make the result bit-exact
    at any parallelism; the oracle chains three non-recursive CTEs with the
    identical integer math."""
    from mismo_ray.webgraph import pagerank

    docs = _read(sf_dir, "documents", ["doc_id"])

    def synth(t: pa.Table) -> pa.Table:
        did = np.asarray(t["doc_id"], dtype=np.int64)
        src = np.char.add("h", (did % 20).astype(str))
        dst = np.char.add("h", ((did * 7 + 3) % 23).astype(str))
        return pa.table(
            {
                "src": pa.array(src.tolist(), type=pa.string()),
                "dst": pa.array(dst.tolist(), type=pa.string()),
            }
        )

    edges = docs.map_batches(synth, batch_format="pyarrow")
    from mismo_ray._joins import partition_hint

    # tiny golden graph: pagerank materializes each round inside the call,
    # so the hint covers every shuffle (same pattern as the febrl queries)
    with partition_hint(8):
        return pagerank(edges, iterations=3)


def q_canonical_url(sf_dir: str):
    """URL canonicalization (lib/url.py) over deterministically
    synthesized crawl URLs (scheme/www/port/trailing-slash/tracking-param/
    fragment variation keyed on doc_id — the SQL oracle builds the
    identical strings with || and CASE): lowercase scheme+host, strip www.
    and userinfo, drop default ports and fragments, rstrip path slashes,
    drop utm_*/fbclid-style params, sort survivors."""
    from mismo_ray.lib.url import add_canonical_url, add_url_parts

    docs = _read(sf_dir, "documents", ["doc_id", "lang", "source"])

    def synth(t: pa.Table) -> pa.Table:
        import pandas as pd

        did = np.asarray(t["doc_id"], dtype=np.int64)
        lang = pd.Series(t["lang"].to_pylist(), dtype="object")
        source = pd.Series(t["source"].to_pylist(), dtype="object")
        scheme = pd.Series(np.array(["HTTP", "https", "HTTPS"])[did % 3])
        www = pd.Series(np.where(did % 2 == 0, "WWW.", ""))
        port = pd.Series(np.array([":80", ":443", ":8080", ""])[did % 4])
        slash = pd.Series(np.where(did % 5 == 0, "/", ""))
        q0 = "?utm_source=feed&b=" + pd.Series(did % 10).astype(str) + "&a=1&fbclid=x"
        query = q0.where(did % 3 == 0, "?z=9&a=2").where(did % 3 != 2, "")
        frag = pd.Series(np.where(did % 7 == 0, "#sec", ""))
        url = (
            scheme + "://" + www + source + ".Example.COM" + port
            + "/" + lang + "/Doc/" + pd.Series(did).astype(str) + slash
            + query + frag
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "url": pa.array(url, type=pa.string()),
            }
        )

    out = add_canonical_url(
        add_url_parts(docs.map_batches(synth, batch_format="pyarrow"), "url"),
        "url",
    )
    return out.select_columns(["doc_id", "url_host", "url_canon"])


def q_redact_pii(sf_dir: str):
    """PII redaction (textstats.redact_pii) over deterministically
    PII-salted text (emails / IPv4s / phone runs appended keyed on doc_id;
    the SQL oracle builds identical strings and applies the same three
    RE2-compatible patterns in the same order via regexp_replace 'g')."""
    from mismo_ray.textstats import redact_pii

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def salt(t: pa.Table) -> pa.Table:
        import pandas as pd

        did = np.asarray(t["doc_id"], dtype=np.int64)
        txt = pd.Series(t["text"].to_pylist(), dtype="object")
        ds_ = pd.Series(did).astype(str)
        email = (" contact user" + ds_ + "@mail" + pd.Series(did % 5).astype(str) + ".com").where(
            did % 3 != 2, ""
        )
        ip = (
            " from "
            + pd.Series(did % 200).astype(str)
            + "."
            + pd.Series(did % 250).astype(str)
            + "."
            + pd.Series(did % 220).astype(str)
            + "."
            + pd.Series(did % 100).astype(str)
        ).where(did % 4 != 3, "")
        phone = (" tel +1 (555) 01" + pd.Series(did % 10).astype(str) + "-0" + ds_).where(
            did % 5 != 4, ""
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "text": pa.array(txt + email + ip + phone, type=pa.string()),
            }
        )

    out = redact_pii(docs.map_batches(salt, batch_format="pyarrow"), "text")
    return out.select_columns(
        ["doc_id", "text_redacted", "n_emails", "n_ips", "n_phones"]
    )


def q_media_features(sf_dir: str):
    """Real-codec multimodal path (multimodal/codecs.py + actor-pool
    featurizer): deterministic 8x8 PPM payloads synthesized per doc_id
    with the SQL-expressible pixel rule pix(y,x,c) = (doc_id*31 + y*8 +
    x + c*7) % 256, encoded by encode_ppm, decoded by the pure-numpy
    netpbm parser inside the ImageFeaturizer actor pool, channel means +
    2x2 luminance-grid means returned as 1e6-scaled ints.  The oracle
    recomputes every feature from the pixel rule with AVG over a
    generated (y, x, c) grid — so the PPM encode -> decode -> featurize
    chain is value-checked byte-for-byte (all features are means of
    integers; sums are exact in double on both engines, and the e6
    half-up rounding never lands on a boundary: k*1e6/64 is an integer
    and k*1e6/48 is an integer or a clean third)."""
    from mismo_ray.multimodal import featurize_images
    from mismo_ray.multimodal.codecs import decode_ppm, encode_ppm

    docs = _read(sf_dir, "documents", ["doc_id"])
    base = (
        np.arange(8)[:, None, None] * 8
        + np.arange(8)[None, :, None]
        + np.arange(3)[None, None, :] * 7
    )

    def synth(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"], dtype=np.int64)
        payloads = [
            encode_ppm(((int(did) * 31 + base) % 256).astype(np.uint8))
            for did in ids
        ]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "payload": pa.array(payloads, type=pa.binary()),
            }
        )

    media = docs.map_batches(synth, batch_format="pyarrow")
    feats = featurize_images(media, decoder=decode_ppm, concurrency=2)

    def finish(t: pa.Table) -> pa.Table:
        f = np.array(t["image_features"].to_pylist(), dtype=np.float64).reshape(
            len(t), -1
        )
        out = {"doc_id": t["doc_id"]}
        for j in range(f.shape[1]):
            out[f"f{j}"] = _e6(f[:, j])
        return pa.table(out)

    return feats.map_batches(finish, batch_format="pyarrow")


def q_incremental_dedupe(sf_dir: str, index: str = "exact"):
    """Two-run incremental exact dedupe through the sharded actor index
    (state.dedup_index): run 1 ingests even-id docs and snapshots; run 2
    (fresh index restored from the snapshot) ingests odd-id docs PLUS
    deterministic re-crawls of every doc_id%10==0 doc (same content, new
    id) and must drop exactly those re-crawls. Content keys are
    ``text#original_doc_id`` so they are distinct BY CONSTRUCTION at any
    scale factor (raw sf0.1 texts collide across odd docs, which would make
    the intra-run survivor arrival-order-dependent and the oracle
    inexpressible); the re-crawl copies the key before its id changes, so
    cross-run dedupe still has exactly the designed work to do. SQL-oracled
    by the same anti-join over the same suffixed keys."""
    import os
    import tempfile

    from mismo_ray.state.dedup_index import incremental_filter_new

    docs = _with_record_id(_read(sf_dir, "documents", ["doc_id", "text"]), "doc_id")

    def add_key(t: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            t["text"].combine_chunks().cast(pa.string()),
            pc.cast(t["doc_id"], pa.string()),
            "#",
        )
        return t.set_column(t.schema.get_field_index("text"), "text", key)

    docs = docs.map_batches(add_key, batch_format="pyarrow")

    def half(parity: int):
        def fn(t: pa.Table) -> pa.Table:
            ids = np.asarray(t["doc_id"], dtype=np.int64)
            return t.filter(pa.array(ids % 2 == parity))

        return fn

    def recrawls(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"], dtype=np.int64)
        t = t.filter(pa.array(ids % 10 == 0))
        ids2 = np.asarray(t["doc_id"], dtype=np.int64) + 1_000_000
        return t.set_column(
            t.schema.get_field_index("doc_id"), "doc_id", pa.array(ids2)
        ).set_column(
            t.schema.get_field_index("record_id"), "record_id", pa.array(ids2)
        )

    day1 = docs.map_batches(half(0), batch_format="pyarrow")
    day2 = docs.map_batches(half(1), batch_format="pyarrow").union(
        docs.map_batches(recrawls, batch_format="pyarrow")
    )
    snap = os.path.join(tempfile.mkdtemp(prefix="mismo_ray_incdedupe_"), "idx.parquet")
    kw = dict(index=index, expected_keys=200_000, fp_rate=1e-9)
    incremental_filter_new(day1, "text", snapshot_out=snap, **kw)
    kept2 = incremental_filter_new(day2, "text", snapshot_in=snap, **kw)
    return kept2.select_columns(["doc_id"]).sort("doc_id")


def q_incremental_dedupe_bloom(sf_dir: str):
    """The identical two-run incremental dedupe through the BLOOM index
    (state.dedup_index.StreamingBloomDedupIndex): constant-memory bit-array
    shards instead of the exact dict. Sized at fp_rate=1e-9 for 200k keys,
    so on this corpus the output matches the exact anti-join oracle
    bit-for-bit (the hashing is deterministic — this is a fixed fact about
    the corpus, not a per-run gamble); the measured-fp-rate contract lives
    in tests/test_bloom_index.py."""
    return q_incremental_dedupe(sf_dir, index="bloom")


def q_febrl_dedupe(sf_dir: str):
    """FEBRL1 person dedupe end-to-end (blocking OR -> FS-trained scoring ->
    threshold); rows-only — pairwise F1 >= 0.99 is asserted in
    tests/test_playdata.py against label_true."""
    from mismo_ray import playdata
    from mismo_ray.pipelines import febrl_match_pairs

    pred, _ = febrl_match_pairs(playdata.load_records("febrl1"))
    return pred.links_ds.select_columns(["record_id_l", "record_id_r"])


def q_playdata_patents(sf_dir: str):
    """Golden PATSTAT patents table + its ground-truth link count (bundled
    public benchmark parquet — sf-independent, rows-only: the oracle's views
    cover only the synthetic sf tables)."""
    from mismo_ray import playdata

    return playdata.load_records("patents")


def q_rldata_dedupe(sf_dir: str):
    """End-to-end dedupe of RLdata500 with simple linkage rules (blocking on
    2-of-3 birth-date parts + carried-name JW verify); rows-only — P/R >= 0.9
    is asserted in tests/test_playdata.py against label_true."""
    from mismo_ray import playdata
    from mismo_ray.pipelines import rldata_match_pairs

    return rldata_match_pairs(playdata.load_records("rldata500")).links_ds


def _decontam_split(sf_dir: str):
    """Corpus = documents with doc_id % 7 != 0; benchmark = the rest —
    a deterministic stand-in for train-corpus vs eval-benchmark."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def split(keep_bench: bool):
        def fn(t: pa.Table) -> pa.Table:
            ids = np.asarray(t["doc_id"], dtype=np.int64)
            mask = (ids % 7 == 0) if keep_bench else (ids % 7 != 0)
            return t.filter(pa.array(mask))

        return fn

    corpus = docs.map_batches(split(False), batch_format="pyarrow")
    bench = docs.map_batches(split(True), batch_format="pyarrow")
    return corpus, bench


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination stats (dedupe.contamination_stats): per
    corpus doc, distinct word-4-gram count and how many of those grams also
    occur in the benchmark split (GPT-3-style overlap rule)."""
    from mismo_ray.dedupe import contamination_stats

    corpus, bench = _decontam_split(sf_dir)
    return contamination_stats(corpus, bench, "text", id_column="doc_id", n=4)


def q_drop_contaminated(sf_dir: str):
    """Benchmark decontamination filter (dedupe.drop_contaminated): corpus
    docs surviving the any-shared-4-gram drop rule."""
    from mismo_ray.dedupe import drop_contaminated

    corpus, bench = _decontam_split(sf_dir)
    corpus = corpus.materialize()  # consumed twice (stats pass + anti join)
    return drop_contaminated(corpus, bench, "text", id_column="doc_id", n=4)


def q_mixture_sample(sf_dir: str):
    """Per-language training-mixture resampling (util_ops.mixture_sample):
    en halved, de ~doubled (2.25 copies expected), zh dropped, others kept.
    Deterministic splitmix64 buckets — the oracle reproduces them with
    128-bit modular arithmetic."""
    from mismo_ray.util_ops import mixture_sample

    docs = _read(sf_dir, "documents", ["doc_id", "lang"])
    return mixture_sample(
        docs,
        {"en": 0.5, "de": 2.25, "zh": 0.0},
        group_column="lang",
        id_column="doc_id",
        seed=0,
        copy_as="n_copy",
    )


def q_pack_sequences(sf_dir: str):
    """Concat-and-chunk sequence packing (packing.pack_sequences): global
    token offsets + sequence slots under the splitmix64(doc_id) pseudo-
    shuffle order, n_chars as the token count, budget 4096. The oracle is
    the same prefix sum as a SQL window function over the same order."""
    from mismo_ray.packing import pack_sequences

    docs = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    return pack_sequences(
        docs, "n_chars", budget=4096, id_column="doc_id", seed=0, order="hash"
    )


def q_row_number(sf_dir: str):
    """Global row numbers in the splitmix64 pseudo-shuffle order
    (packing.add_row_number — distributed ROW_NUMBER()); window-function
    oracle over the same order."""
    from mismo_ray.packing import add_row_number

    docs = _read(sf_dir, "documents", ["doc_id"])
    return add_row_number(docs, id_column="doc_id", seed=0, order="hash")


def q_bpe_tokens(sf_dir: str):
    """Distributed BPE tokenizer (textstats.train_bpe + add_bpe_tokens):
    one word-count shuffle -> bounded word-TYPE collect -> classic driver
    merge loop (lexicographic tie-break = partition-independent) -> actor-
    pool encoding with per-actor hot-word cache. Rows-only: the merge loop
    is iterative, outside SQL's reach; merge semantics are pytest-gated
    against the classic Sennrich walkthrough in tests/test_bpe.py."""
    from mismo_ray.textstats import add_bpe_tokens, train_bpe

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    tok = train_bpe(docs, "text", n_merges=200, min_count=2)
    out = add_bpe_tokens(docs, tok, "text", concurrency=4)

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["doc_id"], "n_bpe": t["bpe_n"]})

    return out.map_batches(finish, batch_format="pyarrow")


def q_word_counts(sf_dir: str):
    """Corpus word-frequency table (textstats.word_counts — the BPE
    trainer's one distributed pass): map-side value_counts partials +
    one keyed shuffle, pinned [^a-z0-9]+ lowercase tokenizer. Hash-checked
    against the same split in SQL."""
    from mismo_ray.textstats import word_counts

    docs = _read(sf_dir, "documents", ["text"])
    out = word_counts(docs, "text", min_count=2)
    return out.map_batches(
        lambda t: t.select(["word", "n"]), batch_format="pyarrow"
    )


def q_quality_classifier(sf_dir: str):
    """Trainable fastText-style quality gate (textstats.train_text_classifier
    + add_classifier_prob — the CCNet/LLaMA-practice linear classifier the
    heuristic gopher/c4 rules sit alongside): class markers are appended to
    every doc by the deterministic rule label = (doc_id % 3 == 0), a
    hashed-n-gram logistic regression is fitted with distributed int64
    fixed-point full-batch Adagrad, all docs are scored through the
    broadcast weight vector, and the PREDICTED label is emitted. The oracle
    is the generating rule itself — parity holds only if the classifier
    actually reaches 100% accuracy on this corpus, making the hash check an
    end-to-end learnability gate (holdout accuracy is separately pytest-gated
    in tests/test_classifier.py)."""
    from mismo_ray.textstats import add_classifier_prob, train_text_classifier

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def synth(t: pa.Table) -> pa.Table:
        did = np.asarray(t["doc_id"], dtype=np.int64)
        pos = did % 3 == 0
        txt = pc.fill_null(t["text"], "").to_pandas().astype(str)
        marker = np.where(pos, " refined prose excellent", " spam noise clickbait")
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "text": pa.array((txt + marker).tolist(), pa.string()),
                "label": pa.array(pos.astype(np.int64)),
            }
        )

    marked = docs.map_batches(synth, batch_format="pyarrow")
    model = train_text_classifier(marked, "text", "label", epochs=20)
    scored = add_classifier_prob(marked, model, "text", out="p")

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "pred": pa.array(
                    (np.asarray(t["p"], dtype=np.float64) >= 0.5).astype(np.int64)
                ),
            }
        )

    return scored.map_batches(finish, batch_format="pyarrow")


def q_compression_stats(sf_dir: str):
    """zlib deflate-size quality signal (textstats.add_compression_stats)
    plus the SQL-checkable facets VERDICT r4 asked for: exact utf8_bytes,
    per-doc character Shannon entropy (x1e4, matching DuckDB's entropy()
    over unnested chars), and a deflate sanity invariant (2B zlib header +
    4B adler32 <= deflate_bytes <= utf8_bytes + 64) the oracle asserts as
    a constant — so the real zlib output is bound-checked row by row while
    exact deflate byte counts stay pytest-gated (tests/test_text.py)."""
    from mismo_ray.textstats import add_compression_stats

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    out = add_compression_stats(docs, "text")

    def finish(t: pa.Table) -> pa.Table:
        ent = np.zeros(len(t), dtype=np.float64)
        for i, s in enumerate(t["text"].to_pylist()):
            if s:
                cp = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
                cnt = np.unique(cp, return_counts=True)[1].astype(np.float64)
                p = cnt / cnt.sum()
                ent[i] = float(-(p * np.log2(p)).sum())
        raw = np.asarray(t["utf8_bytes"], dtype=np.int64)
        comp = np.asarray(t["deflate_bytes"], dtype=np.int64)
        ok = (comp <= raw + 64) & ((raw == 0) | (comp >= 9))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "utf8_bytes": t["utf8_bytes"],
                "char_entropy_e4": pa.array(
                    np.floor(ent * 1e4 + 0.5).astype(np.int64)
                ),
                "deflate_in_bounds": pa.array(ok),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def q_blocking_report(sf_dir: str):
    """Blocking quality (cluster.blocking_report): pair completeness and
    reduction ratio of (p_brand, p_size) blocking against first-name-token
    ground truth. One semi join + three counts; SQL-oracled exactly."""
    from mismo_ray.cluster import blocking_report
    from mismo_ray.linker import KeyLinker

    parts = _part_records(sf_dir)
    n = parts.count()
    cand = KeyLinker(["p_brand", "p_size"], salt_rows=4096)(parts, parts).links_ds

    def truth_keyed(t: pa.Table) -> pa.Table:
        tok = pc.list_element(
            pc.split_pattern(t["p_name"].combine_chunks(), pattern=" "), 0
        )
        return pa.table({"record_id": t["record_id"], "tok": tok})

    keyed = parts.map_batches(truth_keyed, batch_format="pyarrow")
    truth = KeyLinker("tok", salt_rows=4096)(keyed, keyed).links_ds
    rep = blocking_report(cand, truth, n_left=n)
    return pa.table(
        {
            "n_candidates": pa.array([rep["n_candidates"]], type=pa.int64()),
            "n_true": pa.array([rep["n_true"]], type=pa.int64()),
            "true_found": pa.array([rep["true_found"]], type=pa.int64()),
            "total_pairs": pa.array([rep["total_pairs"]], type=pa.int64()),
            "completeness_e6": _e6(np.array([rep["pair_completeness"]])),
            "reduction_e6": _e6(np.array([rep["reduction_ratio"]])),
        }
    )


def q_quantiles(sf_dir: str):
    """Exact distributed quantiles (util_ops.quantiles, radix selection on
    the order-preserving uint64 float view — histograms only, no sort, no
    value collect) over lineitem prices; DuckDB quantile_disc is the oracle."""
    from mismo_ray.util_ops import quantiles

    li = _read(sf_dir, "lineitem", ["l_extendedprice"])
    qs = [0.01, 0.25, 0.5, 0.75, 0.9, 0.99]
    got = quantiles(li, "l_extendedprice", qs)
    return pa.table(
        {
            "q_e6": pa.array([int(round(q * 1e6)) for q in qs], type=pa.int64()),
            "value": pa.array([got[q] for q in qs], type=pa.float64()),
        }
    )


def q_pr_curve(sf_dir: str):
    """Threshold sweep over FS odds (cluster.pr_curve): the fs_score pairs,
    truth = equality of the name's FIRST token (a coarser signal than the
    scored full-name/type features), thresholds at the pipeline's 3 distinct
    odds products. One streaming pass histograms scores per class; the
    oracle re-derives every row with SQL filters over the same scored CTE."""
    from mismo_ray.cluster import pr_curve

    scored = _scored_pairs(sf_dir)

    def first_tok(col: pa.ChunkedArray) -> pa.Array:
        return pc.list_element(
            pc.split_pattern(col.combine_chunks(), pattern=" "), 0
        )

    def tag(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "odds_e6": _e6(np.asarray(t["odds"], dtype=np.float64)),
                "is_true": pc.equal(
                    first_tok(t["p_name_l"]), first_tok(t["p_name_r"])
                ),
            }
        )

    curve = pr_curve(
        scored.map_batches(tag, batch_format="pyarrow"),
        score_column="odds_e6",
        truth_column="is_true",
        thresholds=[1_000_000, 8_000_000, 80_000_000],
    )

    return pa.table(
        {
            "threshold": curve["threshold"].cast(pa.int64()),
            "tp": curve["tp"],
            "fp": curve["fp"],
            "fn": curve["fn"],
            "precision_e6": _e6(np.asarray(curve["precision"], dtype=np.float64)),
            "recall_e6": _e6(np.asarray(curve["recall"], dtype=np.float64)),
        }
    )


def q_incremental_neardup(sf_dir: str):
    """Two-run incremental NEAR-dedupe through the sharded band-key index
    (state.dedup_index.StreamingNearDupIndex): run 1 ingests even-id docs
    and snapshots; run 2 ingests odd-id docs plus lightly-EDITED re-crawls
    (text + ' updated tail marker', new ids) of every doc_id%10==0 doc —
    near-dups, not exact dups, so only the LSH index catches them.
    Rows-only (greedy arrival-order semantics have no SQL expression);
    single-partition days keep the greedy order deterministic."""
    import os
    import tempfile

    from mismo_ray.state.dedup_index import incremental_neardup_filter

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def half(parity: int):
        def fn(t: pa.Table) -> pa.Table:
            ids = np.asarray(t["doc_id"], dtype=np.int64)
            return t.filter(pa.array(ids % 2 == parity))

        return fn

    def near_recrawls(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"], dtype=np.int64)
        t = t.filter(pa.array(ids % 10 == 0))
        ids2 = np.asarray(t["doc_id"], dtype=np.int64) + 1_000_000
        edited = pc.binary_join_element_wise(
            t["text"].combine_chunks(), "updated tail marker", " "
        )
        return t.set_column(
            t.schema.get_field_index("doc_id"), "doc_id", pa.array(ids2)
        ).set_column(t.schema.get_field_index("text"), "text", edited)

    day1 = docs.map_batches(half(0), batch_format="pyarrow").repartition(1)
    day2 = (
        docs.map_batches(half(1), batch_format="pyarrow")
        .union(docs.map_batches(near_recrawls, batch_format="pyarrow"))
        .repartition(1)
    )
    snap = os.path.join(
        tempfile.mkdtemp(prefix="mismo_ray_neardup_"), "idx.parquet"
    )
    incremental_neardup_filter(day1, "text", snapshot_out=snap)
    kept2 = incremental_neardup_filter(day2, "text", snapshot_in=snap)
    return kept2.select_columns(["doc_id"]).sort("doc_id")


def q_febrl_link(sf_dir: str):
    """Two-table clean-vs-dirty linkage on golden data (pipelines.
    febrl_link_pairs): febrl1 split into canonical records vs noisy
    duplicates, fused OR-blocking + FS in LINK task mode. Rows-only; the
    pairwise F1 >= 0.99 gate lives in tests/test_playdata.py."""
    from mismo_ray import playdata
    from mismo_ray.pipelines import febrl_link_pairs, febrl_split_link_task

    left, right = febrl_split_link_task(playdata.load_records("febrl1"))
    pred, _w = febrl_link_pairs(left, right)
    return pred.links_ds.select_columns(["record_id_l", "record_id_r"])


def q_affiliations_dedupe(sf_dir: str):
    """Leipzig affiliations dedupe (pipelines.affiliations_match_pairs):
    rare-token blocking + token-set jaccard on the bundled golden corpus.
    Rows-only (bundled data isn't a driver view); the P/R band is gated in
    tests/test_affiliations.py."""
    from mismo_ray import playdata
    from mismo_ray.pipelines import affiliations_match_pairs

    return affiliations_match_pairs(playdata.load_records("affiliations")).links_ds


def q_flagship(sf_dir: str):
    from mismo_ray.pipelines import flagship

    result = flagship(sf_dir, train="labels", threshold_odds=10.0)
    return result["records"].select_columns(
        ["record_id", "url", "label_true", "component"]
    )


def q_heavy_hitters(sf_dir: str):
    """Exact top-8 most frequent tokens via the two-pass Misra-Gries sketch
    (sketch.heavy_hitters): candidate generation never shuffles raw tokens —
    only bounded per-block summaries — and the exact verification pass counts
    just the <= 4k broadcast candidates. The ``guaranteed`` proof flag must
    hold on this corpus (raise loudly rather than return an unproven set)."""
    import pandas as pd

    from mismo_ray.sketch import heavy_hitters

    docs = _read(sf_dir, "documents", ["text"])

    def toks(t: pa.Table) -> pa.Table:
        texts = pd.Series(t["text"].to_pylist(), dtype="object")
        ex = texts.str.split().explode().dropna()
        return pa.table({"term": pa.array(ex.to_numpy(), type=pa.string())})

    terms = docs.map_batches(toks, batch_format="pyarrow")
    hh = heavy_hitters(terms, "term", k=8)
    if len(hh.table) and not hh.guaranteed:
        raise AssertionError(
            "heavy_hitters completeness proof failed on the test corpus "
            f"(kth must exceed boundary({hh.boundary}) + E({hh.error_bound}))"
        )
    return hh.table


def _to_cents(t: pa.Table, src: str = "value", dst: str = "cents") -> pa.Table:
    """round(src*100) as nullable int64 — the ONE fixed-point rule shared by
    every money-column oracle (SQL mirror: CAST(FLOOR(v*100+0.5) AS BIGINT));
    change it here and in the SQL together."""
    v = np.asarray(t[src].combine_chunks().cast(pa.float64()))
    c = np.floor(v * 100 + 0.5)
    mask = np.isnan(c)
    arr = pa.array(np.where(mask, 0, c).astype(np.int64), mask=mask)
    return t.drop_columns([src]).append_column(dst, arr)


def q_window_fns(sf_dir: str):
    """Row-window functions (window.window_over): lag/lead, running and
    trailing-3 sums, per-user row numbers over events ordered by ts — one
    coarse-bucket shuffle, vectorized pandas window kernels per bucket.
    Money values go through integer cents so the running sums are
    exact-integer on both engines."""
    from mismo_ray.window import window_over

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    out = window_over(
        ev.map_batches(_to_cents, batch_format="pyarrow"),
        partition_by="user_id",
        # event_id tie-break: window_over's determinism contract needs
        # (partition_by, *order_by) to be a unique key; (user_id, ts) alone
        # is not guaranteed unique on an arbitrary corpus
        order_by=["ts", "event_id"],
        specs=[
            ("lag", "cents", "lag_cents"),
            ("lead", "cents", "lead_cents"),
            ("cumsum", "cents", "cum_cents"),
            ("cummax", "cents", "max_cents"),
            ("rolling_sum", "cents", "roll3_cents", 3),
            ("row_number", None, "rn"),
        ],
    )
    def finish(t: pa.Table) -> pa.Table:
        t = t.select(
            [
                "event_id",
                "user_id",
                "lag_cents",
                "lead_cents",
                "cum_cents",
                "max_cents",
                "roll3_cents",
                "rn",
            ]
        )
        # strip the pandas schema metadata the window shuffle attached, so
        # to_pandas() yields plain int64/float64 (like the DuckDB oracle df)
        # instead of resurrecting pandas' Int64 extension dtype
        return t.replace_schema_metadata(None)

    return out.map_batches(finish, batch_format="pyarrow")


def q_semantic_decontaminate(sf_dir: str):
    """Embedding-space decontamination (dedupe.drop_semantic_contaminated):
    corpus = vec_id < 400, benchmark = the rest; any corpus doc with cosine
    >= 0.40 to a benchmark doc is dropped (the paraphrase-robust counterpart
    of the 13-gram rule). Exact chunk-pair join here; the LSH path is
    pytest-gated."""
    from mismo_ray.dedupe import drop_semantic_contaminated

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    corpus = emb.filter(expr="vec_id < 400")
    bench = emb.filter(expr="vec_id >= 400")
    out = drop_semantic_contaminated(
        corpus,
        bench,
        id_column="vec_id",
        tau=0.40,
        method="exact",
        chunk_rows=64,
    )
    return out.map_batches(
        lambda t: t.select(["vec_id"]), batch_format="pyarrow"
    )


def q_subtract_exact(sf_dir: str):
    """Cross-corpus exact subtraction (dedupe.subtract_exact): train =
    doc_id % 3 != 0, ref = doc_id % 5 == 0; any train doc whose text appears
    byte-exactly in ref is dropped (the one-shot remove-eval-from-train op).
    128-bit content-hash keys through the acero-free keyed_filter; null text
    never matches and always survives."""
    from mismo_ray.dedupe import subtract_exact

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def mod_filter(m: int, keep_zero: bool):
        def fn(t: pa.Table) -> pa.Table:
            did = np.asarray(t["doc_id"], dtype=np.int64)
            mask = (did % m == 0) if keep_zero else (did % m != 0)
            return t.filter(pa.array(mask))

        return fn

    train = docs.map_batches(mod_filter(3, False), batch_format="pyarrow")
    ref = docs.map_batches(mod_filter(5, True), batch_format="pyarrow")
    out = subtract_exact(train, ref, "text")
    return out.map_batches(
        lambda t: t.select(["doc_id"]), batch_format="pyarrow"
    )


def q_quantiles_by(sf_dir: str):
    """Per-group exact discrete quantiles (util_ops.quantiles_by): one
    coarse-bucket shuffle, vectorized rank gathers; integer cents keep the
    cross-engine compare exact."""
    from mismo_ray.util_ops import quantiles_by

    ev = _read(sf_dir, "events", ["user_id", "value"])

    return quantiles_by(
        ev.map_batches(_to_cents, batch_format="pyarrow"),
        "user_id",
        "cents",
        (0.25, 0.5, 0.75),
    )


def q_describe(sf_dir: str):
    """Distributed column profile (util_ops.describe): one partial row per
    block through the fold, exact distinct via per-block unique + group
    count. Exact mode here so every cell is SQL-reproducible; the approx
    (HyperLogLog) mode is pytest-gated."""
    from mismo_ray.util_ops import describe

    docs = _read(sf_dir, "documents", ["doc_id", "lang"])
    return describe(docs, ["doc_id", "lang"], distinct="exact")


def q_lang_distinct_approx(sf_dir: str):
    """Per-language HyperLogLog distinct-text counts (sketch.add_approx_distinct):
    only (lang, register, rho) triples cross the shuffle — never the text.
    SQL-checkable facets (VERDICT r4 #2): the query joins the sketch against
    the engine's own exact two-level distinct (hash shuffle, oracle-checked
    as COUNT(DISTINCT text)) and emits the HLL estimate as a relative-error
    bound flag the oracle asserts constant TRUE (p=12 => ~1.6% std error;
    20% is a hard sanity wall).  Exact HLL registers stay pytest-gated
    (tests/test_sketch*.py)."""
    from ray.data.aggregate import Count

    from mismo_ray._joins import distinct
    from mismo_ray._util import hash64
    from mismo_ray.sketch import add_approx_distinct

    docs = _read(sf_dir, "documents", ["lang", "text"])
    hll = add_approx_distinct(docs, "lang", "text", precision=12)

    def proj(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            t["lang"].combine_chunks().is_valid(),
            t["text"].combine_chunks().is_valid(),
        )
        t = t.filter(keep)
        h = hash64(t["text"]).astype(np.int64)
        # per-block pre-dedup: at most one (lang, hash) row per block value
        return pa.table(
            {"lang": t["lang"], "__h__": pa.array(h)}
        ).group_by(["lang", "__h__"]).aggregate([])

    exact = (
        distinct(docs.map_batches(proj, batch_format="pyarrow"), ["lang", "__h__"])
        .groupby("lang")
        .aggregate(Count(alias_name="exact_distinct"))
    )
    hll_t = hll.to_pandas()
    exact_t = exact.to_pandas()
    if len(exact_t) == 0:
        return pa.table(
            {
                "lang": pa.array([], pa.string()),
                "exact_distinct": pa.array([], pa.int64()),
                "hll_within_20pct": pa.array([], pa.bool_()),
            }
        )
    j = exact_t.merge(hll_t, on="lang", how="left")
    approx = j["approx_distinct"].to_numpy(dtype=np.float64)
    ex = j["exact_distinct"].to_numpy(dtype=np.float64)
    ok = np.abs(approx / ex - 1.0) <= 0.20
    return pa.table(
        {
            "lang": pa.array(j["lang"].astype(str)),
            "exact_distinct": pa.array(
                j["exact_distinct"].to_numpy(dtype=np.int64)
            ),
            "hll_within_20pct": pa.array(ok),
        }
    )


# Ordering contract: the driver's CORRECTNESS capture runs exactly the FIRST
# 50 entries of this dict.  Round-5 rotation (VERDICT r4 'Next round' #1):
# the window now holds the flagship plus the 26 queries never captured in
# any prior round's CORRECTNESS_r0N.json (the r4 sketch/trainable tier,
# pr_curve/quantiles/blocking_report, bloom, warc, golden-data link legs),
# then 23 strong family representatives.  Every entry displaced to 51+
# (gopher_quality, c4_clean, canonical_url, registered_domain,
# blocked_hosts, extract_links, anchor_stats, html_text, host_stats,
# cap_per_host, hash_split, row_number, redact_pii, repetition_stats,
# lang_id, token_stats, ccnet_buckets, dup_line_stats, media_features,
# dedupe_report, unnest_linker, sorted_neighborhood, filter_links_best,
# with_n_links, tf_lookup, postal_parse, febrl_dedupe, asof_join,
# events_tumbling, key_counts, pair_counts, ...) is already D-captured
# green in CORRECTNESS_r01-r04; all entries stay fully exercised by
# tools/check_queries.py (the full local battery) and pytest.
QUERIES = {
    # --- driver window: flagship + the 26 never-captured queries -----------
    "flagship_er": q_flagship,
    "lang_distinct_approx": q_lang_distinct_approx,
    "describe": q_describe,
    "quantiles_by": q_quantiles_by,
    "semantic_decontaminate": q_semantic_decontaminate,
    "subtract_exact": q_subtract_exact,
    "ivfpq_topk": q_ivfpq_topk,
    "dsir_sample": q_dsir_sample,
    "substring_spans": q_substring_spans,
    "substring_strip": q_substring_strip,
    "drop_dup_lines_domain": q_drop_dup_lines_domain,
    "extract_anchors": q_extract_anchors,
    "read_warc": q_read_warc,
    "fuzzy_dedupe_best": q_fuzzy_dedupe_best,
    "drop_contaminated": q_drop_contaminated,
    "affiliations_dedupe": q_affiliations_dedupe,
    "incremental_neardup": q_incremental_neardup,
    "febrl_link": q_febrl_link,
    "pr_curve": q_pr_curve,
    "quantiles": q_quantiles,
    "blocking_report": q_blocking_report,
    "incremental_dedupe_bloom": q_incremental_dedupe_bloom,
    "embedding_linker_link": q_embedding_linker_link,
    "compression_stats": q_compression_stats,
    "token_budget": q_token_budget,
    "bpe_tokens": q_bpe_tokens,
    "word_counts": q_word_counts,
    # --- driver window: family representatives (all previously D-green) ----
    "ivf_topk": q_ivf_topk,
    "simhash_pairs": q_simhash_pairs,
    # round-5 additions/conversions take window slots from entries that are
    # already hash-green in CORRECTNESS_r04 (drop_dup_lines,
    # substring_dedupe, lm_perplexity, host_pagerank -> entries 51+):
    "minhash_band_pairs": q_minhash_band_pairs,
    "minhash_band_link": q_minhash_band_link,
    "chunk_documents": q_chunk_documents,
    "lang_id": q_lang_id,
    "robots_filter": q_robots_filter,
    "mmr_select": q_mmr_select,
    "kcenter_select": q_kcenter_select,
    "simhash_charhash": q_simhash_charhash,
    "exact_dedupe": q_exact_dedupe,
    "minhash_lsh_dedupe": q_minhash_lsh_dedupe,
    # spelling_pairs (round-5 SpellingLinker family) displaces ngram_jaccard
    # from the 50-entry driver window — ngram_jaccard is D-captured green in
    # CORRECTNESS_r04 and stays in the local battery at entry 51+.
    "spelling_pairs": q_spelling_pairs,
    "embedding_neardup": q_embedding_neardup,
    "semdedup": q_semdedup,
    "fuzzy_dedupe": q_fuzzy_dedupe,
    "incremental_dedupe": q_incremental_dedupe,
    "ann_topk": q_ann_topk,
    "key_linker_pairs": q_key_linker_pairs,
    "fs_score": q_fs_score,
    "connected_components": q_connected_components,
    "window_fns": q_window_fns,
    "heavy_hitters": q_heavy_hitters,
    # ------- entry 51+: previously-captured entries + family variants -------
    # (host_pagerank, decontaminate, pack_sequences, mixture_sample,
    # quality_classifier displaced by the late round-5 window additions —
    # minhash_band_link, robots_filter, mmr_select, kcenter_select,
    # simhash_charhash; all displaced entries are hash-green in
    # CORRECTNESS_r04)
    "quality_classifier": q_quality_classifier,
    "chunk_sentences": q_chunk_sentences,
    "pack_sequences": q_pack_sequences,
    "mixture_sample": q_mixture_sample,
    "host_pagerank": q_host_pagerank,
    "decontaminate": q_decontaminate,
    "drop_dup_lines": q_drop_dup_lines,
    "substring_dedupe": q_substring_dedupe,
    "lm_perplexity": q_lm_perplexity,
    "simhash_text": q_simhash_text,
    "ngram_jaccard": q_ngram_jaccard,
    "gopher_quality": q_gopher_quality,
    "c4_clean": q_c4_clean,
    "canonical_url": q_canonical_url,
    "dup_line_stats": q_dup_line_stats,
    "ccnet_buckets": q_ccnet_buckets,
    "registered_domain": q_registered_domain,
    "blocked_hosts": q_blocked_hosts,
    "extract_links": q_extract_links,
    "anchor_stats": q_anchor_stats,
    "html_text": q_html_text,
    "host_stats": q_host_stats,
    "cap_per_host": q_cap_per_host,
    "hash_split": q_hash_split,
    "row_number": q_row_number,
    "redact_pii": q_redact_pii,
    "repetition_stats": q_repetition_stats,
    "token_stats": q_token_stats,
    "media_features": q_media_features,
    "dedupe_report": q_dedupe_report,
    "unnest_linker": q_unnest_linker,
    "sorted_neighborhood": q_sorted_neighborhood,
    "filter_links_best": q_filter_links_best,
    "with_n_links": q_with_n_links,
    "tf_lookup": q_tf_lookup,
    "postal_parse": q_postal_parse,
    "febrl_dedupe": q_febrl_dedupe,
    "asof_join": q_asof_join,
    "events_tumbling": q_events_tumbling,
    "key_counts": q_key_counts,
    "pair_counts": q_pair_counts,
    "key_linker_link": q_key_linker_link,
    "fingerprint": q_fingerprint,
    "quality_filter": q_quality_filter,
    "topk_per_group": q_topk_per_group,
    "token_count_bpe": q_token_count_bpe,
    "term_idf": q_term_idf,
    "document_counts": q_document_counts,
    "rare_terms": q_rare_terms,
    "connected_components_star": q_connected_components_star,
    "connected_components_str": q_connected_components_str,
    "link_counts": q_link_counts,
    "degree": q_degree,
    "groupby_agg": q_groupby_agg,
    "events_sliding": q_events_sliding,
    "events_sessionize": q_events_sessionize,
    "keep_unambiguous": q_keep_unambiguous,
    "with_linked_values": q_with_linked_values,
    "keep_min_agreement": q_keep_min_agreement,
    "upset_counts": q_upset_counts,
    "playdata_patents": q_playdata_patents,
    "rldata_dedupe": q_rldata_dedupe,
    "range_join": q_range_join,
    "diff_updates": q_diff_updates,
    "minhash_lsh_link": q_minhash_lsh_link,
}


from mismo_ray.textstats import STOPWORDS_EN as _STOPWORDS_EN

_STOP_SQL = "'" + "','".join(sorted(_STOPWORDS_EN)) + "'"

from mismo_ray.lib.url import PUBLIC_SUFFIXES_2LABEL as _PSL  # noqa: E402

_PSL_SQL = "'" + "','".join(sorted(_PSL)) + "'"

# SQL mirror of _synth_anchor_pages + extract_links(with_anchor=True) split
# semantics: segment per href=", closing-quote required, anchor = first
# '>'-to-'<' run iff followed by a literal '</a>'. Yields
# base(doc_id, href, anchor); shared by extract_anchors and anchor_stats.
# SQL expression for _synth_anchor_pages' html — the ONE synthesis contract;
# used by the anchor base below AND the html_text oracle
_ANCHOR_HTML_SQL = (
    "'<a href=\"https://ex.com/p/' || CAST(doc_id AS VARCHAR) || '\">a' || CAST(doc_id % 5 AS VARCHAR) || "
    "'</a><a href=\"/local/' || CAST(doc_id % 7 AS VARCHAR) || '\"><b>bold</b></a>' || "
    "'<a href=\"/plain/' || CAST(doc_id % 3 AS VARCHAR) || '\" class=\"x\">text here</a><a href=\"broken'"
)

_ANCHOR_BASE_SQL = (
    f"h AS (SELECT doc_id, {_ANCHOR_HTML_SQL} AS html FROM documents), "
    "segs AS (SELECT doc_id, t.seg FROM h, LATERAL ("
    " SELECT unnest(string_split(html, 'href=\"')) AS seg, "
    "        unnest(generate_series(1, len(string_split(html, 'href=\"')))) AS i) AS t "
    " WHERE t.i > 1), "
    "parsed AS (SELECT doc_id, substr(seg, 1, strpos(seg, '\"') - 1) AS href, "
    " substr(seg, strpos(seg, '\"') + 1) AS rest FROM segs WHERE strpos(seg, '\"') > 0), "
    "anch AS (SELECT doc_id, href, "
    " CASE WHEN strpos(rest, '>') > 0 THEN substr(rest, strpos(rest, '>') + 1) END AS after_gt FROM parsed), "
    "base AS (SELECT doc_id, href, "
    " CASE WHEN after_gt IS NOT NULL AND strpos(after_gt, '<') > 0 "
    "  AND substr(after_gt, strpos(after_gt, '<'), 4) = '</a>' "
    "  THEN substr(after_gt, 1, strpos(after_gt, '<') - 1) END AS anchor FROM anch)"
)

# Exact cosine top-3 restricted to the 10 IVF lists each query probes,
# with the centroid list = embeddings of vec_id 100..115 (the same fixed
# centroids q_ivf_topk / q_ivfpq_topk inject through the centroids= seam).
# CASTs to DOUBLE[] match the engine's float64 kernels; all rank ties are
# (sim DESC, id ASC) like the engine's argmax / lexsort.
_IVF_ORACLE = (
    "WITH cent AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS ord, "
    "  CAST(embedding AS DOUBLE[]) AS cv FROM embeddings "
    "  WHERE vec_id BETWEEN 100 AND 115 AND embedding IS NOT NULL), "
    "q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv "
    "  FROM embeddings WHERE vec_id < 20 AND embedding IS NOT NULL), "
    "assign AS (SELECT vec_id, ord FROM ("
    "  SELECT e.vec_id, c.ord, row_number() OVER (PARTITION BY e.vec_id "
    "    ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cv) DESC, c.ord) AS rnk "
    "  FROM embeddings e CROSS JOIN cent c WHERE e.embedding IS NOT NULL) "
    "  WHERE rnk = 1), "
    "probe AS (SELECT query_id, ord FROM ("
    "  SELECT q.query_id, c.ord, row_number() OVER (PARTITION BY q.query_id "
    "    ORDER BY list_cosine_similarity(q.qv, c.cv) DESC, c.ord) AS rnk "
    "  FROM q CROSS JOIN cent c) WHERE rnk <= 10), "
    "cand AS (SELECT q.query_id, a.vec_id AS neighbor_id, "
    "  list_cosine_similarity(q.qv, CAST(e.embedding AS DOUBLE[])) AS sim "
    "  FROM probe p JOIN q ON q.query_id = p.query_id "
    "  JOIN assign a ON a.ord = p.ord "
    "  JOIN embeddings e ON e.vec_id = a.vec_id "
    "  WHERE a.vec_id <> q.query_id) "
    "SELECT query_id, neighbor_id, rk FROM ("
    "  SELECT query_id, neighbor_id, row_number() OVER ("
    "    PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rk FROM cand) "
    "WHERE rk <= 3"
)

def _lang_marker_rows() -> str:
    """VALUES rows (lang_ord, lang, tok) for the lang_id oracle — built from
    the ENGINE's own marker lists so the two sides can never drift."""
    from mismo_ray.textstats import _LANG_MARKERS

    rows = []
    for i, (lang, toks) in enumerate(_LANG_MARKERS.items()):
        for tok in sorted(toks):
            esc = tok.replace("'", "''")
            rows.append(f"({i}, '{lang}', '{esc}')")
    return ", ".join(rows)


# one splitmix64 application over (doc_id, k) rows: x (UBIGINT) -> v (the
# mixed value) — the same s1/s2/s3 HUGEINT ladder the hash_split /
# row_number / simhash_pairs oracles use, shared by the minhash oracle
_SPLITMIX_LADDER_SQL = (
    "s1 AS (SELECT doc_id, k, CAST((CAST(x AS HUGEINT) + 11400714819323198485) "
    " % 18446744073709551616 AS UBIGINT) AS z FROM z0), "
    "s2 AS (SELECT doc_id, k, CAST(((CAST((xor(z, z >> 30)) >> 32 AS HUGEINT) "
    " * 13787848793156543929 % 4294967296) * 4294967296 "
    " + CAST((xor(z, z >> 30)) & 4294967295 AS HUGEINT) * 13787848793156543929) "
    " % 18446744073709551616 AS UBIGINT) AS z FROM s1), "
    "s3 AS (SELECT doc_id, k, CAST(((CAST((xor(z, z >> 27)) >> 32 AS HUGEINT) "
    " * 10723151780598845931 % 4294967296) * 4294967296 "
    " + CAST((xor(z, z >> 27)) & 4294967295 AS HUGEINT) * 10723151780598845931) "
    " % 18446744073709551616 AS UBIGINT) AS z FROM s2), "
    "sig AS (SELECT doc_id, k, xor(z, z >> 31) AS v FROM s3)"
)

def _kcenter_oracle_sql(k: int = 8, pool_n: int = 50, seed: int = 0) -> str:
    """The q_kcenter_select oracle: splitmix64 pool ranks + the greedy
    farthest-point chain unrolled as MATERIALIZED CTE steps (argMIN of the
    rounded max-cosine-to-selected, ties to min vec_id)."""
    M64 = 18446744073709551616
    steps = [
        "t0 AS MATERIALIZED (SELECT vec_id, emb FROM pool "
        "ORDER BY vec_id LIMIT 1)"
    ]
    for i in range(1, k):
        prev = " UNION ALL ".join(
            f"SELECT vec_id, emb FROM t{j}" for j in range(i)
        )
        steps.append(
            f"t{i} AS MATERIALIZED (SELECT vec_id, emb FROM ("
            f"SELECT p.vec_id, p.emb, round(("
            f"SELECT max(list_cosine_similarity(p.emb, s.emb)) FROM ({prev}) s"
            f"), 12) AS score FROM pool p "
            f"WHERE p.vec_id NOT IN (SELECT vec_id FROM ({prev}))"
            f") ORDER BY score ASC, vec_id LIMIT 1)"
        )
    final = " UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS rank, vec_id FROM t{i}" for i in range(k)
    )
    return (
        "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb "
        " FROM embeddings WHERE embedding IS NOT NULL), "
        # zero-norm vectors: DuckDB self-cosine yields -1.0, valid rows ~1
        "v AS (SELECT vec_id, emb FROM e "
        " WHERE list_cosine_similarity(emb, emb) > 0), "
        f"z0 AS (SELECT vec_id, emb, CAST(vec_id + {seed} AS UBIGINT) AS x FROM v), "
        f"m1 AS (SELECT vec_id, emb, CAST((CAST(x AS HUGEINT) + 11400714819323198485) % {M64} AS UBIGINT) AS z FROM z0), "
        "m2 AS (SELECT vec_id, emb, CAST(((CAST((xor(z, z >> 30)) >> 32 AS HUGEINT) "
        " * 13787848793156543929 % 4294967296) * 4294967296 "
        " + CAST((xor(z, z >> 30)) & 4294967295 AS HUGEINT) * 13787848793156543929) "
        f" % {M64} AS UBIGINT) AS z FROM m1), "
        "m3 AS (SELECT vec_id, emb, CAST(((CAST((xor(z, z >> 27)) >> 32 AS HUGEINT) "
        " * 10723151780598845931 % 4294967296) * 4294967296 "
        " + CAST((xor(z, z >> 27)) & 4294967295 AS HUGEINT) * 10723151780598845931) "
        f" % {M64} AS UBIGINT) AS z FROM m2), "
        "rk AS (SELECT vec_id, emb, xor(z, z >> 31) AS rk FROM m3), "
        "pool AS MATERIALIZED (SELECT vec_id, emb FROM rk "
        f"ORDER BY rk, vec_id LIMIT {pool_n}), "
        + ", ".join(steps)
        + " "
        + final
    )


def _charhash_simhash_sql(w: int = 6, seed: int = 7, max_hamming: int = 3) -> str:
    """The q_simhash_charhash oracle: rebuild every charhash simhash
    signature from the raw text with pure SQL 64-bit arithmetic —
    per-shingle Horner polynomial (base 1099511628211) over utf-32
    codepoints via HUGEINT hi/lo modular multiplies, seed xor, the
    splitmix64 ladder, then the 64-bit majority via a (doc, bit) unnest —
    and emit all pairs at hamming <= max_hamming."""
    M64 = 18446744073709551616
    B = 1099511628211

    def modmul(x: str, c: int) -> str:
        return (
            f"CAST(((CAST(({x}) >> 32 AS HUGEINT) * {c} % 4294967296) * 4294967296 "
            f"+ CAST(({x}) & 4294967295 AS HUGEINT) * {c}) % {M64} AS UBIGINT)"
        )

    acc = "CAST(c0 AS UBIGINT)"
    for j in range(1, w):
        acc = (
            f"CAST((CAST({modmul(acc, B)} AS HUGEINT) + CAST(c{j} AS HUGEINT)) "
            f"% {M64} AS UBIGINT)"
        )
    seeded = f"xor({acc}, {seed})"
    z0 = f"CAST((CAST({seeded} AS HUGEINT) + 11400714819323198485) % {M64} AS UBIGINT)"
    cols = ", ".join(
        f"unicode(substr(text, CAST(i + {j} AS INT), 1)) AS c{j}"
        for j in range(w)
    )
    return (
        f"WITH d AS (SELECT doc_id, text FROM documents "
        f" WHERE text IS NOT NULL AND length(text) >= {w}), "
        f"sh AS (SELECT doc_id, {cols} FROM d, "
        f" LATERAL (SELECT unnest(range(1, length(text) - {w} + 2)) AS i)), "
        f"p1 AS (SELECT doc_id, {z0} AS z FROM sh), "
        "p2 AS (SELECT doc_id, CAST(((CAST((xor(z, z >> 30)) >> 32 AS HUGEINT) "
        " * 13787848793156543929 % 4294967296) * 4294967296 "
        " + CAST((xor(z, z >> 30)) & 4294967295 AS HUGEINT) * 13787848793156543929) "
        f" % {M64} AS UBIGINT) AS z FROM p1), "
        "p3 AS (SELECT doc_id, CAST(((CAST((xor(z, z >> 27)) >> 32 AS HUGEINT) "
        " * 10723151780598845931 % 4294967296) * 4294967296 "
        " + CAST((xor(z, z >> 27)) & 4294967295 AS HUGEINT) * 10723151780598845931) "
        f" % {M64} AS UBIGINT) AS z FROM p2), "
        "h AS (SELECT doc_id, xor(z, z >> 31) AS h FROM p3), "
        "bits AS (SELECT doc_id, k, "
        " CASE WHEN ((h >> CAST(k AS INT)) & 1) = 1 THEN 1 ELSE -1 END AS pm "
        " FROM h, LATERAL (SELECT unnest(range(64)) AS k)), "
        "bt AS (SELECT doc_id, k, sum(pm) AS s FROM bits GROUP BY 1, 2), "
        "sig AS (SELECT doc_id, CAST(sum(CASE WHEN s > 0 "
        " THEN CAST(CAST(1 AS UBIGINT) << CAST(k AS INT) AS HUGEINT) ELSE 0 END) "
        " AS UBIGINT) AS sig FROM bt GROUP BY 1) "
        "SELECT a.doc_id AS record_id_l, b.doc_id AS record_id_r "
        "FROM sig a JOIN sig b ON a.doc_id < b.doc_id "
        f"WHERE bit_count(xor(a.sig, b.sig)) <= {max_hamming}"
    )


def _mmr_oracle_sql(k: int = 8, pool_n: int = 50) -> str:
    """The q_mmr_select oracle: the greedy MMR chain unrolled as k CTE
    steps (SQL recursive CTEs cannot aggregate over the recursion, so a
    fixed k unrolls instead). Step i picks the argmax of
    0.5*rel - 0.5*max-sim-to-selected over the pool minus steps 0..i-1,
    ties to min vec_id — exactly the engine's greedy loop."""
    # MATERIALIZED is load-bearing: step i references the union of steps
    # 0..i-1 twice, so inlined CTEs re-expand exponentially (the k=8
    # inlined plan ran for minutes; materialized it is 50 ms)
    steps = [
        "s0 AS MATERIALIZED (SELECT vec_id, emb FROM pool "
        "ORDER BY round(rel, 12) DESC, vec_id LIMIT 1)"
    ]
    for i in range(1, k):
        prev = " UNION ALL ".join(
            f"SELECT vec_id, emb FROM s{j}" for j in range(i)
        )
        steps.append(
            f"s{i} AS MATERIALIZED (SELECT vec_id, emb FROM ("
            f"SELECT p.vec_id, p.emb, round(0.5*p.rel - 0.5*("
            f"SELECT max(list_cosine_similarity(p.emb, s.emb)) FROM ({prev}) s"
            f"), 12) AS score FROM pool p "
            f"WHERE p.vec_id NOT IN (SELECT vec_id FROM ({prev}))"
            f") ORDER BY score DESC, vec_id LIMIT 1)"
        )
    final = " UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS rank, vec_id FROM s{i}" for i in range(k)
    )
    return (
        "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb "
        " FROM embeddings WHERE embedding IS NOT NULL AND vec_id <> 0), "
        # the engine returns empty for an absent/null/zero-norm query; a
        # null or zero qe makes every rel NULL/nan here, so the isfinite
        # pool filter below produces the same empty greedy chain
        "q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings "
        " WHERE vec_id = 0 AND embedding IS NOT NULL), "
        "rel0 AS (SELECT vec_id, emb, list_cosine_similarity(emb, qe) AS rel "
        " FROM e, q), "
        "pool AS MATERIALIZED (SELECT * FROM rel0 "
        " WHERE rel IS NOT NULL AND isfinite(rel) "
        f"ORDER BY rel DESC, vec_id LIMIT {pool_n}), "
        + ", ".join(steps)
        + " "
        + final
    )


# the injected-signature scheme of driver_queries._band_sig_batch, as the
# z0 input CTE the minhash band oracles feed into the splitmix ladder —
# ONE definition so an engine-side tweak can't silently diverge from one
# of the two oracles
_BAND_SIG_Z0_SQL = (
    "ks AS (SELECT unnest(range(16)) AS k), "
    "z0 AS (SELECT doc_id, k, CAST(CASE WHEN k >= LEAST(doc_id // 97, 5) "
    " THEN (doc_id % 97) * 1000003 + k + 1 "
    " ELSE doc_id * 2654435761 + k * 97 + 13 END AS UBIGINT) AS x "
    " FROM documents, ks), "
)


ORACLE_SQL = {
    "minhash_band_pairs": (
        "WITH "
        + _BAND_SIG_Z0_SQL
        + _SPLITMIX_LADDER_SQL
        + ", "
        "bk AS (SELECT doc_id, k // 2 AS band, "
        " string_agg(CAST(v AS VARCHAR), ',' ORDER BY k) AS bkey "
        " FROM sig GROUP BY 1, 2), "
        "cand AS (SELECT DISTINCT a.doc_id AS l, b.doc_id AS r FROM bk a "
        " JOIN bk b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id), "
        "agree AS (SELECT c.l, c.r, count(*) AS n FROM cand c "
        " JOIN sig sa ON sa.doc_id = c.l "
        " JOIN sig sb ON sb.doc_id = c.r AND sb.k = sa.k "
        " WHERE sa.v = sb.v GROUP BY 1, 2) "
        "SELECT l AS record_id_l, r AS record_id_r FROM agree WHERE n >= 12"
    ),
    "minhash_band_link": (
        "WITH "
        + _BAND_SIG_Z0_SQL
        + _SPLITMIX_LADDER_SQL
        + ", "
        "bk AS (SELECT doc_id, k // 2 AS band, "
        " string_agg(CAST(v AS VARCHAR), ',' ORDER BY k) AS bkey "
        " FROM sig GROUP BY 1, 2), "
        "cand AS (SELECT DISTINCT a.doc_id AS l, b.doc_id AS r FROM bk a "
        " JOIN bk b ON a.band = b.band AND a.bkey = b.bkey "
        " WHERE a.doc_id % 2 = 0 AND b.doc_id % 2 = 1), "
        "agree AS (SELECT c.l, c.r, count(*) AS n FROM cand c "
        " JOIN sig sa ON sa.doc_id = c.l "
        " JOIN sig sb ON sb.doc_id = c.r AND sb.k = sa.k "
        " WHERE sa.v = sb.v GROUP BY 1, 2) "
        "SELECT l AS record_id_l, r AS record_id_r FROM agree WHERE n >= 12"
    ),
    "chunk_documents": (
        "WITH d AS (SELECT doc_id, "
        " list_filter(string_split_regex(text, '\\s+'), t -> len(t) > 0) AS toks "
        " FROM documents WHERE text IS NOT NULL), "
        "n AS (SELECT doc_id, toks, len(toks) AS nt FROM d WHERE len(toks) > 0), "
        "c AS (SELECT doc_id, toks, nt, CASE WHEN nt <= 16 THEN 1 "
        " ELSE CAST(ceil(CAST(nt - 16 AS DOUBLE) / 12) AS BIGINT) + 1 END AS nc FROM n), "
        "g AS (SELECT doc_id, toks, nt, unnest(range(nc)) AS chunk_id FROM c) "
        "SELECT doc_id, chunk_id, "
        " array_to_string(toks[chunk_id * 12 + 1 : LEAST(chunk_id * 12 + 16, nt)], ' ') AS text, "
        " LEAST(chunk_id * 12 + 16, nt) - chunk_id * 12 AS n_tokens FROM g"
    ),
    "lang_id": (
        # valid for Latin-only corpora (the synthetic documents table is
        # pure ASCII, where the script-range detector can never fire); the
        # marker lists are generated from the engine's own _LANG_MARKERS
        "WITH markers(lang_ord, lang, tok) AS (VALUES " + _lang_marker_rows() + "), "
        "toks AS (SELECT doc_id, t.tok FROM documents, "
        " LATERAL (SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'), "
        "   s -> len(s) > 0)) AS tok) t "
        " WHERE text IS NOT NULL), "
        "counts AS (SELECT doc_id, m.lang_ord, m.lang, count(*) AS c "
        " FROM toks JOIN markers m ON m.tok = toks.tok GROUP BY 1, 2, 3), "
        "best AS (SELECT doc_id, lang, ROW_NUMBER() OVER "
        " (PARTITION BY doc_id ORDER BY c DESC, lang_ord ASC) AS rn FROM counts) "
        "SELECT d.doc_id, COALESCE(b.lang, 'und') AS lang_pred "
        "FROM documents d LEFT JOIN best b ON b.doc_id = d.doc_id AND b.rn = 1"
    ),
    "mmr_select": _mmr_oracle_sql(k=8, pool_n=50),
    "simhash_charhash": _charhash_simhash_sql(w=6, seed=7, max_hamming=3),
    "kcenter_select": _kcenter_oracle_sql(k=8, pool_n=50, seed=0),
    "chunk_sentences": (
        "WITH d0 AS (SELECT doc_id, replace(text, ' value ', '. ') AS text "
        " FROM documents WHERE text IS NOT NULL), "
        "m AS (SELECT doc_id, regexp_replace(text, '([.!?])[\\t\\n\\f\\r ]+', "
        " '\\1' || chr(31), 'g') AS mt FROM d0), "
        "d AS (SELECT doc_id, "
        " list_filter(string_split(mt, chr(31)), u -> len(u) > 0) AS toks FROM m), "
        "n AS (SELECT doc_id, toks, len(toks) AS nt FROM d WHERE len(toks) > 0), "
        "c AS (SELECT doc_id, toks, nt, CASE WHEN nt <= 3 THEN 1 "
        " ELSE CAST(ceil(CAST(nt - 3 AS DOUBLE) / 2) AS BIGINT) + 1 END AS nc FROM n), "
        "g AS (SELECT doc_id, toks, nt, unnest(range(nc)) AS chunk_id FROM c) "
        "SELECT doc_id, chunk_id, "
        " array_to_string(toks[chunk_id * 2 + 1 : LEAST(chunk_id * 2 + 3, nt)], ' ') AS text, "
        " LEAST(chunk_id * 2 + 3, nt) - chunk_id * 2 AS n_units FROM g"
    ),
    "robots_filter": (
        "WITH p AS (SELECT doc_id, "
        " 'h' || CAST(doc_id % 5 AS VARCHAR) || '.example.com' AS host, "
        " CASE WHEN doc_id % 4 = 0 THEN '/ok/' || CAST(doc_id AS VARCHAR) "
        "      WHEN doc_id % 4 = 1 THEN '/private/' || CAST(doc_id AS VARCHAR) "
        "      WHEN doc_id % 4 = 2 THEN '/private/open/' || CAST(doc_id AS VARCHAR) "
        "      ELSE '/logs/' || CAST(doc_id AS VARCHAR) || '.' || "
        "        CASE WHEN (doc_id // 4) % 2 = 1 THEN 'log' ELSE 'txt' END END AS path "
        " FROM documents), "
        # verdicts: h0 longest-match (Allow /private/open beats Disallow
        # /private/), h1 block-all, h2 allow-all, h3 wildcard *.log with the
        # mybot group ignored, h4 no robots
        "v AS (SELECT doc_id, host, path, CASE "
        " WHEN host = 'h0.example.com' THEN "
        "   (path NOT LIKE '/private/%' OR path LIKE '/private/open%') "
        " WHEN host = 'h1.example.com' THEN FALSE "
        " WHEN host = 'h3.example.com' THEN path NOT LIKE '/logs/%.log%' "
        " ELSE TRUE END AS keep FROM p) "
        "SELECT doc_id, 'https://' || host || path AS url FROM v WHERE keep"
    ),
    "key_counts": (
        "SELECT p_brand, CAST(p_size AS BIGINT) AS p_size, count(*) AS n FROM part GROUP BY p_brand, p_size"
    ),
    "pair_counts": (
        "SELECT p_brand, CAST(p_size AS BIGINT) AS p_size, CAST(count(*)*(count(*)-1)/2 AS BIGINT) AS n_pairs "
        "FROM part GROUP BY p_brand, p_size"
    ),
    "key_linker_pairs": _PAIR_SQL,
    "key_linker_link": (
        "SELECT c_custkey AS record_id_l, s_suppkey AS record_id_r "
        "FROM customer JOIN supplier ON c_nationkey = s_nationkey"
    ),
    "unnest_linker": (
        "WITH toks AS (SELECT p_partkey, unnest(string_split(p_name, ' ')) AS tok FROM part) "
        "SELECT DISTINCT a.p_partkey AS record_id_l, b.p_partkey AS record_id_r "
        "FROM toks a JOIN toks b ON a.tok = b.tok AND a.p_partkey < b.p_partkey"
    ),
    "exact_dedupe": (
        "SELECT min(doc_id) AS keep_id, "
        "count(*) AS n_dups FROM documents GROUP BY text"
    ),
    "incremental_dedupe": (
        "SELECT CAST(doc_id AS BIGINT) AS doc_id FROM ("
        " SELECT doc_id, text || '#' || CAST(doc_id AS VARCHAR) AS key"
        "  FROM documents WHERE doc_id % 2 = 1"
        " UNION ALL"
        " SELECT doc_id + 1000000 AS doc_id,"
        "  text || '#' || CAST(doc_id AS VARCHAR) AS key FROM documents"
        "  WHERE doc_id % 10 = 0"
        ") d2 WHERE key NOT IN"
        " (SELECT text || '#' || CAST(doc_id AS VARCHAR)"
        "  FROM documents WHERE doc_id % 2 = 0)"
        " ORDER BY doc_id"
    ),
    "incremental_dedupe_bloom": (
        "SELECT CAST(doc_id AS BIGINT) AS doc_id FROM ("
        " SELECT doc_id, text || '#' || CAST(doc_id AS VARCHAR) AS key"
        "  FROM documents WHERE doc_id % 2 = 1"
        " UNION ALL"
        " SELECT doc_id + 1000000 AS doc_id,"
        "  text || '#' || CAST(doc_id AS VARCHAR) AS key FROM documents"
        "  WHERE doc_id % 10 = 0"
        ") d2 WHERE key NOT IN"
        " (SELECT text || '#' || CAST(doc_id AS VARCHAR)"
        "  FROM documents WHERE doc_id % 2 = 0)"
        " ORDER BY doc_id"
    ),
    "fingerprint": (
        "SELECT doc_id, md5(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS fingerprint "
        "FROM documents"
    ),
    "token_stats": (
        f"WITH t AS ({_TOKS_SQL}) "
        "SELECT doc_id, length(text) AS n_chars, "
        "len(toks) AS n_tokens, len(list_distinct(toks)) AS n_uniq_tokens, "
        "CAST(ROUND(list_sum(list_transform(toks, x -> length(x))) * 1.0 / len(toks) * 1000000) AS BIGINT) AS avg_token_len_e6, "
        f"CAST(ROUND(len(list_filter(toks, x -> list_contains([{_STOP_SQL}], lower(x)))) * 1.0 / len(toks) * 1000000) AS BIGINT) AS stopword_ratio_e6 "
        "FROM t"
    ),
    "quality_filter": (
        f"WITH t AS ({_TOKS_SQL}) "
        "SELECT doc_id, len(toks) AS n_tokens, "
        "len(list_distinct(toks)) AS n_uniq_tokens FROM t "
        "WHERE len(toks) >= 10 AND len(list_distinct(toks)) * 2 >= len(toks) "
        f"AND CAST(ROUND(len(list_filter(toks, x -> list_contains([{_STOP_SQL}], lower(x)))) * 1.0 / len(toks) * 1000000) AS BIGINT) >= 100000"
    ),
    "topk_per_group": (
        f"WITH t AS ({_TOKS_SQL}), s AS ("
        " SELECT doc_id, (SELECT lang FROM documents d WHERE d.doc_id = t.doc_id) AS lang,"
        " len(toks) AS n_tokens FROM t)"
        " SELECT doc_id, lang, n_tokens FROM ("
        " SELECT *, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_tokens DESC, doc_id) AS rk"
        " FROM s) WHERE rk <= 3"
    ),
    "token_count_bpe": (
        f"WITH t AS ({_TOKS_SQL}) "
        "SELECT doc_id, CAST(list_sum(list_transform(toks, x -> "
        "greatest(1, CAST(ceil(length(x)/4.0) AS BIGINT)))) AS BIGINT) AS n_bpe_tokens FROM t"
    ),
    "term_idf": (
        f"WITH t AS ({_TOKS_SQL}), "
        "flat AS (SELECT doc_id, unnest(list_distinct(toks)) AS term FROM t), "
        "df AS (SELECT term, count(*) AS df FROM flat GROUP BY term) "
        "SELECT term, CAST(ROUND(LN((SELECT count(*) FROM documents WHERE text IS NOT NULL) "
        "/ CAST(df AS DOUBLE)) * 1000000) AS BIGINT) AS idf_e6 FROM df"
    ),
    "document_counts": (
        f"WITH t AS ({_TOKS_SQL}), "
        "flat AS (SELECT doc_id, unnest(list_distinct(toks)) AS term FROM t) "
        "SELECT term, count(*) AS n_records FROM flat GROUP BY term"
    ),
    "rare_terms": (
        f"WITH t AS ({_TOKS_SQL}), "
        "flat AS (SELECT doc_id, unnest(list_distinct(toks)) AS term FROM t), "
        "df AS (SELECT term, count(*) AS n FROM flat GROUP BY term) "
        "SELECT term FROM df WHERE n <= 100"
    ),
    "heavy_hitters": (
        f"WITH t AS ({_TOKS_SQL}), "
        "flat AS (SELECT unnest(toks) AS term FROM t), "
        "c AS (SELECT term, count(*) AS n FROM flat GROUP BY term) "
        "SELECT term, n FROM c ORDER BY n DESC, term ASC LIMIT 8"
    ),
    "semantic_decontaminate": (
        "SELECT a.vec_id FROM embeddings a WHERE a.vec_id < 400 "
        "AND NOT EXISTS (SELECT 1 FROM embeddings b WHERE b.vec_id >= 400 "
        " AND list_cosine_similarity(a.embedding, b.embedding) >= 0.40)"
    ),
    "subtract_exact": (
        "SELECT a.doc_id FROM documents a WHERE a.doc_id % 3 != 0 "
        "AND NOT EXISTS (SELECT 1 FROM documents b WHERE b.doc_id % 5 = 0 "
        " AND b.text = a.text)"
    ),
    "quantiles_by": (
        "WITH e AS (SELECT user_id, "
        " CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents FROM events) "
        "SELECT user_id, quantile_disc(cents, 0.25) AS q25, "
        " quantile_disc(cents, 0.5) AS q50, "
        " quantile_disc(cents, 0.75) AS q75 "
        "FROM e GROUP BY user_id"
    ),
    "window_fns": (
        "WITH e AS (SELECT event_id, user_id, ts, "
        " CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents FROM events) "
        "SELECT event_id, user_id, "
        " LAG(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS lag_cents, "
        " LEAD(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS lead_cents, "
        " CAST(SUM(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id "
        "  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)"
        "  AS cum_cents, "
        " MAX(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id "
        "  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS max_cents, "
        " CAST(SUM(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id "
        "  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT)"
        "  AS roll3_cents, "
        " ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn "
        "FROM e"
    ),
    "describe": (
        "SELECT 'doc_id' AS \"column\", 'int64' AS dtype, "
        " COUNT(doc_id) AS n, COUNT(*) - COUNT(doc_id) AS n_null, "
        " COUNT(DISTINCT doc_id) AS n_distinct, "
        " CAST(MIN(doc_id) AS VARCHAR) AS \"min\", "
        " CAST(MAX(doc_id) AS VARCHAR) AS \"max\", "
        " CAST(FLOOR(SUM(doc_id) * 1000000.0 / COUNT(doc_id) + 0.5) AS BIGINT)"
        "  AS mean_e6 "
        "FROM documents "
        "UNION ALL "
        "SELECT 'lang', 'string', COUNT(lang), COUNT(*) - COUNT(lang), "
        " COUNT(DISTINCT lang), MIN(lang), MAX(lang), CAST(NULL AS BIGINT) "
        "FROM documents"
    ),
    "connected_components": (
        "WITH RECURSIVE edges AS ("
        " SELECT a.p_partkey AS s, b.p_partkey AS d FROM part a JOIN part b"
        "  ON a.p_brand = b.p_brand AND a.p_size = b.p_size AND a.p_partkey <> b.p_partkey"
        " UNION "
        " SELECT a.p_partkey, b.p_partkey FROM part a JOIN part b"
        "  ON a.p_type = b.p_type AND a.p_size = b.p_size AND a.p_partkey <> b.p_partkey"
        "), walk(node, comp) AS ("
        " SELECT p_partkey, p_partkey FROM part"
        " UNION "
        " SELECT e.d, w.comp FROM walk w JOIN edges e ON e.s = w.node"
        ") SELECT node AS record_id, min(comp) AS component FROM walk GROUP BY node"
    ),
    "connected_components_star": (
        "WITH RECURSIVE edges AS ("
        " SELECT a.p_partkey AS s, b.p_partkey AS d FROM part a JOIN part b"
        "  ON a.p_brand = b.p_brand AND a.p_size = b.p_size AND a.p_partkey <> b.p_partkey"
        " UNION "
        " SELECT a.p_partkey, b.p_partkey FROM part a JOIN part b"
        "  ON a.p_type = b.p_type AND a.p_size = b.p_size AND a.p_partkey <> b.p_partkey"
        "), walk(node, comp) AS ("
        " SELECT p_partkey, p_partkey FROM part"
        " UNION "
        " SELECT e.d, w.comp FROM walk w JOIN edges e ON e.s = w.node"
        ") SELECT node AS record_id, min(comp) AS component FROM walk GROUP BY node"
    ),
    "connected_components_str": (
        "WITH RECURSIVE recs AS ("
        " SELECT 'P' || CAST(p_partkey AS VARCHAR) AS rid, p_brand, p_size FROM part"
        "), edges AS ("
        " SELECT a.rid AS s, b.rid AS d FROM recs a JOIN recs b"
        "  ON a.p_brand = b.p_brand AND a.p_size = b.p_size AND a.rid <> b.rid"
        "), walk(node, comp) AS ("
        " SELECT rid, rid FROM recs"
        " UNION "
        " SELECT e.d, w.comp FROM walk w JOIN edges e ON e.s = w.node"
        ") SELECT node AS record_id, min(comp) AS component_id FROM walk GROUP BY node"
    ),
    "sorted_neighborhood": (
        "WITH r AS (SELECT c_custkey, ROW_NUMBER() OVER (ORDER BY c_name, c_custkey) AS rk "
        "FROM customer) "
        "SELECT least(a.c_custkey, b.c_custkey) AS record_id_l, "
        "greatest(a.c_custkey, b.c_custkey) AS record_id_r "
        "FROM r a JOIN r b ON b.rk - a.rk BETWEEN 1 AND 3"
    ),
    "fs_score": _FS_SQL_CORE,
    "filter_links_best": (
        f"WITH scored AS ({_FS_SQL_CORE}) "
        "SELECT record_id_l, record_id_r, odds_e6 FROM ("
        " SELECT record_id_l, record_id_r, odds_e6, "
        " ROW_NUMBER() OVER (PARTITION BY record_id_r ORDER BY odds_e6 DESC, record_id_l) AS rk "
        " FROM scored) WHERE rk = 1"
    ),
    "with_n_links": (
        f"WITH pairs AS ({_PAIR_SQL}), "
        "c AS (SELECT record_id_l, count(*) AS n FROM pairs GROUP BY record_id_l) "
        "SELECT p.p_partkey AS record_id, coalesce(c.n, 0) AS n_links "
        "FROM part p LEFT JOIN c ON c.record_id_l = p.p_partkey"
    ),
    "link_counts": (
        f"WITH pairs AS ({_PAIR_SQL}), "
        "c AS (SELECT record_id_l, count(*) AS n FROM pairs GROUP BY record_id_l), "
        "nl AS (SELECT p.p_partkey, coalesce(c.n, 0) AS n_links "
        " FROM part p LEFT JOIN c ON c.record_id_l = p.p_partkey) "
        "SELECT n_links, count(*) AS n_records FROM nl GROUP BY n_links"
    ),
    "degree": (
        f"WITH pairs AS ({_PAIR_SQL}), "
        "sym AS (SELECT record_id_l AS a, record_id_r AS b FROM pairs "
        " UNION ALL SELECT record_id_r, record_id_l FROM pairs), "
        "d AS (SELECT DISTINCT a, b FROM sym) "
        "SELECT a AS record_id, count(*) AS degree FROM d GROUP BY a"
    ),
    "ann_topk": (
        "WITH sims AS ("
        " SELECT a.vec_id AS q, b.vec_id AS n, "
        " list_cosine_similarity(a.embedding, b.embedding) AS c "
        " FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id "
        " WHERE a.vec_id < 20), "
        "ranked AS (SELECT q, n, ROW_NUMBER() OVER (PARTITION BY q ORDER BY c DESC, n) AS rk FROM sims) "
        "SELECT q AS query_id, n AS neighbor_id, rk FROM ranked WHERE rk <= 3"
    ),
    "embedding_neardup": (
        "SELECT a.vec_id AS record_id_l, b.vec_id AS record_id_r "
        "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
        "WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.40"
    ),
    "embedding_linker_link": (
        "SELECT a.vec_id AS record_id_l, b.vec_id AS record_id_r "
        "FROM embeddings a JOIN embeddings b "
        "ON a.vec_id < 250 AND b.vec_id >= 250 "
        "WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.40"
    ),
    # ivf_topk / ivfpq_topk share one oracle: with the injected vec_id
    # 100..115 centroids and (for ivfpq) refine wider than any list, BOTH
    # must return the exact cosine top-3 restricted to each query's 10
    # probed lists, ties broken by neighbor_id.  Assignment/probe/merge
    # tie-breaks mirror the engine's argmax / lexsort((nids, -sims)).
    "ivf_topk": _IVF_ORACLE,
    "ivfpq_topk": _IVF_ORACLE,
    # the same typo corpus rebuilt with substr arithmetic; the all-pairs
    # levenshtein join is the COMPLETE-recall check of the delete-variant
    # blocking (dedupe task: record_id_l < record_id_r)
    "spelling_pairs": (
        "WITH toks AS (SELECT p_partkey, string_split(p_name, ' ')[1] AS tok "
        " FROM part WHERE p_partkey < 1500 AND p_name IS NOT NULL), "
        "r AS (SELECT p_partkey AS record_id, "
        " CASE WHEN p_partkey % 3 = 0 AND strlen(tok) > 3 "
        "  THEN substr(tok, 1, p_partkey % greatest(strlen(tok) - 2, 1) + 1) "
        "    || substr(tok, p_partkey % greatest(strlen(tok) - 2, 1) + 3) "
        "  ELSE tok END AS name FROM toks) "
        "SELECT a.record_id AS record_id_l, b.record_id AS record_id_r "
        "FROM r a JOIN r b ON a.record_id < b.record_id "
        "WHERE levenshtein(a.name, b.name) <= 1"
    ),
    # f0-f2 = channel means, f3-f6 = 2x2 luminance-grid means (TL,TR,BL,BR)
    # of the arithmetic pixel rule; averaging over all channels in a
    # quadrant equals the mean of per-pixel luminances (equal channel count)
    "media_features": (
        "WITH px AS (SELECT d.doc_id, g.y, g.x, g.c, "
        "  (d.doc_id * 31 + g.y * 8 + g.x + g.c * 7) % 256 AS v "
        " FROM documents d CROSS JOIN ("
        "  SELECT yy.y, xx.x, cc.c FROM "
        "   (SELECT unnest(generate_series(0, 7)) AS y) yy, "
        "   (SELECT unnest(generate_series(0, 7)) AS x) xx, "
        "   (SELECT unnest(generate_series(0, 2)) AS c) cc) g) "
        "SELECT doc_id, "
        " CAST(floor(AVG(v) FILTER (c = 0) * 1000000 + 0.5) AS BIGINT) AS f0, "
        " CAST(floor(AVG(v) FILTER (c = 1) * 1000000 + 0.5) AS BIGINT) AS f1, "
        " CAST(floor(AVG(v) FILTER (c = 2) * 1000000 + 0.5) AS BIGINT) AS f2, "
        " CAST(floor(AVG(v) FILTER (y < 4 AND x < 4) * 1000000 + 0.5) AS BIGINT) AS f3, "
        " CAST(floor(AVG(v) FILTER (y < 4 AND x >= 4) * 1000000 + 0.5) AS BIGINT) AS f4, "
        " CAST(floor(AVG(v) FILTER (y >= 4 AND x < 4) * 1000000 + 0.5) AS BIGINT) AS f5, "
        " CAST(floor(AVG(v) FILTER (y >= 4 AND x >= 4) * 1000000 + 0.5) AS BIGINT) AS f6 "
        "FROM px GROUP BY doc_id"
    ),
    "lang_distinct_approx": (
        "SELECT lang, CAST(COUNT(DISTINCT text) AS BIGINT) AS exact_distinct, "
        " TRUE AS hll_within_20pct FROM documents "
        "WHERE lang IS NOT NULL AND text IS NOT NULL GROUP BY lang"
    ),
    "compression_stats": (
        "WITH chars AS (SELECT doc_id, unnest(string_split(text, '')) AS c "
        "  FROM documents WHERE text IS NOT NULL AND text <> ''), "
        "ent AS (SELECT doc_id, entropy(c) AS h FROM chars GROUP BY doc_id) "
        "SELECT d.doc_id, CAST(strlen(COALESCE(d.text, '')) AS BIGINT) AS utf8_bytes, "
        " CAST(floor(COALESCE(e.h, 0) * 10000 + 0.5) AS BIGINT) AS char_entropy_e4, "
        " TRUE AS deflate_in_bounds "
        "FROM documents d LEFT JOIN ent e USING (doc_id)"
    ),
    # n_bytes = fixed html wrapper (190 B) + 'd{doc_id}' title + utf8 bytes
    # of html.escape(text): & -> &amp; (+4), < -> &lt; (+3), > -> &gt; (+3),
    # " -> &quot; (+5), ' -> &#x27; (+5); strlen() is DuckDB's BYTE length.
    "read_warc": (
        "WITH t AS (SELECT doc_id, COALESCE(text, '') AS tx FROM documents) "
        "SELECT 'https://w' || (doc_id % 11) || '.example.org/d/' || doc_id AS url, "
        " 'response' AS record_type, "
        " CAST(190 + strlen('d' || doc_id) + strlen(tx) "
        "  + 4 * (strlen(tx) - strlen(replace(tx, '&', ''))) "
        "  + 3 * (strlen(tx) - strlen(replace(tx, '<', ''))) "
        "  + 3 * (strlen(tx) - strlen(replace(tx, '>', ''))) "
        "  + 5 * (strlen(tx) - strlen(replace(tx, '\"', ''))) "
        "  + 5 * (strlen(tx) - strlen(replace(tx, chr(39), ''))) AS BIGINT) AS n_bytes "
        "FROM t"
    ),
    "hash_split": (
        "WITH s1 AS (SELECT p_partkey, CAST((CAST(CAST(p_partkey AS UBIGINT) AS HUGEINT) + 11400714819323198527) "
        " % 18446744073709551616 AS UBIGINT) AS z FROM part), "
        "s2 AS (SELECT p_partkey, CAST(((CAST((xor(z, z >> 30)) >> 32 AS HUGEINT) * 13787848793156543929 % 4294967296) * 4294967296 + CAST((xor(z, z >> 30)) & 4294967295 AS HUGEINT) * 13787848793156543929) % 18446744073709551616 AS UBIGINT) AS z FROM s1), "
        "s3 AS (SELECT p_partkey, CAST(((CAST((xor(z, z >> 27)) >> 32 AS HUGEINT) * 10723151780598845931 % 4294967296) * 4294967296 + CAST((xor(z, z >> 27)) & 4294967295 AS HUGEINT) * 10723151780598845931) % 18446744073709551616 AS UBIGINT) AS z FROM s2), "
        "b AS (SELECT p_partkey, xor(z, z >> 31) % 1000000 AS bucket FROM s3) "
        "SELECT p_partkey AS record_id, CASE WHEN bucket < 800000 THEN 'train' "
        "WHEN bucket < 900000 THEN 'val' ELSE 'test' END AS split FROM b"
    ),
    "row_number": (
        # splitmix64(doc_id) order (seed 0) -> ROW_NUMBER() - 1
        "WITH s1 AS (SELECT doc_id, CAST((CAST(CAST(doc_id AS UBIGINT) AS HUGEINT) + 11400714819323198485) "
        " % 18446744073709551616 AS UBIGINT) AS z FROM documents), "
        "s2 AS (SELECT doc_id, CAST(((CAST((xor(z, z >> 30)) >> 32 AS HUGEINT) * 13787848793156543929 % 4294967296) * 4294967296 + CAST((xor(z, z >> 30)) & 4294967295 AS HUGEINT) * 13787848793156543929) % 18446744073709551616 AS UBIGINT) AS z FROM s1), "
        "s3 AS (SELECT doc_id, CAST(((CAST((xor(z, z >> 27)) >> 32 AS HUGEINT) * 10723151780598845931 % 4294967296) * 4294967296 + CAST((xor(z, z >> 27)) & 4294967295 AS HUGEINT) * 10723151780598845931) % 18446744073709551616 AS UBIGINT) AS z FROM s2) "
        "SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY xor(z, z >> 31), doc_id) - 1 AS BIGINT) AS row_number FROM s3"
    ),
    "blocking_report": (
        "WITH cand AS (SELECT a.p_partkey AS l, b.p_partkey AS r FROM part a JOIN part b "
        " ON a.p_brand = b.p_brand AND a.p_size = b.p_size AND a.p_partkey < b.p_partkey), "
        "tru AS (SELECT a.p_partkey AS l, b.p_partkey AS r FROM part a JOIN part b "
        " ON list_extract(string_split(a.p_name, ' '), 1) = list_extract(string_split(b.p_name, ' '), 1) "
        " AND a.p_partkey < b.p_partkey), "
        "n AS (SELECT count(*) AS c FROM part), "
        "s AS (SELECT (SELECT count(*) FROM cand) AS n_candidates, "
        " (SELECT count(*) FROM tru) AS n_true, "
        " (SELECT count(*) FROM tru SEMI JOIN cand USING (l, r)) AS true_found, "
        " (SELECT c * (c - 1) // 2 FROM n) AS total_pairs) "
        "SELECT CAST(n_candidates AS BIGINT) AS n_candidates, CAST(n_true AS BIGINT) AS n_true, "
        " CAST(true_found AS BIGINT) AS true_found, CAST(total_pairs AS BIGINT) AS total_pairs, "
        " CAST(ROUND(true_found / n_true * 1000000) AS BIGINT) AS completeness_e6, "
        " CAST(ROUND((1.0 - n_candidates / total_pairs) * 1000000) AS BIGINT) AS reduction_e6 "
        "FROM s"
    ),
    "quantiles": (
        "WITH v AS (SELECT quantile_disc(l_extendedprice, "
        " [0.01, 0.25, 0.5, 0.75, 0.9, 0.99]) AS vs FROM lineitem), "
        "q AS (SELECT unnest([10000, 250000, 500000, 750000, 900000, 990000]) AS q_e6, "
        " unnest(generate_series(1, 6)) AS i) "
        "SELECT CAST(q.q_e6 AS BIGINT) AS q_e6, v.vs[CAST(q.i AS INT)] AS value FROM q, v"
    ),
    "pr_curve": (
        # same scored CTE as fs_score + mfgr truth; per-threshold filters
        "WITH pairs AS (SELECT a.p_partkey AS record_id_l, b.p_partkey AS record_id_r, "
        " a.p_name AS p_name_l, b.p_name AS p_name_r, a.p_type AS p_type_l, b.p_type AS p_type_r, "
        " (list_extract(string_split(a.p_name, ' '), 1) = list_extract(string_split(b.p_name, ' '), 1)) AS is_true "
        " FROM part a JOIN part b ON a.p_brand = b.p_brand AND a.p_size = b.p_size AND a.p_partkey < b.p_partkey), "
        "lvl AS (SELECT is_true, "
        " CAST(ROUND((CASE WHEN p_name_l = p_name_r THEN 0.9/0.01 "
        "   WHEN levenshtein(p_name_l, p_name_r) <= 3 THEN 0.5/0.05 ELSE 1.0 END "
        "  * CASE WHEN p_type_l = p_type_r THEN 0.8/0.1 ELSE 1.0 END) * 1000000) AS BIGINT) AS odds_e6 "
        " FROM pairs), "
        "th AS (SELECT unnest([1000000, 8000000, 80000000]) AS threshold), "
        "agg AS (SELECT th.threshold, "
        " CAST(sum(CASE WHEN odds_e6 >= th.threshold AND is_true THEN 1 ELSE 0 END) AS BIGINT) AS tp, "
        " CAST(sum(CASE WHEN odds_e6 >= th.threshold AND NOT is_true THEN 1 ELSE 0 END) AS BIGINT) AS fp, "
        " CAST(sum(CASE WHEN odds_e6 < th.threshold AND is_true THEN 1 ELSE 0 END) AS BIGINT) AS fn "
        " FROM th CROSS JOIN lvl GROUP BY th.threshold) "
        "SELECT CAST(threshold AS BIGINT) AS threshold, tp, fp, fn, "
        " CAST(CASE WHEN tp + fp > 0 THEN ROUND(tp / (tp + fp) * 1000000) ELSE 1000000 END AS BIGINT) AS precision_e6, "
        " CAST(CASE WHEN tp + fn > 0 THEN ROUND(tp / (tp + fn) * 1000000) ELSE 1000000 END AS BIGINT) AS recall_e6 "
        "FROM agg"
    ),
    "mixture_sample": (
        # same splitmix64 bucket as hash_split (seed 0), then per-lang rate:
        # copies = floor(rate) + (bucket < round(frac(rate)*1e6)); one output
        # row per copy with its 0-based copy index
        "WITH s1 AS (SELECT doc_id, lang, CAST((CAST(CAST(doc_id AS UBIGINT) AS HUGEINT) + 11400714819323198485) "
        " % 18446744073709551616 AS UBIGINT) AS z FROM documents), "
        "s2 AS (SELECT doc_id, lang, CAST(((CAST((xor(z, z >> 30)) >> 32 AS HUGEINT) * 13787848793156543929 % 4294967296) * 4294967296 + CAST((xor(z, z >> 30)) & 4294967295 AS HUGEINT) * 13787848793156543929) % 18446744073709551616 AS UBIGINT) AS z FROM s1), "
        "s3 AS (SELECT doc_id, lang, CAST(((CAST((xor(z, z >> 27)) >> 32 AS HUGEINT) * 10723151780598845931 % 4294967296) * 4294967296 + CAST((xor(z, z >> 27)) & 4294967295 AS HUGEINT) * 10723151780598845931) % 18446744073709551616 AS UBIGINT) AS z FROM s2), "
        "b AS (SELECT doc_id, lang, xor(z, z >> 31) % 1000000 AS bucket FROM s3), "
        "r AS (SELECT doc_id, lang, bucket, CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 2.25 WHEN 'zh' THEN 0.0 ELSE 1.0 END AS rate FROM b), "
        "c AS (SELECT doc_id, lang, CAST(floor(rate) AS BIGINT) + "
        " (CASE WHEN bucket < CAST(round((rate - floor(rate)) * 1000000) AS UBIGINT) THEN 1 ELSE 0 END) AS copies FROM r) "
        "SELECT doc_id, lang, CAST(u.i AS BIGINT) AS n_copy "
        "FROM c, LATERAL (SELECT unnest(range(0, copies)) AS i) AS u"
    ),
    "pack_sequences": (
        # splitmix64(doc_id) order key (seed 0), then the packing prefix sum
        # as a window function over (key, doc_id)
        "WITH s1 AS (SELECT doc_id, n_chars, CAST((CAST(CAST(doc_id AS UBIGINT) AS HUGEINT) + 11400714819323198485) "
        " % 18446744073709551616 AS UBIGINT) AS z FROM documents), "
        "s2 AS (SELECT doc_id, n_chars, CAST(((CAST((xor(z, z >> 30)) >> 32 AS HUGEINT) * 13787848793156543929 % 4294967296) * 4294967296 + CAST((xor(z, z >> 30)) & 4294967295 AS HUGEINT) * 13787848793156543929) % 18446744073709551616 AS UBIGINT) AS z FROM s1), "
        "s3 AS (SELECT doc_id, n_chars, CAST(((CAST((xor(z, z >> 27)) >> 32 AS HUGEINT) * 10723151780598845931 % 4294967296) * 4294967296 + CAST((xor(z, z >> 27)) & 4294967295 AS HUGEINT) * 10723151780598845931) % 18446744073709551616 AS UBIGINT) AS z FROM s2), "
        "b AS (SELECT doc_id, n_chars, xor(z, z >> 31) AS pkey FROM s3), "
        "o AS (SELECT doc_id, n_chars, "
        " CAST(SUM(coalesce(n_chars, 0)) OVER (ORDER BY pkey, doc_id ROWS UNBOUNDED PRECEDING) - coalesce(n_chars, 0) AS BIGINT) AS global_offset FROM b) "
        "SELECT doc_id, n_chars, global_offset, "
        " global_offset // 4096 AS seq_id, global_offset % 4096 AS seq_pos FROM o"
    ),
    "semdedup": (
        "SELECT a.vec_id, CAST(a.vec_id % 16 AS BIGINT) AS cluster "
        "FROM embeddings a WHERE NOT EXISTS ("
        " SELECT 1 FROM embeddings b "
        " WHERE b.vec_id % 16 = a.vec_id % 16 AND b.vec_id < a.vec_id "
        " AND list_cosine_similarity(a.embedding, b.embedding) >= 0.40)"
    ),
    "groupby_agg": (
        "SELECT l_returnflag, "
        "CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_cents, "
        "CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_rev_cents, "
        "count(*) AS n FROM lineitem GROUP BY l_returnflag"
    ),
    "tf_lookup": (
        "WITH c AS (SELECT c_mktsegment, count(*) AS n FROM customer GROUP BY c_mktsegment), "
        "tot AS (SELECT count(*) AS total FROM customer) "
        "SELECT cu.c_custkey AS record_id, cu.c_mktsegment, "
        "CAST(ROUND(c.n * 1.0 / tot.total * 1000000) AS BIGINT) AS tf_e6 "
        "FROM customer cu JOIN c ON cu.c_mktsegment = c.c_mktsegment CROSS JOIN tot"
    ),
    "events_tumbling": (
        "SELECT CAST(user_id AS BIGINT) AS user_id, "
        "CAST(epoch_us(ts) // 3600000000 * 3600 AS BIGINT) AS window_start, "
        "count(*) AS n_events, "
        "CAST(ROUND(SUM(value) * 1000000) AS BIGINT) AS value_sum_e6 "
        "FROM events GROUP BY 1, 2"
    ),
    "events_sliding": (
        "SELECT user_id, window_start, count(*) AS n_events, "
        "CAST(ROUND(SUM(value) * 1000000) AS BIGINT) AS value_sum_e6 FROM ("
        " SELECT CAST(user_id AS BIGINT) AS user_id, "
        " CAST((epoch_us(ts) // 1000000 // 900) * 900 - h.k * 900 AS BIGINT) AS window_start, "
        " value FROM events CROSS JOIN (SELECT unnest(range(0, 4)) AS k) h"
        ") GROUP BY 1, 2"
    ),
    "events_sessionize": (
        "WITH e AS (SELECT user_id, epoch_us(ts) AS tus FROM events), "
        "marked AS (SELECT user_id, tus, "
        " CASE WHEN tus - lag(tus) OVER (PARTITION BY user_id ORDER BY tus) > 1800000000 "
        " THEN 1 ELSE 0 END AS brk FROM e), "
        "sess AS (SELECT user_id, tus, "
        " CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY tus "
        "  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM marked) "
        "SELECT CAST(user_id AS BIGINT) AS user_id, session_id, "
        "CAST(min(tus) // 1000000 AS BIGINT) AS session_start_s, "
        "CAST(max(tus) // 1000000 AS BIGINT) AS session_end_s, "
        "count(*) AS n_events FROM sess GROUP BY user_id, session_id"
    ),
    "with_linked_values": (
        f"WITH pairs AS ({_PAIR_SQL}), "
        "lv AS (SELECT p.record_id_l AS record_id, "
        " array_to_string(list_sort(list(b.p_name)), '|') AS linked_names "
        " FROM pairs p JOIN part b ON b.p_partkey = p.record_id_r GROUP BY 1) "
        "SELECT a.p_partkey AS record_id, coalesce(lv.linked_names, '') AS linked_names "
        "FROM part a LEFT JOIN lv ON lv.record_id = a.p_partkey"
    ),
    "keep_min_agreement": (
        "WITH pa_ AS (SELECT a.p_partkey AS record_id_l, b.p_partkey AS record_id_r "
        " FROM part a JOIN part b ON a.p_brand = b.p_brand AND a.p_size = b.p_size "
        "  AND a.p_partkey < b.p_partkey), "
        "pb AS (SELECT a.p_partkey AS record_id_l, b.p_partkey AS record_id_r "
        " FROM part a JOIN part b ON a.p_type = b.p_type AND a.p_size = b.p_size "
        "  AND a.p_partkey < b.p_partkey), "
        "allp AS (SELECT * FROM pa_ UNION ALL SELECT * FROM pb) "
        "SELECT record_id_l, record_id_r FROM ("
        " SELECT *, count(*) OVER (PARTITION BY record_id_l, record_id_r) AS c"
        " FROM allp) WHERE c >= 2"
    ),
    "upset_counts": (
        "WITH pa_ AS (SELECT a.p_partkey AS record_id_l, b.p_partkey AS record_id_r "
        " FROM part a JOIN part b ON a.p_brand = b.p_brand AND a.p_size = b.p_size "
        "  AND a.p_partkey < b.p_partkey), "
        "pb AS (SELECT a.p_partkey AS record_id_l, b.p_partkey AS record_id_r "
        " FROM part a JOIN part b ON a.p_type = b.p_type AND a.p_size = b.p_size "
        "  AND a.p_partkey < b.p_partkey), "
        "m AS (SELECT (a.record_id_l IS NOT NULL) AS in_a, "
        " (b.record_id_l IS NOT NULL) AS in_b "
        " FROM pa_ a FULL OUTER JOIN pb b "
        " ON a.record_id_l = b.record_id_l AND a.record_id_r = b.record_id_r) "
        "SELECT CASE WHEN in_a AND in_b THEN 'brand+ptype' "
        " WHEN in_a THEN 'brand' ELSE 'ptype' END AS intersection, "
        "count(*) AS n_pairs FROM m GROUP BY 1"
    ),
    "postal_parse": (
        "WITH comp AS (SELECT c_custkey AS k, "
        " CAST(100 + c_custkey % 899 AS VARCHAR) AS house, "
        " ['MAPLE','OAK','CEDAR','ELM','PINE','WALNUT','SPRUCE','BIRCH'][CAST(c_custkey % 8 AS INT)+1] AS nm, "
        " ['ST','AVENUE','RD'][CAST(c_custkey % 3 AS INT)+1] AS suf, "
        " ['street','avenue','road'][CAST(c_custkey % 3 AS INT)+1] AS canon, "
        " ['SPRINGFIELD','RIVERSIDE','FRANKLIN','NEW HAVEN','CLINTON','SALEM'][CAST(c_custkey % 6 AS INT)+1] AS city, "
        " ['IL','CA','TX','NY','OH','FL'][CAST((c_custkey // 6) % 6 AS INT)+1] AS st_out, "
        " CAST(10000 + (c_custkey * 7) % 89999 AS VARCHAR) AS zipc "
        " FROM customer) "
        "SELECT k AS record_id, house || ' ' || nm || ' ' || suf AS street1, "
        "city, st_out AS state, zipc AS postal_code, "
        "'act|' || lower(nm) || ' ' || canon || '|' || house || '|' || lower(city) AS fp0, "
        "CAST(4 AS BIGINT) AS n_fp FROM comp"
    ),
    "asof_join": (
        "WITH e AS (SELECT CAST(user_id AS BIGINT) AS user_id, epoch_us(ts) AS tus, value FROM events), "
        "l AS (SELECT user_id, tus FROM e WHERE tus % 2 = 0), "
        "r AS (SELECT user_id, tus, max(value) AS rv FROM e WHERE tus % 2 = 1 GROUP BY 1, 2) "
        "SELECT l.user_id, l.tus, r.tus AS tus_r, "
        "CAST(ROUND(r.rv * 1000000) AS BIGINT) AS rv_e6 "
        "FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.tus >= r.tus"
    ),
    "range_join": (
        "WITH r AS (SELECT s_suppkey, CAST(900 + (s_suppkey * 37) % 1100 AS DOUBLE) AS lo "
        " FROM supplier) "
        "SELECT p.p_partkey, r.s_suppkey, "
        "CAST(ROUND(p.p_retailprice * 100) AS BIGINT) AS price_c "
        "FROM part p JOIN r ON p.p_retailprice BETWEEN r.lo AND r.lo + 13"
    ),
    "keep_unambiguous": (
        f"WITH pairs AS ({_PAIR_SQL}) "
        "SELECT record_id_l, record_id_r FROM ("
        " SELECT record_id_l, record_id_r, "
        " count(DISTINCT record_id_l) OVER (PARTITION BY record_id_r) AS nd "
        " FROM pairs) WHERE nd = 1"
    ),
    "diff_updates": (
        "WITH before_t AS (SELECT p_partkey AS record_id, p_name FROM part), "
        "after_t AS ("
        " SELECT p_partkey AS record_id, "
        "  CASE WHEN p_partkey % 10 = 1 THEN p_name || 'X' ELSE p_name END AS p_name "
        " FROM part WHERE p_partkey % 10 <> 0 "
        " UNION ALL "
        " SELECT p_partkey + 1000000, p_name FROM part WHERE p_partkey % 10 = 2) "
        "SELECT 'insert' AS kind, a.record_id, CAST(NULL AS VARCHAR) AS name_before, a.p_name AS name_after "
        "FROM after_t a LEFT JOIN before_t b USING (record_id) WHERE b.record_id IS NULL "
        "UNION ALL "
        "SELECT 'delete', b.record_id, b.p_name, NULL "
        "FROM before_t b LEFT JOIN after_t a USING (record_id) WHERE a.record_id IS NULL "
        "UNION ALL "
        "SELECT 'update', b.record_id, b.p_name, a.p_name "
        "FROM before_t b JOIN after_t a USING (record_id) WHERE b.p_name <> a.p_name"
    ),
    "simhash_pairs": (
        "WITH ids AS (SELECT doc_id, CAST(doc_id % 97 + 1 AS UBIGINT) AS x, "
        " LEAST(doc_id // 97, 6) AS nb FROM documents), "
        "s1 AS (SELECT doc_id, nb, CAST((CAST(x AS HUGEINT) + 11400714819323198527) "
        " % 18446744073709551616 AS UBIGINT) AS z FROM ids), "
        "s2 AS (SELECT doc_id, nb, CAST(((CAST((xor(z, z >> 30)) >> 32 AS HUGEINT) "
        " * 13787848793156543929 % 4294967296) * 4294967296 "
        " + CAST((xor(z, z >> 30)) & 4294967295 AS HUGEINT) * 13787848793156543929) "
        " % 18446744073709551616 AS UBIGINT) AS z FROM s1), "
        "s3 AS (SELECT doc_id, nb, CAST(((CAST((xor(z, z >> 27)) >> 32 AS HUGEINT) "
        " * 10723151780598845931 % 4294967296) * 4294967296 "
        " + CAST((xor(z, z >> 27)) & 4294967295 AS HUGEINT) * 10723151780598845931) "
        " % 18446744073709551616 AS UBIGINT) AS z FROM s2), "
        "sig AS (SELECT doc_id, xor(xor(z, z >> 31), "
        " (CAST(1 AS UBIGINT) << nb) - 1) AS sig FROM s3) "
        "SELECT a.doc_id AS record_id_l, b.doc_id AS record_id_r "
        "FROM sig a JOIN sig b ON a.doc_id < b.doc_id "
        "WHERE bit_count(xor(a.sig, b.sig)) <= 3"
    ),
    "ngram_jaccard": (
        "WITH d AS (SELECT doc_id, substr(text, 1, 80) AS text FROM documents "
        " WHERE text IS NOT NULL AND doc_id % 2 = 0 "
        " AND length(substr(text, 1, 80)) >= 3), "
        "g AS (SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 3) AS gram "
        " FROM d, LATERAL (SELECT unnest(range(1, length(text) - 1)) AS i)), "
        "inter AS (SELECT a.doc_id AS l, b.doc_id AS r, count(*) AS c "
        " FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id "
        " GROUP BY 1, 2), "
        "sz AS (SELECT doc_id, count(*) AS n FROM g GROUP BY 1) "
        "SELECT l AS record_id_l, r AS record_id_r "
        "FROM inter JOIN sz sa ON sa.doc_id = l JOIN sz sb ON sb.doc_id = r "
        "WHERE c * 5 >= (sa.n + sb.n - c) * 4"
    ),
    "fuzzy_dedupe": (
        # same gram-join pair SQL as ngram_jaccard, then recursive-CTE
        # connected components over the even-doc_id universe, survivor =
        # the min member (node == its component label), + member counts
        "WITH RECURSIVE d AS (SELECT doc_id, substr(text, 1, 80) AS text FROM documents "
        " WHERE text IS NOT NULL AND doc_id % 2 = 0 "
        " AND length(substr(text, 1, 80)) >= 3), "
        "g AS (SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 3) AS gram "
        " FROM d, LATERAL (SELECT unnest(range(1, length(text) - 1)) AS i)), "
        "inter AS (SELECT a.doc_id AS l, b.doc_id AS r, count(*) AS c "
        " FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id "
        " GROUP BY 1, 2), "
        "sz AS (SELECT doc_id, count(*) AS n FROM g GROUP BY 1), "
        "pairs AS (SELECT l, r FROM inter "
        " JOIN sz sa ON sa.doc_id = l JOIN sz sb ON sb.doc_id = r "
        " WHERE c * 5 >= (sa.n + sb.n - c) * 4), "
        "edges AS (SELECT l AS s, r AS t FROM pairs UNION SELECT r, l FROM pairs), "
        "walk(node, comp) AS ("
        " SELECT doc_id, doc_id FROM documents WHERE doc_id % 2 = 0"
        " UNION "
        " SELECT e.t, w.comp FROM walk w JOIN edges e ON e.s = w.node"
        "), labels AS (SELECT node, min(comp) AS comp FROM walk GROUP BY node), "
        "counts AS (SELECT comp, CAST(count(*) AS BIGINT) AS n_members "
        " FROM labels GROUP BY comp) "
        "SELECT l.node AS keep_id, c.n_members "
        "FROM labels l JOIN counts c ON c.comp = l.comp WHERE l.node = l.comp"
    ),
    "fuzzy_dedupe_best": (
        # clusters as in fuzzy_dedupe; survivor = longest member (ties: min id)
        "WITH RECURSIVE d AS (SELECT doc_id, substr(text, 1, 80) AS text FROM documents "
        " WHERE text IS NOT NULL AND doc_id % 2 = 0 "
        " AND length(substr(text, 1, 80)) >= 3), "
        "g AS (SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 3) AS gram "
        " FROM d, LATERAL (SELECT unnest(range(1, length(text) - 1)) AS i)), "
        "inter AS (SELECT a.doc_id AS l, b.doc_id AS r, count(*) AS c "
        " FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id "
        " GROUP BY 1, 2), "
        "sz AS (SELECT doc_id, count(*) AS n FROM g GROUP BY 1), "
        "pairs AS (SELECT l, r FROM inter "
        " JOIN sz sa ON sa.doc_id = l JOIN sz sb ON sb.doc_id = r "
        " WHERE c * 5 >= (sa.n + sb.n - c) * 4), "
        "edges AS (SELECT l AS s, r AS t FROM pairs UNION SELECT r, l FROM pairs), "
        "walk(node, comp) AS ("
        " SELECT doc_id, doc_id FROM documents WHERE doc_id % 2 = 0"
        " UNION "
        " SELECT e.t, w.comp FROM walk w JOIN edges e ON e.s = w.node"
        "), labels AS (SELECT node, min(comp) AS comp FROM walk GROUP BY node), "
        "counts AS (SELECT comp, CAST(count(*) AS BIGINT) AS n_members "
        " FROM labels GROUP BY comp), "
        "lens AS (SELECT l.node, l.comp, "
        " CAST(coalesce(length(substr(dd.text, 1, 80)), 0) AS BIGINT) AS n80 "
        " FROM labels l LEFT JOIN documents dd ON dd.doc_id = l.node) "
        "SELECT node AS keep_id, n80, c.n_members "
        "FROM lens JOIN counts c USING (comp) "
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY comp ORDER BY n80 DESC, node ASC) = 1"
    ),
    "dedupe_report": (
        # clusters as in fuzzy_dedupe -> per-size counts + survivor savings
        "WITH RECURSIVE d AS (SELECT doc_id, substr(text, 1, 80) AS text FROM documents "
        " WHERE text IS NOT NULL AND doc_id % 2 = 0 "
        " AND length(substr(text, 1, 80)) >= 3), "
        "g AS (SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 3) AS gram "
        " FROM d, LATERAL (SELECT unnest(range(1, length(text) - 1)) AS i)), "
        "inter AS (SELECT a.doc_id AS l, b.doc_id AS r, count(*) AS c "
        " FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id "
        " GROUP BY 1, 2), "
        "sz AS (SELECT doc_id, count(*) AS n FROM g GROUP BY 1), "
        "pairs AS (SELECT l, r FROM inter "
        " JOIN sz sa ON sa.doc_id = l JOIN sz sb ON sb.doc_id = r "
        " WHERE c * 5 >= (sa.n + sb.n - c) * 4), "
        "edges AS (SELECT l AS s, r AS t FROM pairs UNION SELECT r, l FROM pairs), "
        "walk(node, comp) AS ("
        " SELECT doc_id, doc_id FROM documents WHERE doc_id % 2 = 0"
        " UNION "
        " SELECT e.t, w.comp FROM walk w JOIN edges e ON e.s = w.node"
        "), labels AS (SELECT node, min(comp) AS comp FROM walk GROUP BY node), "
        "lens AS (SELECT l.node, l.comp, "
        " CAST(coalesce(length(substr(dd.text, 1, 80)), 0) AS BIGINT) AS len "
        " FROM labels l LEFT JOIN documents dd ON dd.doc_id = l.node), "
        "per_comp AS (SELECT comp, CAST(count(*) AS BIGINT) AS cluster_size, "
        " CAST(sum(len) AS BIGINT) AS chars, "
        " CAST(min_by(len, node) AS BIGINT) AS surv_chars FROM lens GROUP BY comp) "
        "SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters, "
        " CAST(sum(cluster_size - 1) AS BIGINT) AS n_dup_docs, "
        " CAST(sum(chars - surv_chars) AS BIGINT) AS dup_chars "
        "FROM per_comp WHERE cluster_size >= 2 GROUP BY cluster_size"
    ),
    "cap_per_host": (
        # splitmix64(doc_id) rank within source, cap 10 (seed 0)
        "WITH s1 AS (SELECT doc_id, source, CAST((CAST(CAST(doc_id AS UBIGINT) AS HUGEINT) + 11400714819323198485) "
        " % 18446744073709551616 AS UBIGINT) AS z FROM documents), "
        "s2 AS (SELECT doc_id, source, CAST(((CAST((xor(z, z >> 30)) >> 32 AS HUGEINT) * 13787848793156543929 % 4294967296) * 4294967296 + CAST((xor(z, z >> 30)) & 4294967295 AS HUGEINT) * 13787848793156543929) % 18446744073709551616 AS UBIGINT) AS z FROM s1), "
        "s3 AS (SELECT doc_id, source, CAST(((CAST((xor(z, z >> 27)) >> 32 AS HUGEINT) * 10723151780598845931 % 4294967296) * 4294967296 + CAST((xor(z, z >> 27)) & 4294967295 AS HUGEINT) * 10723151780598845931) % 18446744073709551616 AS UBIGINT) AS z FROM s2) "
        "SELECT doc_id, source FROM s3 "
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY source ORDER BY xor(z, z >> 31)) <= 10"
    ),
    "token_budget": (
        # same splitmix64 mixer as cap_per_host, prefix running-sum cap 2000
        "WITH s1 AS (SELECT doc_id, source, coalesce(length(text), 0) AS n_chars, "
        " CAST((CAST(CAST(doc_id AS UBIGINT) AS HUGEINT) + 11400714819323198485) "
        " % 18446744073709551616 AS UBIGINT) AS z FROM documents), "
        "s2 AS (SELECT doc_id, source, n_chars, CAST(((CAST((xor(z, z >> 30)) >> 32 AS HUGEINT) * 13787848793156543929 % 4294967296) * 4294967296 + CAST((xor(z, z >> 30)) & 4294967295 AS HUGEINT) * 13787848793156543929) % 18446744073709551616 AS UBIGINT) AS z FROM s1), "
        "s3 AS (SELECT doc_id, source, n_chars, CAST(((CAST((xor(z, z >> 27)) >> 32 AS HUGEINT) * 10723151780598845931 % 4294967296) * 4294967296 + CAST((xor(z, z >> 27)) & 4294967295 AS HUGEINT) * 10723151780598845931) % 18446744073709551616 AS UBIGINT) AS z FROM s2) "
        "SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars FROM s3 "
        "QUALIFY SUM(n_chars) OVER (PARTITION BY source ORDER BY xor(z, z >> 31)) <= 2000"
    ),
    "c4_clean": (
        # identical synthesis; line rules + document rules + ordered rejoin
        "WITH d AS (SELECT doc_id, "
        " 'This is sentence number ' || CAST(doc_id AS VARCHAR) || '.' || chr(10) || "
        " 'too short.' || chr(10) || "
        " 'Please enable javascript now please.' || chr(10) || "
        " 'Another good line with words!' || chr(10) || "
        " 'no terminal punctuation here' || chr(10) || "
        " 'And a \"quoted finale\" number ' || CAST(doc_id % 9 AS VARCHAR) || ' works?' || "
        " CASE WHEN doc_id % 7 = 0 THEN chr(10) || 'code { block.' ELSE '' END || "
        " CASE WHEN doc_id % 11 = 3 THEN chr(10) || 'Some Lorem Ipsum filler text.' ELSE '' END AS text "
        " FROM documents), "
        "ok AS (SELECT doc_id, text FROM d "
        " WHERE NOT contains(lower(text), 'lorem ipsum') AND NOT contains(text, '{')), "
        "l AS (SELECT doc_id, t.line, t.i FROM ok, LATERAL ("
        " SELECT unnest(string_split(text, chr(10))) AS line, "
        "        unnest(generate_series(1, len(string_split(text, chr(10))))) AS i) AS t), "
        "k AS (SELECT doc_id, line, i FROM l "
        " WHERE substr(trim(line, ' ' || chr(9) || chr(13) || chr(12) || chr(11)), "
        "   length(trim(line, ' ' || chr(9) || chr(13) || chr(12) || chr(11))), 1) IN ('.', '!', '?', '\"') "
        " AND len(list_filter(regexp_split_to_array(line, '\\s+'), x -> x <> '')) >= 5 "
        " AND NOT contains(lower(line), 'javascript')) "
        "SELECT doc_id, string_agg(line, chr(10) ORDER BY i) AS text "
        "FROM k GROUP BY doc_id HAVING count(*) >= 3"
    ),
    "gopher_quality": (
        # all nine Gopher counts + the keep verdict, integer-exact
        "WITH d AS (SELECT doc_id, coalesce(text, '') AS text FROM documents), "
        "w AS (SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS word FROM d), "
        "wagg AS (SELECT doc_id, count(*) AS n_words, CAST(sum(length(word)) AS BIGINT) AS word_chars, "
        " CAST(sum(CASE WHEN regexp_matches(word, '[A-Za-z]') THEN 1 ELSE 0 END) AS BIGINT) AS n_alpha_words, "
        " CAST(count(DISTINCT CASE WHEN lower(word) IN ('the','be','to','of','and','that','have','with') THEN lower(word) END) AS BIGINT) AS n_stop8 "
        " FROM w GROUP BY doc_id), "
        "l AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM d), "
        "lagg AS (SELECT doc_id, count(*) AS n_lines, "
        " CAST(sum(CASE WHEN starts_with(line, '•') OR starts_with(line, '- ') THEN 1 ELSE 0 END) AS BIGINT) AS n_bullet_lines, "
        " CAST(sum(CASE WHEN suffix(line, '...') OR suffix(line, '…') THEN 1 ELSE 0 END) AS BIGINT) AS n_ellipsis_end_lines "
        " FROM l GROUP BY doc_id), "
        "c AS (SELECT doc_id, "
        " CAST(length(text) - length(replace(text, '#', '')) AS BIGINT) AS n_hash, "
        " CAST((length(text) - length(replace(text, '...', ''))) / 3 AS BIGINT) AS n_ellipsis "
        " FROM d), "
        "j AS (SELECT d.doc_id, coalesce(wagg.n_words, 0) AS n_words, coalesce(wagg.word_chars, 0) AS word_chars, "
        " coalesce(wagg.n_alpha_words, 0) AS n_alpha_words, coalesce(wagg.n_stop8, 0) AS n_stop8, "
        " c.n_hash, c.n_ellipsis, lagg.n_lines, lagg.n_bullet_lines, lagg.n_ellipsis_end_lines "
        " FROM d LEFT JOIN wagg ON wagg.doc_id = d.doc_id "
        " LEFT JOIN lagg ON lagg.doc_id = d.doc_id JOIN c ON c.doc_id = d.doc_id) "
        "SELECT *, (n_words >= 30 AND n_words <= 100000 "
        " AND word_chars * 1 >= n_words * 3 AND word_chars * 1 <= n_words * 10 "
        " AND (n_hash + n_ellipsis) * 10 <= n_words * 1 "
        " AND n_bullet_lines * 10 <= n_lines * 9 "
        " AND n_ellipsis_end_lines * 10 <= n_lines * 3 "
        " AND n_alpha_words * 5 >= n_words * 4 "
        " AND n_stop8 >= 1) AS gopher_keep FROM j"
    ),
    "ccnet_buckets": (
        # lm_perplexity logic quantized to e6, tercile cuts via quantile_disc
        "WITH d AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks FROM documents), "
        "pairs AS (SELECT doc_id, unnest(list_zip(list_slice(toks, 1, len(toks)-1), list_slice(toks, 2, len(toks)))) AS p FROM d WHERE len(toks) >= 2), "
        "pw AS (SELECT doc_id, p[1] AS w1, p[2] AS w2 FROM pairs), "
        "uni AS (SELECT unnest(toks) AS w FROM d), "
        "uc AS (SELECT w, count(*)::DOUBLE AS c FROM uni GROUP BY w), "
        "vocab AS (SELECT count(*)::DOUBLE AS v FROM uc), "
        "bc AS (SELECT w1, w2, count(*)::DOUBLE AS c FROM pw GROUP BY w1, w2), "
        "ppl AS (SELECT pw.doc_id, "
        " CAST(round(-sum(ln(bc.c + 1.0) - ln(uc.c + vocab.v)) / count(*) * 1e6) AS BIGINT) AS lgq "
        " FROM pw JOIN bc USING (w1, w2) JOIN uc ON pw.w1 = uc.w CROSS JOIN vocab "
        " GROUP BY pw.doc_id), "
        "cuts AS (SELECT quantile_disc(lgq, [1.0/3.0, 2.0/3.0]) AS v FROM ppl) "
        "SELECT doc_id, CASE WHEN lgq <= v[1] THEN 'head' "
        " WHEN lgq <= v[2] THEN 'middle' ELSE 'tail' END AS bucket FROM ppl, cuts"
    ),
    "lm_perplexity": (
        # add-1 bigram LM self-trained on the corpus; logp term written as
        # ln(cb+1) - ln(cu+V) to mirror the engine's np.log subtraction
        "WITH d AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks FROM documents), "
        "pairs AS (SELECT doc_id, unnest(list_zip(list_slice(toks, 1, len(toks)-1), list_slice(toks, 2, len(toks)))) AS p FROM d WHERE len(toks) >= 2), "
        "pw AS (SELECT doc_id, p[1] AS w1, p[2] AS w2 FROM pairs), "
        "uni AS (SELECT unnest(toks) AS w FROM d), "
        "uc AS (SELECT w, count(*)::DOUBLE AS c FROM uni GROUP BY w), "
        "vocab AS (SELECT count(*)::DOUBLE AS v FROM uc), "
        "bc AS (SELECT w1, w2, count(*)::DOUBLE AS c FROM pw GROUP BY w1, w2) "
        "SELECT pw.doc_id, count(*) AS n_scored, "
        " CAST(round(-sum(ln(bc.c + 1.0) - ln(uc.c + vocab.v)) / count(*) * 1e6) AS BIGINT) AS logppl_e6 "
        "FROM pw JOIN bc USING (w1, w2) JOIN uc ON pw.w1 = uc.w CROSS JOIN vocab "
        "GROUP BY pw.doc_id"
    ),
    "word_counts": (
        # the pinned tokenizer family, min_count=2 prune
        "WITH w AS (SELECT unnest(list_filter(regexp_split_to_array(lower(text), "
        "'[^a-z0-9]+'), x -> x <> '')) AS word FROM documents WHERE text IS NOT NULL) "
        "SELECT word, count(*) AS n FROM w GROUP BY word HAVING count(*) >= 2"
    ),
    "quality_classifier": (
        # the generating rule: the hash check passes only when the fitted
        # classifier reproduces it on every doc (100% accuracy)
        "SELECT doc_id, CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS BIGINT) "
        "AS pred FROM documents"
    ),
    "repetition_stats": (
        # word n-grams by VALUE (space-joined — injective, words contain no
        # whitespace); top{n} = max over grams of count * gram_chars; dup{n}
        # = chars of words covered by any gram occurring >= 2 times
        # (DISTINCT unions the overlapping occurrence spans)
        f"WITH t AS ({_TOKS_SQL}), "
        "base AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_words, "
        " CAST(coalesce(list_sum(list_transform(toks, x -> length(x))), 0) AS BIGINT) AS word_chars FROM t), "
        "g2 AS (SELECT doc_id, i, toks[CAST(i AS INT)] || ' ' || toks[CAST(i + 1 AS INT)] AS g, "
        " length(toks[CAST(i AS INT)]) + length(toks[CAST(i + 1 AS INT)]) AS gc "
        " FROM t, LATERAL (SELECT unnest(range(1, len(toks))) AS i) AS r), "
        "g3 AS (SELECT doc_id, i, toks[CAST(i AS INT)] || ' ' || toks[CAST(i + 1 AS INT)] || ' ' || toks[CAST(i + 2 AS INT)] AS g, "
        " length(toks[CAST(i AS INT)]) + length(toks[CAST(i + 1 AS INT)]) + length(toks[CAST(i + 2 AS INT)]) AS gc "
        " FROM t, LATERAL (SELECT unnest(range(1, len(toks) - 1)) AS i) AS r), "
        "top2 AS (SELECT doc_id, max(c * gc) AS v FROM (SELECT doc_id, g, count(*) AS c, any_value(gc) AS gc FROM g2 GROUP BY doc_id, g) GROUP BY doc_id), "
        "top3 AS (SELECT doc_id, max(c * gc) AS v FROM (SELECT doc_id, g, count(*) AS c, any_value(gc) AS gc FROM g3 GROUP BY doc_id, g) GROUP BY doc_id), "
        "d2 AS (SELECT doc_id, g FROM g2 GROUP BY doc_id, g HAVING count(*) >= 2), "
        "h2 AS (SELECT g2.doc_id, g2.i FROM g2 JOIN d2 USING (doc_id, g)), "
        "cov2 AS (SELECT DISTINCT doc_id, i + j AS w FROM h2, LATERAL (SELECT unnest(range(0, 2)) AS j) AS rr), "
        "dup2 AS (SELECT cov2.doc_id, CAST(sum(length(t.toks[CAST(cov2.w AS INT)])) AS BIGINT) AS v "
        " FROM cov2 JOIN t ON t.doc_id = cov2.doc_id GROUP BY cov2.doc_id), "
        "d3 AS (SELECT doc_id, g FROM g3 GROUP BY doc_id, g HAVING count(*) >= 2), "
        "h3 AS (SELECT g3.doc_id, g3.i FROM g3 JOIN d3 USING (doc_id, g)), "
        "cov3 AS (SELECT DISTINCT doc_id, i + j AS w FROM h3, LATERAL (SELECT unnest(range(0, 3)) AS j) AS rr), "
        "dup3 AS (SELECT cov3.doc_id, CAST(sum(length(t.toks[CAST(cov3.w AS INT)])) AS BIGINT) AS v "
        " FROM cov3 JOIN t ON t.doc_id = cov3.doc_id GROUP BY cov3.doc_id) "
        "SELECT b.doc_id, b.n_words, b.word_chars, "
        " CAST(coalesce(top2.v, 0) AS BIGINT) AS top2gram_chars, "
        " CAST(coalesce(top3.v, 0) AS BIGINT) AS top3gram_chars, "
        " CAST(coalesce(dup2.v, 0) AS BIGINT) AS dup2gram_chars, "
        " CAST(coalesce(dup3.v, 0) AS BIGINT) AS dup3gram_chars "
        "FROM base b LEFT JOIN top2 USING (doc_id) LEFT JOIN top3 USING (doc_id) "
        "LEFT JOIN dup2 USING (doc_id) LEFT JOIN dup3 USING (doc_id)"
    ),
    "decontaminate": (
        # word 4-grams by VALUE (space-joined; hashes in the Ray op are
        # membership-only): DISTINCT per corpus doc, benchmark set = DISTINCT
        # over the doc_id % 7 == 0 split
        "WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 0 AND text IS NOT NULL), "
        "bm AS (SELECT text FROM documents WHERE doc_id % 7 = 0 AND text IS NOT NULL), "
        "cw AS (SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ws FROM corpus), "
        "bw AS (SELECT list_filter(string_split(text, ' '), w -> w <> '') AS ws FROM bm), "
        "cg AS (SELECT DISTINCT doc_id, array_to_string(ws[CAST(i AS INT) : CAST(i AS INT) + 3], ' ') AS gram "
        " FROM cw, LATERAL (SELECT unnest(range(1, len(ws) - 2)) AS i) AS r), "
        "bg AS (SELECT DISTINCT array_to_string(ws[CAST(i AS INT) : CAST(i AS INT) + 3], ' ') AS gram "
        " FROM bw, LATERAL (SELECT unnest(range(1, len(ws) - 2)) AS i) AS r), "
        "hits AS (SELECT doc_id, count(*) AS c FROM cg JOIN bg USING (gram) GROUP BY doc_id), "
        "tot AS (SELECT doc_id, count(*) AS n_grams FROM cg GROUP BY doc_id) "
        "SELECT t.doc_id, CAST(t.n_grams AS BIGINT) AS n_grams, "
        " CAST(coalesce(h.c, 0) AS BIGINT) AS n_contaminated "
        "FROM tot t LEFT JOIN hits h USING (doc_id)"
    ),
    "drop_contaminated": (
        # survivors of the any-shared-4-gram rule: corpus docs with no gram
        # in the benchmark set (incl. docs with < 4 words / null text)
        "WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 0), "
        "bm AS (SELECT text FROM documents WHERE doc_id % 7 = 0 AND text IS NOT NULL), "
        "cw AS (SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ws FROM corpus WHERE text IS NOT NULL), "
        "bw AS (SELECT list_filter(string_split(text, ' '), w -> w <> '') AS ws FROM bm), "
        "cg AS (SELECT DISTINCT doc_id, array_to_string(ws[CAST(i AS INT) : CAST(i AS INT) + 3], ' ') AS gram "
        " FROM cw, LATERAL (SELECT unnest(range(1, len(ws) - 2)) AS i) AS r), "
        "bg AS (SELECT DISTINCT array_to_string(ws[CAST(i AS INT) : CAST(i AS INT) + 3], ' ') AS gram "
        " FROM bw, LATERAL (SELECT unnest(range(1, len(ws) - 2)) AS i) AS r), "
        "bad AS (SELECT DISTINCT doc_id FROM cg JOIN bg USING (gram)) "
        "SELECT c.doc_id, c.text FROM corpus c ANTI JOIN bad USING (doc_id)"
    ),
    "substring_dedupe": (
        # same anchored windows by VALUE: a window starts at 1-indexed pos i
        # (2 <= i <= len-39) whose previous char is a space/newline; dup =
        # window content in >= 2 distinct docs; coverage = merged intervals
        # via lag() (intervals all have length 40, so covered chars per row
        # = min(40, pos - prev_pos))
        "WITH w AS (SELECT doc_id, g.i AS pos, "
        " substring(text, CAST(g.i AS INT), 40) AS win, length(text) AS len "
        " FROM documents, LATERAL (SELECT unnest(range(2, length(text) - 38)) AS i) AS g "
        " WHERE text IS NOT NULL AND substring(text, CAST(g.i - 1 AS INT), 1) IN (' ', chr(10))), "
        "dup AS (SELECT win FROM w GROUP BY win HAVING count(DISTINCT doc_id) >= 2), "
        "hits AS (SELECT w.doc_id, w.pos, w.len FROM w JOIN dup USING (win)), "
        "lagged AS (SELECT doc_id, len, pos, "
        " lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev FROM hits) "
        "SELECT doc_id, CAST(any_value(len) AS BIGINT) AS doc_len, "
        " CAST(count(*) AS BIGINT) AS n_dup_windows, "
        " CAST(sum(CASE WHEN prev IS NULL THEN 40 ELSE least(40, pos - prev) END) AS BIGINT) AS dup_chars "
        "FROM lagged GROUP BY doc_id"
    ),
    "substring_spans": (
        # same anchored duplicated-window hits as substring_dedupe, merged
        # to maximal intervals via gaps-and-islands: a new island starts
        # when the gap to the previous hit exceeds the window length;
        # output is 0-indexed [start, end) to match the operator
        "WITH w AS (SELECT doc_id, g.i AS pos, "
        " substring(text, CAST(g.i AS INT), 40) AS win "
        " FROM documents, LATERAL (SELECT unnest(range(2, length(text) - 38)) AS i) AS g "
        " WHERE text IS NOT NULL AND substring(text, CAST(g.i - 1 AS INT), 1) IN (' ', chr(10))), "
        "dup AS (SELECT win FROM w GROUP BY win HAVING count(DISTINCT doc_id) >= 2), "
        "hits AS (SELECT w.doc_id, w.pos FROM w JOIN dup USING (win)), "
        "lagged AS (SELECT doc_id, pos, "
        " lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev FROM hits), "
        "isl AS (SELECT doc_id, pos, "
        " sum(CASE WHEN prev IS NULL OR pos - prev > 40 THEN 1 ELSE 0 END) "
        "   OVER (PARTITION BY doc_id ORDER BY pos) AS island FROM lagged) "
        "SELECT doc_id, CAST(min(pos) - 1 AS BIGINT) AS span_start, "
        " CAST(max(pos) + 39 AS BIGINT) AS span_end "
        "FROM isl GROUP BY doc_id, island"
    ),
    "substring_strip": (
        # fragment reconstruction: for each merged span, the text between
        # the previous span's end and this span's start survives, plus the
        # tail after the last span; fragments are whitespace-trimmed,
        # empties dropped, and re-joined with ' '; docs with no spans pass
        # through unchanged, docs fully covered become ''
        "WITH w AS (SELECT doc_id, g.i AS pos, "
        " substring(text, CAST(g.i AS INT), 40) AS win "
        " FROM documents, LATERAL (SELECT unnest(range(2, length(text) - 38)) AS i) AS g "
        " WHERE text IS NOT NULL AND substring(text, CAST(g.i - 1 AS INT), 1) IN (' ', chr(10))), "
        "dup AS (SELECT win FROM w GROUP BY win HAVING count(DISTINCT doc_id) >= 2), "
        "hits AS (SELECT w.doc_id, w.pos FROM w JOIN dup USING (win)), "
        "lagged AS (SELECT doc_id, pos, "
        " lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev FROM hits), "
        "isl AS (SELECT doc_id, pos, "
        " sum(CASE WHEN prev IS NULL OR pos - prev > 40 THEN 1 ELSE 0 END) "
        "   OVER (PARTITION BY doc_id ORDER BY pos) AS island FROM lagged), "
        "sp AS (SELECT doc_id, min(pos) - 1 AS s, max(pos) + 39 AS e "
        " FROM isl GROUP BY doc_id, island), "
        "o AS (SELECT doc_id, s, e, "
        " coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 0) AS prev FROM sp), "
        "frag AS ("
        " SELECT o.doc_id, o.s AS ord, "
        "  substring(d.text, CAST(o.prev + 1 AS INT), CAST(o.s - o.prev AS INT)) AS f "
        " FROM o JOIN documents d USING (doc_id) WHERE o.s > o.prev "
        " UNION ALL "
        " SELECT q.doc_id, length(d.text) AS ord, "
        "  substring(d.text, CAST(q.last_e + 1 AS INT)) AS f "
        " FROM (SELECT doc_id, max(e) AS last_e FROM sp GROUP BY doc_id) q "
        " JOIN documents d USING (doc_id) WHERE q.last_e < length(d.text)), "
        "clean AS (SELECT doc_id, string_agg(tf, ' ' ORDER BY ord) AS txt FROM "
        " (SELECT doc_id, ord, trim(f, ' ' || chr(10) || chr(9) || chr(13)) AS tf FROM frag) "
        " WHERE tf <> '' GROUP BY doc_id) "
        "SELECT d.doc_id, "
        " CASE WHEN sd.doc_id IS NULL THEN d.text ELSE coalesce(c.txt, '') END AS text_clean "
        "FROM documents d "
        "LEFT JOIN (SELECT DISTINCT doc_id FROM sp) sd USING (doc_id) "
        "LEFT JOIN clean c USING (doc_id)"
    ),
    "dup_line_stats": (
        # derived lined corpus (replace ' value ' -> newline, identical
        # left-to-right non-overlapping scan as the vectorized Arrow
        # kernel); duplicated = exact line content in >= 2 distinct docs
        "WITH t AS (SELECT doc_id, replace(text, ' value ', chr(10)) AS txt "
        " FROM documents WHERE text IS NOT NULL), "
        "ln AS (SELECT doc_id, i, string_split(txt, chr(10))[CAST(i AS INT)] AS line "
        " FROM t, LATERAL (SELECT unnest(range(1, len(string_split(txt, chr(10))) + 1)) AS i) AS r), "
        "dup AS (SELECT line FROM ln WHERE length(line) >= 1 "
        " GROUP BY line HAVING count(DISTINCT doc_id) >= 2), "
        "hits AS (SELECT ln.doc_id, length(ln.line) AS c FROM ln JOIN dup USING (line)) "
        "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_lines, "
        " CAST(sum(c) AS BIGINT) AS dup_line_chars "
        "FROM hits GROUP BY doc_id"
    ),
    "drop_dup_lines": (
        # same duplicated-line set, removed from every doc; remaining lines
        # re-joined in order (anti join + ordered string_agg); docs whose
        # every line is duplicated become ''
        "WITH t AS (SELECT doc_id, replace(text, ' value ', chr(10)) AS txt "
        " FROM documents WHERE text IS NOT NULL), "
        "ln AS (SELECT doc_id, i, string_split(txt, chr(10))[CAST(i AS INT)] AS line "
        " FROM t, LATERAL (SELECT unnest(range(1, len(string_split(txt, chr(10))) + 1)) AS i) AS r), "
        "dup AS (SELECT line FROM ln WHERE length(line) >= 1 "
        " GROUP BY line HAVING count(DISTINCT doc_id) >= 2), "
        "kept AS (SELECT ln.doc_id, ln.i, ln.line FROM ln ANTI JOIN dup USING (line)), "
        "clean AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY i) AS txt2 "
        " FROM kept GROUP BY doc_id) "
        "SELECT t.doc_id, coalesce(c.txt2, '') AS text_clean "
        "FROM t LEFT JOIN clean c USING (doc_id)"
    ),
    "drop_dup_lines_domain": (
        # domain-scoped variant: a line is boilerplate only within its own
        # source/domain — duplicated-line set grouped by (source, line)
        "WITH t AS (SELECT doc_id, source, replace(text, ' value ', chr(10)) AS txt "
        " FROM documents WHERE text IS NOT NULL), "
        "ln AS (SELECT doc_id, source, i, string_split(txt, chr(10))[CAST(i AS INT)] AS line "
        " FROM t, LATERAL (SELECT unnest(range(1, len(string_split(txt, chr(10))) + 1)) AS i) AS r), "
        "dup AS (SELECT source, line FROM ln WHERE length(line) >= 1 "
        " GROUP BY source, line HAVING count(DISTINCT doc_id) >= 2), "
        "kept AS (SELECT ln.doc_id, ln.i, ln.line FROM ln ANTI JOIN dup USING (source, line)), "
        "clean AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY i) AS txt2 "
        " FROM kept GROUP BY doc_id) "
        "SELECT t.doc_id, coalesce(c.txt2, '') AS text_clean "
        "FROM t LEFT JOIN clean c USING (doc_id)"
    ),
    "host_stats": (
        # same host synthesis; n_tokens via the shared token expression;
        # DISTINCT text directly (the Ray side counts via 128-bit hashes)
        "WITH t AS (SELECT source || '.example.org' AS host, text, "
        " string_split_regex(trim(text), '\\s+') AS toks "
        " FROM documents WHERE text IS NOT NULL) "
        "SELECT host, CAST(count(*) AS BIGINT) AS n_pages, "
        " CAST(count(DISTINCT text) AS BIGINT) AS n_distinct_texts, "
        " CAST(sum(len(toks)) AS BIGINT) AS n_tokens_sum, "
        " CAST(sum(length(text)) AS BIGINT) AS n_chars_sum "
        "FROM t GROUP BY host"
    ),
    "html_text": (
        # anchor-pages html (shared _ANCHOR_HTML_SQL) + injected entities ->
        # tag strip, entity chain (&amp; last), whitespace collapse — same
        # order as lib/html.py
        f"WITH h AS (SELECT doc_id, {_ANCHOR_HTML_SQL} || "
        " CASE WHEN doc_id % 2 = 0 THEN ' Fish &amp; Chips &lt;tag&gt; &amp;lt;keep&amp;gt; &nbsp;end' "
        "  ELSE '  plain   spaced' || chr(9) || 'text ' END AS html FROM documents), "
        "s AS (SELECT doc_id, regexp_replace(html, '<[^>]*>', '', 'g') AS x FROM h), "
        "e AS (SELECT doc_id, replace(replace(replace(replace(replace(replace(x, "
        " '&lt;', '<'), '&gt;', '>'), '&quot;', '\"'), '&#39;', chr(39)), '&nbsp;', ' '), '&amp;', '&') AS x FROM s) "
        "SELECT doc_id, trim(regexp_replace(x, '\\s+', ' ', 'g')) AS text FROM e"
    ),
    "registered_domain": (
        # same host synthesis; eTLD+1 label-slice rules with the bundled
        # 2-label suffix list inlined (see _PSL_SQL)
        "WITH h AS (SELECT doc_id, CASE "
        " WHEN doc_id % 6 = 0 THEN 'www.site' || CAST(doc_id % 7 AS VARCHAR) || '.example.com' "
        " WHEN doc_id % 6 = 1 THEN 'blog.site' || CAST(doc_id % 7 AS VARCHAR) || '.co.uk' "
        " WHEN doc_id % 6 = 2 THEN 'a.b.site' || CAST(doc_id % 7 AS VARCHAR) || '.com.au' "
        " WHEN doc_id % 6 = 3 THEN '10.0.0.' || CAST(doc_id % 7 AS VARCHAR) "
        " WHEN doc_id % 6 = 4 THEN 'localhost' "
        " ELSE 'site' || CAST(doc_id % 7 AS VARCHAR) || '.org' END AS host FROM documents), "
        "p AS (SELECT doc_id, host, string_split(host, '.') AS parts, "
        " len(string_split(host, '.')) AS n FROM h) "
        "SELECT doc_id, host, CASE "
        " WHEN regexp_matches(host, '^\\d+\\.\\d+\\.\\d+\\.\\d+$') THEN host "
        " WHEN n < 2 THEN host "
        " WHEN parts[CAST(n - 1 AS INT)] || '.' || parts[CAST(n AS INT)] IN (" + _PSL_SQL + ") "
        "  THEN CASE WHEN n >= 3 THEN parts[CAST(n - 2 AS INT)] || '.' || parts[CAST(n - 1 AS INT)] || '.' || parts[CAST(n AS INT)] ELSE host END "
        " ELSE parts[CAST(n - 1 AS INT)] || '.' || parts[CAST(n AS INT)] END AS domain "
        "FROM p"
    ),
    "blocked_hosts": (
        # same host synthesis; blocked iff host equals or is a subdomain of
        # a blocklist entry
        "WITH u AS (SELECT doc_id, "
        " CASE WHEN doc_id % 4 = 0 THEN 'sub.' ELSE '' END || "
        " 'h' || CAST(doc_id % 10 AS VARCHAR) || '.example.com' AS host FROM documents), "
        "b AS (SELECT unnest(['h3.example.com', 'h7.example.com']) AS bad) "
        "SELECT doc_id, 'https://' || host || '/p/' || CAST(doc_id AS VARCHAR) AS url "
        "FROM u WHERE NOT EXISTS (SELECT 1 FROM b "
        " WHERE u.host = b.bad OR suffix(u.host, '.' || b.bad))"
    ),
    "anchor_stats": (
        # shared anchor base -> per-target totals + window-top-1 anchor
        f"WITH {_ANCHOR_BASE_SQL}, "
        "tot AS (SELECT href, count(*) AS n_links, count(anchor) AS n_anchored FROM base GROUP BY href), "
        "cnt AS (SELECT href, anchor, count(*) AS c FROM base WHERE anchor IS NOT NULL GROUP BY href, anchor), "
        "top AS (SELECT href, anchor AS top_anchor, c AS top_anchor_count FROM cnt "
        " QUALIFY ROW_NUMBER() OVER (PARTITION BY href ORDER BY c DESC, anchor ASC) = 1) "
        "SELECT t.href, t.n_links, t.n_anchored, top.top_anchor, top.top_anchor_count "
        "FROM tot t LEFT JOIN top USING (href)"
    ),
    "extract_anchors": (
        f"WITH {_ANCHOR_BASE_SQL} SELECT doc_id, href, anchor FROM base"
    ),
    "extract_links": (
        # identical html synthesis (|| and CASE on doc_id), href extraction
        # via regexp_extract_all (closing quote required — the trailing
        # 'href="broken' is dropped on both sides), then the resolution
        # rules of webgraph.resolve_hrefs as one CASE
        "WITH d AS (SELECT doc_id, lang, source, "
        " CASE doc_id % 3 WHEN 0 THEN '//cdn.example.net/lib.js' "
        "  WHEN 1 THEN 'mailto:spam@example.com' "
        "  ELSE 'rel/' || CAST(doc_id % 9 AS VARCHAR) || '#frag' END AS third "
        " FROM documents), "
        "h AS (SELECT doc_id, lang, source, "
        " '<html><body><a href=\"https://' || source || '.example.com/p/' || CAST(doc_id AS VARCHAR) "
        " || '\">a</a><p>text</p><a href=\"/local/' || CAST(doc_id % 7 AS VARCHAR) "
        " || '\">b</a><a href=\"' || third || '\">c</a><a href=\"broken' AS html FROM d), "
        "x AS (SELECT doc_id, lang, source, "
        " unnest(regexp_extract_all(html, 'href=\"([^\"]*)\"', 1)) AS href FROM h), "
        "r AS (SELECT doc_id, lang, source, href, string_split(href, '#')[1] AS hf FROM x), "
        "res AS (SELECT doc_id, href, "
        " CASE "
        "  WHEN hf = '' THEN NULL "
        "  WHEN starts_with(lower(hf), 'mailto:') OR starts_with(lower(hf), 'javascript:') "
        "   OR starts_with(lower(hf), 'tel:') OR starts_with(lower(hf), 'data:') THEN NULL "
        "  WHEN starts_with(lower(hf), 'http://') OR starts_with(lower(hf), 'https://') THEN hf "
        "  WHEN starts_with(hf, '//') THEN 'https:' || hf "
        "  WHEN starts_with(hf, '/') THEN 'https://' || source || '.example.org' || hf "
        "  WHEN regexp_matches(lower(hf), '^[a-z][a-z0-9+.\\-]*:') THEN NULL "
        "  ELSE 'https://' || source || '.example.org/' || lang || '/idx/' || hf "
        " END AS link_url FROM r) "
        "SELECT doc_id, href, link_url, "
        " lower(regexp_extract(link_url, '^[A-Za-z][A-Za-z0-9+.\\-]*://([^/?#]*)', 1)) AS link_host "
        "FROM res WHERE link_url IS NOT NULL"
    ),
    "host_pagerank": (
        # identical deterministic host graph from doc_id arithmetic, then 3
        # PageRank iterations in the same fixed-point int64 math (shares =
        # rank // out_degree, update = base + (85 * incoming) // 100) —
        # integer sums are associative, so both sides are bit-exact
        "WITH e AS (SELECT 'h' || CAST(doc_id % 20 AS VARCHAR) AS src, "
        " 'h' || CAST((doc_id * 7 + 3) % 23 AS VARCHAR) AS dst FROM documents), "
        "nodes AS (SELECT DISTINCT node FROM "
        " (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)), "
        "c AS (SELECT 1000000000000 // count(*) AS r0, "
        " (15 * (1000000000000 // count(*))) // 100 AS base FROM nodes), "
        "od AS (SELECT src AS node, count(*) AS d FROM e GROUP BY src), "
        "r0t AS (SELECT node, (SELECT r0 FROM c) AS rank FROM nodes), "
        "i1 AS (SELECT e.dst AS node, CAST(sum(p.rank // o.d) AS BIGINT) AS s "
        " FROM e JOIN od o ON e.src = o.node JOIN r0t p ON e.src = p.node GROUP BY e.dst), "
        "r1 AS (SELECT nd.node, CAST((SELECT base FROM c) + (85 * coalesce(i1.s, 0)) // 100 AS BIGINT) AS rank "
        " FROM nodes nd LEFT JOIN i1 ON nd.node = i1.node), "
        "i2 AS (SELECT e.dst AS node, CAST(sum(p.rank // o.d) AS BIGINT) AS s "
        " FROM e JOIN od o ON e.src = o.node JOIN r1 p ON e.src = p.node GROUP BY e.dst), "
        "r2 AS (SELECT nd.node, CAST((SELECT base FROM c) + (85 * coalesce(i2.s, 0)) // 100 AS BIGINT) AS rank "
        " FROM nodes nd LEFT JOIN i2 ON nd.node = i2.node), "
        "i3 AS (SELECT e.dst AS node, CAST(sum(p.rank // o.d) AS BIGINT) AS s "
        " FROM e JOIN od o ON e.src = o.node JOIN r2 p ON e.src = p.node GROUP BY e.dst), "
        "r3 AS (SELECT nd.node, CAST((SELECT base FROM c) + (85 * coalesce(i3.s, 0)) // 100 AS BIGINT) AS rank "
        " FROM nodes nd LEFT JOIN i3 ON nd.node = i3.node) "
        "SELECT node, rank FROM r3"
    ),
    "canonical_url": (
        # identical deterministic URL synthesis (CASE on doc_id), then the
        # canonicalization rules of lib/url.py re-expressed in SQL:
        # regexp component split, www/userinfo strip, default-port drop,
        # trailing-slash rstrip, tracking-param filter + bytewise sort
        "WITH u AS (SELECT doc_id, "
        " CASE doc_id % 3 WHEN 0 THEN 'HTTP' WHEN 1 THEN 'https' ELSE 'HTTPS' END "
        " || '://' || CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE '' END "
        " || source || '.Example.COM' "
        " || CASE doc_id % 4 WHEN 0 THEN ':80' WHEN 1 THEN ':443' WHEN 2 THEN ':8080' ELSE '' END "
        " || '/' || lang || '/Doc/' || CAST(doc_id AS VARCHAR) "
        " || CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END "
        " || CASE doc_id % 3 WHEN 0 THEN '?utm_source=feed&b=' || CAST(doc_id % 10 AS VARCHAR) || '&a=1&fbclid=x' "
        "    WHEN 1 THEN '?z=9&a=2' ELSE '' END "
        " || CASE WHEN doc_id % 7 = 0 THEN '#sec' ELSE '' END AS url "
        " FROM documents), "
        "p AS (SELECT doc_id, url, "
        " lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1)) AS scheme, "
        " regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\\-]*://([^/?#]*)', 1) AS auth, "
        " regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\\-]*://[^/?#]*([^?#]*)', 1) AS path, "
        " regexp_extract(url, '\\?([^#]*)', 1) AS qs FROM u), "
        "h AS (SELECT doc_id, scheme, path, qs, "
        " lower(regexp_extract(list_extract(string_split(auth, '@'), len(string_split(auth, '@'))), '^(.*?)(?::[0-9]+)?$', 1)) AS host, "
        " regexp_extract(list_extract(string_split(auth, '@'), len(string_split(auth, '@'))), ':([0-9]+)$', 1) AS port FROM p), "
        "c AS (SELECT doc_id, host AS url_host, scheme, "
        " regexp_replace(host, '^www\\.', '') AS host2, port, "
        " (port <> '' AND NOT (scheme = 'http' AND port = '80') "
        "  AND NOT (scheme = 'https' AND port = '443')) AS keep_port, "
        " CASE WHEN rtrim(path, '/') = '' THEN '/' ELSE rtrim(path, '/') END AS path2, "
        " list_sort(list_filter(string_split(qs, '&'), x -> x <> '' "
        "  AND NOT starts_with(x, 'utm_') "
        "  AND NOT list_contains(['fbclid','gclid','msclkid','ref','ref_src','igshid','mc_cid','mc_eid'], "
        "   list_extract(string_split(x, '='), 1)))) AS params FROM h) "
        "SELECT doc_id, url_host, "
        " scheme || '://' || host2 "
        " || CASE WHEN keep_port THEN ':' || port ELSE '' END || path2 "
        " || CASE WHEN len(params) > 0 THEN '?' || array_to_string(params, '&') ELSE '' END AS url_canon "
        "FROM c"
    ),
    "redact_pii": (
        # identical PII salting (CASE on doc_id), then the same three
        # patterns applied in the same order (email -> IP -> phone), each
        # counted on the text as it stands BEFORE its own replacement
        "WITH s AS (SELECT doc_id, text "
        " || CASE WHEN doc_id % 3 <> 2 THEN ' contact user' || CAST(doc_id AS VARCHAR) "
        "    || '@mail' || CAST(doc_id % 5 AS VARCHAR) || '.com' ELSE '' END "
        " || CASE WHEN doc_id % 4 <> 3 THEN ' from ' || CAST(doc_id % 200 AS VARCHAR) "
        "    || '.' || CAST(doc_id % 250 AS VARCHAR) || '.' || CAST(doc_id % 220 AS VARCHAR) "
        "    || '.' || CAST(doc_id % 100 AS VARCHAR) ELSE '' END "
        " || CASE WHEN doc_id % 5 <> 4 THEN ' tel +1 (555) 01' || CAST(doc_id % 10 AS VARCHAR) "
        "    || '-0' || CAST(doc_id AS VARCHAR) ELSE '' END AS t "
        " FROM documents), "
        "e AS (SELECT doc_id, "
        " len(regexp_extract_all(t, '[A-Za-z0-9._%+\\-]+@[A-Za-z0-9.\\-]+\\.[A-Za-z]{2,}')) AS n_emails, "
        " regexp_replace(t, '[A-Za-z0-9._%+\\-]+@[A-Za-z0-9.\\-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t FROM s), "
        "i AS (SELECT doc_id, n_emails, "
        " len(regexp_extract_all(t, '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b')) AS n_ips, "
        " regexp_replace(t, '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b', '<IP>', 'g') AS t FROM e), "
        "p AS (SELECT doc_id, n_emails, n_ips, "
        " len(regexp_extract_all(t, '\\+?[0-9][0-9()\\-. ]{6,}[0-9]')) AS n_phones, "
        " regexp_replace(t, '\\+?[0-9][0-9()\\-. ]{6,}[0-9]', '<PHONE>', 'g') AS t FROM i) "
        "SELECT doc_id, t AS text_redacted, CAST(n_emails AS BIGINT) AS n_emails, "
        " CAST(n_ips AS BIGINT) AS n_ips, CAST(n_phones AS BIGINT) AS n_phones FROM p"
    ),
    # minhash_lsh_dedupe / simhash_pairs / lang_id / flagship_er:
    # hash-function / model-driven ops, not SQL-expressible -> rows-only check.
}
