"""Benchmark decontamination (dedupe._decontam): stats, drop, join path."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _ds(docs: dict[int, str | None], id_column: str = "record_id"):
    t = pa.table(
        {
            id_column: pa.array(list(docs.keys()), type=pa.int64()),
            "text": pa.array(list(docs.values()), type=pa.string()),
        }
    )
    return ray.data.from_arrow(t).repartition(2).materialize()


CORPUS = {
    0: "the quick brown fox jumps over the lazy dog",
    1: "what is the capital of france paris obviously",
    2: "a short one",  # fewer than n=3 words? no: 3 words -> 1 gram
    3: "totally clean document with no benchmark overlap at all",
    4: None,
    5: "",
    6: "the quick brown cat sleeps",
}

BENCH = {
    100: "what is the capital of france",
    101: "the quick brown fox runs",
}


def _brute_stats(n: int) -> dict[int, tuple[int, int]]:
    def grams(s: str | None) -> set[str]:
        if not s:
            return set()
        ws = [w for w in s.split(" ") if w]
        return {" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)}

    bench = set()
    for s in BENCH.values():
        bench |= grams(s)
    out = {}
    for k, s in CORPUS.items():
        g = grams(s)
        if g:
            out[k] = (len(g), len(g & bench))
    return out


def test_contamination_stats_matches_bruteforce(ray_session):
    from mismo_ray.dedupe import contamination_stats

    for n in (1, 3, 4):
        out = contamination_stats(
            _ds(CORPUS), _ds(BENCH, "bid"), "text", n=n
        ).to_pandas()
        got = {
            int(r.record_id): (int(r.n_grams), int(r.n_contaminated))
            for r in out.itertuples()
        }
        assert got == _brute_stats(n), f"n={n}"


def test_contamination_stats_join_path_parity(ray_session):
    from mismo_ray.dedupe import contamination_stats

    kw = dict(id_column="record_id", n=3)
    broad = contamination_stats(_ds(CORPUS), _ds(BENCH, "bid"), "text", **kw)
    joined = contamination_stats(
        _ds(CORPUS), _ds(BENCH, "bid"), "text", max_broadcast_grams=0, **kw
    )
    b = broad.to_pandas().sort_values("record_id").reset_index(drop=True)
    j = joined.to_pandas().sort_values("record_id").reset_index(drop=True)
    assert b[["record_id", "n_grams", "n_contaminated"]].equals(
        j[["record_id", "n_grams", "n_contaminated"]]
    )


def test_drop_contaminated_gpt3_rule(ray_session):
    from mismo_ray.dedupe import drop_contaminated

    out = drop_contaminated(_ds(CORPUS), _ds(BENCH, "bid"), "text", n=3)
    kept = sorted(out.to_pandas()["record_id"])
    brute = _brute_stats(3)
    expect = sorted(
        k
        for k in CORPUS
        if k not in brute or brute[k][1] == 0  # no grams or no contamination
    )
    assert kept == expect
    # sanity: doc 0 and 1 share 3-grams with the benchmark and must be gone
    assert 0 not in kept and 1 not in kept
    # null/empty/gram-less docs always survive
    assert {2, 4, 5}.issubset(set(kept))


def test_drop_contaminated_fraction_threshold(ray_session):
    from mismo_ray.dedupe import drop_contaminated

    # doc 0: 7 grams, 2 contaminated (frac ~0.29); doc 1: 6 grams, 4
    # contaminated (frac ~0.67) -> only doc 1 drops at 0.5
    brute = _brute_stats(3)
    assert brute[0][1] > 0 and brute[1][1] > 0
    out = drop_contaminated(
        _ds(CORPUS), _ds(BENCH, "bid"), "text", n=3, max_contaminated_frac=0.5
    )
    kept = set(out.to_pandas()["record_id"])
    assert 0 in kept
    assert 1 not in kept


def test_benchmark_grams_distinct(ray_session):
    from mismo_ray.dedupe import benchmark_grams

    bg = benchmark_grams(_ds(BENCH, "bid"), "text", n=3).to_pandas()
    # 4 + 3 distinct 3-grams, no overlap between the two benchmark docs
    assert len(bg) == 7
    assert len(bg.drop_duplicates(["__h1__", "__h2__"])) == 7


def test_double_space_and_null_handling(ray_session):
    from mismo_ray.dedupe import contamination_stats

    corpus = {0: "a  b   c d", 1: "x y"}
    bench = {9: "a b c"}
    out = contamination_stats(
        _ds(corpus), _ds(bench, "bid"), "text", n=3
    ).to_pandas()
    got = {
        int(r.record_id): (int(r.n_grams), int(r.n_contaminated))
        for r in out.itertuples()
    }
    # empty split segments are dropped: "a  b   c d" -> [a,b,c,d] -> 2 grams,
    # one of which ("a b c") is in the benchmark; "x y" has no 3-grams
    assert got == {0: (2, 1)}


# ---------------------------------------------------------------- semantic
def _emb_tables():
    import numpy as np
    import pyarrow as pa

    rng = np.random.default_rng(12)
    d = 16
    # benchmark: 5 well-separated unit vectors; corpus: 40 docs, 10 of which
    # are tiny perturbations of benchmark docs (cosine ~0.99), 30 random
    bench = rng.normal(size=(5, d))
    bench /= np.linalg.norm(bench, axis=1, keepdims=True)
    near = bench[rng.integers(0, 5, 10)] + rng.normal(scale=0.02, size=(10, d))
    far = rng.normal(size=(30, d))
    corpus = np.vstack([near, far])
    to_tbl = lambda m, ids: pa.table(
        {"record_id": ids, "embedding": [list(map(float, r)) for r in m]}
    )
    return (
        to_tbl(corpus, list(range(40))),
        to_tbl(bench, list(range(1000, 1005))),
        set(range(10)),
    )


def test_semantic_contamination_finds_paraphrases(ray_session):
    import ray.data

    from mismo_ray.dedupe import drop_semantic_contaminated, semantic_contamination

    corpus_t, bench_t, planted = _emb_tables()
    corpus = ray.data.from_arrow(corpus_t).repartition(4)
    bench = ray.data.from_arrow(bench_t)
    stats = semantic_contamination(
        corpus, bench, tau=0.9, method="exact", chunk_rows=8
    ).to_pandas()
    assert set(stats["record_id"]) == planted
    assert (stats["n_hits"] >= 1).all()
    kept = drop_semantic_contaminated(
        corpus, bench, tau=0.9, method="exact", chunk_rows=8
    )
    kept_ids = set(kept.to_pandas()["record_id"])
    assert kept_ids == set(range(10, 40))
    # payload survives the anti filter intact
    assert kept.schema().base_schema.field("embedding").type == corpus_t.schema.field("embedding").type


def test_semantic_contamination_lsh_path_agrees(ray_session):
    import ray.data

    from mismo_ray.dedupe import semantic_contamination

    corpus_t, bench_t, planted = _emb_tables()
    corpus = ray.data.from_arrow(corpus_t).repartition(3)
    bench = ray.data.from_arrow(bench_t)
    got = semantic_contamination(
        corpus, bench, tau=0.9, method="lsh", n_bands=16, bits_per_band=4
    ).to_pandas()
    # LSH + exact verify: no false positives; recall on near-identical
    # vectors (cos ~0.99) must find all planted docs at these band settings
    assert set(got["record_id"]) == planted


def test_keyed_filter_semi_anti_list_payload(ray_session):
    import pyarrow as pa
    import ray.data

    from mismo_ray._joins import keyed_filter

    ds = ray.data.from_arrow(
        pa.table(
            {
                "id": [1, 2, 3, 4, 5],
                "vec": [[1.0], [2.0], [3.0], [4.0], [5.0]],
            }
        )
    ).repartition(3)
    keys = ray.data.from_arrow(pa.table({"id": [2, 4, 9]}))
    semi = keyed_filter(ds, keys, "id").to_pandas()
    assert sorted(semi["id"]) == [2, 4]
    anti = keyed_filter(ds, keys, "id", invert=True).to_pandas()
    anti = anti.sort_values("id").reset_index(drop=True)
    assert anti["id"].tolist() == [1, 3, 5]
    assert [list(v) for v in anti["vec"]] == [[1.0], [3.0], [5.0]]


def test_keyed_filter_empty_key_set(ray_session):
    import pyarrow as pa
    import ray.data

    from mismo_ray._joins import keyed_filter

    ds = ray.data.from_arrow(pa.table({"id": [1, 2], "vec": [[1.0], [2.0]]}))
    empty = ray.data.from_arrow(pa.table({"id": pa.array([], type=pa.int64())}))
    assert keyed_filter(ds, empty, "id", invert=True).count() == 2
    assert keyed_filter(ds, empty, "id").count() == 0


def test_subtract_exact_content_and_nulls(ray_session):
    import pyarrow as pa
    import ray.data

    from mismo_ray.dedupe import subtract_exact

    train = ray.data.from_arrow(
        pa.table(
            {
                "record_id": list(range(6)),
                "text": ["a", "b", "c", "d", "e", None],
            }
        )
    ).repartition(3)
    ref = ray.data.from_arrow(pa.table({"x": [0, 1], "text": ["b", "d"]}))
    out = subtract_exact(train, ref, "text").to_pandas().sort_values("record_id")
    # content matches drop; null text never matches and survives
    assert out["record_id"].tolist() == [0, 2, 4, 5]
    hits = (
        subtract_exact(train, ref, "text", invert=True)
        .to_pandas()
        .sort_values("record_id")
    )
    assert hits["record_id"].tolist() == [1, 3]
    # REF-side nulls must not match train-side nulls (SQL: NULL = NULL is
    # not true) — regression for keyed_filter's is_in null-to-null match
    ref_null = ray.data.from_arrow(
        pa.table({"x": [0, 1], "text": ["b", None]})
    )
    out2 = (
        subtract_exact(train, ref_null, "text").to_pandas().sort_values("record_id")
    )
    assert out2["record_id"].tolist() == [0, 2, 3, 4, 5]
    hits2 = (
        subtract_exact(train, ref_null, "text", invert=True)
        .to_pandas()
        .sort_values("record_id")
    )
    assert hits2["record_id"].tolist() == [1]


def test_subtract_exact_normalize_and_empty_ref(ray_session):
    import pyarrow as pa
    import ray.data

    from mismo_ray.dedupe import subtract_exact

    train = ray.data.from_arrow(
        pa.table({"record_id": [1, 2], "text": ["  Hello  World ", "x"]})
    )
    ref = ray.data.from_arrow(pa.table({"text": ["hello world"]}))
    norm = lambda s: " ".join(s.lower().split())
    out = subtract_exact(train, ref, "text", normalize=norm).to_pandas()
    assert out["record_id"].tolist() == [2]
    empty_ref = ray.data.from_arrow(pa.table({"text": pa.array([], pa.string())}))
    assert subtract_exact(train, empty_ref, "text").count() == 2
