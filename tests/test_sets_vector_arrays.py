"""sets / vector / arrays modules vs reference doctest semantics
(/root/reference/mismo/sets/, /root/reference/mismo/vector/_vector.py,
/root/reference/mismo/arrays/)."""

from __future__ import annotations

import math

import pyarrow as pa
import pytest
import ray.data

from mismo_ray import arrays, sets, vector


def test_jaccard():
    assert sets.jaccard(["a", "b"], ["b", "c"]) == pytest.approx(1 / 3)
    assert sets.jaccard(["a"], ["b"]) == 0.0
    assert sets.jaccard([], []) == 0.0
    assert sets.jaccard(None, ["a"]) is None
    assert sets.jaccard(["x", "x", "y"], ["x", "y"]) == 1.0  # set semantics


ADDRESSES = [
    "12 main st",
    "99 main ave",
    "56 st joseph st",
    "21 glacier st",
    "12 glacier st",
]


@pytest.fixture
def terms_ds(ray_session):
    return ray.data.from_items(
        [{"record_id": i, "terms": a.split()} for i, a in enumerate(ADDRESSES)]
    )


def test_document_counts(terms_ds):
    # doctest _tfidf.py:29-72
    got = {
        r["term"]: r["n_records"]
        for r in sets.document_counts(terms_ds, "terms").take_all()
    }
    assert got == {
        "12": 2, "21": 1, "56": 1, "99": 1, "ave": 1,
        "glacier": 2, "joseph": 1, "main": 2, "st": 4,
    }


def test_term_idf(terms_ds):
    # doctest _tfidf.py:82-117
    got = {r["term"]: r["idf"] for r in sets.term_idf(terms_ds, "terms").take_all()}
    assert got["st"] == pytest.approx(math.log(5 / 4))
    assert got["main"] == pytest.approx(math.log(5 / 2))
    assert got["21"] == pytest.approx(math.log(5))


def test_add_array_value_counts(ray_session):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "terms": pa.array(
                    [None, ["st"], ["56", "st", "joseph", "st"], []],
                    type=pa.list_(pa.string()),
                )
            }
        )
    )
    out = sets.add_array_value_counts(ds, "terms").take_all()
    as_dicts = [
        None if r["terms_counts"] is None else {d["key"]: d["value"] for d in r["terms_counts"]}
        for r in out
    ]
    assert as_dicts == [None, {"st": 1}, {"56": 1, "st": 2, "joseph": 1}, {}]


def test_add_tfidf(ray_session):
    # doctest _tfidf.py:224-260: ['st'] -> {'st': 0.15415067982725836}
    rows = [None, ["st"], ["st"], ["12", "main", "st"], ["99", "main", "ave"],
            ["56", "st", "joseph", "st"], ["21", "glacier", "st"],
            ["12", "glacier", "st"]]
    ds = ray.data.from_arrow(
        pa.table({"terms": pa.array(rows, type=pa.list_(pa.string()))})
    )
    out = sets.add_tfidf(ds, "terms").take_all()
    by_terms = {}
    for r in out:
        key = tuple(r["terms"]) if r["terms"] is not None else None
        val = (
            None
            if r["terms_tfidf"] is None
            else {d["key"]: d["value"] for d in r["terms_tfidf"]}
        )
        by_terms[key] = val
    assert by_terms[None] is None
    assert by_terms[("st",)]["st"] == pytest.approx(0.15415067982725836)
    assert by_terms[("12", "main", "st")]["12"] == pytest.approx(0.7232830370915955)
    assert by_terms[("12", "main", "st")]["st"] == pytest.approx(0.08899893649403144)


def test_rare_terms(terms_ds):
    got = {r["term"] for r in sets.rare_terms(terms_ds, "terms", max_records_n=1).take_all()}
    assert got == {"21", "56", "99", "ave", "joseph"}
    got2 = {
        r["term"]
        for r in sets.rare_terms(terms_ds, "terms", max_records_frac=0.4).take_all()
    }
    assert got2 == {"21", "56", "99", "ave", "joseph", "12", "glacier", "main"}
    with pytest.raises(ValueError):
        sets.rare_terms(terms_ds, "terms")


def test_vector_dense():
    assert vector.dot([1.0, 2.0], [3.0, 4.0]) == 11.0
    assert vector.cosine_similarity([1.0, 2.0], [2.0, 4.0]) == pytest.approx(1.0)
    assert vector.norm([3.0, 4.0]) == 5.0
    assert vector.norm([3.0, -4.0], "l1") == 7.0
    assert vector.normalize([3.0, 4.0]) == [0.6, 0.8]
    assert vector.dot(None, [1.0]) is None


def test_vector_sparse():
    a = {"x": 1.0, "y": 2.0}
    b = {"y": 3.0, "z": 5.0}
    assert vector.dot(a, b) == 6.0  # shared-key intersection
    assert vector.mul(a, b) == {"y": 6.0}
    assert vector.norm(a) == pytest.approx(math.sqrt(5))
    got = vector.normalize(a)
    assert got["x"] == pytest.approx(1 / math.sqrt(5))


def test_cosine_matrix():
    import numpy as np

    vecs = np.array([[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]])
    qs = np.array([[1.0, 0.0]])
    sims = vector.cosine_similarity_matrix(vecs, qs)[:, 0]
    assert sims == pytest.approx([1.0, 0.0, 1 / math.sqrt(2)])


def test_array_combinations():
    assert arrays.array_combinations(["a"], ["x", "y"]) == [
        {"l": "a", "r": "x"},
        {"l": "a", "r": "y"},
    ]
    assert arrays.array_combinations(None, ["x"]) is None
    assert arrays.array_combinations_first_n(["a", "b"], ["x", "y"], 3) == [
        {"l": "a", "r": "x"},
        {"l": "a", "r": "y"},
        {"l": "b", "r": "x"},
    ]


def test_array_helpers():
    assert arrays.array_filter_isin_other(["a", "b", "c"], {"b", "c"}) == ["b", "c"]
    assert arrays.array_min([3, 1, 2]) == 1
    assert arrays.array_max([3, 1, 2]) == 3
    assert arrays.array_mean([1, 2, 3]) == 2
    assert arrays.array_median([1, 2, 3, 10]) == 2.5
    assert arrays.array_any([False, True]) is True
    assert arrays.array_all([True, False]) is False
    # deterministic shuffle: same (seed, row_key) -> same order
    s1 = arrays.array_shuffle([1, 2, 3, 4], seed=7, row_key=1)
    s2 = arrays.array_shuffle([1, 2, 3, 4], seed=7, row_key=1)
    s3 = arrays.array_shuffle([1, 2, 3, 4], seed=7, row_key=2)
    assert s1 == s2
    assert sorted(s1) == [1, 2, 3, 4]
    assert sorted(s3) == [1, 2, 3, 4]


def test_explain(ray_session):
    import pyarrow as pa
    import ray.data

    from mismo_ray import explain

    ds = ray.data.from_arrow(pa.table({"a": [1, 2, 2]})).groupby("a").count()
    plan = explain(ds)
    assert "Aggregate" in plan  # lazy logical tree, no execution
    stats = explain(ds, analyze=True)
    assert "Operator" in stats  # executed per-operator stats


def test_top_k_per_group_matches_pandas(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from mismo_ray.util_ops import top_k_per_group

    rng = np.random.default_rng(3)
    n = 500
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c", "d"], n),
            "g2": rng.integers(0, 3, n),
            "score": rng.integers(0, 50, n),
            "id": np.arange(n, dtype=np.int64),
        }
    )
    ds = ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(5)
    got = top_k_per_group(
        ds, ["g", "g2"], [("score", "desc"), ("id", "asc")], 2
    ).take_all()
    exp = (
        df.sort_values(["score", "id"], ascending=[False, True], kind="mergesort")
        .groupby(["g", "g2"], sort=False)
        .head(2)
    )
    assert sorted(r["id"] for r in got) == sorted(exp["id"].tolist())


def test_stratified_sample_deterministic(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from mismo_ray.util_ops import stratified_sample

    rng = np.random.default_rng(5)
    n = 400
    t = pa.table(
        {
            "record_id": np.arange(n, dtype=np.int64),
            "lang": pa.array(rng.choice(["en", "de", "fr"], n)),
        }
    )
    ds = ray.data.from_arrow(t).repartition(4)
    s1 = stratified_sample(ds, "lang", 5)
    rows1 = sorted(r["record_id"] for r in s1.take_all())
    # exactly 5 per group (every group has >5 members here)
    by_lang = {}
    for r in s1.take_all():
        by_lang.setdefault(r["lang"], []).append(r["record_id"])
    assert all(len(v) == 5 for v in by_lang.values()) and len(by_lang) == 3
    # deterministic across runs and partitionings
    s2 = stratified_sample(ds.repartition(9), "lang", 5)
    assert sorted(r["record_id"] for r in s2.take_all()) == rows1
    # different seed -> (almost surely) different selection
    s3 = stratified_sample(ds, "lang", 5, seed=99)
    assert sorted(r["record_id"] for r in s3.take_all()) != rows1


def test_add_tfidf_null_elements_and_unnormalized(ray_session):
    """Counter-semantics parity of the vectorized kernel: null TERMS are a
    countable key (document_counts counts them, so idf covers them), null
    ROWS stay null, [] stays {}, and normalize=False returns raw tf*idf."""
    import math

    rows = [["a", None, "a"], [], None, ["b"], [None]]
    ds = ray.data.from_arrow(
        pa.table({"terms": pa.array(rows, type=pa.list_(pa.string()))})
    )

    def as_dicts(out):
        return [
            None
            if r["terms_tfidf"] is None
            else {d["key"]: d["value"] for d in r["terms_tfidf"]}
            for r in out
        ]

    idf = {"a": math.log(4 / 1), None: math.log(4 / 2), "b": math.log(4 / 1)}
    got = as_dicts(sets.add_tfidf(ds, "terms").take_all())
    nrm = math.sqrt(2 * 2 + 1)
    assert got[0] == pytest.approx(
        {"a": 2 / nrm * idf["a"], None: 1 / nrm * idf[None]}
    )
    assert got[1] == {} and got[2] is None
    assert got[3] == pytest.approx({"b": idf["b"]})
    assert got[4] == pytest.approx({None: idf[None]})

    raw = as_dicts(sets.add_tfidf(ds, "terms", normalize=False).take_all())
    assert raw[0] == pytest.approx({"a": 2 * idf["a"], None: idf[None]})
