"""fuzzy_dedupe: near-dup pairs -> connected components -> canonical
survivor per cluster. Survivor selection is free for int ids (labels are
min member ids); string ids take the groupby-min + semi-join path."""

from __future__ import annotations

import pyarrow as pa
import ray.data


TEXTS = [
    "the quick brown fox jumps over the lazy dog tonight",
    "the quick brown fox jumps over the lazy dog tonight!",  # near-dup of 0
    "the quick brown fox jumps over the lazy dog toniight",  # near-dup of 0
    "completely different text about ray data pipelines",
    "completely different text about ray data pipelines.",  # near-dup of 3
    "a unique singleton document with nothing similar here",
]


def test_fuzzy_dedupe_int_ids(ray_session):
    from mismo_ray.dedupe import fuzzy_dedupe

    ds = ray.data.from_arrow(
        pa.table({"record_id": list(range(len(TEXTS))), "text": TEXTS})
    )
    out = fuzzy_dedupe(ds, "text", min_jaccard=0.7, max_pairs=None, with_counts=True)
    rows = sorted(out.take_all(), key=lambda r: r["record_id"])
    got = [(r["record_id"], r["component"], r["n_members"]) for r in rows]
    assert got == [(0, 0, 3), (3, 3, 2), (5, 5, 1)]


def test_fuzzy_dedupe_string_ids(ray_session):
    from mismo_ray.dedupe import fuzzy_dedupe

    ds = ray.data.from_arrow(
        pa.table({"record_id": [f"r{i}" for i in range(len(TEXTS))], "text": TEXTS})
    )
    out = fuzzy_dedupe(ds, "text", min_jaccard=0.7, max_pairs=None, with_counts=True)
    rows = sorted(out.take_all(), key=lambda r: r["record_id"])
    assert [(r["record_id"], r["n_members"]) for r in rows] == [
        ("r0", 3),
        ("r3", 2),
        ("r5", 1),
    ]


def test_fuzzy_dedupe_precomputed_links_minhash(ray_session):
    """The links= hook: survivors from minhash-LSH candidate pairs (the
    100 TB pair-gen path) instead of the exact gram join."""
    from mismo_ray.dedupe import fuzzy_dedupe, minhash_lsh_pairs

    ds = ray.data.from_arrow(
        pa.table({"record_id": list(range(len(TEXTS))), "text": TEXTS})
    )
    links = minhash_lsh_pairs(
        ds, "text", num_hashes=64, n_bands=16, verify_jaccard=0.5
    ).links_ds
    out = fuzzy_dedupe(ds, "text", links=links)
    keep = sorted(r["record_id"] for r in out.take_all())
    # cluster representatives only; 1/2 and 4 are deduped away
    assert 0 in keep and 3 in keep and 5 in keep
    assert not ({1, 2, 4} & set(keep))


def test_fuzzy_dedupe_keep_best_quality(ray_session):
    """keep=("max", col): the survivor is the best-quality member (tie ->
    min id), not the min-id member."""
    from mismo_ray.dedupe import fuzzy_dedupe

    quality = [1.0, 9.0, 2.0, 5.0, 5.0, 3.0]  # doc1 beats doc0; 3/4 tie
    ds = ray.data.from_arrow(
        pa.table(
            {
                "record_id": list(range(len(TEXTS))),
                "text": TEXTS,
                "q": quality,
            }
        )
    )
    out = fuzzy_dedupe(
        ds,
        "text",
        min_jaccard=0.7,
        max_pairs=None,
        with_counts=True,
        keep=("max", "q"),
    )
    rows = sorted(out.take_all(), key=lambda r: r["record_id"])
    got = [(r["record_id"], r["component"], r["n_members"]) for r in rows]
    # cluster {0,1,2}: argmax q = 1; cluster {3,4}: tie 5.0 -> min id 3
    assert got == [(1, 0, 3), (3, 3, 2), (5, 5, 1)]

    # keep=("min", col): lowest-q member survives (doc 0 in the big cluster)
    out2 = fuzzy_dedupe(
        ds, "text", min_jaccard=0.7, max_pairs=None, keep=("min", "q")
    )
    ids2 = sorted(r["record_id"] for r in out2.take_all())
    assert ids2 == [0, 3, 5]


def test_fuzzy_dedupe_keep_rejects_bad_mode(ray_session):
    import pytest

    from mismo_ray.dedupe import fuzzy_dedupe

    ds = ray.data.from_arrow(
        pa.table({"record_id": [0, 1], "text": TEXTS[:2], "q": [1.0, 2.0]})
    )
    with pytest.raises(ValueError, match="keep must be"):
        fuzzy_dedupe(ds, "text", max_pairs=None, keep=("argmax", "q"))


def test_dedupe_report_sizes_and_savings(ray_session):
    from mismo_ray.dedupe import dedupe_report

    docs = [
        "the quick brown fox jumps over the lazy dog tonight",   # cluster A
        "the quick brown fox jumps over the lazy dog tonight!",  # A
        "the quick brown fox jumps over the lazy dog toniight",  # A (size 3)
        "completely different text about ray data pipelines",    # cluster B
        "completely different text about ray data pipelines.",   # B (size 2)
        "a unique singleton document with nothing similar here", # singleton
    ]
    ds = ray.data.from_arrow(
        pa.table({"record_id": list(range(len(docs))), "text": docs})
    ).repartition(2)
    out = (
        dedupe_report(ds, "text", min_jaccard=0.7, max_pairs=None)
        .to_pandas()
        .set_index("cluster_size")
        .sort_index()
    )
    # sizes: one 3-cluster, one 2-cluster; singletons unreported
    assert list(out.index) == [2, 3]
    assert out.loc[2, "n_clusters"] == 1 and out.loc[2, "n_dup_docs"] == 1
    assert out.loc[3, "n_clusters"] == 1 and out.loc[3, "n_dup_docs"] == 2
    # savings: total member chars minus the min-id survivor's chars
    assert out.loc[3, "dup_chars"] == len(docs[1]) + len(docs[2])
    assert out.loc[2, "dup_chars"] == len(docs[4])
