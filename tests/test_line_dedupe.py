"""Line-level exact dedup (dedupe._lines): stats, drop, keep_first."""

from __future__ import annotations

import pyarrow as pa
import ray
import ray.data


def _ds(docs: dict[int, str | None]):
    t = pa.table(
        {
            "record_id": pa.array(list(docs.keys()), type=pa.int64()),
            "text": pa.array(list(docs.values()), type=pa.string()),
        }
    )
    return ray.data.from_arrow(t).repartition(2).materialize()


DOCS = {
    0: "unique alpha\ncookie banner accept all\nunique beta",
    1: "other start\ncookie banner accept all\nother end\ncookie banner accept all",
    2: "totally unrelated\nno shared lines",
    3: None,
    4: "",
}


def test_dup_line_stats(ray_session):
    from mismo_ray.dedupe import dup_line_stats

    out = (
        dup_line_stats(_ds(DOCS), "text")
        .to_pandas()
        .sort_values("record_id")
        .reset_index(drop=True)
    )
    assert list(out["record_id"]) == [0, 1]
    assert list(out["n_dup_lines"]) == [1, 2]
    n = len("cookie banner accept all")
    assert list(out["dup_line_chars"]) == [n, 2 * n]


def test_drop_dup_lines(ray_session):
    from mismo_ray.dedupe import drop_dup_lines

    out = drop_dup_lines(_ds(DOCS), "text", out_column="clean").to_pandas()
    cm = dict(zip(out["record_id"], out["clean"]))
    assert cm[0] == "unique alpha\nunique beta"
    assert cm[1] == "other start\nother end"
    assert cm[2] == DOCS[2]  # untouched doc passes through byte-identical
    assert cm[3] is None
    assert cm[4] == ""
    assert set(out.columns) == {"record_id", "text", "clean"}


def test_drop_dup_lines_keep_first(ray_session):
    from mismo_ray.dedupe import drop_dup_lines

    out = drop_dup_lines(_ds(DOCS), "text", keep_first=True).to_pandas()
    cm = dict(zip(out["record_id"], out["text"]))
    # canonical copy (smallest doc id, then line index) survives; all other
    # occurrences - including doc 1's second intra-doc repeat - are dropped
    assert cm[0] == DOCS[0]
    assert cm[1] == "other start\nother end"
    assert cm[2] == DOCS[2]


def test_intra_doc_repeats_do_not_qualify(ray_session):
    from mismo_ray.dedupe import drop_dup_lines, dup_line_stats

    docs = {0: "same line\nsame line\nsame line", 1: "different things here"}
    assert dup_line_stats(_ds(docs), "text").count() == 0
    out = drop_dup_lines(_ds(docs), "text").to_pandas()
    assert dict(zip(out["record_id"], out["text"])) == docs


def test_min_chars_and_delimiter(ray_session):
    from mismo_ray.dedupe import drop_dup_lines

    # "ab" is shared but below min_chars=3 -> survives; "longer shared" drops
    docs = {0: "ab|longer shared|tail0", 1: "ab|longer shared|tail1"}
    out = drop_dup_lines(
        _ds(docs), "text", delimiter="|", min_chars=3
    ).to_pandas()
    cm = dict(zip(out["record_id"], out["text"]))
    assert cm[0] == "ab|tail0" and cm[1] == "ab|tail1"


def test_all_lines_dropped_gives_empty(ray_session):
    from mismo_ray.dedupe import drop_dup_lines

    docs = {0: "x y z\nq r s", 1: "x y z\nq r s", 2: "x y z"}
    out = drop_dup_lines(_ds(docs), "text").to_pandas()
    assert all(out["text"] == "")


def test_drop_dup_lines_scoped(ray_session):
    """scope_column makes duplication domain-local: the same line on two
    different domains is not boilerplate; within one domain it is."""
    from mismo_ray.dedupe import drop_dup_lines, dup_line_stats

    t = pa.table(
        {
            "record_id": pa.array([0, 1, 2, 3], type=pa.int64()),
            "domain": ["a.com", "a.com", "b.com", "b.com"],
            "text": [
                "nav bar\npage zero",
                "nav bar\npage one",
                "nav bar\npage two",
                "b only\npage three",
            ],
        }
    )
    ds = ray.data.from_arrow(t).repartition(2).materialize()

    out = drop_dup_lines(
        ds, "text", out_column="clean", scope_column="domain"
    ).to_pandas()
    cm = dict(zip(out["record_id"], out["clean"]))
    # "nav bar" repeats within a.com (docs 0,1) -> dropped there; on b.com it
    # appears in only one doc (2) -> kept.
    assert cm[0] == "page zero"
    assert cm[1] == "page one"
    assert cm[2] == "nav bar\npage two"
    assert cm[3] == "b only\npage three"

    # unscoped: "nav bar" is in 3 distinct docs -> dropped everywhere
    out2 = drop_dup_lines(ds, "text", out_column="clean").to_pandas()
    cm2 = dict(zip(out2["record_id"], out2["clean"]))
    assert cm2[2] == "page two"

    stats = dup_line_stats(ds, "text", scope_column="domain").to_pandas()
    assert sorted(stats["record_id"]) == [0, 1]


def test_drop_dup_lines_join_path_parity(ray_session):
    """max_broadcast=0 forces the hash-join path; it must agree with the
    broadcast path on rewrite output, keep_first survivor and stats."""
    from mismo_ray.dedupe import drop_dup_lines, dup_line_stats

    texts = [
        "nav\nbody zero\nfooter",
        "nav\nbody one\nfooter",
        "nav\nbody two",
        "unique page\nnav",      # intra-list dup of "nav" at a later idx
        "solo content here",
    ]
    t = pa.table(
        {
            "record_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(3).materialize()

    for kw in ({}, {"keep_first": True}):
        bc = (
            drop_dup_lines(ds, "text", out_column="c", **kw)
            .to_pandas().sort_values("record_id").reset_index(drop=True)
        )
        jn = (
            drop_dup_lines(ds, "text", out_column="c", max_broadcast=0, **kw)
            .to_pandas().sort_values("record_id").reset_index(drop=True)
        )
        assert list(bc["c"]) == list(jn["c"]), kw
    # keep_first survivor is the smallest (doc, idx): doc 0 keeps its nav
    kf = (
        drop_dup_lines(ds, "text", out_column="c", keep_first=True)
        .to_pandas().sort_values("record_id")
    )
    assert list(kf["c"]) == [
        "nav\nbody zero\nfooter",
        "body one",
        "body two",
        "unique page",
        "solo content here",
    ]

    sb = dup_line_stats(ds, "text").to_pandas().sort_values("record_id")
    sj = (
        dup_line_stats(ds, "text", max_broadcast=0)
        .to_pandas().sort_values("record_id")
    )
    assert list(sb["n_dup_lines"]) == list(sj["n_dup_lines"])
    assert list(sb["dup_line_chars"]) == list(sj["dup_line_chars"])
