"""substring_dup_stats: the distributed two-shuffle span-dedup must
reproduce a single-process brute-force reference, including the
content-defined anchor rule (the property that makes cross-doc runs
detectable regardless of offset) and interval-merge coverage."""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pyarrow as pa
import pytest
import ray.data
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mismo_ray.dedupe import substring_dup_stats


def _brute(docs: dict[int, str], window: int, min_docs: int = 2, anchor_mod: int = 1):
    occ: dict[str, list[tuple[int, int]]] = defaultdict(list)
    for rid, s in docs.items():
        if s is None:
            continue
        for i in range(1, len(s) - window + 1):
            if s[i - 1] in " \n" and (anchor_mod <= 1 or ord(s[i]) % anchor_mod == 0):
                occ[s[i : i + window]].append((rid, i))
    perdoc: dict[int, list[int]] = defaultdict(list)
    for w, v in occ.items():
        if len({d for d, _ in v}) >= min_docs:
            for d, i in v:
                perdoc[d].append(i)
    out = {}
    for d, ps in perdoc.items():
        ps.sort()
        cov = window + sum(min(window, b - a) for a, b in zip(ps, ps[1:]))
        out[d] = (len(docs[d]), len(ps), cov)
    return out


def _run(docs: dict[int, str], **kw) -> dict:
    t = pa.table(
        {
            "record_id": pa.array(list(docs.keys()), type=pa.int64()),
            "text": pa.array(list(docs.values()), type=pa.string()),
        }
    )
    got = substring_dup_stats(
        ray.data.from_arrow(t).repartition(3), "text", **kw
    ).to_pandas()
    return {
        int(r.record_id): (int(r.doc_len), int(r.n_dup_windows), int(r.dup_chars))
        for r in got.itertuples()
    }


def test_substring_dup_stats_planted(ray_session):
    rng = np.random.default_rng(0)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]
    boiler = (
        "this is a shared boilerplate license block that repeats verbatim "
        "across many documents in the corpus"
    )
    docs = {}
    for i in range(50):
        body = " ".join(rng.choice(words, size=int(rng.integers(20, 60))))
        if i % 3 == 0:
            # inject at a RANDOM offset: catching these is exactly what
            # content-defined anchors buy over stride sampling
            k = int(rng.integers(0, len(body) // 2))
            body = body[:k] + " " + boiler + " " + body[k:]
        docs[i] = body
    docs[50] = None  # null text must be skipped
    docs[51] = "short"
    expected = _brute({k: v for k, v in docs.items() if v is not None}, 40)
    assert len(expected) > 10  # the plant actually produced dup spans
    assert _run(docs, window=40) == expected


def test_substring_dup_stats_no_dups(ray_session):
    docs = {i: f"completely unique document number {i} " + "x" * i for i in range(8)}
    assert _run(docs, window=40) == _brute(docs, 40)


def test_substring_dup_stats_anchor_mod(ray_session):
    base = "the quick brown fox jumps over the lazy dog again and again and again"
    docs = {0: "aaa " + base, 1: "bbbbbbbbb " + base, 2: "unrelated " + "z " * 40}
    for mod in (1, 2):
        assert _run(docs, window=30, anchor_mod=mod) == _brute(docs, 30, anchor_mod=mod)


@pytest.mark.usefixtures("ray_session")
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.text(alphabet="ab \n", min_size=0, max_size=60), min_size=2, max_size=12
    ),
    window=st.sampled_from([5, 9]),
)
def test_substring_dup_stats_property(texts, window):
    # tiny alphabet -> dense collisions, repeated windows within one doc,
    # anchors adjacent to each other and to doc edges
    docs = dict(enumerate(texts))
    assert _run(docs, window=window) == _brute(docs, window)


def test_spans_and_strip(ray_session):
    from mismo_ray.dedupe import strip_dup_spans, substring_dup_spans

    boiler = "shared boilerplate block that is exactly repeated in both docs yes"
    docs = {
        0: "unique head zero " + boiler + " unique tail zero",
        1: "other start " + boiler + " other finish",
        2: "totally unrelated text with nothing shared at all here",
    }
    t = pa.table(
        {
            "record_id": pa.array(list(docs.keys()), type=pa.int64()),
            "text": pa.array(list(docs.values()), type=pa.string()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(2).materialize()
    spans = substring_dup_spans(ds, "text", window=30).materialize()
    sp = spans.to_pandas().sort_values(["record_id", "span_start"])
    # each boilerplate-carrying doc gets exactly one merged span, and the
    # span's text must lie inside the boilerplate region
    assert list(sp["record_id"]) == [0, 1]
    for r in sp.itertuples():
        seg = docs[int(r.record_id)][int(r.span_start) : int(r.span_end)]
        assert seg in docs[0] and seg in docs[1]
        assert boiler[5:-5] in seg  # covers the run (anchor offsets allowed)
    cleaned = strip_dup_spans(ds, spans, "text").to_pandas()
    cm = dict(zip(cleaned["record_id"], cleaned["text"]))
    assert cm[2] == docs[2]  # untouched doc passes through
    for rid in (0, 1):
        assert boiler[5:-5] not in cm[rid]
        assert "unique head zero" in cm[0] and "unique tail zero" in cm[0]


def test_strip_preserves_schema_and_rows(ray_session):
    from mismo_ray.dedupe import strip_dup_spans, substring_dup_spans

    texts = ["aaa bbb ccc ddd eee fff ggg hhh iii jjj"] * 3 + ["solo text here"]
    t = pa.table(
        {
            "record_id": pa.array(range(4), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(["en"] * 4, type=pa.string()),
        }
    )
    ds = ray.data.from_arrow(t).materialize()
    spans = substring_dup_spans(ds, "text", window=10)
    out = strip_dup_spans(ds, spans, "text", out_column="clean").to_pandas()
    assert len(out) == 4
    assert set(out.columns) == {"record_id", "text", "lang", "clean"}
    # identical docs: everything from the first anchor (pos 4 — pos 0 has
    # no preceding space so can't anchor) through the last window is
    # stripped, leaving only the uncovered head/tail fragments
    assert all(out[out.record_id < 3]["clean"] == "aaa j")
    assert out[out.record_id == 3]["clean"].iloc[0] == "solo text here"
