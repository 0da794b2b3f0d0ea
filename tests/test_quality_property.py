"""Property-based parity: the vectorized quality filters (Gopher, C4,
html strip) vs straightforward pure-python references on random text."""

from __future__ import annotations

import re

import pyarrow as pa
import ray.data
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

WORDS = ["the", "and", "fox", "a#", "x...", "•dot", "- y", "Abc", "42", "", "have"]
line_strategy = st.lists(st.sampled_from(WORDS), min_size=0, max_size=8).map(
    " ".join
)
doc_strategy = st.one_of(
    st.none(),
    st.lists(line_strategy, min_size=0, max_size=6).map("\n".join),
)
docs_strategy = st.lists(doc_strategy, min_size=1, max_size=12)


def _ds(docs):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(docs)), type=pa.int64()),
                "text": pa.array(docs, type=pa.string()),
            }
        )
    ).repartition(2)


def _gopher_ref(doc):
    """Pure-python Gopher signal counts."""
    s = doc or ""
    words = s.split()
    lines = s.split("\n")
    stop8 = {"the", "be", "to", "of", "and", "that", "have", "with"}
    return dict(
        n_words=len(words),
        word_chars=sum(len(w) for w in words),
        n_alpha_words=sum(1 for w in words if re.search("[A-Za-z]", w)),
        n_stop8=len({w.lower() for w in words} & stop8),
        n_hash=s.count("#"),
        n_ellipsis=(len(s) - len(s.replace("...", ""))) // 3,
        n_lines=len(lines),
        n_bullet_lines=sum(
            1 for x in lines if x.startswith("•") or x.startswith("- ")
        ),
        n_ellipsis_end_lines=sum(
            1 for x in lines if x.endswith("...") or x.endswith("…")
        ),
    )


@given(docs=docs_strategy)
@settings(**SETTINGS)
def test_gopher_stats_property(ray_session, docs):
    from mismo_ray.textstats import add_gopher_stats

    out = (
        add_gopher_stats(_ds(docs))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for i, d in enumerate(docs):
        ref = _gopher_ref(d)
        for k, v in ref.items():
            assert int(out.loc[i, k]) == v, (k, d)


def _c4_ref(doc, min_line_words=5, min_sentences=3):
    if doc is None:
        doc = ""
    if "lorem ipsum" in doc.lower() or "{" in doc:
        return None
    kept = []
    for line in doc.split("\n"):
        stripped = line.strip(" \t\r\f\v")
        if not stripped or stripped[-1] not in '.!?"':
            continue
        if len(line.split()) < min_line_words:
            continue
        if "javascript" in line.lower():
            continue
        kept.append(line)
    if len(kept) < min_sentences:
        return None
    return "\n".join(kept)


@given(docs=docs_strategy)
@settings(**SETTINGS)
def test_c4_clean_property(ray_session, docs):
    from mismo_ray.textstats import c4_clean

    df = c4_clean(_ds(docs), min_sentences=1).to_pandas()
    out = {} if df.empty else df.set_index("doc_id")["text"].to_dict()
    for i, d in enumerate(docs):
        ref = _c4_ref(d, min_sentences=1)
        if ref is None:
            assert i not in out, d
        else:
            assert out.get(i) == ref, d


HTMLY = st.lists(
    st.sampled_from(
        ["<b>", "</b>", "text", "&amp;", "&lt;", "<a x", ">", "a  b", "\tc\n", "&amp;lt;"]
    ),
    min_size=0,
    max_size=10,
).map("".join)


@given(html=HTMLY)
@settings(**SETTINGS)
def test_strip_tags_property(html):
    from mismo_ray.lib.html import strip_tags_batch

    got = strip_tags_batch(pa.array([html])).to_pylist()[0]
    ref = re.sub("<[^>]*>", "", html)
    for ent, ch in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&nbsp;", " "),
        ("&amp;", "&"),
    ):
        ref = ref.replace(ent, ch)
    # RE2-\s parity: no \v in the class, plain-space strip (== SQL trim)
    ref = re.sub(r"[ \t\n\r\f]+", " ", ref).strip(" ")
    assert got == ref, html
