"""add_repetition_stats: Gopher-style repetition signals vs hand-computed
references — line metrics (the SQL oracle corpus has no newlines, so they
are only covered here), n-gram coverage unioning, and edge cases."""

from __future__ import annotations

import math

import pyarrow as pa
import ray.data

from mismo_ray.textstats import add_repetition_stats


def _run(texts, **kw):
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    df = (
        add_repetition_stats(ray.data.from_arrow(t), "text", **kw)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    return df


def test_line_metrics(ray_session):
    texts = [
        "a\nb\na\nc\na",  # line "a" x3 -> 2 of 5 lines are repeats
        "x\ny",  # no repeats
        "same\nsame",  # all repeats of one line
        None,
    ]
    df = _run(texts)
    assert df.loc[0, "n_lines"] == 5 and df.loc[0, "n_uniq_lines"] == 3
    assert math.isclose(df.loc[0, "dup_line_frac"], 2 / 5)
    # dup chars: "a" occurs 3x -> 3 chars of 5 total line chars
    assert df.loc[0, "dup_line_chars"] == 3 and df.loc[0, "line_chars"] == 5
    assert df.loc[1, "dup_line_frac"] == 0.0
    assert math.isclose(df.loc[2, "dup_line_char_frac"], 1.0)
    assert df.loc[3, "n_lines"] == 0 and df.loc[3, "dup_line_frac"] == 0.0


def test_top_ngram(ray_session):
    # "b c" occurs 3x (6 chars incl occurrences: 3 * 2 = 6 word chars);
    # word_chars = 9 words x 1 char
    df = _run(["a b c b c b c a a"], top_ns=(2,), dup_ns=(2,))
    assert df.loc[0, "n_words"] == 9 and df.loc[0, "word_chars"] == 9
    assert df.loc[0, "top2gram_chars"] == 3 * 2
    assert math.isclose(df.loc[0, "top2gram_frac"], 6 / 9)


def test_dup_ngram_coverage_unions_overlaps(ray_session):
    # "a a a a" : 2-gram ("a","a") occurs 3x; covered words = all 4 (spans
    # [0,1],[1,2],[2,3] union), NOT 6 — double counting would exceed
    # word_chars
    df = _run(["a a a a"], top_ns=(2,), dup_ns=(2,))
    assert df.loc[0, "dup2gram_chars"] == 4
    assert math.isclose(df.loc[0, "dup2gram_frac"], 1.0)


def test_short_docs_and_defaults(ray_session):
    df = _run(["one", "", "two words"])
    # shorter than every n -> all zero, fracs zero not NaN
    for c in df.columns:
        assert not df[c].isna().any()
    assert df.loc[0, "top2gram_chars"] == 0
    assert df.loc[2, "dup5gram_chars"] == 0
