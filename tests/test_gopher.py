"""Gopher quality rules (textstats._gopher) — per-rule rejection and
integer-exact ratio boundaries."""

import pyarrow as pa
import ray.data

from mismo_ray.textstats import add_gopher_stats, gopher_quality_filter

GOOD = (
    "the quick brown fox jumps over that lazy dog and then runs off to be "
    "with your friends of mine while we have a look at what remains here "
    "today because more words are needed to clear the fifty word minimum "
    "for this canonical gopher quality filter test document okay"
)


def _ds(docs):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(docs)), type=pa.int64()),
                "text": pa.array(docs, type=pa.string()),
            }
        )
    ).repartition(2)


def test_gopher_stats_counts(ray_session):
    doc = "the cat\n- bullet one\n• bullet two\ntrailing dots...\n### x ..."
    out = add_gopher_stats(_ds([doc])).to_pandas().iloc[0]
    assert out["n_words"] == 13
    assert out["n_lines"] == 5
    assert out["n_bullet_lines"] == 2
    assert out["n_ellipsis_end_lines"] == 2
    assert out["n_hash"] == 3
    assert out["n_ellipsis"] == 2
    assert out["n_stop8"] == 1  # only 'the'


def test_gopher_filter_each_rule(ray_session):
    docs = [
        GOOD,                                        # 0: passes
        "too short to pass the word count",          # 1: < 50 words
        " ".join(["aa"] * 60),                       # 2: mean len 2 < 3, no stopwords
        GOOD + " " + "#" * 40,                       # 3: symbol ratio blown
        "\n".join(["- b " + GOOD] * 1),              # 4: 100% bullet lines
        " ".join(
            ["apple banana cherry dates elder figs grape melon"] * 8
        ),                                           # 5: zero of the 8 stopwords
        None,                                        # 6: null -> 0 words -> drop
    ]
    kept = gopher_quality_filter(_ds(docs)).to_pandas()
    assert sorted(kept["doc_id"]) == [0]

    labeled = gopher_quality_filter(_ds(docs), label_only=True).to_pandas()
    assert labeled["gopher_keep"].sum() == 1
    assert len(labeled) == len(docs)


def test_gopher_boundary_integer_exact(ray_session):
    # exactly 50 words, mean word length exactly 3.0 -> both inclusive
    doc = " ".join(["the", "and", "box"] * 16 + ["of", "to"])  # 50 words
    stats = add_gopher_stats(_ds([doc])).to_pandas().iloc[0]
    assert stats["n_words"] == 50
    # 48 * 3 + 2 + 2 = 148 chars -> mean 2.96 < 3 -> fails mean-len rule
    kept = gopher_quality_filter(_ds([doc])).to_pandas()
    assert len(kept) == 0
    # pad short words out: exactly mean 3.0 passes (boundary inclusive)
    doc2 = " ".join(["the", "and", "box"] * 16 + ["off", "too"])
    s2 = add_gopher_stats(_ds([doc2])).to_pandas().iloc[0]
    assert s2["word_chars"] == 150 and s2["n_words"] == 50
    kept2 = gopher_quality_filter(_ds([doc2])).to_pandas()
    assert len(kept2) == 1
