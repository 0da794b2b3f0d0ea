"""C4 line-level cleaning rules (textstats._c4)."""

import pyarrow as pa
import ray.data

from mismo_ray.textstats import c4_clean

DOC_GOOD = (
    "This is a fine sentence.\n"
    "too short.\n"                          # < 5 words
    "Please enable JavaScript to continue.\n"  # javascript
    "Another good line right here!\n"
    "no terminal punctuation at all\n"
    'And a "quoted finale" works too?'
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


def test_c4_line_rules_and_rewrite(ray_session):
    out = c4_clean(_ds([DOC_GOOD])).to_pandas()
    assert len(out) == 1
    assert out["text"].iloc[0] == (
        "This is a fine sentence.\n"
        "Another good line right here!\n"
        'And a "quoted finale" works too?'
    )


def test_c4_document_rules(ray_session):
    docs = [
        DOC_GOOD,                                   # kept
        DOC_GOOD + "\ncode { block here.",          # '{' -> dropped
        DOC_GOOD + "\nSome Lorem Ipsum filler.",    # lorem ipsum -> dropped
        "One good sentence only here.",             # < 3 kept lines -> dropped
        None,                                       # null -> dropped
    ]
    out = c4_clean(_ds(docs)).to_pandas()
    assert sorted(out["doc_id"]) == [0]

    labeled = c4_clean(_ds(docs), label_only=True).to_pandas().sort_values("doc_id")
    assert len(labeled) == len(docs)
    assert list(labeled["c4_keep"]) == [True, False, False, False, False]
    assert labeled["n_kept_lines"].iloc[0] == 3
    assert labeled["n_kept_lines"].iloc[3] == 1


def test_c4_out_column_and_thresholds(ray_session):
    out = c4_clean(
        _ds(["Solo good sentence stands alone."]),
        min_sentences=1,
        out_column="clean_text",
    ).to_pandas()
    assert out["clean_text"].iloc[0] == "Solo good sentence stands alone."
    assert out["text"].iloc[0].startswith("Solo")  # original preserved
