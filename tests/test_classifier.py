"""fastText-style linear quality classifier (textstats._classifier).

The trainable member of the quality tier (CCNet / LLaMA practice: a linear
classifier over hashed n-grams gates the crawl). Gates here: perfect
accuracy on a separable corpus INCLUDING held-out docs, bit-identical
refits (the int64 fixed-point gradient claim), empty/all-null survival,
and model checkpoint round-trip."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from mismo_ray.textstats import (
    TextClassifier,
    add_classifier_prob,
    evaluate_classifier,
    train_text_classifier,
)

FILLER = [
    "the quick brown fox jumped over a lazy dog near the river bank",
    "stocks rallied on tuesday as investors weighed earnings reports",
    "the committee approved a new budget for road maintenance projects",
    "researchers published findings on coral reef recovery this spring",
]


def _corpus(n: int = 200) -> pa.Table:
    rows = []
    for i in range(n):
        pos = i % 3 == 0
        marker = " refined prose excellent" if pos else " spam noise clickbait"
        rows.append(
            {
                "doc_id": i,
                "text": FILLER[i % len(FILLER)] + marker,
                "label": int(pos),
            }
        )
    return pa.Table.from_pylist(rows)


def test_separable_holdout_accuracy(ray_session):
    tbl = _corpus(200)
    train = ray.data.from_arrow(tbl.filter(pa.array([i % 5 != 0 for i in range(200)])))
    test = ray.data.from_arrow(tbl.filter(pa.array([i % 5 == 0 for i in range(200)])))
    m = train_text_classifier(train, "text", "label", epochs=20)
    ev = evaluate_classifier(test, m, "text", "label")
    assert ev["n"] == 40
    assert ev["accuracy"] == 1.0
    assert ev["log_loss"] < 0.2


def test_refit_bit_identical(ray_session):
    ds = ray.data.from_arrow(_corpus(120))
    m1 = train_text_classifier(ds, "text", "label", epochs=8)
    m2 = train_text_classifier(ds, "text", "label", epochs=8)
    assert np.array_equal(m1.w, m2.w)
    assert m1.b == m2.b


def test_prob_column_and_order(ray_session):
    ds = ray.data.from_arrow(_corpus(60))
    m = train_text_classifier(ds, "text", "label", epochs=20)
    out = add_classifier_prob(ds, m, "text").to_pandas().sort_values("doc_id")
    pos = out[out["label"] == 1]["quality_prob"]
    neg = out[out["label"] == 0]["quality_prob"]
    assert pos.min() > neg.max()


def test_empty_corpus(ray_session):
    empty = ray.data.from_arrow(
        pa.table(
            {
                "text": pa.array([], pa.string()),
                "label": pa.array([], pa.int64()),
            }
        )
    )
    m = train_text_classifier(empty, "text", "label", epochs=3)
    assert not m.w.any() and m.b == 0.0
    ev = evaluate_classifier(empty, m, "text", "label")
    assert ev["n"] == 0 and np.isnan(ev["accuracy"])


def test_all_null_text_survives(ray_session):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "text": pa.array([None, None, None, None], pa.string()),
                "label": pa.array([1, 0, 1, 0], pa.int64()),
            }
        )
    )
    m = train_text_classifier(ds, "text", "label", epochs=3)
    out = add_classifier_prob(ds, m, "text").take_all()
    # no tokens anywhere: every doc scores sigmoid(bias)
    probs = {round(r["quality_prob"], 12) for r in out}
    assert len(probs) == 1


def test_parquet_roundtrip(ray_session, tmp_path):
    ds = ray.data.from_arrow(_corpus(60))
    m = train_text_classifier(ds, "text", "label", epochs=6)
    m.to_parquet(str(tmp_path / "clf"))
    m2 = TextClassifier.from_parquet(str(tmp_path / "clf"))
    assert np.array_equal(m.w, m2.w)
    assert m.b == m2.b and m.seed == m2.seed
    a = add_classifier_prob(ds, m, "text").to_pandas()["quality_prob"]
    b = add_classifier_prob(ds, m2, "text").to_pandas()["quality_prob"]
    np.testing.assert_array_equal(a.to_numpy(), b.to_numpy())


def test_sampling_cap_is_deterministic(ray_session):
    ds = ray.data.from_arrow(_corpus(200))
    m1 = train_text_classifier(ds, "text", "label", epochs=6, max_train_rows=80)
    m2 = train_text_classifier(ds, "text", "label", epochs=6, max_train_rows=80)
    assert np.array_equal(m1.w, m2.w)
    # the cap actually bites: fewer docs -> different fit than the full run
    m3 = train_text_classifier(ds, "text", "label", epochs=6)
    assert not np.array_equal(m1.w, m3.w)
