"""DSIR importance resampling: target-matching selection quality,
determinism across runs/partitionings, exact sample size, model
round-trip, temperature behavior, degenerate inputs."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data


def _corpus(n_a=300, n_b=300, seed=11):
    """Two unmistakable styles: A = english-ish sentences, B = coordinate
    gibberish. Deterministic, vocabulary fully disjoint."""
    rng = np.random.default_rng(seed)
    a_words = "the quick brown fox jumps over lazy dog river stone light".split()
    b_words = "zz9 qq7 xx3 kk4 vv2 jj8 ww5 uu6 hh1 mm0".split()
    texts, styles = [], []
    for i in range(n_a + n_b):
        words = a_words if i < n_a else b_words
        k = rng.integers(8, 20)
        texts.append(" ".join(rng.choice(words, size=k)))
        styles.append("a" if i < n_a else "b")
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n_a + n_b, dtype=np.int64)),
            "text": pa.array(texts, type=pa.string()),
            "style": pa.array(styles, type=pa.string()),
        }
    )


def test_dsir_selects_target_style(ray_session):
    from mismo_ray.textstats import add_dsir_weight, dsir_sample, fit_dsir

    t = _corpus()
    raw = ray.data.from_arrow(t).repartition(8)
    # target: an independent style-A sample (different seed -> different docs)
    tgt_tbl = _corpus(n_a=100, n_b=0, seed=99)
    target = ray.data.from_arrow(tgt_tbl).repartition(4)

    model = fit_dsir(target, raw, "text", buckets=4096, seed=7)
    # weights separate the styles: every style-A doc outweighs every B doc
    w = add_dsir_weight(raw, model, "text").to_pandas()
    wa = w.loc[w["style"] == "a", "dsir_logw"]
    wb = w.loc[w["style"] == "b", "dsir_logw"]
    assert wa.min() > wb.max()
    # low-temperature sampling returns (almost) exclusively style A
    got = dsir_sample(
        raw, model, "text", 200, seed=3, temperature=0.05
    ).to_pandas()
    assert len(got) == 200
    assert (got["style"] == "a").mean() >= 0.99
    # temperature=inf-ish: selection approaches uniform, so B leaks in
    hot = dsir_sample(
        raw, model, "text", 200, seed=3, temperature=100.0
    ).to_pandas()
    assert (hot["style"] == "b").sum() > 20


def test_dsir_deterministic_and_partition_invariant(ray_session):
    from mismo_ray.textstats import dsir_sample, fit_dsir

    t = _corpus(n_a=150, n_b=150)
    raw8 = ray.data.from_arrow(t).repartition(8)
    raw3 = ray.data.from_arrow(t).repartition(3)
    target = ray.data.from_arrow(_corpus(n_a=60, n_b=0, seed=5))

    m8 = fit_dsir(target, raw8, "text", buckets=2048)
    m3 = fit_dsir(target, raw3, "text", buckets=2048)
    # counts (and hence the model) are partition-invariant
    assert np.array_equal(m8.log_ratio, m3.log_ratio)

    a = set(dsir_sample(raw8, m8, "text", 77, seed=1).to_pandas().doc_id)
    b = set(dsir_sample(raw3, m3, "text", 77, seed=1).to_pandas().doc_id)
    c = set(dsir_sample(raw8, m8, "text", 77, seed=2).to_pandas().doc_id)
    assert a == b
    assert len(a) == 77
    assert a != c  # a different seed is a different draw


def test_dsir_model_roundtrip_and_guards(ray_session, tmp_path):
    from mismo_ray.textstats import DsirModel, dsir_sample, fit_dsir

    t = _corpus(n_a=50, n_b=50)
    raw = ray.data.from_arrow(t).repartition(4)
    target = ray.data.from_arrow(_corpus(n_a=30, n_b=0, seed=2))
    model = fit_dsir(target, raw, "text", buckets=1024)

    p = str(tmp_path / "dsir")
    model.to_parquet(p)
    back = DsirModel.from_parquet(p)
    assert np.array_equal(model.log_ratio, back.log_ratio)
    assert (back.buckets, back.seed, back.alpha) == (1024, 7, 1.0)

    # n >= corpus: everything passes through
    assert dsir_sample(raw, model, "text", 1000).count() == 100
    with pytest.raises(ValueError, match="n must be positive"):
        dsir_sample(raw, model, "text", 0)
    with pytest.raises(ValueError, match="temperature"):
        dsir_sample(raw, model, "text", 5, temperature=0.0)
    # empty target corpus refuses to fit
    empty = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())})
    )
    with pytest.raises(ValueError, match="target corpus has no tokens"):
        fit_dsir(empty, raw, "text")


def test_dsir_null_and_empty_text(ray_session):
    from mismo_ray.textstats import add_dsir_weight, dsir_sample, fit_dsir

    t = pa.table(
        {
            "doc_id": pa.array(np.arange(6, dtype=np.int64)),
            "text": pa.array(
                ["the quick fox", None, "", "zz9 qq7", "lazy dog river", None],
                type=pa.string(),
            ),
        }
    )
    raw = ray.data.from_arrow(t).repartition(3)
    target = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0], pa.int64()),
                "text": pa.array(["quick fox dog"], pa.string()),
            }
        )
    )
    model = fit_dsir(target, raw, "text", buckets=512)
    w = add_dsir_weight(raw, model, "text").to_pandas().sort_values("doc_id")
    # null/empty docs get weight 0.0, not null, not a crash
    assert list(w.dsir_logw.iloc[[1, 2, 5]]) == [0.0, 0.0, 0.0]
    got = dsir_sample(raw, model, "text", 3, seed=4).to_pandas()
    assert len(got) == 3
