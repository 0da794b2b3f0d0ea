"""Bigram-LM perplexity scoring (textstats._lm) — parity with the pure
python reference, OOV handling, pruning, checkpoint round-trip."""

import math

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from mismo_ray.textstats import BigramLM, add_perplexity, train_bigram_lm
from mismo_ray.textstats._lm import logppl_reference

DOCS = [
    "The quick brown fox jumps over the lazy dog",
    "the quick brown fox naps",
    "Pack my box with five dozen liquor jugs!!",
    "pack my box, pack my box, pack my box",
    "singleton",
    "",
    None,
    "punct-only ... 123 mixed CASE text 123",
    "the the the the",
]


def _ds(docs, parallelism=3):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(docs)), type=pa.int64()),
                "text": pa.array(docs, type=pa.string()),
            }
        )
    ).repartition(parallelism)


def test_self_trained_parity_with_reference(ray_session):
    ds = _ds(DOCS)
    lm = train_bigram_lm(ds, "text")
    out = (
        add_perplexity(ds, lm, "text")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ref = logppl_reference(DOCS)
    for i, (n_ref, ppl_ref) in enumerate(ref):
        assert out.loc[i, "n_scored"] == n_ref
        got = out.loc[i, "logppl"]
        if ppl_ref is None:
            assert got is None or (isinstance(got, float) and math.isnan(got))
        else:
            assert got == pytest.approx(ppl_ref, rel=1e-12)


def test_oov_scoring_train_test_split(ray_session):
    train = _ds(DOCS, parallelism=2)
    test_docs = [
        "the quick zebra quantum flux",  # zebra/quantum/flux are OOV
        "totally unseen words everywhere",  # all OOV
        "the quick brown fox",  # fully in-vocab
    ]
    lm = train_bigram_lm(train, "text")
    out = (
        add_perplexity(_ds(test_docs, parallelism=1), lm, "text")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # python reference with the SAME (train-fitted) counts
    from collections import Counter

    from mismo_ray.textstats._lm import _SPLIT_COMPILED

    tok = [[t for t in _SPLIT_COMPILED.split(d.lower()) if t] for d in DOCS if d]
    uni, big = Counter(), Counter()
    for ts in tok:
        uni.update(ts)
        big.update(zip(ts, ts[1:]))
    v = len(uni)
    for i, d in enumerate(test_docs):
        ts = [t for t in _SPLIT_COMPILED.split(d.lower()) if t]
        pairs = list(zip(ts, ts[1:]))
        s = sum(
            math.log(big.get(p, 0) + 1.0) - math.log(uni.get(p[0], 0) + v)
            for p in pairs
        )
        assert out.loc[i, "n_scored"] == len(pairs)
        assert out.loc[i, "logppl"] == pytest.approx(-s / len(pairs), rel=1e-12)


def test_min_count_prunes_vocab(ray_session):
    ds = _ds(["a a a b", "a c a", "b a"], parallelism=1)
    full = train_bigram_lm(ds, "text")
    pruned = train_bigram_lm(ds, "text", min_count=2)
    assert set(full.vocab) == {"a", "b", "c"}
    assert set(pruned.vocab) == {"a", "b"}  # c appears once
    # pruned word is OOV: bigrams touching it are gone
    assert pruned.v == 2
    assert len(pruned.big_keys) < len(full.big_keys)


def test_max_broadcast_guard(ray_session):
    ds = _ds(["a b c d e f g h"], parallelism=1)
    with pytest.raises(ValueError, match="max_broadcast"):
        train_bigram_lm(ds, "text", max_broadcast=3)


def test_parquet_roundtrip(ray_session, tmp_path):
    ds = _ds(DOCS)
    lm = train_bigram_lm(ds, "text", k=0.5)
    p = str(tmp_path / "lm")
    lm.to_parquet(p)
    lm2 = BigramLM.from_parquet(p)
    assert lm2.k == 0.5
    assert list(lm2.vocab) == list(lm.vocab)
    np.testing.assert_array_equal(lm2.uni_counts, lm.uni_counts)
    np.testing.assert_array_equal(lm2.big_keys, lm.big_keys)
    np.testing.assert_array_equal(lm2.big_counts, lm.big_counts)
    # scoring through the reloaded model is identical
    a = add_perplexity(ds, lm, "text").to_pandas().sort_values("doc_id")
    b = add_perplexity(ds, lm2, "text").to_pandas().sort_values("doc_id")
    np.testing.assert_array_equal(
        a["n_scored"].to_numpy(), b["n_scored"].to_numpy()
    )
    np.testing.assert_allclose(
        a["logppl"].to_numpy(dtype=float), b["logppl"].to_numpy(dtype=float)
    )


def test_quality_signal_direction(ray_session):
    # repeated in-domain text scores lower perplexity than shuffled noise
    clean = ["the quick brown fox jumps over the lazy dog"] * 20
    corpus = clean + ["dog lazy the over jumps fox brown quick the"]
    ds = _ds(corpus, parallelism=2)
    lm = train_bigram_lm(ds, "text")
    out = add_perplexity(ds, lm, "text").to_pandas().sort_values("doc_id")
    clean_ppl = out["logppl"].iloc[0]
    noise_ppl = out["logppl"].iloc[-1]
    assert noise_ppl > clean_ppl


def test_perplexity_buckets(ray_session):
    from mismo_ray.textstats import perplexity_buckets

    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, None]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(vals)), type=pa.int64()),
                "logppl": pa.array(vals, type=pa.float64()),
            }
        )
    ).repartition(2)
    out = (
        perplexity_buckets(ds, "logppl")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # quantile_disc cuts on [1..6]: q=1/3 -> rank ceil(2)-1=1 -> 2.0;
    # q=2/3 -> rank ceil(4)-1=3 -> 4.0. value <= cut -> lower bucket.
    assert list(out["ppl_bucket"])[:6] == [
        "head", "head", "middle", "middle", "tail", "tail",
    ]
    assert out["ppl_bucket"].iloc[6] is None or (
        isinstance(out["ppl_bucket"].iloc[6], float)
    )


def test_perplexity_buckets_validation(ray_session):
    from mismo_ray.textstats import perplexity_buckets

    ds = ray.data.from_arrow(
        pa.table({"doc_id": [0], "logppl": pa.array([1.0])})
    )
    with pytest.raises(ValueError, match="labels"):
        perplexity_buckets(ds, "logppl", qs=(0.5,), labels=("a", "b", "c"))
    with pytest.raises(ValueError, match="ascending"):
        perplexity_buckets(ds, "logppl", qs=(0.7, 0.3), labels=("a", "b", "c"))


def test_min_bigram_count_prunes_before_collect(ray_session):
    # "a b" occurs 3x, every other bigram once
    ds = _ds(["a b c", "a b d", "a b e"], parallelism=1)
    full = train_bigram_lm(ds, "text")
    pruned = train_bigram_lm(ds, "text", min_bigram_count=2)
    assert set(pruned.vocab) == set(full.vocab)  # unigrams untouched
    assert len(pruned.big_keys) == 1  # only (a,b) survives
    assert len(full.big_keys) == 4  # (a,b) (b,c) (b,d) (b,e)
    # pruned bigrams score as unseen (count 0) -> higher logppl
    out_f = add_perplexity(_ds(["a b c"], 1), full, "text").to_pandas()
    out_p = add_perplexity(_ds(["a b c"], 1), pruned, "text").to_pandas()
    assert out_p["logppl"].iloc[0] > out_f["logppl"].iloc[0]


def test_perplexity_buckets_uniform_values_all_head(ray_session):
    # degenerate distribution (every value identical): both cuts equal the
    # value, so everything lands in the lowest bucket and a downstream
    # drop-tail gate is correctly a no-op
    from mismo_ray.textstats import perplexity_buckets

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(12), type=pa.int64()),
                "logppl": pa.array([3.25] * 12, type=pa.float64()),
            }
        )
    ).repartition(3)
    out = perplexity_buckets(ds, "logppl").to_pandas()
    assert list(out["ppl_bucket"].unique()) == ["head"]


def test_empty_corpus_yields_empty_model_and_null_buckets(ray_session):
    # ADVICE regression: all-null corpus used to KeyError on the
    # zero-column collect; buckets used to crash on NaN cuts
    from mismo_ray.textstats import perplexity_buckets

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1], type=pa.int64()),
                "text": pa.array([None, None], type=pa.string()),
            }
        )
    )
    lm = train_bigram_lm(ds, "text")
    assert lm.v == 0 and len(lm.big_keys) == 0
    scored = add_perplexity(ds, lm, "text").to_pandas()
    assert scored["logppl"].isna().all()
    out = perplexity_buckets(
        ray.data.from_arrow(
            pa.table({"logppl": pa.array([], type=pa.float64())})
        )
    ).to_pandas()
    assert len(out) == 0
    # non-empty rows but all-null column -> every label null, no crash
    out2 = perplexity_buckets(
        ray.data.from_arrow(
            pa.table({"logppl": pa.array([None, None], type=pa.float64())})
        )
    ).to_pandas()
    assert out2["ppl_bucket"].isna().all()
