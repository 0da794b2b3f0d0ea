"""EM training at amplified-corpus scale: reference-style sanity bounds
(mismo/fs/tests/test_train.py:127-157 asserts bounds only, since exact EM
weights are not reproducible across platforms) plus a cross-seed stability
gate the reference lacks — our sampling is deterministic (seed, record_id)
hashes, so the spread across seeds is pure estimator variance."""

from __future__ import annotations

import math

import pytest

from mismo_ray.pipelines._webpages import train_em_at_scale

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def em_result(ray_session):
    # ~30k pages: big enough that the ~450-record-per-seed samples don't
    # overlap much, small enough for the test budget
    return train_em_at_scale(
        SF_DIR, multiplier=20, max_pairs=100_000, seeds=(0, 1), n_blocks=16
    )


def test_em_scale_reference_bounds(em_result):
    """The reference's directional assertions on every seed's weights."""
    for run in em_result["per_seed"]:
        odds = run["odds"]
        # every text tier is strong match evidence on the synth corpus
        # (variants of the same page share >=0.35-jaccard shingle sets;
        # random cross-page pairs essentially never do). ELSE levels are
        # excluded from ComparerWeights by design (fs/_weights.py:85).
        assert odds["text/exact"] > 10.0
        assert odds["text/near"] > 10.0
        # url same_page is match evidence (synth variants share the page)
        assert odds["url/same_page"] > 1.0
        # language agreement is weak-but-positive evidence
        assert odds["lang/same"] > 1.0


def test_em_scale_seed_stability(em_result):
    """Two disjoint hash samples of the same corpus must converge to the
    same weights within estimator tolerance: max |log odds ratio| <= ln(3)
    over all finite levels (the reference's commented-out exact checks used
    rel=0.1 on one platform; cross-sample variance is the honest bound)."""
    assert em_result["max_log_odds_spread"] <= math.log(3.0)


def test_em_scale_counters(em_result):
    assert em_result["n_pages"] > 10_000
    assert len(em_result["per_seed"]) == 2
    assert all(r["seconds"] > 0 for r in em_result["per_seed"])


@pytest.fixture(scope="module")
def em_skewed(ray_session):
    """Same corpus with 1/50 of pages rerouted onto ONE mirror domain
    (reroute_hot_domain) — the one-block-dominates pair sample."""
    return train_em_at_scale(
        SF_DIR,
        multiplier=20,
        max_pairs=100_000,
        seeds=(0, 1),
        n_blocks=16,
        hot_mod=50,
    )


def test_em_skew_stability(em_result, em_skewed):
    """EM under a hot-domain block (VERDICT r4 #9): the estimator must stay
    put where the corpus did not change — text/lang odds shift < ln(2) vs
    the uniform run, and their cross-seed spread stays inside the uniform
    run's ln(3) wall.  The URL tier is asserted finite but NOT spread-gated:
    rerouting changes the url distribution itself (its odds legitimately
    move), and its ``same_page`` level becomes a rare event whose u is
    estimated from a handful of sampled pairs — cross-seed spread there is
    measured at ~2.7 at this 30k-page/100k-pair test scale and shrinks with
    max_pairs (the bench leg ``train_em_skewed`` records the at-scale
    figure)."""
    assert em_skewed["hot_mod"] == 50
    uni = em_result["per_seed"][0]["odds"]
    o0, o1 = (r["odds"] for r in em_skewed["per_seed"])
    for k in uni:
        assert 0.0 < o0[k] < float("inf"), (k, o0[k])
        assert 0.0 < o1[k] < float("inf"), (k, o1[k])
        if k.startswith(("text/", "lang/")):
            # corpus-invariant tiers: estimator must not move under skew
            assert abs(math.log(o0[k]) - math.log(uni[k])) <= math.log(2.0), (
                k,
                uni[k],
                o0[k],
            )
            # ...and must agree across disjoint seed samples
            assert abs(math.log(o0[k]) - math.log(o1[k])) <= math.log(3.0), (
                k,
                o0[k],
                o1[k],
            )
