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
