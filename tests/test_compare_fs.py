"""LevelComparer + Fellegi-Sunter weights/training
(reference: /root/reference/mismo/compare/_enum_comparer.py,
/root/reference/mismo/fs/)."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data

from mismo_ray.compare import LevelComparer, compare
from mismo_ray.fs import (
    ComparerWeights,
    LevelWeights,
    Weights,
    level_proportions,
    train_using_em,
    train_using_labels,
)
from mismo_ray.linker import KeyLinker


def name_comparer():
    return LevelComparer(
        "name",
        ["exact", "close", "else"],
        [
            (lambda t: pc.equal(t["name_l"], t["name_r"]).to_numpy(zero_copy_only=False), "exact"),
            (
                lambda t: np.array(
                    [
                        a is not None and b is not None and a[:3] == b[:3]
                        for a, b in zip(t["name_l"].to_pylist(), t["name_r"].to_pylist())
                    ]
                ),
                "close",
            ),
        ],
    )


def pairs_table():
    return pa.table(
        {
            "record_id_l": [0, 1, 2, 3],
            "record_id_r": [10, 11, 12, 13],
            "name_l": ["alice", "bobby", "carol", None],
            "name_r": ["alice", "bobbi", "david", "x"],
        }
    )


def test_level_comparer_first_match_wins(ray_session):
    ds = ray.data.from_arrow(pairs_table())
    out = name_comparer()(ds).take_all()
    labels = {r["record_id_l"]: r["name"] for r in out}
    # exact=0, close=1, else=2
    assert labels == {0: 0, 1: 1, 2: 2, 3: 2}


def test_level_comparer_string_repr(ray_session):
    c = LevelComparer(
        "name",
        ["exact", "else"],
        [(lambda t: pc.equal(t["name_l"], t["name_r"]).to_numpy(zero_copy_only=False), "exact")],
        representation="string",
    )
    out = c(ray.data.from_arrow(pairs_table())).take_all()
    assert {r["name"] for r in out} == {"exact", "else"}


def test_compare_multiple(ray_session):
    c1 = name_comparer()
    c2 = LevelComparer(
        "ids",
        ["same_parity", "else"],
        [
            (
                lambda t: (
                    np.asarray(t["record_id_l"]) % 2
                    == np.asarray(t["record_id_r"]) % 2
                ),
                "same_parity",
            )
        ],
    )
    out = compare(ray.data.from_arrow(pairs_table()), [c1, c2]).take_all()
    assert all("name" in r and "ids" in r for r in out)


def test_level_weights_odds():
    lw = LevelWeights("exact", m=0.9, u=0.01)
    assert lw.odds == pytest.approx(90.0)
    assert LevelWeights("x", m=0.5, u=0).odds == float("inf")


def test_comparer_weights_vector_odds():
    cw = ComparerWeights(
        "name",
        [LevelWeights("exact", m=0.8, u=0.01), LevelWeights("close", m=0.15, u=0.09)],
    )
    got = cw.odds(np.array([0, 1, 2]))  # 2 = else level
    assert got == pytest.approx([80.0, 15 / 9, 1.0])
    assert cw.odds("exact") == pytest.approx(80.0)
    assert cw.odds(1) == pytest.approx(15 / 9)


def test_weights_score_compared(ray_session):
    cw = ComparerWeights(
        "name",
        [LevelWeights("exact", m=0.8, u=0.01), LevelWeights("close", m=0.15, u=0.09)],
    )
    w = Weights([cw])
    ds = ray.data.from_arrow(
        pa.table({"record_id_l": [0, 1, 2], "record_id_r": [5, 6, 7], "name": [0, 1, 2]})
    )
    out = {r["record_id_l"]: r for r in w.score_compared(ds).take_all()}
    assert out[0]["odds"] == pytest.approx(80.0)
    assert out[0]["name_odds"] == pytest.approx(80.0)
    assert out[2]["odds"] == pytest.approx(1.0)
    assert out[0]["log_odds"] == pytest.approx(math.log(80.0))


def test_weights_json_roundtrip(tmp_path):
    w = Weights(
        [
            ComparerWeights(
                "name",
                [LevelWeights("exact", m=0.8, u=0.01)],
            )
        ]
    )
    p = tmp_path / "w.json"
    w.to_json(p)
    w2 = Weights.from_json(p)
    assert w == w2


def test_level_proportions_smoothing():
    # unseen levels get an add-one count (reference _train.py:31-38)
    props = level_proportions(["a", "b", "else"], np.array([0, 0, 0, 1]))
    assert props == pytest.approx([3 / 5, 1 / 5, 1 / 5])


@pytest.fixture
def labeled_people(ray_session):
    # two entities with noisy names + distractors
    n = 60
    names, labels = [], []
    for i in range(n):
        ent = i % 6
        labels.append(ent)
        base = ["alice", "bobby", "carol", "david", "erika", "frank"][ent]
        name = base if i % 3 else base[:4] + "x"  # a third are typos
        names.append(name)
    return ray.data.from_arrow(
        pa.table(
            {
                "record_id": list(range(n)),
                "label_true": labels,
                "name": names,
                "first3": [x[:3] for x in names],
            }
        )
    )


def test_train_using_labels(labeled_people):
    c = name_comparer()
    w = train_using_labels([c], labeled_people, labeled_people, max_pairs=10_000)
    cw = w["name"]
    # exact matches should be far more likely among true pairs
    assert cw["exact"].m > cw["exact"].u
    assert cw["exact"].odds > 1.0


def test_train_using_em(labeled_people):
    c = name_comparer()
    w = train_using_em([c], labeled_people, labeled_people, max_pairs=10_000)
    assert w["name"]["exact"].odds > 1.0


def test_end_to_end_score(labeled_people):
    linkage = KeyLinker("first3")(labeled_people, labeled_people)
    pairs = linkage.links.with_both(["name"], ["name"])
    c = name_comparer()
    w = train_using_labels([c], labeled_people, labeled_people, max_pairs=10_000)
    scored = w.compare_and_score(pairs, [c])
    rows = scored.take_all()
    assert all("odds" in r for r in rows)
    exact = [r for r in rows if r["name"] == 0]
    els = [r for r in rows if r["name"] == 2]
    if exact and els:
        assert min(e["odds"] for e in exact) > max(e["odds"] for e in els)
