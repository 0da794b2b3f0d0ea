"""Leipzig affiliations corpus: loader shape + the documented noisy-label
achievable band for the simple tuned rule (pipelines._affiliations).

The upstream converter warns the labels are "not very reliable" (reference
leipzig/make_affiliations.py): identical org strings can carry different
labels, so febrl/RLdata-style 0.9+ gates are unreachable by ANY method on
this data. The gates below pin the measured band of the bundled rule
(P=0.607 R=0.383 F1=0.470 at bar=0.45) with slack for nondeterminism-free
regression detection — they assert the pipeline never silently degrades,
not that the dataset is solvable.
"""

from __future__ import annotations

import pyarrow as pa


def _pair_set(ds) -> set[tuple[int, int]]:
    return {
        (min(r["record_id_l"], r["record_id_r"]), max(r["record_id_l"], r["record_id_r"]))
        for r in ds.take_all()
    }


def test_load_affiliations_shape(ray_session):
    from mismo_ray.playdata import load_affiliations

    lk = load_affiliations()
    t = lk.left.schema().base_schema
    assert t.field("record_id").type == pa.int64()
    assert t.field("label_true").type == pa.int64()
    assert t.field("affiliation").type == pa.string()
    assert lk.left.count() == 2260
    # 330 labeled entities -> 16795 unordered true pairs
    assert lk.links_ds.count() == 16795


def test_affiliations_match_band(ray_session):
    from mismo_ray.pipelines import affiliations_match_pairs
    from mismo_ray.playdata import load_affiliations

    lk = load_affiliations()
    truth = _pair_set(lk.links_ds)
    pred = _pair_set(affiliations_match_pairs(lk.left).links_ds)
    tp = len(pred & truth)
    p, r = tp / len(pred), tp / len(truth)
    f1 = 2 * p * r / (p + r)
    # measured: P=0.607 R=0.383 F1=0.470 (deterministic pipeline)
    assert p >= 0.55, p
    assert r >= 0.35, r
    assert f1 >= 0.43, f1


def test_featurize_affiliations_keys(ray_session):
    import ray.data

    from mismo_ray.pipelines import featurize_affiliations

    t = pa.table(
        {
            "record_id": pa.array([0, 1], type=pa.int64()),
            "affiliation": pa.array(
                [
                    "Dept. of Computer Science, MIT, Cambridge, MA",
                    ", IBM Almaden Research Center",
                ]
            ),
        }
    )
    out = featurize_affiliations(ray.data.from_arrow(t)).to_pandas()
    assert sorted(out.loc[0, "keys"]) == [
        "cambridge",
        "computer",
        "dept",
        "mit",
        "science",
    ]
    assert sorted(out.loc[1, "keys"]) == ["almaden", "center", "ibm", "research"]


def test_affiliations_join_path_matches_broadcast(ray_session):
    """max_broadcast_terms=0 forces the distributed explode->keyed_filter->
    regroup blocking; the pair set must equal the broadcast path's."""
    from mismo_ray.pipelines import affiliations_match_pairs
    from mismo_ray.playdata import load_affiliations

    records = load_affiliations().left
    broadcast = _pair_set(affiliations_match_pairs(records).links_ds)
    joined = _pair_set(
        affiliations_match_pairs(records, max_broadcast_terms=0).links_ds
    )
    assert joined == broadcast
    assert len(joined) > 0
