"""Golden-dataset conformance: the bundled playdata tables load with the
reference's schemas/shapes, and FS training reproduces the reference's
published m/u anchors on the patents dataset
(reference mismo/fs/tests/test_train.py:103-119 tolerances)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from mismo_ray import fs, playdata
from mismo_ray.compare import LevelComparer
from mismo_ray.lib.geo import distance_km


@pytest.fixture
def name_comparer():
    # reference fs/tests/test_train.py:13-27: EXACT = equal names,
    # CLOSE = equal first-3 chars, ELSE
    # (_b defined inside the fixture: workers can't import test modules, so
    # the condition closures must not reference test-module globals)
    def _b(arr):
        return (
            pc.fill_null(arr, False).to_numpy(zero_copy_only=False).astype(bool)
        )

    return LevelComparer(
        "name",
        ["EXACT", "CLOSE", "ELSE"],
        [
            (lambda t: _b(pc.equal(t["name_l"], t["name_r"])), "EXACT"),
            (
                lambda t: _b(
                    pc.equal(
                        pc.utf8_slice_codeunits(t["name_l"], 0, 3),
                        pc.utf8_slice_codeunits(t["name_r"], 0, 3),
                    )
                ),
                "CLOSE",
            ),
            (lambda t: np.ones(len(t), dtype=bool), "ELSE"),
        ],
    )


@pytest.fixture
def location_comparer():
    # reference fs/tests/test_train.py:30-78 (patents lat/lon are never null
    # — 0.0 encodes "no address", so the missing tiers stay empty)
    def _b(arr):
        return (
            pc.fill_null(arr, False).to_numpy(zero_copy_only=False).astype(bool)
        )

    def km(t):
        return distance_km(
            np.asarray(t["latitude_l"], dtype=np.float64),
            np.asarray(t["longitude_l"], dtype=np.float64),
            np.asarray(t["latitude_r"], dtype=np.float64),
            np.asarray(t["longitude_r"], dtype=np.float64),
        )

    return LevelComparer(
        "location",
        ["EXACT", "WITHIN_10KM", "WITHIN_100KM", "ELSE"],
        [
            (
                lambda t: _b(
                    pc.and_(
                        pc.equal(t["latitude_l"], t["latitude_r"]),
                        pc.equal(t["longitude_l"], t["longitude_r"]),
                    )
                ),
                "EXACT",
            ),
            (lambda t: km(t) <= 10, "WITHIN_10KM"),
            (lambda t: km(t) <= 100, "WITHIN_100KM"),
            (lambda t: np.ones(len(t), dtype=bool), "ELSE"),
        ],
    )


def test_load_shapes(ray_session):
    f1 = playdata.load_febrl1()
    assert f1.left.count() == 1000
    assert f1.links_ds.count() == 500  # 500 original+duplicate pairs
    schema = f1.left.schema().base_schema
    assert schema.field("record_id").type == pa.uint16()
    assert schema.field("postcode").type == pa.string()
    assert schema.field("soc_sec_id").type == pa.int32()

    r500 = playdata.load_rldata500()
    assert r500.left.count() == 500
    assert r500.links_ds.count() == 50  # 10% duplicates

    p = playdata.load_patents()
    assert p.left.count() == 2379
    names = p.left.schema().base_schema.names
    assert names == [
        "record_id", "label_true", "name_true", "name",
        "latitude", "longitude", "coauthors", "classes",
    ]


def _check_name_weights(weights):
    # the reference's published anchors, same tolerances
    # (reference fs/tests/test_train.py:103-119)
    assert weights.name == "name"
    exact, close, else_ = weights[0], weights[1], weights[2]
    assert exact.name == "EXACT"
    assert exact.m == pytest.approx(0.02723, abs=0.1)
    assert exact.u == pytest.approx(0.00207, abs=0.01)
    assert close.name == "CLOSE"
    assert close.m == pytest.approx(0.3522, abs=0.3)
    assert close.u == pytest.approx(0.03623, abs=0.1)
    assert else_.name == "ELSE"
    assert else_.m == pytest.approx(0.5971, abs=0.4)
    assert else_.u == pytest.approx(0.9617, abs=0.1)


def test_train_using_labels_patents_anchors(ray_session, name_comparer):
    patents = playdata.load_patents()
    (weights,) = fs.train_using_labels(
        [name_comparer],
        patents.left,
        patents.right,
        max_pairs=100_000,
        columns=["name"],
    )
    _check_name_weights(weights)


def test_train_using_pairs_patents_anchors(ray_session, name_comparer):
    patents = playdata.load_patents()
    (weights,) = fs.train_using_pairs(
        [name_comparer],
        patents.links_ds,
        patents.left,
        patents.left,
        max_pairs=100_000,
        columns=["name"],
    )
    _check_name_weights(weights)


def test_train_em_patents_sanity(ray_session, name_comparer, location_comparer):
    # reference fs/tests/test_train.py:127-157 sanity bounds (EM on patents)
    patents = playdata.load_patents()
    weights = fs.train_using_em(
        [name_comparer, location_comparer],
        patents.left,
        patents.right,
        max_pairs=100_000,
        columns=["name", "latitude", "longitude"],
    )
    assert len(weights) == 2
    exact, close, else_ = (
        weights["name"][0], weights["name"][1], weights["name"][2]
    )
    assert exact.name == "EXACT"
    assert exact.m > 0.1
    assert exact.u < 0.1
    assert else_.name == "ELSE"
    assert else_.m < 0.6
    assert else_.u > 0.7
    assert exact.odds > close.odds


def test_rldata500_dedupe_90pct(ray_session):
    # reference playdata.py:262-268: "can be deduplicated with 90%+ precision
    # and recall using simple linkage rules" — hold the pipeline to it
    from mismo_ray.cluster import pairwise_metrics_from_links
    from mismo_ray.pipelines import rldata_match_pairs

    lk = playdata.load_rldata500()
    m = pairwise_metrics_from_links(rldata_match_pairs(lk.left).links_ds, lk.left)
    assert m["precision"] >= 0.9, m
    assert m["recall"] >= 0.9, m


def test_rldata10000_dedupe_90pct(ray_session):
    from mismo_ray.cluster import pairwise_metrics_from_links
    from mismo_ray.pipelines import rldata_match_pairs

    lk = playdata.load_rldata10000()
    m = pairwise_metrics_from_links(rldata_match_pairs(lk.left).links_ds, lk.left)
    assert m["precision"] >= 0.9, m
    assert m["recall"] >= 0.9, m


@pytest.mark.parametrize("loader", ["load_febrl1", "load_febrl2", "load_febrl3"])
def test_febrl_dedupe_f1_gate(ray_session, loader):
    # north_rule gate on REAL golden data: blocking -> FS-trained scoring ->
    # threshold reaches pairwise F1 >= 0.99 on the FEBRL benchmarks
    from mismo_ray.cluster import pairwise_metrics_from_links
    from mismo_ray.pipelines import febrl_match_pairs

    lk = getattr(playdata, loader)()
    pred, weights = febrl_match_pairs(lk.left)
    m = pairwise_metrics_from_links(pred.links_ds, lk.left)
    assert m["f1"] >= 0.99, (loader, m)
    # the fitted weights must rank exact id agreement above disagreement
    ssn = weights["ssn"]
    assert ssn["exact"].odds > 1.0


def test_febrl_link_two_table_f1_gate(ray_session):
    """Clean-vs-dirty LINK task (reference address_linkage shape) on golden
    labeled data: split febrl1 into one canonical record per entity vs the
    noisy duplicates, link across tables, gate pairwise F1 >= 0.99."""
    import pandas as pd

    from mismo_ray.pipelines._febrl import febrl_link_pairs, febrl_split_link_task
    from mismo_ray.playdata import load_febrl1

    lk = load_febrl1()
    left, right = febrl_split_link_task(lk.left)
    assert left.count() == 500 and right.count() == 500
    pred, _w = febrl_link_pairs(left, right)
    pred_pairs = {
        (r["record_id_l"], r["record_id_r"]) for r in pred.links_ds.take_all()
    }
    lp = left.select_columns(["record_id", "label_true"]).to_pandas()
    rp = right.select_columns(["record_id", "label_true"]).to_pandas()
    truth = set(
        pd.merge(lp, rp, on="label_true").apply(
            lambda r: (r.record_id_x, r.record_id_y), axis=1
        )
    )
    tp = len(pred_pairs & truth)
    p, r = tp / len(pred_pairs), tp / len(truth)
    f1 = 2 * p * r / (p + r)
    assert f1 >= 0.99, (p, r, f1)


def test_febrl_split_join_path_matches_broadcast(ray_session):
    """max_broadcast_ids=0 forces the keyed_filter anti-join split; both
    sides must be identical to the broadcast split."""
    from mismo_ray.pipelines._febrl import febrl_split_link_task
    from mismo_ray.playdata import load_febrl1

    records = load_febrl1().left
    bl, br = febrl_split_link_task(records)
    jl, jr = febrl_split_link_task(records, max_broadcast_ids=0)

    def ids(ds):
        return sorted(r["record_id"] for r in ds.select_columns(["record_id"]).take_all())

    assert ids(bl) == ids(jl)
    assert ids(br) == ids(jr)
    assert len(ids(jr)) == 500
