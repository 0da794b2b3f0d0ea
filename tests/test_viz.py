"""Viz surface smoke tests: Vega-Lite spec dicts + the distributed upset
intersection counts (reference _linked_table.chart / _upset.py / fs/_plot
equivalents)."""

from __future__ import annotations

import json

import pyarrow as pa
import pytest
import ray.data


def _links(pairs):
    return ray.data.from_arrow(
        pa.table(
            {
                "record_id_l": pa.array([a for a, _ in pairs], type=pa.int64()),
                "record_id_r": pa.array([b for _, b in pairs], type=pa.int64()),
            }
        )
    )


def test_link_counts_chart(ray_session):
    from mismo_ray.viz import link_counts_chart

    spec = link_counts_chart(
        [
            {"n_links": 0, "n_records": 1000},
            {"n_links": 1, "n_records": 500},
            {"n_links": 2, "n_records": 100},
        ]
    )
    json.dumps(spec)  # must be pure-JSON
    assert spec["mark"] == "bar"
    assert "(1_600 total)" in spec["title"]["text"][1]
    vals = spec["data"]["values"]
    assert vals[0] == {"n_links": 0, "n_records": 1000, "frac_records": 0.625}


def test_upset_counts_and_chart(ray_session):
    from mismo_ray.viz import upset_chart, upset_counts

    a = _links([(1, 2), (3, 4), (5, 6)])
    b = _links([(3, 4), (5, 6), (7, 8)])
    c = _links([(5, 6)])
    counts = upset_counts({"A": a, "B": b, "C": c})
    by_key = {
        tuple(i): n
        for i, n in zip(
            counts["intersection"].to_pylist(), counts["n_pairs"].to_pylist()
        )
    }
    assert by_key == {
        ("A",): 1,          # (1,2)
        ("A", "B"): 1,      # (3,4)
        ("A", "B", "C"): 1, # (5,6)
        ("B",): 1,          # (7,8)
    }
    spec = upset_chart(counts)
    json.dumps(spec)
    assert {v["intersection"] for v in spec["data"]["values"]} == {
        "A", "B", "A ∩ B", "A ∩ B ∩ C"
    }


def test_weights_chart():
    from mismo_ray.fs import ComparerWeights, LevelWeights, Weights
    from mismo_ray.viz import weights_chart

    w = Weights(
        [
            ComparerWeights(
                "name",
                [LevelWeights("exact", m=0.9, u=0.01), LevelWeights("close", m=0.5, u=0.05)],
            )
        ]
    )
    spec = weights_chart(w)
    json.dumps(spec)
    vals = spec["data"]["values"]
    assert [v["level"] for v in vals] == ["exact", "close"]
    assert abs(vals[0]["log2_odds"] - 6.4919) < 1e-3  # log2(90)


def test_odds_histogram(ray_session):
    import numpy as np

    from mismo_ray.viz import odds_histogram

    odds = np.concatenate([np.full(900, 0.5), np.full(100, 512.0)])
    ds = ray.data.from_arrow(pa.table({"odds": odds})).repartition(4)
    spec = odds_histogram(ds, bins=10)
    json.dumps(spec)
    vals = spec["data"]["values"]
    assert sum(v["n"] for v in vals) == 1000
    # log2 range is [-1, 9]; mass in the first and last bins
    assert vals[0]["n"] == 900 and vals[-1]["n"] == 100


def test_distribution_and_key_counts_charts(ray_session):
    from mismo_ray.viz import distribution_chart, key_counts_chart

    ds = ray.data.from_arrow(
        pa.table({"color": ["red"] * 5 + ["blue"] * 2 + [None]})
    )
    spec = distribution_chart(ds, "color")
    json.dumps(spec)
    vals = spec["data"]["values"]
    assert vals[0] == {"value": "red", "n": 5}
    assert {"value": "(null)", "n": 1} in vals

    kc = [
        {"p_brand": "B1", "p_size": 3, "n": 100},
        {"p_brand": "B2", "p_size": 5, "n": 7},
    ]
    spec = key_counts_chart(kc)
    json.dumps(spec)
    assert spec["data"]["values"][0] == {"key": "B1, 3", "n": 100}


def test_pr_curve_chart(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from mismo_ray.cluster import pr_curve
    from mismo_ray.viz import pr_curve_chart

    links = ray.data.from_arrow(
        pa.table(
            {
                "s": pa.array([1, 5, 9, 9, 2], type=pa.int64()),
                "y": pa.array([False, True, True, False, True]),
            }
        )
    )
    curve = pr_curve(links, score_column="s", truth_column="y", thresholds=[2, 6])
    spec = pr_curve_chart(curve)
    assert spec["mark"]["type"] == "line"
    vals = spec["data"]["values"]
    assert len(vals) == 2
    assert {v["threshold"] for v in vals} == {2.0, 6.0}
    for v in vals:
        assert 0 <= v["precision"] <= 1 and 0 <= v["recall"] <= 1


def test_dedupe_report_chart():
    from mismo_ray.viz import dedupe_report_chart

    spec = dedupe_report_chart(
        [
            {"cluster_size": 3, "n_clusters": 1, "n_dup_docs": 2, "dup_chars": 100},
            {"cluster_size": 2, "n_clusters": 4, "n_dup_docs": 4, "dup_chars": 50},
        ]
    )
    assert spec["mark"] == "bar"
    assert [v["cluster_size"] for v in spec["data"]["values"]] == [2, 3]
    assert "6" in spec["title"][1] and "150" in spec["title"][1]


def test_lsh_curves_chart():
    from mismo_ray.linker import MinhashLshLinker
    from mismo_ray.viz import lsh_curves_chart

    spec = lsh_curves_chart()
    vals = spec["data"]["values"]
    assert len(vals) == 13 * 51  # reference default grid x 51 jaccard steps
    # curve values must agree with the linker's own cost model
    lk = MinhashLshLinker("text", num_hashes=100, n_bands=50)  # band_size 2
    for row in vals:
        if row["band_size"] == 2 and row["n_bands"] == 50:
            assert row["pr"] == pytest.approx(
                lk.blocking_probability(row["jaccard"])
            )
    # monotone S-curve endpoints
    by = [r for r in vals if r["band_size"] == 10 and r["n_bands"] == 20]
    assert by[0]["pr"] == 0.0 and by[-1]["pr"] == 1.0
    custom = lsh_curves_chart([(3, 7)])
    assert len(custom["data"]["values"]) == 51
