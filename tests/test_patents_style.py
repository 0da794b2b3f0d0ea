"""Patents-style multi-signal pipeline (FIXTURES.md §5; reference analogue:
mismo's patents dataset tests, /root/reference/mismo/fs/tests/test_train.py
and docs/examples/patent_deduplication.ipynb): token-set blocking +
coordinate blocking + tiered comparers + FS training on a synthetic table
with planted entities."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data

from mismo_ray.compare import LevelComparer
from mismo_ray.cluster import connected_components, pairwise_metrics_from_links
from mismo_ray.fs import train_using_em, train_using_labels
from mismo_ray.lib import geo
from mismo_ray.linker import KeyLinker, OrLinker, UnnestLinker
from mismo_ray.sets import jaccard


def synth_patents(n_entities: int = 120, seed: int = 3) -> pa.Table:
    """Entities appear 1-3 times with noisy company names, jittered coords,
    overlapping coauthor sets (deterministic)."""
    rng = np.random.default_rng(seed)
    letters = np.array(list("ABCDEFGHIJKLMNOPQRSTUVWXYZ"))
    companies = [
        "".join(rng.choice(letters, size=8)) + " CORP" for _ in range(n_entities)
    ]
    rows = {k: [] for k in
            ["record_id", "label_true", "name", "latitude", "longitude", "coauthors", "classes"]}
    rid = 0
    for e in range(n_entities):
        n_recs = 1 + int(rng.integers(0, 3))
        base_lat = float(rng.uniform(-60, 60))
        base_lon = float(rng.uniform(-170, 170))
        authors = [f"auth{e}_{j}" for j in range(4)]
        classes = [f"G{e % 9}N", f"B{e % 7}L"]
        for v in range(n_recs):
            nm = companies[e]
            if v == 1:
                nm = nm.replace(" CORP", " CO")  # suffix variant (close)
            # v == 2 keeps the exact base name (exact duplicate)
            rows["record_id"].append(rid); rid += 1
            rows["label_true"].append(e)
            rows["name"].append(nm)
            rows["latitude"].append(base_lat + float(rng.normal(0, 0.001)))
            rows["longitude"].append(base_lon + float(rng.normal(0, 0.001)))
            rows["coauthors"].append(sorted(set(authors) - ({authors[v % 4]} if v else set())))
            rows["classes"].append(classes)
    return pa.table(
        {
            "record_id": pa.array(rows["record_id"], type=pa.int64()),
            "label_true": pa.array(rows["label_true"], type=pa.int64()),
            "name": pa.array(rows["name"], type=pa.string()),
            "latitude": pa.array(rows["latitude"], type=pa.float64()),
            "longitude": pa.array(rows["longitude"], type=pa.float64()),
            "coauthors": pa.array(rows["coauthors"], type=pa.list_(pa.string())),
            "classes": pa.array(rows["classes"], type=pa.list_(pa.string())),
        }
    )


@pytest.fixture(scope="module")
def patents(ray_session):
    return ray.data.from_arrow(synth_patents()).materialize()


def patent_comparers():
    def name_exact(t):
        return pc.equal(t["name_l"], t["name_r"]).to_numpy(zero_copy_only=False)

    def name_close(t):
        from mismo_ray.text import levenshtein_array

        d = levenshtein_array(t["name_l"], t["name_r"]).to_numpy(zero_copy_only=False)
        return np.asarray(d) <= 5

    def coauthor_overlap(t):
        return np.array(
            [
                (jaccard(a, b) or 0.0) >= 0.5
                for a, b in zip(t["coauthors_l"].to_pylist(), t["coauthors_r"].to_pylist())
            ]
        )

    return [
        LevelComparer(
            "name", ["exact", "close", "else"],
            [(name_exact, "exact"), (name_close, "close")],
        ),
        LevelComparer(
            "coauthors", ["overlap", "else"], [(coauthor_overlap, "overlap")]
        ),
    ]


def test_patents_blocking_recall(patents):
    blocker = OrLinker(
        [
            UnnestLinker("coauthors", max_pairs=10_000),
            geo.CoordinateLinker(distance_km=1),
        ]
    )
    linkage = blocker(patents, patents)
    m = pairwise_metrics_from_links(linkage.links_ds, patents)
    assert m["recall"] == 1.0  # same-entity records share coauthors AND coords


def test_patents_end_to_end(patents):
    blocker = OrLinker(
        [
            UnnestLinker("coauthors", max_pairs=10_000),
            geo.CoordinateLinker(distance_km=1),
        ]
    )
    linkage = blocker(patents, patents)
    pairs = linkage.links.with_both(["name", "coauthors"], ["name", "coauthors"])
    comparers = patent_comparers()
    w = train_using_labels(comparers, patents, patents, max_pairs=50_000)
    # trained weights must separate: exact-name odds > close > else(=1)
    cw = w["name"]
    assert cw["exact"].odds > cw["close"].odds > 1.0
    scored = w.compare_and_score(pairs, comparers)
    matches = scored.map_batches(
        lambda t: t.filter(pc.greater_equal(t["odds"], 10.0)),
        batch_format="pyarrow",
    ).materialize()
    m = pairwise_metrics_from_links(matches, patents)
    assert m["f1"] >= 0.95, m
    labeled = connected_components(links=matches, records=patents)
    rows = labeled.select_columns(["label_true", "component"]).take_all()
    from mismo_ray.cluster import adjusted_rand_score

    ari = adjusted_rand_score(
        [r["label_true"] for r in rows], [r["component"] for r in rows]
    )
    assert ari >= 0.95


def test_patents_em_close_to_supervised(patents):
    comparers = patent_comparers()
    w_sup = train_using_labels(comparers, patents, patents, max_pairs=50_000)
    w_em = train_using_em(comparers, patents, patents, max_pairs=50_000)
    # EM should agree with supervised on the ORDERING of evidence strength
    assert w_em["name"]["exact"].odds > 1.0
    assert w_em["coauthors"]["overlap"].odds > 1.0
    assert (w_sup["name"]["exact"].odds > 1.0)
