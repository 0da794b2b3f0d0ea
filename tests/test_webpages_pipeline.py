"""Flagship web-page ER pipeline: extraction invariant, blocking recall,
end-to-end F1 gate (BASELINE.json north_star)."""

from __future__ import annotations

import pytest
import ray.data

from mismo_ray.cluster import pairwise_metrics_from_links, pairwise_precision_recall_f1
from mismo_ray.pipelines import (
    add_extracted_text,
    extract_text_bytes,
    featurize,
    load_pages,
    render_html,
    run_er_pipeline,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pages(ray_session):
    return featurize(add_extracted_text(load_pages(SF_DIR))).materialize()


def test_render_extract_roundtrip():
    text = 'hello <world> & "friends"\nsecond line'
    assert extract_text_bytes(render_html("t", text)) == text


def test_pages_schema_and_determinism(ray_session, pages):
    rows = pages.take(5)
    assert {"url", "warc_ts", "text", "lang", "label_true", "record_id",
            "extracted_text", "domain", "path_stem"} <= set(rows[0].keys())
    # regenerating yields identical pages (hash-derived randomness)
    again = featurize(add_extracted_text(load_pages(SF_DIR)))
    a = sorted(r["url"] for r in pages.take_all())
    b = sorted(r["url"] for r in again.take_all())
    assert a == b


def test_extraction_invariant_byte_identical(ray_session, pages):
    # per-row invariant: extracted text == ground-truth text for every url
    for r in pages.take_all():
        assert r["extracted_text"] == r["text"], r["url"]


def test_record_ids_unique(ray_session, pages):
    ids = [r["record_id"] for r in pages.take_all()]
    assert len(ids) == len(set(ids))


def test_blocking_recall(ray_session, pages):
    # KeyLinker on (domain, path_stem) must reach every true pair: cluster
    # members share domain+stem by construction
    from mismo_ray.linker import KeyLinker

    linkage = KeyLinker(["domain", "path_stem"])(pages, pages)
    m = pairwise_metrics_from_links(linkage.links_ds, pages)
    assert m["recall"] == 1.0


def test_end_to_end_f1(ray_session, pages):
    result = run_er_pipeline(pages, train="labels", threshold_odds=10.0)
    m = pairwise_metrics_from_links(result["links"], pages)
    assert m["f1"] >= 0.99, m
    # cluster membership: predicted components vs label_true
    rows = result["records"].select_columns(["label_true", "component"]).take_all()
    pm = pairwise_precision_recall_f1(
        [r["label_true"] for r in rows], [r["component"] for r in rows]
    )
    assert pm["f1"] >= 0.99, pm


def test_checkpoint_resume(ray_session, pages, tmp_path):
    result = run_er_pipeline(
        pages, train="labels", threshold_odds=10.0, checkpoint_dir=str(tmp_path)
    )
    n_links = result["links"].count()
    assert (tmp_path / "scored_linkage" / "manifest.json").exists()
    # resumable: the scored linkage can be reloaded and clustered again
    from mismo_ray.types import Linkage

    lk = Linkage.from_parquets(str(tmp_path / "scored_linkage"))
    assert lk.links_ds.count() == n_links
    # a second run against the same checkpoint dir short-circuits blocking +
    # scoring and reproduces identical clusters
    result2 = run_er_pipeline(
        pages, train="labels", threshold_odds=10.0, checkpoint_dir=str(tmp_path)
    )
    assert result2["counters"].get("resumed_from_checkpoint") is True
    assert result2["links"].count() == n_links
    c1 = {
        (r["record_id"], r["component"])
        for r in result["records"].select_columns(["record_id", "component"]).take_all()
    }
    c2 = {
        (r["record_id"], r["component"])
        for r in result2["records"].select_columns(["record_id", "component"]).take_all()
    }
    assert c1 == c2


def test_end_to_end_f1_unsupervised_em(ray_session, pages):
    """The north_star's EM-fitted weights reach the same F1 gate with NO
    labels used for training."""
    result = run_er_pipeline(pages, train="em", threshold_odds=10.0)
    m = pairwise_metrics_from_links(result["links"], pages)
    assert m["f1"] >= 0.99, m


def test_partition_level_resume(ray_session, pages, tmp_path):
    """A run killed mid-scoring resumes recomputing ONLY the unfinished
    partitions (asserted via the partitions_computed/skipped counters), and
    produces the identical scored-link set."""
    import shutil

    ck = str(tmp_path / "ck")
    result = run_er_pipeline(
        pages, train="labels", threshold_odds=10.0, checkpoint_dir=ck,
        resume_partitions=8,
    )
    n_links = result["links"].count()
    assert result["counters"]["partitions_computed"] == 8
    assert result["counters"]["partitions_skipped"] == 0
    # consume the link set now — the deletions below would break the lazy read
    s1 = {
        (r["record_id_l"], r["record_id_r"])
        for r in result["links"].select_columns(
            ["record_id_l", "record_id_r"]
        ).take_all()
    }

    # simulate a kill after 5 completed partitions: 2 partitions fully lost,
    # 1 left as partial output without its _DONE marker
    shutil.rmtree(f"{ck}/scored_parts/part_0")
    shutil.rmtree(f"{ck}/scored_parts/part_1")
    (tmp_path / "ck" / "scored_parts" / "part_2" / "_DONE").unlink()
    # the stage-level scored_linkage checkpoint postdates the kill — drop it
    shutil.rmtree(f"{ck}/scored_linkage")

    result2 = run_er_pipeline(
        pages, train="labels", threshold_odds=10.0, checkpoint_dir=ck,
        resume_partitions=8,
    )
    assert result2["counters"].get("resumed_pairs_checkpoint") is True
    assert result2["counters"]["partitions_computed"] == 3
    assert result2["counters"]["partitions_skipped"] == 5
    assert result2["links"].count() == n_links
    s2 = {
        (r["record_id_l"], r["record_id_r"])
        for r in result2["links"].select_columns(
            ["record_id_l", "record_id_r"]
        ).take_all()
    }
    assert s1 == s2
