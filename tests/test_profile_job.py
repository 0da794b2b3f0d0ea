"""pipelines._profile — the corpus-profile pre-pass job."""

import glob

import pyarrow.parquet as pq

from mismo_ray.pipelines._profile import profile_pipeline

SF = "/root/testdata/sf0.001"


def test_profile_pipeline_counters_and_artifacts(ray_session, tmp_path):
    out = str(tmp_path / "prof")
    c = profile_pipeline(SF, output_dir=out)
    assert c["n_pages"] > 0
    # HLL at p=12 on a ~700-row corpus: within a few % of n_pages (urls are
    # unique by construction in the synthetic crawl)
    assert abs(c["approx_distinct_urls"] - c["n_pages"]) / c["n_pages"] < 0.05
    assert c["n_langs"] >= 2
    assert c["hot_hosts_guaranteed"] is True
    assert c["top_host"] and c["top_host_share_e6"] > 0

    cols = pq.read_table(f"{out}/columns.parquet")
    assert set(cols["column"].to_pylist()) == {
        "url", "url_host", "lang", "extracted_text",
    }
    hot = pq.read_table(f"{out}/hot_hosts.parquet")
    assert hot.column_names == ["host", "n", "share_e6"]
    ns = hot["n"].to_pylist()
    assert ns == sorted(ns, reverse=True)  # hottest first
    assert glob.glob(f"{out}/lang_distinct/*.parquet")


def test_profile_pipeline_deterministic(ray_session, tmp_path):
    a = profile_pipeline(SF)
    b = profile_pipeline(SF)
    assert a == b  # sketches are hash-derived: bit-identical re-runs
