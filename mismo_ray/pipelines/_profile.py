"""Corpus-profile job: the "what is in this crawl" pre-pass a curation team
runs BEFORE committing to a full pipeline over new data.

One cheap sweep over the page table produces, with zero raw-column
shuffles beyond bounded sketch rows:

- a per-column :func:`~mismo_ray.util_ops.describe` profile (counts, nulls,
  HyperLogLog distinct, min/max, mean) of the id/url/lang/text columns;
- the hottest hosts with EXACT page counts + corpus shares
  (:func:`~mismo_ray.sketch.heavy_hitters` — the mirror-site / boilerplate
  detector and the KeyLinker salting advisory in one);
- per-language approximate distinct-text counts
  (:func:`~mismo_ray.sketch.add_approx_distinct` — duplication rate by
  language without shuffling text).

Everything lands as parquet under ``output_dir`` plus one summary dict, so
the profile is diffable between crawl snapshots. Launch:

    python tools/run_job.py --pipeline profile --sf-dir ... --output ...
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data


def profile_pipeline(
    sf_dir: str,
    *,
    output_dir: str | None = None,
    hot_k: int = 20,
) -> dict:
    """Profile the page corpus; returns counters."""
    from mismo_ray.lib.url import add_url_parts
    from mismo_ray.pipelines._webpages import add_extracted_text, load_pages
    from mismo_ray.sketch import add_approx_distinct, heavy_hitters
    from mismo_ray.util_ops import describe

    pages = add_url_parts(add_extracted_text(load_pages(sf_dir)), "url")
    # the three sweeps below each consume the corpus once; materialize so
    # page synthesis + text extraction run a single time (bounded: the
    # html column is already dropped by add_extracted_text)
    pages = pages.materialize()

    profile = describe(
        pages,
        ["url", "url_host", "lang", "extracted_text"],
        distinct="approx",
    )
    hot = heavy_hitters(pages, "url_host", k=hot_k, result_name="host")
    share = (
        np.floor(
            np.asarray(hot.table["n"], dtype=np.int64)
            * 1e6
            / max(hot.n_total, 1)
            + 0.5
        ).astype(np.int64)
        if len(hot.table)
        else np.array([], dtype=np.int64)
    )
    hot_hosts = hot.table.append_column("share_e6", pa.array(share))
    lang_dup = add_approx_distinct(
        pages, "lang", "extracted_text", result_name="n_distinct_texts"
    )

    prof_rows = {r["column"]: r for r in profile.to_pylist()}
    n_pages = prof_rows["url"]["n"] + prof_rows["url"]["n_null"]
    counters = {
        "n_pages": int(n_pages),
        "approx_distinct_urls": prof_rows["url"]["n_distinct"],
        "approx_distinct_texts": prof_rows["extracted_text"]["n_distinct"],
        "n_langs": prof_rows["lang"]["n_distinct"],
        "top_host": hot_hosts["host"][0].as_py() if len(hot_hosts) else None,
        "top_host_share_e6": int(share[0]) if len(share) else None,
        "hot_hosts_guaranteed": hot.guaranteed,
    }
    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
        pq.write_table(profile, os.path.join(output_dir, "columns.parquet"))
        pq.write_table(hot_hosts, os.path.join(output_dir, "hot_hosts.parquet"))
        lang_dup.write_parquet(os.path.join(output_dir, "lang_distinct"))
    else:
        # still execute the lang sweep so counters reflect a full profile
        lang_dup = lang_dup.materialize()
    counters["n_lang_rows"] = lang_dup.count() if not output_dir else None
    return counters
