"""Link-graph job: pages -> href extraction -> host edges -> PageRank.

The third job entrypoint (tools/run_job.py --pipeline linkgraph): builds
the host graph of a crawl and ranks hosts with the fixed-point integer
PageRank (webgraph.pagerank). At 100 TB the stages are: one
embarrassingly-parallel extraction map over the html column (which never
crosses a shuffle), one groupby to collapse page-level links into host
edges, then |iterations| x (join + groupby-sum) over the compact edge/rank
tables. Output: hive-partitioned parquet of (node, rank).

The synthetic corpus's html carries no hrefs, so the job amplifies the
documents table into pages with deterministic outlinks (3 per page: an
intra-host nav link, a cross-host content link, a hub link — giving the
graph a realistic hub-heavy degree skew).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

__all__ = ["synth_linked_pages", "linkgraph_pipeline"]


def synth_linked_pages(
    docs: ray.data.Dataset, *, multiplier: int = 1
) -> ray.data.Dataset:
    """documents -> (url, html) pages with deterministic outlinks."""

    def gen(t: pa.Table) -> pa.Table:
        import pandas as pd

        did = np.repeat(np.asarray(t["doc_id"], dtype=np.int64), multiplier)
        rep = np.tile(np.arange(multiplier, dtype=np.int64), len(t))
        pid = did * np.int64(multiplier) + rep
        pid_s = pd.Series(pid).astype(str)
        host = "site" + pd.Series(pid % 40).astype(str) + ".example.org"
        url = "https://" + host + "/a/" + pid_s
        # 3 outlinks: relative nav (same host), cross-host content link,
        # hub link (everyone points at a few hubs -> degree skew)
        cross = "https://site" + pd.Series((pid * 13 + 7) % 40).astype(str) + ".example.org/a/" + pd.Series(pid % 97).astype(str)
        hub = "https://hub" + pd.Series(pid % 3).astype(str) + ".example.org/"
        html = (
            '<html><body><a href="/nav/' + pd.Series(pid % 11).astype(str)
            + '">nav</a><a href="' + cross + '">x</a><a href="' + hub
            + '">hub</a></body></html>'
        )
        return pa.table(
            {
                "url": pa.array(url, type=pa.string()),
                "html": pa.array(html, type=pa.string()).cast(pa.binary()),
            }
        )

    return docs.map_batches(gen, batch_format="pyarrow")


def linkgraph_pipeline(
    sf_dir: str,
    *,
    multiplier: int = 1,
    iterations: int = 3,
    output_dir: str | None = None,
) -> dict:
    """documents -> linked pages -> host edges -> PageRank. Returns
    counters; with output_dir, writes (node, rank) parquet."""
    import os
    import time

    from mismo_ray.lib.url import parse_url_batch
    from mismo_ray.webgraph import extract_links, pagerank

    t0 = time.time()
    os.environ.setdefault("MISMO_RAY_NUM_PARTITIONS", "64")
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).repartition(int(os.environ.get("GRAFT_SCALE_BLOCKS", "96")))
    pages = synth_linked_pages(docs, multiplier=multiplier)
    links = extract_links(pages)

    def to_edges(t: pa.Table) -> pa.Table:
        src = parse_url_batch(t["url"].combine_chunks())["host"]
        return pa.table({"src": src, "dst": t["link_host"]})

    edges = links.map_batches(to_edges, batch_format="pyarrow")
    ranks = pagerank(edges, iterations=iterations)
    n_hosts = ranks.count()
    top = ranks.sort("rank", descending=True).limit(5).to_pandas()
    out = {
        "n_pages": docs.count() * multiplier,
        "n_hosts": n_hosts,
        "iterations": iterations,
        "top_hosts": list(zip(top["node"], (int(r) for r in top["rank"]))),
        "seconds": round(time.time() - t0, 3),
    }
    if output_dir:
        ranks.write_parquet(os.path.join(output_dir, "host_ranks"))
    return out
