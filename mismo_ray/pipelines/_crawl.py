"""Crawl-cleaning pipeline: the webtext pre-training data path, end to end
as ONE streaming chain — the companion benchmark to the ER flagship.

    synth(multiplier-amplified corpus, URL + PII + line structure)
    -> canonical URL (regex parse + param canonicalization)
    -> PII redaction (email/IP/phone -> typed tokens)
    -> language ID (actor pool) + token/quality stats
    -> quality gate (vectorized filter)
    -> C4-style duplicated-line removal (hits shuffle ~32 B/line, one
       full-text rewrite join)
    -> exact dedupe of the cleaned text (one 128-bit-hash groupby)

Every stage is a map_batches / bucketed-groupby / hash-join composition:
nothing materializes the corpus on the driver, all shuffles are keyed and
fixed-layout (96 blocks / MISMO_RAY_NUM_PARTITIONS), so the chain's
wall-time scales with CPUs the same way the ER scaling pipeline does.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def synth_crawl(
    docs: ray.data.Dataset, *, multiplier: int = 20
) -> ray.data.Dataset:
    """Amplify the documents table ``multiplier``x with per-replica
    variation: distinct record_id and URL, a replica-tagged first line
    (keeps replicas distinct through exact dedupe), deterministic PII
    salting, and line structure (the word 'value' becomes a newline)."""

    def expand(t: pa.Table) -> pa.Table:
        import pandas as pd

        did = np.repeat(np.asarray(t["doc_id"], dtype=np.int64), multiplier)
        rep = np.tile(np.arange(multiplier, dtype=np.int64), len(t))
        text = pd.Series(
            np.repeat(np.asarray(t["text"].to_pylist(), dtype=object), multiplier)
        )
        lined = text.str.replace(" value ", "\n", regex=False)
        did_s = pd.Series(did).astype(str)
        rep_s = pd.Series(rep).astype(str)
        body = (
            "r" + rep_s + " d" + did_s + " head\n" + lined
            + "\ncontact user" + did_s + "@mail" + pd.Series(did % 5).astype(str)
            + ".com from " + pd.Series(did % 200).astype(str) + ".0.0."
            + pd.Series(did % 100).astype(str)
        )
        url = (
            "HTTPS://WWW.crawl" + pd.Series(did % 50).astype(str)
            + ".Example.COM/d/" + did_s + "/r/" + rep_s
            + "/?utm_source=feed&a=" + rep_s
        )
        return pa.table(
            {
                "record_id": pa.array(did * np.int64(multiplier) + rep),
                "url": pa.array(url, type=pa.string()),
                "text": pa.array(body, type=pa.string()),
            }
        )

    return docs.map_batches(expand, batch_format="pyarrow")


def crawl_clean(
    docs: ray.data.Dataset,
    *,
    multiplier: int = 20,
    min_tokens: int = 5,
    dedupe_min_docs: int = 2,
    robots=None,
    robots_agent: str = "*",
    output_dir: str | None = None,
    return_dataset: bool = False,
) -> "dict | tuple[dict, ray.data.Dataset]":
    """Run the full cleaning chain; returns summary counters (each one the
    result of a streaming count/aggregate, not a driver materialization).
    With ``return_dataset=True`` returns ``(counters, survivors)`` so a
    downstream job (e.g. the pretrain shard export) can keep streaming from
    the deduped corpus without re-reading parquet.

    ``robots=`` (a ``{host: robots_txt}`` map or Dataset — see
    ``lib.robots.apply_robots``) opt-in gates the corpus on crawl
    politeness FIRST, before any per-document compute is spent; ``None``
    (the default) leaves the chain and its counters bit-identical to
    every recorded baseline."""
    from mismo_ray.dedupe import drop_dup_lines, exact_dedupe
    from mismo_ray.lib.url import add_canonical_url
    from mismo_ray.textstats import add_lang_id, add_token_stats, redact_pii

    # the amplifier stands in for the corpus read: materialize it so
    # downstream batch sizes apply to CORPUS rows, not source-doc rows —
    # fused, the lang stage's batch_size would bundle 4096 PRE-expansion
    # rows per task (5000 docs -> 2 tasks for the whole chain). A real
    # read_parquet produces corpus-sized blocks and needs no such break.
    crawl = synth_crawl(docs, multiplier=multiplier).materialize()
    if robots is not None:
        from mismo_ray.lib.robots import apply_robots

        crawl = apply_robots(
            crawl, robots, url_column="url", id_column="record_id",
            agent=robots_agent,
        )
    crawl = add_canonical_url(crawl, "url")
    crawl = redact_pii(crawl, "text", out_column="text")
    crawl = add_token_stats(crawl, "text")

    def gate(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["n_tokens"], min_tokens))
        # pre-dedupe char count rides along as an int64 column (8 B/row) so
        # the counters pass below never has to re-scan the gated corpus
        return t.append_column(
            "__chars_in__", pc.utf8_length(t["text"]).cast(pa.int64())
        )

    # Quality gate BEFORE lang-ID: don't run the model on docs we drop —
    # and, just as important here, keep the lang-ID ACTOR pool the LAST
    # map of the chain. Ray Data fuses upstream task maps INTO the
    # actor-pool operator, but a task map DOWNSTREAM of the pool runs as
    # its own operator competing for the 2 CPU slots the CPUs-2 pool
    # leaves free — the old gate stage cost 21.8 s of wall (96 trivial
    # filter tasks through 2 slots) at 32 CPUs.
    crawl = crawl.map_batches(gate, batch_format="pyarrow")
    # lang-ID default = FIXED pool sized to cluster CPUs: the pool absorbs
    # the fused synth/url/pii/stats/gate upstream, so its size IS the map
    # stage's parallelism (autoscaling pools plateaued short of the
    # cluster here — measured in BASELINE.md)
    crawl = add_lang_id(crawl)

    # drop_dup_lines consumes its input twice (the line-hits pass and the
    # rewrite join's document side) — materialize the gated corpus so the
    # synth/url/pii/lang chain executes once, not twice (at real scale this
    # checkpoint would be the natural write_parquet boundary)
    gated = (
        crawl.select_columns(
            [
                "record_id",
                "url_canon",
                "lang_pred",
                "text",
                "n_emails",
                "n_ips",
                "__chars_in__",
            ]
        )
        .materialize()
    )
    cleaned = drop_dup_lines(gated, "text", min_docs=dedupe_min_docs)
    # ONE execution of the chain; the counters below read the materialized
    # blocks (at real scale this would be write_parquet and the counters
    # would come from the write's lineage counters instead)
    cleaned = cleaned.materialize()
    survivors = exact_dedupe(cleaned, "text")
    if output_dir:
        import os

        survivors = survivors.materialize()
        survivors.write_parquet(os.path.join(output_dir, "clean"))

    # ONE pass over the cleaned corpus computes every corpus counter as
    # per-block partials (<= n_blocks tiny rows to the driver) — the
    # 100 TB-correct alternative to one full scan per counter (this block
    # was 3 scans of cleaned + 1 of gated before; measured 23.8 s of the
    # 62.9 s 32-CPU mult=400 run)
    def partials(t: pa.Table) -> pa.Table:
        def s(col: pa.ChunkedArray | pa.Array) -> int:
            v = pc.sum(col).as_py()
            return int(v) if v is not None else 0

        return pa.table(
            {
                "n_rows": pa.array([len(t)], type=pa.int64()),
                "n_emails": pa.array([s(t["n_emails"])], type=pa.int64()),
                "n_ips": pa.array([s(t["n_ips"])], type=pa.int64()),
                "n_chars_in": pa.array([s(t["__chars_in__"])], type=pa.int64()),
                "n_chars_out": pa.array(
                    [s(pc.utf8_length(t["text"]).cast(pa.int64()))],
                    type=pa.int64(),
                ),
            }
        )

    agg = pa.Table.from_pylist(
        cleaned.map_batches(partials, batch_format="pyarrow").take_all()
    )
    counters = {
        "n_records": int(pc.sum(agg["n_rows"]).as_py() or 0),
        "n_distinct_clean": survivors.count(),
        "n_emails": int(pc.sum(agg["n_emails"]).as_py() or 0),
        "n_ips": int(pc.sum(agg["n_ips"]).as_py() or 0),
        "n_chars_in": int(pc.sum(agg["n_chars_in"]).as_py() or 0),
        "n_chars_out": int(pc.sum(agg["n_chars_out"]).as_py() or 0),
        "multiplier": multiplier,
    }
    if return_dataset:
        # exact_dedupe returns the keep-list (keep_id per distinct content);
        # the surviving ROWS are the semi-join of the cleaned corpus on it
        from mismo_ray._joins import hash_join

        surviving_rows = hash_join(
            cleaned.drop_columns(["__chars_in__"]),
            survivors.select_columns(["keep_id"]),
            on=["record_id"],
            right_on=["keep_id"],
            how="left_semi",
        )
        return counters, surviving_rows
    return counters


def crawl_clean_pipeline(
    sf_dir: str,
    *,
    multiplier: int = 20,
    output_dir: str | None = None,
    robots=None,
) -> dict:
    """Benchmark/job entry: fixed 96-block layout (same reasoning as the ER
    scaling pipeline — layout must not depend on CPU count). With
    ``output_dir``, the deduped corpus is written to ``<output_dir>/clean``."""
    import os
    import time

    t0 = time.time()
    os.environ.setdefault("MISMO_RAY_NUM_PARTITIONS", "64")
    # override_num_blocks makes the READ produce the fixed layout directly
    # (ReadParquet->SplitBlocks) instead of a repartition exchange after it
    # — the repartition op cost ~3 s of fixed driver/1-task time at every
    # parallelism level on this tiny source table
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"],
        override_num_blocks=int(os.environ.get("GRAFT_SCALE_BLOCKS", "96")),
    )
    out = crawl_clean(
        docs, multiplier=multiplier, output_dir=output_dir, robots=robots
    )
    out["seconds"] = round(time.time() - t0, 3)
    return out
