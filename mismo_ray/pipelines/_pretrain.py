"""End-to-end pre-training data job: raw crawl -> training shards.

The full 100 TB training-data path as one composed job, every stage an
existing first-class operator:

    crawl_clean        (canonical URL -> PII redact -> lang-ID + quality
                        gate -> C4 line dedup -> exact dedupe)
    -> bigram-LM gate  (CCNet: self-trained perplexity, exact tercile
                        buckets, drop the worst bucket)
    -> hash_split      (deterministic train/val assignment, stable as the
                        corpus grows)
    -> token counting  (BPE-ish deterministic proxy)
    -> pack_sequences + write_training_shards
                       (concat-and-chunk packing via distributed ordered
                        prefix sum; hive-partitioned resumable shards)

Scale notes: the cleaned corpus is materialized once (the LM gate's
quantile cut-points and the packing prefix sum each need a second pass —
at real scale this boundary is the natural intermediate
``write_parquet`` checkpoint, exactly like crawl_clean's own internal
materialize points). Everything else streams; no stage collects the
corpus on the driver. All selection (buckets, split, packing order) is a
pure function of (record_id, seed): re-running the job reproduces the
same shards bit-for-bit, and write_training_shards' _DONE marker makes
the export itself resumable.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def pretrain_data(
    docs: ray.data.Dataset,
    output_dir: str,
    *,
    multiplier: int = 20,
    seq_len: int = 512,
    seqs_per_shard: int = 256,
    val_fraction: float = 0.05,
    drop_bucket: str = "tail",
    classifier=None,
    classifier_threshold: float = 0.5,
    seed: int = 0,
) -> dict:
    """Run the chain over the (to-be-amplified) documents table; returns
    merged counters from every stage. Output layout: packed train shards
    under ``<output_dir>/shards`` (with the ``_DONE`` resume marker), the
    held-out docs under ``<output_dir>/val``.

    ``classifier``: optional fitted ``textstats.TextClassifier`` — the
    CCNet/LLaMA-practice trainable quality gate, applied between dedupe
    and the LM gate (docs scoring below ``classifier_threshold`` drop;
    counter ``n_after_classifier_gate``). Train it on a labeled sample
    with ``textstats.train_text_classifier`` and reuse the checkpointed
    model across runs (``TextClassifier.from_parquet``)."""
    import os

    from mismo_ray.packing import write_training_shards
    from mismo_ray.pipelines._crawl import crawl_clean
    from mismo_ray.textstats import (
        add_perplexity,
        add_token_count,
        perplexity_buckets,
        train_bigram_lm,
    )
    from mismo_ray.util_ops import hash_split

    counters, clean = crawl_clean(docs, multiplier=multiplier, return_dataset=True)
    # materialize the deduped corpus ONCE: LM training (count + collect)
    # and scoring would otherwise each re-run the exact-dedupe groupby +
    # semi-join lineage (at real scale: the write_parquet checkpoint)
    clean = clean.materialize()

    # --- optional trainable quality gate (fastText-style classifier):
    # one stateless broadcast-scoring pass, applied before LM training so
    # the perplexity model fits on classifier-approved text only
    if classifier is not None:
        from mismo_ray.textstats import add_classifier_prob

        thr = float(classifier_threshold)
        scored_q = add_classifier_prob(clean, classifier, "text", out="__qp__")

        def clf_keep(t: pa.Table) -> pa.Table:
            mask = pc.fill_null(pc.greater_equal(t["__qp__"], thr), False)
            return t.filter(mask).drop_columns(["__qp__"])

        clean = scored_q.map_batches(clf_keep, batch_format="pyarrow").materialize()
        counters["n_after_classifier_gate"] = clean.count()

    # --- CCNet LM gate: self-trained bigram perplexity, drop the worst
    # tercile. Scored corpus is materialized once: the tercile cut-points
    # (quantile passes) and the labeling map both re-read it.
    lm = train_bigram_lm(clean, "text")
    scored = add_perplexity(clean, lm, "text").materialize()
    counters["n_unscorable"] = scored.filter(expr="n_scored == 0").count()
    bucketed = perplexity_buckets(
        scored.filter(expr="n_scored > 0"), "logppl"
    )
    def keep(t: pa.Table) -> pa.Table:
        b = t["ppl_bucket"].combine_chunks()
        mask = pc.and_kleene(b.is_valid(), pc.not_equal(b, drop_bucket))
        t = t.filter(pc.fill_null(mask, False))
        return t.drop_columns(["n_scored", "logppl", "ppl_bucket"])

    kept = bucketed.map_batches(keep, batch_format="pyarrow")
    counters["n_after_lm_gate"] = kept.count()

    # --- deterministic train/val split + token counting
    split = hash_split(
        kept,
        {"train": 1.0 - val_fraction, "val": val_fraction},
        id_column="record_id",
        seed=seed,
    )
    train = split.filter(expr="split == 'train'").drop_columns(["split"])
    # export the held-out docs next to the shards (they are the whole point
    # of the split; without this a user would have to re-run the pipeline)
    val = split.filter(expr="split == 'val'").drop_columns(["split"])
    val.write_parquet(os.path.join(output_dir, "val"))
    train = add_token_count(train, "text")

    # --- pack + shard export (resumable; _DONE marker)
    shard_counters = write_training_shards(
        train,
        os.path.join(output_dir, "shards"),
        tokens_column="n_bpe_tokens",
        budget=seq_len,
        seqs_per_shard=seqs_per_shard,
        id_column="record_id",
        seed=seed,
    )
    counters["n_train"] = shard_counters["docs"]
    counters["n_val"] = counters["n_after_lm_gate"] - counters["n_train"]
    counters.update(
        {
            "n_tokens": shard_counters["tokens"],
            "n_seqs": shard_counters["n_seqs"],
            "n_shards": shard_counters["n_shards"],
            "seq_len": seq_len,
        }
    )
    return counters


def pretrain_pipeline(
    sf_dir: str,
    output_dir: str,
    *,
    multiplier: int = 20,
    seq_len: int = 512,
    seqs_per_shard: int = 256,
    seed: int = 0,
) -> dict:
    """Job entry: fixed block layout (independent of CPU count, same
    contract as the ER scaling pipeline), documents table in, shard
    directory + counters out."""
    import os
    import time

    t0 = time.time()
    os.environ.setdefault("MISMO_RAY_NUM_PARTITIONS", "64")
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).repartition(int(os.environ.get("GRAFT_SCALE_BLOCKS", "96")))
    out = pretrain_data(
        docs,
        output_dir,
        multiplier=multiplier,
        seq_len=seq_len,
        seqs_per_shard=seqs_per_shard,
        seed=seed,
    )
    out["seconds"] = round(time.time() - t0, 3)
    return out
