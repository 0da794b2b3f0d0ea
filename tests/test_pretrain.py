"""pretrain pipeline: crawl_clean -> CCNet LM gate -> hash split ->
packed training shards, end to end with counter consistency and
deterministic re-run."""

import glob
import os

import pyarrow.parquet as pq

from mismo_ray.pipelines._pretrain import pretrain_pipeline


def test_pretrain_end_to_end(ray_session, tmp_path):
    out1 = str(tmp_path / "run1")
    c = pretrain_pipeline(
        "/root/testdata/sf0.001",
        out1,
        multiplier=1,
        seq_len=128,
        seqs_per_shard=16,
    )
    # stage flow: every gate only shrinks the corpus
    assert c["n_records"] > 0
    assert 0 < c["n_after_lm_gate"] <= c["n_distinct_clean"] <= c["n_records"]
    # tercile gate drops roughly a third (band allows ties at the cut;
    # multiplier=1 keeps the synthetic texts varied — higher multipliers
    # collapse post-dedupe text to identical structure and the gate
    # correctly becomes a no-op on uniform perplexity)
    frac = c["n_after_lm_gate"] / c["n_distinct_clean"]
    assert 0.6 <= frac <= 0.75
    assert c["n_train"] + c["n_val"] == c["n_after_lm_gate"]
    assert c["n_seqs"] > 0 and c["n_shards"] > 0 and c["n_tokens"] > 0
    # resumable export: _DONE marker + hive-partitioned shards + val docs
    assert os.path.exists(os.path.join(out1, "shards", "_DONE"))
    val_files = glob.glob(os.path.join(out1, "val", "**", "*.parquet"), recursive=True)
    assert val_files
    n_val_rows = sum(len(pq.read_table(f)) for f in val_files)
    assert n_val_rows == c["n_val"]
    files = sorted(
        glob.glob(os.path.join(out1, "shards", "**", "*.parquet"), recursive=True)
    )
    assert files
    t = pq.read_table(files[0])
    for col in ("record_id", "n_bpe_tokens", "global_offset", "seq_id", "seq_pos"):
        assert col in t.column_names

    # deterministic: a fresh run reproduces identical counters
    out2 = str(tmp_path / "run2")
    c2 = pretrain_pipeline(
        "/root/testdata/sf0.001",
        out2,
        multiplier=1,
        seq_len=128,
        seqs_per_shard=16,
    )
    for k in ("n_records", "n_after_lm_gate", "n_train", "n_val", "n_tokens", "n_seqs", "n_shards"):
        assert c2[k] == c[k], k

    # token-stream integrity: global offsets are a permutation-free prefix
    # sum — every doc's offset equals the sum of tokens before it in
    # (seq_id, seq_pos) order
    import pyarrow as pa

    full = pa.concat_tables(
        [pq.read_table(f) for f in files], promote_options="default"
    )
    rows = sorted(
        zip(
            full["global_offset"].to_pylist(),
            full["n_bpe_tokens"].to_pylist(),
        )
    )
    acc = 0
    for off, ntok in rows:
        assert off == acc
        acc += ntok
    assert acc == c["n_tokens"]


def test_pretrain_classifier_gate(ray_session, tmp_path):
    """Optional trainable quality gate: an accept-all model is a no-op on
    every downstream counter; a reject-all model empties the corpus and the
    pipeline still terminates cleanly (the 100 TB failure mode where a bad
    gate drops everything must not crash the job)."""
    import numpy as np
    import ray.data

    from mismo_ray.pipelines._pretrain import pretrain_data
    from mismo_ray.textstats import TextClassifier

    docs = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    base = pretrain_data(
        docs, str(tmp_path / "plain"), multiplier=1, seq_len=128, seqs_per_shard=16
    )
    accept = TextClassifier(np.zeros(16), 5.0)  # sigmoid(5) ~ 0.993 for all
    c_acc = pretrain_data(
        docs,
        str(tmp_path / "acc"),
        multiplier=1,
        seq_len=128,
        seqs_per_shard=16,
        classifier=accept,
    )
    assert c_acc["n_after_classifier_gate"] == c_acc["n_distinct_clean"]
    for k in ("n_after_lm_gate", "n_train", "n_val", "n_tokens", "n_seqs"):
        assert c_acc[k] == base[k], k

    reject = TextClassifier(np.zeros(16), -5.0)
    c_rej = pretrain_data(
        docs,
        str(tmp_path / "rej"),
        multiplier=1,
        seq_len=128,
        seqs_per_shard=16,
        classifier=reject,
    )
    assert c_rej["n_after_classifier_gate"] == 0
    assert c_rej["n_train"] == 0 and c_rej["n_seqs"] == 0
