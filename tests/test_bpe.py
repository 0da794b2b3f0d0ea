"""Distributed BPE trainer + encoder (textstats._bpe)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from mismo_ray.textstats import BpeTokenizer, add_bpe_tokens, train_bpe, word_counts
from mismo_ray.textstats._bpe import _EOW, _merge_loop


def test_merge_loop_classic():
    """The canonical walkthrough: corpus {low:5, lower:2, newest:6, widest:3}
    (Sennrich et al. §3.2 uses this family). First merges must fuse the
    most frequent adjacent pair, ties broken lexicographically."""
    words = ["low", "lower", "newest", "widest"]
    counts = np.array([5, 2, 6, 3], dtype=np.int64)
    merges = _merge_loop(words, counts, 4)
    # 'es' appears in newest+widest = 9, 'st' likewise, 'se'? e-s then s-t;
    # best first merge is ('e','s') or ('s','t') at 9 -> lexicographic: ('e','s')
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", _EOW)
    enc = BpeTokenizer(merges)
    assert enc.encode_word("newest") == ["n", "e", "w", "est" + _EOW]


def test_train_and_encode_roundtrip(ray_session, tmp_path):
    docs = [
        "the cat sat on the mat",
        "the cats sat on the mats",
        "a cat and a mat and a hat",
    ] * 10
    ds = ray.data.from_arrow(pa.table({"text": pa.array(docs, pa.string())}))
    tok = train_bpe(ds, "text", n_merges=50, min_count=1)
    assert len(tok.merges) > 0
    # frequent whole words become single symbols
    assert tok.encode_word("the") == ["the" + _EOW]
    out = add_bpe_tokens(ds, tok, "text").take(4)
    assert out[0]["bpe_n"] == len(out[0]["bpe"])
    assert out[0]["bpe"] == out[3]["bpe"]  # identical docs encode identically
    # checkpoint round-trip
    tok.to_parquet(str(tmp_path / "bpe"))
    tok2 = BpeTokenizer.from_parquet(str(tmp_path / "bpe"))
    assert tok2.merges == tok.merges
    assert tok2.encode_word("cats") == tok.encode_word("cats")


def test_train_deterministic_across_partitionings(ray_session):
    docs = [f"alpha beta gamma delta doc {i % 7} repeats words" for i in range(60)]
    tbl = pa.table({"text": pa.array(docs, pa.string())})
    a = train_bpe(ray.data.from_arrow(tbl), "text", n_merges=30, min_count=1)
    b = train_bpe(
        ray.data.from_arrow(tbl).repartition(7), "text", n_merges=30, min_count=1
    )
    assert a.merges == b.merges


def test_min_count_prunes_and_cap_raises(ray_session):
    docs = ["common common common rare1 rare2 rare3"]
    ds = ray.data.from_arrow(pa.table({"text": pa.array(docs, pa.string())}))
    wc = {r["word"]: r["n"] for r in word_counts(ds, "text", min_count=2).take_all()}
    assert wc == {"common": 3}
    with pytest.raises(ValueError, match="word types"):
        train_bpe(ds, "text", min_count=1, max_word_types=2)


def test_empty_and_null(ray_session):
    empty = ray.data.from_arrow(pa.table({"text": pa.array([], pa.string())}))
    tok = train_bpe(empty, "text")
    assert tok.merges == []
    nulls = ray.data.from_arrow(
        pa.table({"text": pa.array([None, "ab ab ab"], pa.string())})
    )
    tok2 = train_bpe(nulls, "text", min_count=1, n_merges=5)
    out = add_bpe_tokens(nulls, tok2, "text").take_all()
    assert out[0]["bpe_n"] == 0 and out[0]["bpe"] == []
    assert out[1]["bpe_n"] >= 1
