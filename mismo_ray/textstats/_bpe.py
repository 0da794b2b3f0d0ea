"""Distributed byte-pair-encoding tokenizer training + encoding.

Sennrich et al. 2016 ("Neural Machine Translation of Rare Words with
Subword Units"): learn a merge table by repeatedly fusing the most
frequent adjacent symbol pair. The reference repo has no tokenizer (mismo
is record linkage); `token_count_bpe_ish` (a regex upper bound) covered
counting — this module adds the real trainable artifact a pretraining
pipeline ships: a merge table learned FROM the corpus, and an encoder
that applies it at corpus scale.

BPE's scale property: training only needs the WORD-TYPE frequency table,
not the corpus. So the one corpus-sized pass is a word-count
(map-side ``value_counts`` partials -> one ``groupby().sum()`` shuffle),
pruned by ``min_count`` and gated by ``max_word_types`` (raise instead of
OOM — same contract as the LM module's ``max_broadcast``); the merge loop
runs on the driver over that bounded table, exactly like every published
BPE/sentencepiece trainer. Encoding is an actor-pool stage: merge ranks
dict built once per actor in ``__init__``; per batch, only UNIQUE words
are encoded (web text repeats words heavily) and a per-actor cache
carries hot words across batches.

Determinism: the merge loop breaks pair-count ties lexicographically
(published trainers tie-break by insertion order, which is corpus-order
dependent; lexicographic is partition-independent), so the learned table
is bit-identical at any parallelism.

Tokenization contract: the pinned ``[^a-z0-9]+`` lowercase word splitter
(byte-identical to the LM/DSIR modules); each word ends with the ``</w>``
end-of-word sentinel symbol.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from mismo_ray.textstats._lm import _SPLIT_COMPILED, _explode_tokens

_EOW = "</w>"


def word_counts(
    ds: ray.data.Dataset, column: str, *, min_count: int = 1
) -> ray.data.Dataset:
    """Corpus word-frequency table -> Dataset(word, n). Map-side combine:
    each batch emits only its distinct words, then one keyed shuffle."""

    def partial(t: pa.Table) -> pa.Table:
        tokens, _ = _explode_tokens(t, column)
        if len(tokens) == 0:
            return pa.table(
                {"word": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        vc = pd.Series(tokens).value_counts()
        return pa.table(
            {
                "word": pa.array(vc.index.to_numpy(dtype=object), pa.string()),
                "n": pa.array(vc.to_numpy(dtype=np.int64)),
            }
        )

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["word", "n"])

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .sum("n")
        .map_batches(rename, batch_format="pyarrow")
    )
    if min_count > 1:
        counts = counts.filter(expr=f"n >= {int(min_count)}")
    return counts


class BpeTokenizer:
    """Learned merge table (ordered) + the encoder that applies it."""

    def __init__(self, merges: list[tuple[str, str]]):
        self.merges = [tuple(m) for m in merges]
        self.ranks = {m: i for i, m in enumerate(self.merges)}
        self._cache: dict[str, list[str]] = {}

    def encode_word(self, word: str) -> list[str]:
        """Greedy lowest-rank-first merge of one word. Each pass replaces
        ALL (non-overlapping, left-to-right) occurrences of the best pair —
        the canonical apply-merges-in-rank-order algorithm, and O(L log L)
        on degenerate inputs like a 50k-char run of one character, where
        one-occurrence-per-scan would be O(L^2)."""
        cached = self._cache.get(word)
        if cached is not None:
            return cached
        syms = list(word) + [_EOW]
        while len(syms) > 1:
            best_rank = None
            best = None
            for pair in zip(syms, syms[1:]):
                r = self.ranks.get(pair)
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank = r
                    best = pair
            if best is None:
                break
            fused = best[0] + best[1]
            new: list[str] = []
            i = 0
            L = len(syms)
            while i < L:
                if i + 1 < L and syms[i] == best[0] and syms[i + 1] == best[1]:
                    new.append(fused)
                    i += 2
                else:
                    new.append(syms[i])
                    i += 1
            syms = new
        if len(self._cache) < 1_000_000:
            self._cache[word] = syms
        return syms

    def encode_batch(self, texts: list[str | None]) -> tuple[list[list[str]], np.ndarray]:
        """-> (per-doc symbol lists, per-doc counts); unique words encoded
        once per batch, cache carries across batches."""
        out_syms: list[list[str]] = []
        n_tok = np.zeros(len(texts), dtype=np.int64)
        s = pd.Series(texts, dtype="object")
        # the pinned tokenizer, shared with the trainer's _explode_tokens —
        # train and encode MUST split byte-identically
        toks = s.str.lower().str.split(_SPLIT_COMPILED)
        for i, words in enumerate(toks):
            if not isinstance(words, list):
                out_syms.append([])
                continue
            doc: list[str] = []
            for w in words:
                if w:
                    doc.extend(self.encode_word(w))
            out_syms.append(doc)
            n_tok[i] = len(doc)
        return out_syms, n_tok

    def to_parquet(self, path: str) -> None:
        import pyarrow.parquet as pq

        os.makedirs(path, exist_ok=True)
        pq.write_table(
            pa.table(
                {
                    "a": pa.array([m[0] for m in self.merges], pa.string()),
                    "b": pa.array([m[1] for m in self.merges], pa.string()),
                }
            ),
            os.path.join(path, "merges.parquet"),
        )
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump({"n_merges": len(self.merges), "eow": _EOW}, f)

    @classmethod
    def from_parquet(cls, path: str) -> "BpeTokenizer":
        import pyarrow.parquet as pq

        t = pq.read_table(os.path.join(path, "merges.parquet"))
        return cls(list(zip(t["a"].to_pylist(), t["b"].to_pylist())))


def _merge_loop(
    words: list[str], counts: np.ndarray, n_merges: int
) -> list[tuple[str, str]]:
    """Classic BPE training over a word-type frequency table. Pair counts
    are maintained incrementally (only words containing the merged pair are
    re-scanned); ties break lexicographically for partition independence."""
    seqs = [tuple(w) + (_EOW,) for w in words]
    # pair -> total count; pair -> set of word indexes containing it
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for wi, seq in enumerate(seqs):
        c = int(counts[wi])
        for a, b in zip(seq, seq[1:]):
            pair_counts[(a, b)] = pair_counts.get((a, b), 0) + c
            pair_words.setdefault((a, b), set()).add(wi)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best = None
        best_n = 0
        for p, n in pair_counts.items():
            if n > best_n or (n == best_n and best is not None and p < best):
                best, best_n = p, n
        if best is None or best_n < 1:
            break
        merges.append(best)
        fused = best[0] + best[1]
        for wi in list(pair_words.get(best, ())):
            seq = seqs[wi]
            c = int(counts[wi])
            # remove old pair contributions of this word
            for a, b in zip(seq, seq[1:]):
                pair_counts[(a, b)] -= c
                if pair_counts[(a, b)] <= 0:
                    pair_counts.pop((a, b), None)
                ws = pair_words.get((a, b))
                if ws is not None:
                    ws.discard(wi)
                    if not ws:
                        pair_words.pop((a, b), None)
            # apply the merge left-to-right
            new: list[str] = []
            i = 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == best[0] and seq[i + 1] == best[1]:
                    new.append(fused)
                    i += 2
                else:
                    new.append(seq[i])
                    i += 1
            seqs[wi] = tuple(new)
            for a, b in zip(new, new[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + c
                pair_words.setdefault((a, b), set()).add(wi)
    return merges


def train_bpe(
    ds: ray.data.Dataset,
    column: str,
    *,
    n_merges: int = 4096,
    min_count: int = 2,
    max_word_types: int = 1_000_000,
) -> BpeTokenizer:
    """Learn a BPE merge table from a corpus. One distributed word-count
    shuffle; the merge loop runs on the collected word-TYPE table (bounded:
    ``min_count`` prunes the long tail, ``max_word_types`` raises instead
    of collecting an unbounded vocabulary — raise ``min_count`` when hit)."""
    counts = word_counts(ds, column, min_count=min_count).materialize()
    n_types = counts.count()
    if n_types == 0:
        return BpeTokenizer([])
    if n_types > max_word_types:
        raise ValueError(
            f"{n_types} word types exceed max_word_types={max_word_types}; "
            "raise min_count (web-scale corpora prune harmlessly) or the cap"
        )
    rows = counts.take_all()
    # sort by word for a partition-independent scan order
    rows.sort(key=lambda r: r["word"])
    words = [r["word"] for r in rows]
    freq = np.array([r["n"] for r in rows], dtype=np.int64)
    return BpeTokenizer(_merge_loop(words, freq, n_merges))


class BpeEncoder:
    """Actor-pool encoding stage: ranks dict + word cache once per actor."""

    def __init__(self, merges: list[tuple[str, str]], column: str, out: str):
        self.tok = BpeTokenizer(merges)
        self.column = column
        self.out = out

    def __call__(self, t: pa.Table) -> pa.Table:
        syms, n_tok = self.tok.encode_batch(t[self.column].to_pylist())
        return t.append_column(
            self.out, pa.array(syms, pa.list_(pa.string()))
        ).append_column(self.out + "_n", pa.array(n_tok))


def add_bpe_tokens(
    ds: ray.data.Dataset,
    tokenizer: BpeTokenizer,
    column: str,
    *,
    out: str = "bpe",
    concurrency: int | None = None,
) -> ray.data.Dataset:
    """Encode every row -> ``out`` (list<string> symbols) + ``out_n``
    (int64 count). Actor pool so the ranks table and the hot-word cache
    build once per actor."""
    from mismo_ray._pool import clamp_pool

    pool = clamp_pool(concurrency)
    return ds.map_batches(
        BpeEncoder,
        fn_constructor_args=(tokenizer.merges, column, out),
        batch_format="pyarrow",
        concurrency=pool,
    )
