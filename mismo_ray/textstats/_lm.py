"""CCNet-style n-gram language-model quality scoring.

Wenzek et al. 2020 ("CCNet: Extracting High Quality Monolingual Datasets
from Web Crawl Data") rank web documents by the perplexity of a small
language model; low-perplexity pages are "clean" in-domain text, high
perplexity flags gibberish/boilerplate. The reference repo has no LM op —
this belongs to the training-data tier of the task brief.

Model: add-k-smoothed bigram LM over word tokens.

    logp(w_i | w_{i-1}) = ln(c(w_{i-1} w_i) + k) - ln(c(w_{i-1}) + k*V)
    logppl(doc)         = -sum(logp) / n_pairs     (per-token, natural log)

Tokenization is pinned for oracle parity with DuckDB: lowercase, split on
``[^a-z0-9]+``, drop empty tokens — byte-identical to
``regexp_split_to_array(lower(text), '[^a-z0-9]+')`` + ``list_filter``.

Scale shape (100 TB):

- **training** — per-batch partial gram counts (pandas C-speed hashtable
  ``value_counts``; the corpus text never leaves its tasks), one
  vocabulary-sized ``groupby().sum()`` shuffle (unigrams and bigrams share
  it via a ``""`` sentinel — empty string can never be a token), then one
  bounded driver collect of the pruned model. CCNet's LM is a fixed small
  artifact by design; ``max_broadcast`` guards the collect and
  ``min_count`` is the pruning knob when a raw web vocabulary is too big.
- **scoring** — the fitted model is ``ray.put`` once; ``PerplexityScorer``
  is an actor-pool stage that builds its pandas-Index hashtables once per
  actor in ``__init__`` and scores batches with C-speed ``get_indexer`` +
  ``searchsorted`` lookups (no Python loop over tokens).
- **reuse** — ``BigramLM.to_parquet`` / ``from_parquet`` checkpoint the
  model so later runs (or other corpora) score without retraining.
"""

from __future__ import annotations

import json
import math
import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

_SPLIT_RE = "[^a-z0-9]+"
_SPLIT_COMPILED = re.compile(_SPLIT_RE)


def _explode_tokens(batch: pa.Table, column: str):
    """-> (tokens: np object array, rows: np int64 batch-row positions),
    document order preserved, empties dropped."""
    texts = pd.Series(batch[column].to_pylist(), dtype="object")
    toks = texts.str.lower().str.split(_SPLIT_COMPILED)
    ex = toks.explode()
    ex = ex[ex.notna()]
    ex = ex[ex != ""]
    return ex.to_numpy(), ex.index.to_numpy(dtype=np.int64)


def _pair_arrays(tokens: np.ndarray, rows: np.ndarray):
    """Consecutive same-document token pairs -> (w1, w2, pair_rows)."""
    if len(tokens) < 2:
        e = np.array([], dtype=object)
        return e, e, np.array([], dtype=np.int64)
    m = rows[1:] == rows[:-1]
    return tokens[:-1][m], tokens[1:][m], rows[1:][m]


class BigramLM:
    """Fitted add-k bigram model: sorted vocab + aligned unigram counts,
    sorted int64 bigram keys (``i1 * (V+1) + i2``) + aligned counts."""

    def __init__(
        self,
        vocab: np.ndarray,
        uni_counts: np.ndarray,
        big_keys: np.ndarray,
        big_counts: np.ndarray,
        *,
        k: float = 1.0,
    ):
        self.vocab = vocab
        self.uni_counts = uni_counts.astype(np.float64)
        self.big_keys = big_keys.astype(np.int64)
        self.big_counts = big_counts.astype(np.float64)
        self.k = float(k)

    @property
    def v(self) -> int:
        return len(self.vocab)

    def to_parquet(self, path: str) -> None:
        """Checkpoint the model (vocab/unigram + bigram tables + meta)."""
        import pyarrow.parquet as pq

        os.makedirs(path, exist_ok=True)
        pq.write_table(
            pa.table(
                {
                    "w": pa.array(list(self.vocab), type=pa.string()),
                    "c": pa.array(self.uni_counts),
                }
            ),
            os.path.join(path, "unigrams.parquet"),
        )
        pq.write_table(
            pa.table({"key": pa.array(self.big_keys), "c": pa.array(self.big_counts)}),
            os.path.join(path, "bigrams.parquet"),
        )
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump({"k": self.k, "v": self.v}, f)

    @classmethod
    def from_parquet(cls, path: str) -> "BigramLM":
        import pyarrow.parquet as pq

        uni = pq.read_table(os.path.join(path, "unigrams.parquet"))
        big = pq.read_table(os.path.join(path, "bigrams.parquet"))
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        return cls(
            np.asarray(uni["w"].to_pylist(), dtype=object),
            np.asarray(uni["c"], dtype=np.float64),
            np.asarray(big["key"], dtype=np.int64),
            np.asarray(big["c"], dtype=np.float64),
            k=meta["k"],
        )

    def logprob_pairs(self, w1: np.ndarray, w2: np.ndarray) -> np.ndarray:
        """Vectorized logp(w2 | w1) for parallel token arrays."""
        vi = pd.Index(self.vocab)
        i1 = vi.get_indexer(w1)
        i2 = vi.get_indexer(w2)
        return self._logprob_ids(i1, i2)

    def _logprob_ids(self, i1: np.ndarray, i2: np.ndarray) -> np.ndarray:
        v = self.v
        if v == 0:
            # zero-vocabulary model (empty corpus): every pair is OOV with
            # cu = cb = 0 — np.where would still EAGERLY index the empty
            # uni_counts array and raise
            return np.full(len(i1), np.log(self.k) - np.log(self.k * 1.0))
        cu = np.where(i1 >= 0, self.uni_counts[np.maximum(i1, 0)], 0.0)
        known = (i1 >= 0) & (i2 >= 0)
        key = np.where(known, i1.astype(np.int64) * (v + 1) + i2, -1)
        cb = np.zeros(len(i1), dtype=np.float64)
        if len(self.big_keys) and len(key):
            pos = np.minimum(
                np.searchsorted(self.big_keys, key), len(self.big_keys) - 1
            )
            hit = self.big_keys[pos] == key
            cb[hit] = self.big_counts[pos[hit]]
        return np.log(cb + self.k) - np.log(cu + self.k * v)


def train_bigram_lm(
    ds: ray.data.Dataset,
    column: str = "text",
    *,
    k: float = 1.0,
    min_count: int = 1,
    min_bigram_count: int = 1,
    max_broadcast: int = 5_000_000,
) -> BigramLM:
    """Fit the bigram LM distributed: map-side partial counts, one
    vocabulary-sized shuffle, one bounded collect.

    ``min_count`` prunes unigrams below the threshold (pruned words become
    OOV at scoring time: unigram count 0, and their bigrams are dropped);
    ``min_bigram_count`` prunes rare bigram entries (a pruned bigram scores
    as unseen — count 0 — which slightly over-estimates the perplexity of
    text containing it; the standard KenLM-style size/quality tradeoff).
    Both prunes are pushed into the Dataset BEFORE the driver collect, so
    on a raw web corpus — where hapax grams dominate the gram table — the
    collect is bounded by the PRUNED model size, not the raw vocabulary.
    V counts the kept vocabulary. Raises if the kept model still exceeds
    ``max_broadcast`` rows — raise the prune thresholds instead of
    collecting an unbroadcastable model.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        tokens, rows = _explode_tokens(batch, column)
        if len(tokens) == 0:
            return pa.table(
                {
                    "w1": pa.array([], type=pa.string()),
                    "w2": pa.array([], type=pa.string()),
                    "c": pa.array([], type=pa.int64()),
                }
            )
        uni = pd.Series(tokens).value_counts()
        w1p, w2p, _ = _pair_arrays(tokens, rows)
        out_w1 = list(uni.index.to_numpy())
        out_w2 = [""] * len(uni)
        out_c = list(uni.to_numpy())
        if len(w1p):
            big = pd.DataFrame({"w1": w1p, "w2": w2p}).value_counts()
            idx = big.index
            out_w1 += list(idx.get_level_values(0))
            out_w2 += list(idx.get_level_values(1))
            out_c += list(big.to_numpy())
        return pa.table(
            {
                "w1": pa.array(out_w1, type=pa.string()),
                "w2": pa.array(out_w2, type=pa.string()),
                "c": pa.array(np.asarray(out_c, dtype=np.int64)),
            }
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["w1", "w2"])
        .aggregate(Sum("c", alias_name="c"))
    )
    if min_count > 1 or min_bigram_count > 1:
        # prune distributed, BEFORE the collect: at web scale hapax grams
        # are the bulk of the table and must never reach the driver
        def prune(t: pa.Table) -> pa.Table:
            is_uni = pc.equal(t["w2"], "")
            bar = pc.if_else(is_uni, min_count, min_bigram_count)
            return t.filter(pc.greater_equal(t["c"], bar))

        counts = counts.map_batches(prune, batch_format="pyarrow")
    # materialize: count() and take_all() both consume this lineage, and the
    # gram-count map + vocabulary shuffle is the expensive pass of training
    counts = counts.materialize()
    n = counts.count()
    if n > max_broadcast:
        raise ValueError(
            f"fitted LM has {n} gram rows > max_broadcast={max_broadcast}; "
            "raise min_count/min_bigram_count to prune harder"
        )
    if n == 0:
        # empty/all-null corpus: a valid zero-vocabulary model (every pair
        # scores as OOV) instead of a KeyError on the zero-column table
        e = np.array([], dtype=object)
        ei = np.array([], dtype=np.int64)
        return BigramLM(e, ei.astype(np.float64), ei, ei.astype(np.float64), k=k)
    from mismo_ray._util import collect_table

    tbl = collect_table(counts)
    w1 = np.asarray(tbl["w1"].to_pylist(), dtype=object)
    w2 = np.asarray(tbl["w2"].to_pylist(), dtype=object)
    c = np.asarray(tbl["c"], dtype=np.int64)

    uni_mask = w2 == ""
    uw, uc = w1[uni_mask], c[uni_mask]
    keep = uc >= min_count
    uw, uc = uw[keep], uc[keep]
    order = np.argsort(uw, kind="stable")
    vocab, uni_counts = uw[order], uc[order].astype(np.float64)

    vi = pd.Index(vocab)
    bw1, bw2, bc = w1[~uni_mask], w2[~uni_mask], c[~uni_mask]
    i1 = vi.get_indexer(bw1)
    i2 = vi.get_indexer(bw2)
    known = (i1 >= 0) & (i2 >= 0)
    keys = i1[known].astype(np.int64) * (len(vocab) + 1) + i2[known]
    bc = bc[known].astype(np.float64)
    korder = np.argsort(keys, kind="stable")
    return BigramLM(vocab, uni_counts, keys[korder], bc[korder], k=k)


class PerplexityScorer:
    """Actor-pool scoring stage: hashtables built once per actor.
    ``lm_ref`` may be an ObjectRef, a BigramLM, or a checkpoint path
    (``BigramLM.to_parquet`` dir) — a path loads once per actor, the
    production seam when the model artifact lives on shared storage."""

    def __init__(self, lm_ref, column: str, prefix: str):
        if isinstance(lm_ref, str):
            lm = BigramLM.from_parquet(lm_ref)
        else:
            lm = ray.get(lm_ref) if isinstance(lm_ref, ray.ObjectRef) else lm_ref
        self._lm = lm
        self._vi = pd.Index(lm.vocab)
        self._column = column
        self._prefix = prefix

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        tokens, rows = _explode_tokens(batch, self._column)
        n_scored = np.zeros(n, dtype=np.int64)
        lsum = np.zeros(n, dtype=np.float64)
        if len(tokens) >= 2:
            w1, w2, prow = _pair_arrays(tokens, rows)
            if len(w1):
                i1 = self._vi.get_indexer(w1)
                i2 = self._vi.get_indexer(w2)
                logp = self._lm._logprob_ids(i1, i2)
                n_scored = np.bincount(prow, minlength=n).astype(np.int64)
                lsum = np.bincount(prow, weights=logp, minlength=n)
        has = n_scored > 0
        logppl = np.where(has, -lsum / np.maximum(n_scored, 1), 0.0)
        batch = batch.append_column(
            f"{self._prefix}n_scored", pa.array(n_scored)
        )
        return batch.append_column(
            f"{self._prefix}logppl", pa.array(logppl, mask=~has)
        )


def add_perplexity(
    ds: ray.data.Dataset,
    lm: "BigramLM | str",
    column: str = "text",
    *,
    prefix: str = "",
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 4096,
) -> ray.data.Dataset:
    """Append ``n_scored`` (pair count) and ``logppl`` (natural-log
    perplexity per token; null when the doc has < 2 tokens). The model is
    shipped once (``ray.put``) and unpacked once per actor. Default pool
    is FIXED at CPUs - 2 — fused upstream maps run inside the pool;
    autoscaling pools run measurably slower and an all-CPUs fixed pool
    starves task operators on small sessions (rationale in add_lang_id)."""
    from mismo_ray._pool import clamp_pool

    concurrency = clamp_pool(concurrency)
    # a checkpoint PATH ships as-is (each actor loads it in __init__);
    # a fitted model ships once through the object store
    lm_ref = lm if isinstance(lm, str) else ray.put(lm)
    return ds.map_batches(
        PerplexityScorer,
        fn_constructor_args=(lm_ref, column, prefix),
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )


def perplexity_buckets(
    ds: ray.data.Dataset,
    column: str = "logppl",
    *,
    qs=(1.0 / 3.0, 2.0 / 3.0),
    labels=("head", "middle", "tail"),
    label_as: str = "ppl_bucket",
) -> ray.data.Dataset:
    """CCNet-style perplexity bucketing: label every row by which side of
    the EXACT global quantile cut-points of ``column`` it falls —
    ``labels[i]`` when value <= cut[i] (first match), last label above all
    cuts. CCNet keeps "head" (lowest perplexity) for training and samples
    the rest.

    Cut-points come from :func:`mismo_ray.util_ops.quantiles` — exact
    distributed radix selection (quantile_disc semantics), so the
    boundaries are actual data values, not sketch estimates. Cost: the
    quantile histogram passes (driver holds n_bins ints, never values)
    plus one stateless labeling map. Null/NaN rows get a null label.

    Tie note: rows whose value EQUALS a cut-point land in the lower
    bucket on both this and the SQL side; when ``column`` is a float
    computed in parallel, quantize it (e.g. ``round(x * 1e6)``) before
    bucketing if bit-exact cross-engine agreement at the boundary matters.
    """
    from mismo_ray.util_ops import quantiles

    qs = [float(q) for q in qs]
    if len(labels) != len(qs) + 1:
        raise ValueError(
            f"need len(qs)+1 labels, got {len(labels)} labels for {len(qs)} cuts"
        )
    if sorted(qs) != qs:
        raise ValueError("qs must be ascending")
    cuts = quantiles(ds, column, qs)
    thresholds = np.asarray(
        [float("nan") if cuts[q] is None else cuts[q] for q in qs],
        dtype=np.float64,
    )
    lab_arr = np.asarray(list(labels), dtype=object)
    if np.isnan(thresholds).any():
        # no non-null values to cut on (empty / all-null column): label
        # every row null instead of bucketing against NaN thresholds
        def null_label(t: pa.Table) -> pa.Table:
            return t.append_column(
                label_as, pa.nulls(len(t), type=pa.string())
            )

        return ds.map_batches(null_label, batch_format="pyarrow")

    def fn(t: pa.Table) -> pa.Table:
        col = t[column]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        isnull = np.asarray(col.is_null())
        v = col.to_numpy(zero_copy_only=False).astype(np.float64)
        v = np.where(isnull, np.inf, v)
        isnull = isnull | np.isnan(v)
        idx = np.searchsorted(thresholds, np.where(isnull, np.inf, v), side="left")
        out = pa.array(
            lab_arr[np.minimum(idx, len(labels) - 1)],
            type=pa.string(),
            mask=isnull,
        )
        return t.append_column(label_as, out)

    return ds.map_batches(fn, batch_format="pyarrow")


def logppl_reference(docs: list[str | None], *, k: float = 1.0):
    """Pure-python reference implementation (tests only): returns
    (n_scored, logppl-or-None) per doc, self-trained on ``docs``."""
    tok = [
        [t for t in _SPLIT_COMPILED.split(d.lower()) if t] if d else []
        for d in docs
    ]
    from collections import Counter

    uni: Counter = Counter()
    big: Counter = Counter()
    for ts in tok:
        uni.update(ts)
        big.update(zip(ts, ts[1:]))
    v = len(uni)
    out = []
    for ts in tok:
        pairs = list(zip(ts, ts[1:]))
        if not pairs:
            out.append((0, None))
            continue
        s = 0.0
        for p in pairs:
            s += math.log(big.get(p, 0) + k) - math.log(uni.get(p[0], 0) + k * v)
        out.append((len(pairs), -s / len(pairs)))
    return out
