"""fastText-style linear quality classifier over hashed n-gram features.

The CCNet / LLaMA-pipeline quality gate is a small LINEAR classifier
(Joulin et al. 2017, "Bag of Tricks for Efficient Text Classification"):
hash word uni+bigrams into a fixed bucket space, train logistic regression
on a labeled sample (e.g. "looks like Wikipedia" vs "random crawl"), then
score the whole corpus with the fitted weight vector. The reference repo
has no analog (mismo is record linkage); this joins the heuristic quality
ops (gopher/C4) as the *trainable* member of the training-data tier.

Model: logistic regression on L2-normalized hashed-n-gram counts.

    x_doc   = counts over ``buckets`` hashed uni+bigram slots, L2-normalized
    p(doc)  = sigmoid(x_doc . w + b)

Tokenization and hashing are byte-identical to the DSIR module
(`_dsir._gram_buckets`): tokens siphashed once, bigram buckets derived by
integer mixing — the pinned ``[^a-z0-9]+`` tokenizer family.

Scale shape (100 TB):

- **training** — published practice trains these classifiers on a bounded
  labeled sample (CCNet: a few hundred thousand docs), so ``fit`` first
  hash-samples down to ``max_train_rows`` (deterministic per-record
  threshold — stable across runs and cluster sizes), featurizes ONCE into
  sparse per-doc rows (text is dropped; ~nnz * 16 bytes/doc), repartitions
  to a pinned ``train_width`` and materializes. Each full-batch GD epoch
  is then one ``map_batches`` pass over the cached sparse features: every
  block emits ONE sparse partial gradient in **int64 fixed point**
  (the PageRank trick — integer addition commutes, so the driver-side
  accumulation is bit-identical no matter the arrival order or CPU
  count), bounded to ``train_width`` rows on the driver.
- **scoring** — the fitted model is one float64 vector (512 KB at the
  default 2^16 buckets), ``ray.put`` once; scoring is a stateless
  vectorized ``map_batches`` pass (bincount segment-sums, no Python loop
  over tokens or rows).
- **reuse** — ``TextClassifier.to_parquet / from_parquet`` checkpoint the
  model so later corpora score without retraining.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import ray
import ray.data

from mismo_ray._util import hash64
from mismo_ray.textstats._dsir import _gram_buckets

_SCALE = float(1 << 28)  # fixed-point: |err*val| <= 1/doc, 2^63/2^28 ~ 3.4e10 docs


def _featurize_batch(batch: pa.Table, column: str, buckets: int, seed: int):
    """-> (idx ListArray, val ListArray): per-doc sparse L2-normalized
    hashed-n-gram counts, one (possibly empty) list pair per input row."""
    n = len(batch)
    bk, rows = _gram_buckets(batch, column, buckets, seed)
    if len(bk) == 0:
        offsets = np.zeros(n + 1, dtype=np.int64)
        idx = pa.LargeListArray.from_arrays(offsets, pa.array([], pa.int64()))
        val = pa.LargeListArray.from_arrays(offsets, pa.array([], pa.float64()))
        return idx, val
    key = rows.astype(np.int64) * buckets + bk
    uk, counts = np.unique(key, return_counts=True)  # sorted -> doc-major
    drow = (uk // buckets).astype(np.int64)
    dcol = uk % buckets
    vals = counts.astype(np.float64)
    norms = np.sqrt(np.bincount(drow, weights=vals * vals, minlength=n))
    vals = vals / norms[drow]
    per_doc = np.bincount(drow, minlength=n)
    offsets = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(per_doc)])
    idx = pa.LargeListArray.from_arrays(offsets, pa.array(dcol, pa.int64()))
    val = pa.LargeListArray.from_arrays(offsets, pa.array(vals, pa.float64()))
    return idx, val


def _flatten(idx_col, val_col):
    """Arrow list columns -> (flat idx, flat val, per-nnz doc positions, n)."""
    la = idx_col.combine_chunks() if isinstance(idx_col, pa.ChunkedArray) else idx_col
    va = val_col.combine_chunks() if isinstance(val_col, pa.ChunkedArray) else val_col
    offsets = np.asarray(la.offsets, dtype=np.int64)
    voff = np.asarray(va.offsets, dtype=np.int64)
    # SLICED list arrays keep absolute offsets into the untrimmed values
    # buffer — rebase, or flat values and doc positions misalign
    flat_i = np.asarray(la.values, dtype=np.int64)[offsets[0] : offsets[-1]]
    flat_v = np.asarray(va.values, dtype=np.float64)[voff[0] : voff[-1]]
    n = len(la)
    doc = np.repeat(np.arange(n, dtype=np.int64), np.diff(offsets))
    return flat_i, flat_v, doc, n


class TextClassifier:
    """Fitted linear text classifier: weight vector over hashed n-gram
    buckets + bias. ``seed`` pins the feature hashing; a model only scores
    correctly with its own (buckets, seed)."""

    def __init__(self, w: np.ndarray, b: float, *, seed: int = 7):
        self.w = np.asarray(w, dtype=np.float64)
        self.b = float(b)
        self.seed = int(seed)

    @property
    def buckets(self) -> int:
        return len(self.w)

    def prob_batch(self, batch: pa.Table, column: str) -> np.ndarray:
        """Vectorized p(positive) for every row of a batch."""
        idx, val = _featurize_batch(batch, column, self.buckets, self.seed)
        flat_i, flat_v, doc, n = _flatten(idx, val)
        scores = np.bincount(doc, weights=self.w[flat_i] * flat_v, minlength=n)
        return 1.0 / (1.0 + np.exp(-(scores + self.b)))

    def to_parquet(self, path: str) -> None:
        import pyarrow.parquet as pq

        os.makedirs(path, exist_ok=True)
        pq.write_table(
            pa.table({"w": pa.array(self.w)}), os.path.join(path, "weights.parquet")
        )
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump({"b": self.b, "seed": self.seed, "buckets": self.buckets}, f)

    @classmethod
    def from_parquet(cls, path: str) -> "TextClassifier":
        import pyarrow.parquet as pq

        w = np.asarray(
            pq.read_table(os.path.join(path, "weights.parquet"))["w"],
            dtype=np.float64,
        )
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        return cls(w, meta["b"], seed=meta["seed"])


def _grad_pass(w_ref, b: float, buckets: int):
    """One-row-per-block sparse fixed-point partial gradient of the
    (unregularized) logistic loss; L2 is applied once on the driver."""

    def fn(t: pa.Table) -> pa.Table:
        w = ray.get(w_ref)  # zero-copy from the local object store
        flat_i, flat_v, doc, n = _flatten(t["idx"], t["val"])
        y = np.asarray(t["y"], dtype=np.float64)
        scores = np.bincount(doc, weights=w[flat_i] * flat_v, minlength=n) + b
        p = 1.0 / (1.0 + np.exp(-scores))
        err = p - y
        dense = np.zeros(buckets, dtype=np.float64)
        np.add.at(dense, flat_i, err[doc] * flat_v)
        nz = np.nonzero(dense)[0]
        off = np.array([0, len(nz)], dtype=np.int64)
        return pa.table(
            {
                "gi": pa.LargeListArray.from_arrays(off, pa.array(nz, pa.int64())),
                "gv": pa.LargeListArray.from_arrays(
                    off,
                    pa.array(
                        np.round(dense[nz] * _SCALE).astype(np.int64), pa.int64()
                    ),
                ),
                "gb": pa.array([int(round(err.sum() * _SCALE))], pa.int64()),
            }
        )

    return fn


def train_text_classifier(
    ds: ray.data.Dataset,
    text_column: str,
    label_column: str,
    *,
    buckets: int = 1 << 16,
    seed: int = 7,
    epochs: int = 30,
    lr: float = 0.5,
    l2: float = 1e-6,
    max_train_rows: int = 1_000_000,
    train_width: int = 32,
) -> TextClassifier:
    """Fit a fastText-style linear classifier with distributed full-batch
    Adagrad. ``label_column`` must be 0/1 (bool or numeric).

    Deterministic by construction: the training sample is a pure
    (text-hash, seed) function, features are cached once, every epoch's
    gradient is accumulated in int64 fixed point (order-free addition),
    and the Adagrad update is driver-side math over those exact integers —
    so repeated fits, at any parallelism, produce bit-identical weights.
    """
    total = ds.count()
    if total == 0:
        return TextClassifier(np.zeros(buckets), 0.0, seed=seed)
    if total > max_train_rows:
        thresh = np.uint64(int(min(1.0, max_train_rows / total) * 2**64))

        def sample(t: pa.Table) -> pa.Table:
            h = hash64(t[text_column], seed=seed ^ 0xC1A5)
            return t.filter(pa.array(h < thresh))

        ds = ds.map_batches(sample, batch_format="pyarrow")

    def featurize(t: pa.Table) -> pa.Table:
        labels = t[label_column]
        if labels.null_count:
            raise ValueError(
                f"label column {label_column!r} contains nulls; training "
                "needs 0/1 labels on every row (filter unlabeled rows first)"
            )
        idx, val = _featurize_batch(t, text_column, buckets, seed)
        y = np.asarray(labels.cast(pa.float64()), dtype=np.float64)
        return pa.table({"idx": idx, "val": val, "y": pa.array(y)})

    feats = ds.map_batches(featurize, batch_format="pyarrow").materialize()
    n_total = feats.count()
    if n_total == 0:
        return TextClassifier(np.zeros(buckets), 0.0, seed=seed)
    # width adapts to the sample so per-epoch task overhead stays small on
    # tiny corpora; it is a pure function of (n_total, train_width), so the
    # determinism claim is unaffected.
    width = max(1, min(train_width, n_total // 256 + 1))
    feats = feats.repartition(width).materialize()

    w = np.zeros(buckets, dtype=np.float64)
    b = 0.0
    h = np.zeros(buckets, dtype=np.float64)  # Adagrad accumulators
    hb = 0.0
    eps = 1e-8
    for _ in range(epochs):
        w_ref = ray.put(w)
        parts = feats.map_batches(
            _grad_pass(w_ref, b, buckets), batch_format="pyarrow", batch_size=None
        ).take_all()  # bounded: one row per block = width rows
        acc = np.zeros(buckets, dtype=np.int64)
        gb_acc = 0
        for part in parts:  # int64 adds commute -> order-free, bit-exact
            gi = np.asarray(part["gi"], dtype=np.int64)
            np.add.at(acc, gi, np.asarray(part["gv"], dtype=np.int64))
            gb_acc += int(part["gb"])
        g = acc.astype(np.float64) / _SCALE / n_total + l2 * w
        gb = gb_acc / _SCALE / n_total
        h += g * g
        hb += gb * gb
        w = w - lr * g / (np.sqrt(h) + eps)
        b = b - lr * gb / (np.sqrt(hb) + eps)
    return TextClassifier(w, b, seed=seed)


def add_classifier_prob(
    ds: ray.data.Dataset,
    model: TextClassifier,
    column: str,
    *,
    out: str = "quality_prob",
) -> ray.data.Dataset:
    """Score every row with a fitted classifier -> append ``out`` (float64).
    The model is broadcast once; rows with no tokens score sigmoid(bias)."""
    model_ref = ray.put((model.w, model.b, model.seed))

    def fn(t: pa.Table) -> pa.Table:
        w, b, seed = ray.get(model_ref)
        m = TextClassifier(w, b, seed=seed)
        return t.append_column(out, pa.array(m.prob_batch(t, column)))

    return ds.map_batches(fn, batch_format="pyarrow")


def evaluate_classifier(
    ds: ray.data.Dataset,
    model: TextClassifier,
    text_column: str,
    label_column: str,
) -> dict:
    """Distributed accuracy/log-loss: per-batch integer partials, driver
    sums counters only."""
    model_ref = ray.put((model.w, model.b, model.seed))

    def fn(t: pa.Table) -> pa.Table:
        labels = t[label_column]
        if labels.null_count:
            raise ValueError(
                f"label column {label_column!r} contains nulls; evaluation "
                "needs 0/1 labels on every row (filter unlabeled rows first)"
            )
        w, b, seed = ray.get(model_ref)
        m = TextClassifier(w, b, seed=seed)
        p = m.prob_batch(t, text_column)
        y = np.asarray(labels.cast(pa.float64()), dtype=np.float64)
        eps = 1e-12
        loss = -np.sum(y * np.log(p + eps) + (1.0 - y) * np.log(1.0 - p + eps))
        return pa.table(
            {
                "n": pa.array([len(t)], pa.int64()),
                "correct": pa.array(
                    [int(((p >= 0.5) == (y >= 0.5)).sum())], pa.int64()
                ),
                "loss_fp": pa.array([int(round(loss * _SCALE))], pa.int64()),
            }
        )

    parts = ds.map_batches(fn, batch_format="pyarrow", batch_size=None).take_all()
    n = sum(int(r["n"]) for r in parts)
    correct = sum(int(r["correct"]) for r in parts)
    loss = sum(int(r["loss_fp"]) for r in parts) / _SCALE
    return {
        "n": n,
        "accuracy": (correct / n) if n else float("nan"),
        "log_loss": (loss / n) if n else float("nan"),
    }
