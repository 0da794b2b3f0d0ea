"""DSIR-style importance resampling (Xie et al. 2023, "Data Selection for
Language Models via Importance Resampling", NeurIPS).

Select raw-corpus documents that look like a TARGET corpus: fit two
bag-of-hashed-n-gram unigram models (target and raw), weight every raw doc
by its log importance ratio, then sample without replacement proportionally
to the ratio via deterministic Gumbel top-k. The reference repo has no
analog (mismo is record linkage); this belongs to the training-data tier
of the task brief alongside mixture_sample/hash_split.

Scale shape (100 TB):

- **featurize** — unigrams + bigrams of the pinned ``[^a-z0-9]+``
  tokenizer (byte-identical to the LM module) hashed into ``buckets``
  fixed slots; each token is siphashed ONCE per batch, bigram hashes are
  derived from the two token hashes with integer mixing (no second string
  hash). Text never leaves its task.
- **fit** — per-batch partial bucket counts -> at most ``buckets``
  (bucket, count) rows per batch through one ``groupby().sum()`` shuffle
  -> one bounded driver collect of <= ``buckets`` rows. The fitted model
  is a single float64 vector of length ``buckets`` (80 KB at the default
  10k), broadcast once via ``ray.put``.
- **weight** — one stateless ``map_batches`` pass; per-doc weight is a
  ``np.bincount`` gather, no Python loop over tokens.
- **sample** — Gumbel key = logw + G(hash64(id, seed)) is a pure
  (id, seed) function; the top-``n`` cut comes from the exact distributed
  radix :func:`mismo_ray.util_ops.quantiles` (3 streaming passes over one
  float64 column, driver holds histograms only) and the final filter is
  one more pass. No global sort, no driver materialization.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from mismo_ray._util import hash64, hash64_base, hash64_fold, splitmix64
from mismo_ray.textstats._lm import _explode_tokens

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _gram_buckets(batch: pa.Table, column: str, buckets: int, seed: int):
    """-> (bucket ids of every unigram+bigram occurrence, doc-row positions).

    Tokens are siphashed once; bigram hashes mix the two neighbouring
    token hashes with splitmix64 (order-sensitive), so the second gram
    family costs integer ops only."""
    tokens, rows = _explode_tokens(batch, column)
    if len(tokens) == 0:
        e = np.array([], dtype=np.int64)
        return e, e
    th = hash64_fold(hash64_base(tokens), seed)
    uni = (th % np.uint64(buckets)).astype(np.int64)
    m = rows[1:] == rows[:-1]
    with np.errstate(over="ignore"):
        bh = splitmix64(th[:-1][m] ^ splitmix64(th[1:][m] ^ _GOLDEN))
    big = (bh % np.uint64(buckets)).astype(np.int64)
    return (
        np.concatenate([uni, big]),
        np.concatenate([rows, rows[1:][m]]),
    )


def hashed_ngram_counts(
    ds: ray.data.Dataset,
    column: str,
    *,
    buckets: int = 10_000,
    seed: int = 7,
) -> np.ndarray:
    """Total hashed-n-gram bucket counts over a corpus -> int64 (buckets,).

    Map-side combine: each batch emits only its non-zero (bucket, count)
    rows, one small keyed shuffle sums them, the driver collects at most
    ``buckets`` rows."""

    def partial(batch: pa.Table) -> pa.Table:
        b, _ = _gram_buckets(batch, column, buckets, seed)
        if len(b) == 0:
            return pa.table(
                {
                    "bucket": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        counts = np.bincount(b, minlength=buckets)
        nz = np.nonzero(counts)[0]
        return pa.table(
            {"bucket": pa.array(nz.astype(np.int64)), "n": pa.array(counts[nz])}
        )

    rows = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .sum("n")
        .take_all()
    )
    out = np.zeros(buckets, dtype=np.int64)
    for r in rows:
        out[int(r["bucket"])] = int(r["sum(n)"])
    return out


class DsirModel:
    """Fitted importance model: per-bucket log(p_target / p_raw)."""

    def __init__(
        self,
        log_ratio: np.ndarray,
        *,
        buckets: int,
        seed: int,
        alpha: float,
    ):
        self.log_ratio = np.asarray(log_ratio, dtype=np.float64)
        self.buckets = int(buckets)
        self.seed = int(seed)
        self.alpha = float(alpha)

    def to_parquet(self, path: str) -> None:
        import pyarrow.parquet as pq

        os.makedirs(path, exist_ok=True)
        pq.write_table(
            pa.table({"log_ratio": pa.array(self.log_ratio)}),
            os.path.join(path, "log_ratio.parquet"),
        )
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(
                {"buckets": self.buckets, "seed": self.seed, "alpha": self.alpha}, f
            )

    @classmethod
    def from_parquet(cls, path: str) -> "DsirModel":
        import pyarrow.parquet as pq

        t = pq.read_table(os.path.join(path, "log_ratio.parquet"))
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        return cls(
            np.asarray(t["log_ratio"], dtype=np.float64),
            buckets=meta["buckets"],
            seed=meta["seed"],
            alpha=meta["alpha"],
        )


def fit_dsir(
    target: ray.data.Dataset,
    raw: ray.data.Dataset,
    column: str,
    *,
    buckets: int = 10_000,
    seed: int = 7,
    alpha: float = 1.0,
) -> DsirModel:
    """Fit log(p_target/p_raw) per hashed-n-gram bucket (add-``alpha``
    smoothed). Two count passes (one per corpus); the model is an 80 KB
    vector at the default 10k buckets."""
    ct = hashed_ngram_counts(target, column, buckets=buckets, seed=seed)
    cr = hashed_ngram_counts(raw, column, buckets=buckets, seed=seed)
    if ct.sum() == 0:
        raise ValueError("fit_dsir: target corpus has no tokens")
    if cr.sum() == 0:
        raise ValueError("fit_dsir: raw corpus has no tokens")
    lp_t = np.log(ct + alpha) - np.log(ct.sum() + alpha * buckets)
    lp_r = np.log(cr + alpha) - np.log(cr.sum() + alpha * buckets)
    return DsirModel(lp_t - lp_r, buckets=buckets, seed=seed, alpha=alpha)


def add_dsir_weight(
    ds: ray.data.Dataset,
    model: DsirModel,
    column: str,
    *,
    out_column: str = "dsir_logw",
    per_gram: bool = True,
) -> ray.data.Dataset:
    """Per-doc log importance weight: sum over the doc's hashed n-grams of
    the model's log ratio. ``per_gram=True`` (default) divides by the gram
    count so the weight is length-invariant (the paper's raw sum applies
    to fixed-length chunks; variable-length web docs would otherwise let
    length dominate). Docs with no tokens (or null text) get 0.0."""
    m_ref = ray.put(model.log_ratio)
    buckets, seed = model.buckets, model.seed

    def weigh(batch: pa.Table) -> pa.Table:
        lr = ray.get(m_ref)
        n = batch.num_rows
        b, rows = _gram_buckets(batch, column, buckets, seed)
        if len(b) == 0:
            return batch.append_column(
                out_column, pa.array(np.zeros(n), type=pa.float64())
            )
        s = np.bincount(rows, weights=lr[b], minlength=n)
        if per_gram:
            cnt = np.bincount(rows, minlength=n)
            s = np.divide(s, cnt, out=np.zeros_like(s), where=cnt > 0)
        return batch.append_column(out_column, pa.array(s, type=pa.float64()))

    return ds.map_batches(weigh, batch_format="pyarrow")


def dsir_sample(
    ds: ray.data.Dataset,
    model: DsirModel,
    column: str,
    n: int,
    *,
    id_column: str = "doc_id",
    seed: int = 0,
    temperature: float = 1.0,
    weight_column: str = "dsir_logw",
    per_gram: bool = True,
) -> ray.data.Dataset:
    """Sample ``n`` docs without replacement with probability proportional
    to exp(logw / temperature) — the Gumbel top-k construction: key =
    logw/T + Gumbel(hash64(id, seed)), keep the n largest keys. The noise
    is a pure (id, seed) function, so the selection is stable across runs,
    partitionings and cluster sizes; the cut point comes from the exact
    distributed quantile (no global sort). ``temperature -> 0`` approaches
    deterministic top-n by weight."""
    from mismo_ray.util_ops import quantiles

    if n <= 0:
        raise ValueError("dsir_sample: n must be positive")
    t = float(temperature)
    if t <= 0:
        raise ValueError(
            "dsir_sample: temperature must be > 0 (use a small value for near-argmax)"
        )

    def with_key(d: ray.data.Dataset) -> ray.data.Dataset:
        weighted = add_dsir_weight(
            d, model, column, out_column=weight_column, per_gram=per_gram
        )

        def key(batch: pa.Table) -> pa.Table:
            h = hash64(batch[id_column], seed)
            # u in (0, 1): top 53 bits -> [0,1) + half-ulp offset
            u = (h >> np.uint64(11)).astype(np.float64) * 2.0**-53 + 2.0**-54
            g = -np.log(-np.log(u))
            w = np.asarray(batch[weight_column], dtype=np.float64)
            return batch.append_column(
                "__dsir_key__", pa.array(w / t + g, type=pa.float64())
            )

        return weighted.map_batches(key, batch_format="pyarrow")

    # pass 1 computes keys but materializes ONLY the 8-byte key column (the
    # text never parks in the object store); count + the radix quantile read
    # this small table. The final pass recomputes the key — it is a pure
    # (text, id, model, seed) function — and filters, so the corpus itself
    # streams end to end.
    keys_only = with_key(ds).select_columns(["__dsir_key__"]).materialize()
    total = keys_only.count()
    if total == 0 or n >= total:
        # keep-everything result must still carry the SAME schema as the
        # sampled path (incl. the dsir_logw weight column) — a raw `ds`
        # return made downstream weight readers corpus-size-dependent
        def strip(batch: pa.Table) -> pa.Table:
            return batch.drop_columns(["__dsir_key__"])

        return with_key(ds).map_batches(strip, batch_format="pyarrow")
    # cut = the (total-n)-th smallest key (0-indexed rank total-n); keys are
    # float64 with per-id Gumbel noise, ties impossible in practice -> the
    # filter keeps exactly the n largest
    q = (total - n + 0.5) / total
    cut = quantiles(keys_only, "__dsir_key__", [q])[q]

    def keep(batch: pa.Table) -> pa.Table:
        mask = pc.greater_equal(batch["__dsir_key__"], pa.scalar(cut))
        return batch.filter(mask).drop_columns(["__dsir_key__"])

    return with_key(ds).map_batches(keep, batch_format="pyarrow")
