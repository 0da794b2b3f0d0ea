"""Deduplication operators for training-data pipelines.

The reference's whole library IS near-dedup (SURVEY §2.7); these wrap its
primitives into the dedup shapes a 100 TB corpus pipeline needs:

- ``exact_dedupe``: content-hash -> hash-partition -> per-group min-id keep
  (ray_guide "Aggregation at scale" pattern);
- ``minhash_lsh_pairs``/``minhash_lsh_dedupe``: shingle -> seeded minhash
  signature -> banded LSH keys -> UnnestLinker-style bucket groupby ->
  optional exact-jaccard verify -> connected components. The reference's
  ``minhash_lsh_keys`` (mismo/linker/_lsh.py:17-43) samples RANDOMLY per call;
  ours uses fixed seeded hash families so runs are deterministic (SURVEY §4);
- ``simhash64``/``simhash_pairs``: 64-bit simhash, banded into 4x16-bit keys,
  candidates verified by hamming distance;
- ``ngram_jaccard_pairs``: character-ngram UnnestLinker blocking + exact
  jaccard verify;
- ``embedding_neardup_pairs``: cosine >= tau via mismo_ray.ann.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Min

from mismo_ray._util import hash64, splitmix64
from mismo_ray.linker._unnest import UnnestLinker
from mismo_ray.sets import jaccard
from mismo_ray.types import Linkage

# ------------------------------------------------------------------ exact
def exact_dedupe(
    ds: ray.data.Dataset,
    column: str,
    *,
    id_column: str = "record_id",
    normalize: Callable[[str], str] | None = None,
) -> ray.data.Dataset:
    """Hash-partitioned exact dedup: one row per distinct content hash with
    (content_hash, keep_id = min id, n_dups). Vectorized hash inside
    map_batches, then a single groupby shuffle over the hash."""

    def add_hash(t: pa.Table) -> pa.Table:
        vals = t[column].to_pylist()
        if normalize is not None:
            vals = [None if v is None else normalize(v) for v in vals]
        hashes = [
            None if v is None else hashlib.md5(str(v).encode("utf-8")).hexdigest()
            for v in vals
        ]
        return pa.table(
            {
                "content_hash": pa.array(hashes, type=pa.string()),
                id_column: t[id_column],
            }
        )

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")
    return hashed.groupby("content_hash").aggregate(
        Min(id_column, alias_name="keep_id"), Count(alias_name="n_dups")
    )


# ---------------------------------------------------------------- minhash
def char_shingles(s: str | None, w: int = 5) -> list[str] | None:
    if s is None:
        return None
    if len(s) <= w:
        return [s] if s else []
    return [s[i : i + w] for i in range(len(s) - w + 1)]


def minhash_signature(
    shingles: list[str] | None, *, num_hashes: int = 64, seed: int = 7
) -> np.ndarray | None:
    """Seeded k-minhash signature (one base hash + k affine mixes)."""
    if shingles is None:
        return None
    if not shingles:
        return np.full(num_hashes, np.iinfo(np.uint64).max, dtype=np.uint64)
    base = hash64(list(set(shingles)), seed=seed)  # (n_shingles,)
    with np.errstate(over="ignore"):
        a = splitmix64(np.arange(1, num_hashes + 1, dtype=np.uint64) * np.uint64(seed * 2 + 1))
        b = splitmix64(a ^ np.uint64(0xABCDEF))
        # h_i(x) = a_i * x + b_i (mod 2^64)
        sig = (base[None, :] * a[:, None] + b[:, None]).min(axis=1)
    return sig


def minhash_lsh_keys(
    s: str | None,
    *,
    num_hashes: int = 64,
    n_bands: int = 16,
    shingle_w: int = 5,
    seed: int = 7,
) -> list[int] | None:
    """Banded LSH keys from the minhash signature: one 64-bit key per band
    (reference mismo/linker/_lsh.py:17-43, determinized)."""
    sig = minhash_signature(char_shingles(s, shingle_w), num_hashes=num_hashes, seed=seed)
    if sig is None:
        return None
    rows = num_hashes // n_bands
    keys = []
    for band in range(n_bands):
        chunk = sig[band * rows : (band + 1) * rows]
        h = hash64(chunk.tolist(), seed=band + 1)
        with np.errstate(over="ignore"):
            combined = np.uint64(0)
            for x in h:
                combined = splitmix64(np.array([combined ^ x], dtype=np.uint64))[0]
        keys.append(int(np.int64(combined.astype(np.int64))) ^ (band << 56))
    return keys


def minhash_lsh_pairs(
    ds: ray.data.Dataset,
    column: str,
    *,
    num_hashes: int = 64,
    n_bands: int = 16,
    shingle_w: int = 5,
    verify_jaccard: float | None = None,
    max_pairs: int | None = None,
    seed: int = 7,
) -> Linkage:
    """Candidate near-dup pairs via banded minhash LSH; optional exact
    shingle-jaccard verification (pairs below the bar are dropped)."""

    def keys_fn(batch: pa.Table) -> pa.Array:
        out = [
            minhash_lsh_keys(
                v, num_hashes=num_hashes, n_bands=n_bands, shingle_w=shingle_w, seed=seed
            )
            for v in batch[column].to_pylist()
        ]
        return pa.array(out, type=pa.list_(pa.int64()))

    keys_fn.__name__ = "lsh_keys"
    linker = UnnestLinker(keys_fn, max_pairs=max_pairs)
    linkage = linker(ds, ds)
    if verify_jaccard is None:
        return linkage
    pairs = linkage.links.with_both([column], [column])

    def verify(t: pa.Table) -> pa.Table:
        keep = [
            (jaccard(char_shingles(a, shingle_w), char_shingles(b, shingle_w)) or 0.0)
            >= verify_jaccard
            for a, b in zip(
                t[f"{column}_l"].to_pylist(), t[f"{column}_r"].to_pylist()
            )
        ]
        return t.filter(pa.array(keep)).select(["record_id_l", "record_id_r"])

    verified = pairs.map_batches(verify, batch_format="pyarrow")
    return Linkage(left=ds, right=ds, links=verified)


def minhash_lsh_dedupe(
    ds: ray.data.Dataset,
    column: str,
    *,
    verify_jaccard: float = 0.8,
    label_as: str = "dup_group",
    **kwargs,
) -> ray.data.Dataset:
    """Near-dup clusters: LSH pairs -> verify -> connected components."""
    from mismo_ray.cluster import connected_components

    linkage = minhash_lsh_pairs(ds, column, verify_jaccard=verify_jaccard, **kwargs)
    return connected_components(
        links=linkage.links_ds, records=ds, label_as=label_as
    )


# ---------------------------------------------------------------- simhash
def simhash64(s: str | None, *, shingle_w: int = 4, seed: int = 11) -> int | None:
    if s is None:
        return None
    sh = char_shingles(s, shingle_w)
    if not sh:
        return 0
    h = hash64(sh, seed=seed)
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
        np.int64
    )
    score = bits.sum(axis=0) * 2 - len(h)
    out = np.uint64(0)
    for i in range(64):
        if score[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out.astype(np.int64))


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


def simhash_pairs(
    ds: ray.data.Dataset,
    column: str,
    *,
    max_hamming: int = 3,
    shingle_w: int = 4,
    seed: int = 11,
    max_pairs: int | None = None,
) -> Linkage:
    """Candidates via 4x16-bit simhash bands (any equal band blocks the pair
    — catches all pairs within hamming distance 3 of each other by
    pigeonhole), verified by exact hamming distance."""

    def band_keys(batch: pa.Table) -> pa.Array:
        out = []
        for v in batch[column].to_pylist():
            h = simhash64(v, shingle_w=shingle_w, seed=seed)
            if h is None:
                out.append(None)
                continue
            hu = h & 0xFFFFFFFFFFFFFFFF
            out.append(
                [((hu >> (16 * b)) & 0xFFFF) | (b << 16) for b in range(4)]
            )
        return pa.array(out, type=pa.list_(pa.int64()))

    band_keys.__name__ = "simhash_bands"
    linkage = UnnestLinker(band_keys, max_pairs=max_pairs)(ds, ds)
    pairs = linkage.links.with_both([column], [column])

    def verify(t: pa.Table) -> pa.Table:
        keep = []
        for a, b in zip(t[f"{column}_l"].to_pylist(), t[f"{column}_r"].to_pylist()):
            ha = simhash64(a, shingle_w=shingle_w, seed=seed)
            hb = simhash64(b, shingle_w=shingle_w, seed=seed)
            keep.append(
                ha is not None and hb is not None and hamming64(ha, hb) <= max_hamming
            )
        return t.filter(pa.array(keep)).select(["record_id_l", "record_id_r"])

    verified = pairs.map_batches(verify, batch_format="pyarrow")
    return Linkage(left=ds, right=ds, links=verified)


# ------------------------------------------------------------ ngram jaccard
def ngram_jaccard_pairs(
    ds: ray.data.Dataset,
    column: str,
    *,
    n: int = 3,
    min_jaccard: float = 0.5,
    max_pairs: int | None = 100_000,
    rare_only_df: int | None = None,
) -> Linkage:
    """Character-ngram inverted-index blocking (hot grams dropped via
    max_pairs, exactly the address-notebook trigram pattern, SURVEY §3.2)
    + exact ngram-jaccard verification."""
    from mismo_ray.text import ngrams as ngrams_fn

    def gram_key(batch: pa.Table) -> pa.Array:
        out = [
            None if v is None else list(set(ngrams_fn(v, n) or []))
            for v in batch[column].to_pylist()
        ]
        return pa.array(out, type=pa.list_(pa.string()))

    gram_key.__name__ = f"ngrams{n}"
    linkage = UnnestLinker(gram_key, max_pairs=max_pairs)(ds, ds)
    pairs = linkage.links.with_both([column], [column])

    def verify(t: pa.Table) -> pa.Table:
        keep = [
            (jaccard(ngrams_fn(a, n), ngrams_fn(b, n)) or 0.0) >= min_jaccard
            for a, b in zip(
                t[f"{column}_l"].to_pylist(), t[f"{column}_r"].to_pylist()
            )
        ]
        return t.filter(pa.array(keep)).select(["record_id_l", "record_id_r"])

    verified = pairs.map_batches(verify, batch_format="pyarrow")
    return Linkage(left=ds, right=ds, links=verified)


# ------------------------------------------------------------- embeddings
def embedding_neardup_pairs(
    ds: ray.data.Dataset,
    *,
    tau: float = 0.95,
    id_column: str = "record_id",
    vector_column: str = "embedding",
) -> Linkage:
    from mismo_ray.ann import cosine_threshold_pairs

    links = cosine_threshold_pairs(
        ds, tau=tau, id_column=id_column, vector_column=vector_column
    )
    return Linkage(left=ds, right=ds, links=links)
