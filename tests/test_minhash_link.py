"""MinhashLshLinker link task (cross-corpus near-dup) vs brute-force
cross jaccard, plus hybrid-verify consistency with exact-verify."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from tests.conftest import rows_set

WORDS = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()


def _texts(n: int, seed: int) -> list[str]:
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        out.append(" ".join(rng.choice(WORDS, size=rng.integers(8, 16))))
    return out


def _corpora(seed: int = 11, n: int = 40):
    """Two corpora where some right docs are light edits of left docs."""
    rng = np.random.default_rng(seed)
    left = _texts(n, seed)
    right = []
    for i in range(n):
        if i % 3 == 0:  # near-dup of left[i]: perturb one character
            s = left[i]
            j = int(rng.integers(0, len(s)))
            right.append(s[:j] + "x" + s[j + 1 :])
        else:
            right.append(" ".join(rng.choice(WORDS, size=rng.integers(8, 16))))
    return left, right


def _shingle_set(s: str, w: int = 5) -> set:
    if len(s) <= w:
        return {s} if s else set()
    return {s[i : i + w] for i in range(len(s) - w + 1)}


def _brute_cross(left, right, tau):
    out = set()
    for i, a in enumerate(left):
        sa = _shingle_set(a)
        for j, b in enumerate(right):
            sb = _shingle_set(b)
            inter = len(sa & sb)
            if inter and inter / len(sa | sb) >= tau:
                out.add((i, 1000 + j))
    return out


def _ds(texts, base):
    return ray.data.from_arrow(
        pa.table(
            {
                "record_id": list(range(base, base + len(texts))),
                "text": texts,
            }
        )
    )


@pytest.mark.parametrize("verify_mode", ["exact", "hybrid"])
def test_minhash_link_matches_bruteforce(ray_session, verify_mode):
    from mismo_ray.dedupe import minhash_lsh_pairs

    left_texts, right_texts = _corpora()
    tau = 0.7
    expected = _brute_cross(left_texts, right_texts, tau)
    assert len(expected) >= 8  # planted near-dups
    lds, rds = _ds(left_texts, 0), _ds(right_texts, 1000)
    got = rows_set(
        minhash_lsh_pairs(
            lds,
            "text",
            right=rds,
            verify_jaccard=tau,
            verify_mode=verify_mode,
            n_bands=32,
            num_hashes=64,
            shingle_w=5,
        ).links_ds,
        ["record_id_l", "record_id_r"],
    )
    # blocking recall < 1 in principle; with 32 bands at J>=0.7 the miss
    # probability is ~(1-0.7^2)^32 ~ 6e-10 — require exact match on verified
    # pairs (the exact-verify subset relation holds by construction)
    assert got == expected


def test_minhash_linker_link_task(ray_session):
    from mismo_ray.linker import MinhashLshLinker

    left_texts, right_texts = _corpora(seed=5)
    lds, rds = _ds(left_texts, 0), _ds(right_texts, 1000)
    linker = MinhashLshLinker(
        "text", verify_jaccard=0.7, n_bands=32, num_hashes=64
    )
    linkage = linker(lds, rds)
    got = rows_set(linkage.links_ds, ["record_id_l", "record_id_r"])
    expected = _brute_cross(left_texts, right_texts, 0.7)
    # hybrid default: clear accepts/rejects from sketch, borderline exact
    assert got == expected
