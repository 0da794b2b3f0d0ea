"""String similarity kernels (reference: /root/reference/mismo/text/_similarity.py).

Pinned semantics (reference doctests):

- ``levenshtein_ratio`` = (lenmax - dist) / lenmax; ``("mile","mike")``->0.75;
  ``("mile","")``->0.0; ``("","")``->nan  (_similarity.py:50-88).
- ``jaro_similarity("foo","food")``->0.9166666666666666; empty-vs-anything->0.0
  (including empty-vs-empty); null -> null/nan (_similarity.py:112-142).
- ``jaro_winkler_similarity("foo","food")``->0.9416666666666667 (prefix scale
  p=0.1, prefix length capped at 4, no boost threshold) (_similarity.py:144-181).
- ``damerau_levenshtein``: optimal-string-alignment variant (adjacent
  transposition counts as one edit), matching the DuckDB builtin the reference
  delegates to (_similarity.py:40-47).

Scalar functions take ``str | None``; the ``*_array`` forms are vectorized
across a batch of pairs (numpy DP across the pair axis for Levenshtein) for use
inside ``map_batches``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


# ---------------------------------------------------------------- scalar fns
def levenshtein(a: str | None, b: str | None) -> int | None:
    if a is None or b is None:
        return None
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    prev = list(range(lb + 1))
    cur = [0] * (lb + 1)
    for i in range(1, la + 1):
        cur[0] = i
        ca = a[i - 1]
        for j in range(1, lb + 1):
            cost = 0 if ca == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        prev, cur = cur, prev
    return prev[lb]


def damerau_levenshtein(a: str | None, b: str | None) -> int | None:
    """Unrestricted Damerau-Levenshtein distance (matches the DuckDB builtin
    the reference delegates to: transposed substrings can be edited further)."""
    if a is None or b is None:
        return None
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    maxdist = la + lb
    da: dict[str, int] = {}
    # classic DL with the "da" last-occurrence table; 1-indexed DP with a
    # sentinel row/col of maxdist.
    d = [[maxdist] * (lb + 2) for _ in range(la + 2)]
    for i in range(la + 1):
        d[i + 1][1] = i
    for j in range(lb + 1):
        d[1][j + 1] = j
    for i in range(1, la + 1):
        db = 0
        for j in range(1, lb + 1):
            k = da.get(b[j - 1], 0)
            ell = db
            if a[i - 1] == b[j - 1]:
                cost = 0
                db = j
            else:
                cost = 1
            d[i + 1][j + 1] = min(
                d[i][j] + cost,
                d[i + 1][j] + 1,
                d[i][j + 1] + 1,
                d[k][ell] + (i - k - 1) + 1 + (j - ell - 1),
            )
        da[a[i - 1]] = i
    return d[la + 1][lb + 1]


def _ratio(a, b, dist_fn) -> float | None:
    if a is None or b is None:
        return None
    lenmax = max(len(a), len(b))
    if lenmax == 0:
        return float("nan")
    return (lenmax - dist_fn(a, b)) / lenmax


def levenshtein_ratio(a: str | None, b: str | None) -> float | None:
    return _ratio(a, b, levenshtein)


def damerau_levenshtein_ratio(a: str | None, b: str | None) -> float | None:
    return _ratio(a, b, damerau_levenshtein)


def jaro_similarity(a: str | None, b: str | None) -> float | None:
    if a is None or b is None:
        return None
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    if a == b:
        return 1.0
    match_dist = max(la, lb) // 2 - 1
    if match_dist < 0:
        match_dist = 0
    b_matched = [False] * lb
    a_matched = [False] * la
    matches = 0
    for i, ca in enumerate(a):
        lo = max(0, i - match_dist)
        hi = min(lb, i + match_dist + 1)
        for j in range(lo, hi):
            if not b_matched[j] and b[j] == ca:
                a_matched[i] = True
                b_matched[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    # transpositions
    t = 0
    j = 0
    for i in range(la):
        if a_matched[i]:
            while not b_matched[j]:
                j += 1
            if a[i] != b[j]:
                t += 1
            j += 1
    t //= 2
    return (matches / la + matches / lb + (matches - t) / matches) / 3.0


def jaro_winkler_similarity(
    a: str | None, b: str | None, prefix_weight: float = 0.1
) -> float | None:
    sj = jaro_similarity(a, b)
    if sj is None:
        return None
    if sj == 0.0 or sj == 1.0:
        return sj
    prefix = 0
    for ca, cb in zip(a, b):
        if ca != cb or prefix >= 4:
            break
        prefix += 1
    return sj + prefix * prefix_weight * (1.0 - sj)


# ------------------------------------------------------------- batched forms
def _to_pylist(x):
    if isinstance(x, (pa.Array, pa.ChunkedArray)):
        return x.to_pylist()
    return list(x)


def levenshtein_array(a, b) -> pa.Array:
    """Vectorized-across-pairs Levenshtein over two equal-length sequences.

    Runs the DP with numpy ops across the pair axis: O(maxlen_a * maxlen_b)
    python iterations, each a vector op over all pairs in the batch.
    Falls back to per-pair python for batches with very long strings.
    """
    al, bl = _to_pylist(a), _to_pylist(b)
    n = len(al)
    out = np.zeros(n, dtype=np.float64)
    valid = np.array([x is not None and y is not None for x, y in zip(al, bl)])
    idx = np.nonzero(valid)[0]
    if len(idx) == 0:
        return pa.array([None] * n, type=pa.int64())
    sa = [al[i] for i in idx]
    sb = [bl[i] for i in idx]
    la = np.array([len(s) for s in sa], dtype=np.int32)
    lb = np.array([len(s) for s in sb], dtype=np.int32)
    ma, mb = int(la.max(initial=0)), int(lb.max(initial=0))
    if ma == 0 or mb == 0 or ma * mb > 16384:
        dist = np.array([levenshtein(x, y) for x, y in zip(sa, sb)], dtype=np.float64)
    else:
        m = len(sa)
        A = np.zeros((m, ma), dtype=np.uint32)
        B = np.zeros((m, mb), dtype=np.uint32)
        for k, s in enumerate(sa):
            A[k, : len(s)] = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
        for k, s in enumerate(sb):
            B[k, : len(s)] = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
        dist = _levenshtein_gather(A, B, la, lb)
    out_arr = np.full(n, np.nan)
    out_arr[idx] = dist
    return pa.array(
        [None if not valid[i] else int(out_arr[i]) for i in range(n)], type=pa.int64()
    )


def _levenshtein_gather(A, B, la, lb) -> np.ndarray:
    """DP across pair axis, snapshotting each pair's answer at its own (la, lb)."""
    m, ma = A.shape
    mb = B.shape[1]
    prev = np.tile(np.arange(mb + 1, dtype=np.int32), (m, 1))
    result = np.where(la == 0, lb, 0).astype(np.int32)
    done0 = la == 0
    cur = np.empty_like(prev)
    for i in range(1, ma + 1):
        cur[:, 0] = i
        ca = A[:, i - 1][:, None]
        cost = (ca != B).astype(np.int32)
        for j in range(1, mb + 1):
            cur[:, j] = np.minimum(
                np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1),
                prev[:, j - 1] + cost[:, j - 1],
            )
        finish = la == i
        if finish.any():
            result[finish] = cur[finish, lb[finish]]
        prev, cur = cur, prev
    result[done0] = lb[done0]
    return result.astype(np.float64)


def _pairwise_pyfunc_array(fn, a, b, out_type=pa.float64()) -> pa.Array:
    al, bl = _to_pylist(a), _to_pylist(b)
    return pa.array([fn(x, y) for x, y in zip(al, bl)], type=out_type)


def jaro_similarity_array(a, b) -> pa.Array:
    return _pairwise_pyfunc_array(jaro_similarity, a, b)


def jaro_winkler_similarity_array(a, b) -> pa.Array:
    return _pairwise_pyfunc_array(jaro_winkler_similarity, a, b)


def damerau_levenshtein_array(a, b) -> pa.Array:
    return _pairwise_pyfunc_array(damerau_levenshtein, a, b, out_type=pa.int64())


def levenshtein_ratio_array(a, b) -> pa.Array:
    al, bl = _to_pylist(a), _to_pylist(b)
    dist = levenshtein_array(al, bl).to_pylist()
    out = []
    for x, y, d in zip(al, bl, dist):
        if x is None or y is None:
            out.append(None)
        else:
            lenmax = max(len(x), len(y))
            out.append(float("nan") if lenmax == 0 else (lenmax - d) / lenmax)
    return pa.array(out, type=pa.float64())


def double_metaphone(s: str | None) -> list[str] | None:
    """Double Metaphone phonetic encoding (reference _similarity.py:9-36
    doctest shapes: catherine -> ['K0RN', 'KTRN'], '' -> ['', ''], None ->
    None). Bundled pure-python implementation of Philips' algorithm
    (text/_metaphone.py) — no optional native package needed."""
    from mismo_ray.text._metaphone import double_metaphone_py

    return double_metaphone_py(s)
