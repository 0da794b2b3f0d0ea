"""Dense and sparse vector math (reference: /root/reference/mismo/vector/_vector.py).

Dense vectors are ``list<float>`` (numpy paths); sparse vectors are
``map<K, float>`` represented in python as dicts (arrow map / list<struct>
columns). Semantics pinned by the reference:

- ``dot``: dense = elementwise product sum; sparse = sum over shared keys
  (_vector.py:29-62).
- ``cosine_similarity`` = dot(a, b) / (|a| * |b|) (_vector.py:65-102).
- ``norm(v, metric="l2"|"l1")``; ``normalize`` divides by the norm
  (_vector.py:129-223); empty vector normalizes to empty; zero-norm yields
  nan entries (0/0) as in the reference's SQL division.
- nulls propagate.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa


def _is_sparse(v) -> bool:
    return isinstance(v, dict)


def _as_dict(v):
    # arrow map columns arrive as list-of-(key, value) tuples or list of dicts
    if isinstance(v, dict):
        return v
    if isinstance(v, list) and v and isinstance(v[0], tuple):
        return dict(v)
    if isinstance(v, list) and v and isinstance(v[0], dict) and set(v[0]) == {"key", "value"}:
        return {d["key"]: d["value"] for d in v}
    return v


def dot(a, b) -> float | None:
    if a is None or b is None:
        return None
    a, b = _as_dict(a), _as_dict(b)
    if _is_sparse(a):
        return float(sum(v * b.get(k, 0.0) for k, v in a.items() if k in b))
    if len(a) != len(b):
        raise ValueError("dense vectors must have equal length")
    return float(np.dot(np.asarray(a, dtype=np.float64), np.asarray(b, dtype=np.float64)))


def norm(v, metric: str = "l2") -> float | None:
    if v is None:
        return None
    v = _as_dict(v)
    vals = list(v.values()) if _is_sparse(v) else list(v)
    if metric == "l2":
        return math.sqrt(sum(x * x for x in vals))
    if metric == "l1":
        return sum(abs(x) for x in vals)
    raise ValueError(f"Unknown metric {metric}")


def normalize(v, metric: str = "l2"):
    if v is None:
        return None
    v = _as_dict(v)
    n = norm(v, metric)
    if _is_sparse(v):
        return {k: x / n for k, x in v.items()}
    return [x / n for x in v]


def mul(a, b):
    """Elementwise product; sparse x sparse over shared keys."""
    if a is None or b is None:
        return None
    a, b = _as_dict(a), _as_dict(b)
    if _is_sparse(a):
        return {k: v * b[k] for k, v in a.items() if k in b}
    return [x * y for x, y in zip(a, b)]


def cosine_similarity(a, b) -> float | None:
    if a is None or b is None:
        return None
    d = dot(a, b)
    na, nb = norm(a), norm(b)
    if na == 0 or nb == 0:
        return float("nan")
    return d / (na * nb)


def cosine_similarity_matrix(
    vecs: np.ndarray, queries: np.ndarray
) -> np.ndarray:
    """Batched dense cosine: (n, d) x (q, d) -> (n, q) similarity matrix.

    The workhorse for ANN brute-force scoring inside ``map_batches`` — one
    numpy matmul per batch against a broadcast query matrix.
    """
    vecs = np.asarray(vecs, dtype=np.float64)
    queries = np.asarray(queries, dtype=np.float64)
    vn = np.linalg.norm(vecs, axis=1, keepdims=True)
    qn = np.linalg.norm(queries, axis=1, keepdims=True)
    vn[vn == 0] = np.nan
    qn[qn == 0] = np.nan
    return (vecs @ queries.T) / (vn * qn.T)


def cosine_similarity_array(a, b) -> pa.Array:
    """Row-wise cosine of two list<float> arrow columns (vectorized when the
    vectors are fixed-length)."""
    al = a.to_pylist() if isinstance(a, (pa.Array, pa.ChunkedArray)) else list(a)
    bl = b.to_pylist() if isinstance(b, (pa.Array, pa.ChunkedArray)) else list(b)
    return pa.array(
        [cosine_similarity(x, y) for x, y in zip(al, bl)], type=pa.float64()
    )
