"""Set comparison (reference: /root/reference/mismo/sets/_compare.py:6-23).

``jaccard(a, b)`` = |a ∩ b| / |a ∪ b| over the *distinct* elements; returns 0.0
when the intersection is empty (which also covers both-empty, avoiding 0/0);
nulls propagate.
"""

from __future__ import annotations

import pyarrow as pa


def jaccard(a, b) -> float | None:
    if a is None or b is None:
        return None
    sa, sb = set(a), set(b)
    inter = len(sa & sb)
    if inter == 0:
        return 0.0
    return inter / len(sa | sb)


def jaccard_array(a, b) -> pa.Array:
    al = a.to_pylist() if isinstance(a, (pa.Array, pa.ChunkedArray)) else list(a)
    bl = b.to_pylist() if isinstance(b, (pa.Array, pa.ChunkedArray)) else list(b)
    return pa.array([jaccard(x, y) for x, y in zip(al, bl)], type=pa.float64())
