"""Array helpers (reference: /root/reference/mismo/arrays/_array.py, _builtins.py).

Per-row operations over list columns, used inside pair comparison of
multi-valued fields. All run within one Arrow batch (arrays are small, bounded
by the reference's usage — token lists, email lists).
"""

from __future__ import annotations

import numpy as np

from mismo_ray._util import splitmix64


def array_combinations(a: list | None, b: list | None) -> list | None:
    """Cartesian product of two arrays -> list of {'l': x, 'r': y} structs
    (reference: mismo/arrays/_array.py:14-34)."""
    if a is None or b is None:
        return None
    return [{"l": x, "r": y} for x in a for y in b]


def array_combinations_first_n(a, b, n: int) -> list | None:
    """First n elements of the cartesian product (reference: _array.py:37-76)."""
    combos = array_combinations(a, b)
    return None if combos is None else combos[:n]


def array_filter_isin_other(a: list | None, other: set) -> list | None:
    """Keep array elements present in ``other`` (reference: _array.py:79-135;
    the 'other table column' side is broadcast as a python set)."""
    if a is None:
        return None
    return [x for x in a if x in other]


def array_min(a):
    return None if not a else min(x for x in a if x is not None)


def array_max(a):
    return None if not a else max(x for x in a if x is not None)


def array_sum(a):
    return None if a is None else sum(x for x in a if x is not None)


def array_mean(a):
    if not a:
        return None
    vals = [x for x in a if x is not None]
    return sum(vals) / len(vals) if vals else None


def array_median(a):
    if not a:
        return None
    vals = sorted(x for x in a if x is not None)
    if not vals:
        return None
    return float(np.median(vals))


def array_any(a):
    return None if a is None else any(bool(x) for x in a if x is not None)


def array_all(a):
    return None if a is None else all(bool(x) for x in a if x is not None)


def array_shuffle(a: list | None, *, seed: int, row_key: int = 0) -> list | None:
    """Deterministic per-row shuffle: randomness derived from (seed, row_key)
    so results are stable across parallelism levels (SURVEY §4 determinism)."""
    if a is None:
        return None
    rng = np.random.default_rng(
        int(splitmix64(np.array([seed ^ row_key], dtype=np.uint64))[0])
    )
    out = list(a)
    rng.shuffle(out)
    return out


def array_choice(a: list | None, n: int, *, seed: int, row_key: int = 0) -> list | None:
    if a is None:
        return None
    return array_shuffle(a, seed=seed, row_key=row_key)[:n]


def array_sort(a: list | None, key=None, reverse: bool = False) -> list | None:
    if a is None:
        return None
    return sorted(a, key=key, reverse=reverse)
