"""Phone cleaning and comparison
(reference: /root/reference/mismo/lib/phone/_core.py).

Pinned semantics:
- ``clean_phone_number``: strip non-digits; with a 3-digit
  ``default_area_code``, prepend it to bare 7-digit numbers; extract the
  10-digit run from ``1?(\\d{10})``; null out empties and bogus numbers
  containing "0000"/"9999"/"12345" (:31-82). List inputs are cleaned
  per-element, nulls dropped, de-duplicated.
- ``match_level``: EXACT(0) > NEAR(1, damerau<=1) > ELSE(2) on already-cleaned
  numbers (:85-129).
"""

from __future__ import annotations

import re

import pyarrow as pa

from mismo_ray.text import damerau_levenshtein

_NON_DIGIT = re.compile(r"[^0-9]")
_TEN = re.compile(r"1?(\d{10})")
_BOGUS = re.compile(r".*(0000|9999|12345).*")

EXACT, NEAR, ELSE = 0, 1, 2
LEVELS = ["EXACT", "NEAR", "ELSE"]


def clean_phone_number(
    number, *, default_area_code: str | None = None
):
    if isinstance(number, list):
        out = []
        for n in number:
            c = clean_phone_number(n, default_area_code=default_area_code)
            if c is not None and c not in out:
                out.append(c)
        return out
    if number is None:
        return None
    if default_area_code is not None and len(default_area_code) != 3:
        raise ValueError("default_area_code must be 3 digits")
    x = _NON_DIGIT.sub("", str(number))
    if default_area_code and re.fullmatch(r"\d{7}", x):
        x = default_area_code + x
    m = _TEN.search(x)
    if m is None:
        return None
    x = m.group(1)
    if _BOGUS.match(x):
        return None
    return x


def match_level(p1: str | None, p2: str | None) -> int:
    if p1 is not None and p1 == p2:
        return EXACT
    d = damerau_levenshtein(p1, p2)
    if d is not None and d <= 1:
        return NEAR
    return ELSE


def clean_phone_array(arr, *, default_area_code: str | None = None) -> pa.Array:
    vals = arr.to_pylist() if isinstance(arr, (pa.Array, pa.ChunkedArray)) else arr
    return pa.array(
        [clean_phone_number(v, default_area_code=default_area_code) for v in vals],
        type=pa.string(),
    )


def match_level_array(a, b) -> pa.Array:
    al = a.to_pylist() if isinstance(a, (pa.Array, pa.ChunkedArray)) else list(a)
    bl = b.to_pylist() if isinstance(b, (pa.Array, pa.ChunkedArray)) else list(b)
    return pa.array([match_level(x, y) for x, y in zip(al, bl)], type=pa.int64())
