"""Company-name cleaning from the reference's patent-deduplication notebook
(reference/docs/examples/patent_deduplication.ipynb, `clean_names` /
`clean_coauthors` / `clean_classes` cells) — the exact regex chain and token
rules, vectorized over Arrow batches.

Semantics pinned by the notebook:
- ``clean_names``: norm whitespace -> upper -> keep only [0-9A-Z ] ->
  remove "B\\s*V" and "N\\s*V" ANYWHERE (Dutch corp suffixes, often
  ill-formed) -> remove \\bCO\\b, \\bCORP\\b, \\bLTD\\b, \\bINC\\b,
  \\bLLC\\b, \\bNL\\b -> norm whitespace again.
- ``clean_coauthors``: upper, "NONE" -> null, "**" separator -> tokens,
  unique, sorted, tokens shorter than 3 chars dropped.
- ``clean_classes``: upper, split on "**", per-element whitespace norm, sort.
"""

from __future__ import annotations

import re

import pyarrow as pa

from mismo_ray.text import norm_whitespace

_NON_ALNUM_SPACE = re.compile(r"[^0-9A-Z ]")
_BV = re.compile(r"B\s*V")
_NV = re.compile(r"N\s*V")
_STOPWORDS = re.compile(r"\b(CO|CORP|LTD|INC|LLC|NL)\b")


def clean_name(name: str | None) -> str | None:
    if name is None:
        return None
    s = norm_whitespace(name)
    s = s.upper()
    s = _NON_ALNUM_SPACE.sub("", s)
    s = _BV.sub("", s)
    s = _NV.sub("", s)
    s = _STOPWORDS.sub("", s)
    return norm_whitespace(s)


def clean_coauthors(s: str | None) -> list[str] | None:
    if s is None:
        return None
    up = s.upper()
    if up == "NONE":
        return None
    up = norm_whitespace(up.replace("**", " "))
    toks = sorted(set(up.split(" "))) if up else []
    return [t for t in toks if len(t) >= 3]


def clean_classes(s: str | None) -> list[str] | None:
    if s is None:
        return None
    return sorted(norm_whitespace(p) for p in s.upper().split("**"))


def clean_names_array(arr) -> pa.Array:
    vals = arr.to_pylist() if isinstance(arr, (pa.Array, pa.ChunkedArray)) else arr
    return pa.array([clean_name(v) for v in vals], type=pa.string())


def clean_coauthors_array(arr) -> pa.Array:
    vals = arr.to_pylist() if isinstance(arr, (pa.Array, pa.ChunkedArray)) else arr
    return pa.array(
        [clean_coauthors(v) for v in vals], type=pa.list_(pa.string())
    )


def clean_classes_array(arr) -> pa.Array:
    vals = arr.to_pylist() if isinstance(arr, (pa.Array, pa.ChunkedArray)) else arr
    return pa.array(
        [clean_classes(v) for v in vals], type=pa.list_(pa.string())
    )
