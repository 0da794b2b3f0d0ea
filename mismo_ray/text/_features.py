"""Tokenization features (reference: /root/reference/mismo/text/_features.py).

Semantics pinned by the reference doctests:

- ``tokenize``: split on whitespace runs; ``"  abc  def"`` -> ``["abc","def"]``;
  ``" "`` -> ``[]``; ``None`` -> ``None``  (_features.py:9-28).
- ``ngrams``: character n-grams; ``""``/too-short -> ``[]``; ``None`` -> ``None``;
  order NOT guaranteed (_features.py:31-79).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _is_arrow(x) -> bool:
    return isinstance(x, (pa.Array, pa.ChunkedArray))


def tokenize(text):
    """Whitespace-split a string into a token array."""
    if _is_arrow(text):
        t = pc.utf8_trim_whitespace(text)
        # split_pattern_regex("") yields [""]; map empty strings to [] after.
        toks = pc.split_pattern_regex(t, r"\s+")
        empty = pc.equal(t, "")
        return pc.if_else(empty, pa.scalar([], type=pa.list_(pa.string())), toks)
    if text is None:
        return None
    return text.split()


def _ngrams_py(s: str | None, n: int) -> list[str] | None:
    if s is None:
        return None
    return [s[i : i + n] for i in range(len(s) - n + 1)]


def ngrams(string, n: int):
    """Character n-grams. Unlike the reference we return them in order
    (the reference explicitly does not guarantee order, _features.py:52-64)."""
    if n < 1:
        raise ValueError("n must be greater than 0")
    if _is_arrow(string):
        if isinstance(string, pa.ChunkedArray):
            string = string.combine_chunks()
        vals = string.to_pylist()
        return pa.array(
            [_ngrams_py(v, n) for v in vals], type=pa.list_(pa.string())
        )
    return _ngrams_py(string, n)
