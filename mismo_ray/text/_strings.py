"""String normalizers (reference: /root/reference/mismo/text/_strings.py:9-58).

Each function accepts either a Python scalar (``str | None``) or a
``pyarrow.Array``/``ChunkedArray`` and returns the same shape. The array paths
use ``pyarrow.compute`` kernels so they run vectorized inside
``Dataset.map_batches(..., batch_format="pyarrow")``.
"""

from __future__ import annotations

import unicodedata

import pyarrow as pa
import pyarrow.compute as pc


def _is_arrow(x) -> bool:
    return isinstance(x, (pa.Array, pa.ChunkedArray))


def norm_whitespace(texts):
    """Strip leading/trailing whitespace; collapse runs of whitespace to one space.

    Reference: mismo/text/_strings.py:9-14.
    """
    if _is_arrow(texts):
        t = pc.utf8_trim_whitespace(texts)
        return pc.replace_substring_regex(t, r"\s+", " ")
    if texts is None:
        return None
    import re

    return re.sub(r"\s+", " ", texts.strip())


def _strip_accents_py(s: str) -> str:
    # NFKD-free: NFD decompose, drop combining marks, recompose. Matches the
    # reference's semantics (é->e but Ø, æ unchanged; _strings.py:17-58).
    return unicodedata.normalize(
        "NFC",
        "".join(
            ch
            for ch in unicodedata.normalize("NFD", s)
            if not unicodedata.combining(ch)
        ),
    )


def strip_accents(s):
    """Remove accents: é -> e; leaves non-accent letters (Ø, æ) untouched.

    Reference: mismo/text/_strings.py:17-58 (duckdb ``strip_accents`` builtin).
    """
    if _is_arrow(s):
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        # no arrow kernel for accent folding; per-unique-value python with a
        # dictionary-encode so repeated values pay once.
        enc = s.dictionary_encode()
        dict_vals = enc.dictionary.to_pylist()
        folded = pa.array(
            [None if v is None else _strip_accents_py(v) for v in dict_vals],
            type=pa.string(),
        )
        return pc.take(folded, enc.indices)
    if s is None:
        return None
    return _strip_accents_py(s)
