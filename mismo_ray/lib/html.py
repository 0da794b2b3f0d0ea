"""Generic HTML -> text extraction for crawl tables.

The flagship ER pipeline extracts text from its OWN synthesized page
format (pipelines._webpages, byte-identical per-url contract); this module
is the generic fallback for arbitrary html: tag stripping + common-entity
decoding + whitespace normalization, with semantics pinned so a SQL oracle
reproduces the output byte-for-byte:

- tags: every ``<[^>]*>`` match removed (RE2-compatible; an unterminated
  ``<...`` at end-of-document does not match and stays — same as DuckDB
  ``regexp_replace(html, '<[^>]*>', '', 'g')``). Script/style CONTENT is
  not removed (that needs a parser; at curation scale the quality filters
  downstream catch code-ish text).
- entities: a fixed chain of the common five + nbsp, ``&amp;`` decoded
  LAST so ``&amp;lt;`` yields ``&lt;`` (single-pass decoding, not
  recursive — the documented, SQL-mirrorable subset of html.unescape).
- whitespace: runs collapse to one space, ends trimmed.

Everything is one stateless ``map_batches`` of pandas C-speed regex/replace
calls; html never crosses a shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

_TAG_RE = r"<[^>]*>"
# decode order is part of the contract: &amp; LAST
_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def strip_tags_batch(
    arr: pa.Array | pa.ChunkedArray,
    *,
    entities: bool = True,
    norm_space: bool = True,
) -> pa.Array:
    """Vectorized html -> text for one Arrow array (nulls pass through)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_binary(arr.type) or pa.types.is_large_binary(arr.type):
        arr = arr.cast(pa.string())
    s = pd.Series(arr.to_pylist(), dtype="object")
    out = s.str.replace(_TAG_RE, "", regex=True)
    if entities:
        for ent, ch in _ENTITIES:
            out = out.str.replace(ent, ch, regex=False)
    if norm_space:
        # EXACT RE2-\s class ([ \t\n\f\r] — no \v, no unicode spaces) and a
        # matching explicit strip set: python \s / .strip() are
        # unicode-aware and would diverge from the SQL mirror on \v or
        # NBSP-bearing html
        out = out.str.replace(r"[ \t\n\r\f]+", " ", regex=True).str.strip(" ")
    return pa.array(out.to_numpy(), type=pa.string())


def add_text_from_html(
    ds: ray.data.Dataset,
    html_column: str = "html",
    *,
    out_column: str = "text",
    entities: bool = True,
    norm_space: bool = True,
) -> ray.data.Dataset:
    """Append the extracted text column (see module docstring contract)."""

    def fn(t: pa.Table) -> pa.Table:
        return t.append_column(
            out_column,
            strip_tags_batch(
                t[html_column], entities=entities, norm_space=norm_space
            ),
        )

    return ds.map_batches(fn, batch_format="pyarrow")
