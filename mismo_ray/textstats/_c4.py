"""C4 line-level cleaning rules (Raffel et al. 2020, "Exploring the Limits
of Transfer Learning...", §2.2) — the other canonical webtext filter,
complementing the document-level Gopher rules.

Line rules (a line is kept iff ALL hold):

- ends in terminal punctuation: one of ``. ! ? "`` (C4's rule);
- has at least ``min_line_words`` whitespace words (C4 uses 5 — Raffel
  et al. §2.2: "only retained lines that contained at least 5 words";
  the 3 in that section applies to *sentences per page*, not words);
- does not contain the word ``javascript`` (case-insensitive) — C4 drops
  lines with it (cookie/JS boilerplate);
- is not the literal boilerplate marker ``lorem ipsum`` carrier: C4 drops
  the WHOLE page when ``lorem ipsum`` appears; same for ``{`` (code).

Document rules:

- pages containing ``lorem ipsum`` (case-insensitive) or a ``{`` anywhere
  are dropped entirely;
- after line filtering, pages with fewer than ``min_sentences`` kept
  lines are dropped (C4 uses 3).

Output of ``c4_clean``: surviving docs with the kept lines rejoined by
``'\\n'`` (byte-exact, SQL-oracle-able: every predicate is a string/count
check, the rewrite is a filtered list rejoin). ``label_only=True`` keeps
every doc and appends ``(n_lines, n_kept_lines, c4_keep)`` instead.

One stateless vectorized ``map_batches`` (pandas split/explode + boolean
masks + groupby rejoin); nothing shuffles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

_TERMINALS = ('.', '!', '?', '"')
# a word = a run of non-(ASCII-whitespace); RE2-\s parity (see _gopher)
_WORD_RUN = r"[^ \t\n\r\f]+"


def c4_clean(
    ds: ray.data.Dataset,
    column: str = "text",
    *,
    min_line_words: int = 5,
    min_sentences: int = 3,
    out_column: str | None = None,
    label_only: bool = False,
) -> ray.data.Dataset:
    """Apply the C4 rules (see module docstring). ``out_column`` defaults
    to rewriting ``column`` in place."""
    out_col = out_column or column

    def fn(t: pa.Table) -> pa.Table:
        n = len(t)
        texts = pd.Series(t[column].to_pylist(), dtype="object")
        filled = texts.fillna("")
        low = filled.str.lower()
        doc_ok = (
            ~low.str.contains("lorem ipsum", regex=False)
            & ~filled.str.contains("{", regex=False)
        ).to_numpy(dtype=bool)

        lines = filled.str.split("\n")
        lx = lines.explode()
        rows = lx.index.to_numpy(dtype=np.int64)
        vals = lx.fillna("")
        # explicit ASCII strip set so the SQL oracle (trim with the same
        # character list) matches byte-for-byte
        stripped = vals.str.strip(" \t\r\f\v")
        ends_ok = stripped.str[-1:].isin(list(_TERMINALS)).to_numpy(dtype=bool)
        # word count = runs of non-(ASCII-whitespace) — exact parity with
        # the oracle's RE2 '\s+' split (python .split() is unicode-aware
        # and would diverge on NBSP-bearing crawl text)
        word_ok = (
            vals.str.count(_WORD_RUN).fillna(0).to_numpy(dtype=np.int64)
            >= min_line_words
        )
        no_js = ~vals.str.lower().str.contains("javascript", regex=False).to_numpy(
            dtype=bool
        )
        keep_line = ends_ok & word_ok & no_js

        n_lines = lines.str.len().fillna(0).to_numpy(dtype=np.int64)
        n_kept = np.bincount(rows[keep_line], minlength=n).astype(np.int64)
        keep_doc = doc_ok & (n_kept >= min_sentences)

        if label_only:
            t = t.append_column("n_lines", pa.array(n_lines))
            t = t.append_column("n_kept_lines", pa.array(n_kept))
            return t.append_column("c4_keep", pa.array(keep_doc))

        # rewrite: kept lines rejoined in order, only for surviving docs
        kept_vals = vals.to_numpy()[keep_line]
        kept_rows = rows[keep_line]
        joined = pd.Series(kept_vals).groupby(kept_rows).agg("\n".join)
        new_text = np.full(n, None, dtype=object)
        if len(joined):
            new_text[joined.index.to_numpy()] = joined.to_numpy()
        mask = pa.array(keep_doc)
        names = list(t.column_names)
        if out_col in names:
            idx = t.schema.get_field_index(out_col)
            t = t.set_column(idx, out_col, pa.array(new_text, type=pa.string()))
        else:
            t = t.append_column(out_col, pa.array(new_text, type=pa.string()))
        return t.filter(mask)

    return ds.map_batches(fn, batch_format="pyarrow")
