"""Gopher quality rules (Rae et al. 2021, "Scaling Language Models:
Methods, Analysis & Insights from Training Gopher", Appendix A1.1) — the
canonical webtext document-quality filter.

Every signal is an INTEGER count and every rule an integer comparison
(ratios applied by cross-multiplication), so the filter is bit-exact and
fully SQL-oracle-able — the same trick ``add_repetition_stats`` uses.

Signals per document (``add_gopher_stats``):

- ``n_words`` / ``word_chars`` — whitespace tokens and their total length
- ``n_alpha_words`` — words containing at least one ASCII letter
- ``n_stop8`` — how many DISTINCT words of the Gopher 8-word English list
  (the, be, to, of, and, that, have, with) appear as exact lowercase tokens
- ``n_hash`` / ``n_ellipsis`` — '#' characters and non-overlapping '...'
  occurrences (the "symbol" counts)
- ``n_lines`` / ``n_bullet_lines`` / ``n_ellipsis_end_lines`` — newline
  lines, lines starting with a bullet ('•' or '- '), lines ending in
  '...' or '…'

Rules (``gopher_quality_filter`` keeps a doc iff ALL hold; each threshold
is a keyword so pipelines can loosen/tighten):

- ``min_words <= n_words <= max_words``            (50 .. 100_000)
- ``min_mean_word_len <= word_chars/n_words <= max_mean_word_len`` (3..10)
- ``(n_hash + n_ellipsis) / n_words <= max_symbol_ratio``        (0.1)
- ``n_bullet_lines / n_lines <= max_bullet_frac``                (0.9)
- ``n_ellipsis_end_lines / n_lines <= max_ellipsis_line_frac``   (0.3)
- ``n_alpha_words / n_words >= min_alpha_word_frac``             (0.8)
- ``n_stop8 >= min_stop_words``                                  (2)

One stateless ``map_batches`` (pandas split/explode/bincount — no per-row
Python); nothing shuffles.
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

# a word = a run of non-(ASCII-whitespace); matches RE2 \s (no \v, no
# unicode spaces) so python and the SQL oracle tokenize identically
_WORD_RUN = r"[^ \t\n\r\f]+"


def add_gopher_stats(
    ds: ray.data.Dataset, column: str = "text"
) -> ray.data.Dataset:
    """Append the integer Gopher quality signals (see module docstring)."""

    def fn(t: pa.Table) -> pa.Table:
        n = len(t)
        texts = pd.Series(t[column].to_pylist(), dtype="object")
        filled = texts.fillna("")

        # --- word-level. Tokens are runs of non-(ASCII-whitespace): the
        # explicit class pins parity with the SQL oracle's RE2 '\s+' split
        # (python str.split() is unicode-aware — NBSP in crawl text would
        # silently diverge); findall never emits empty tokens.
        toks = filled.str.findall(_WORD_RUN)
        ex = toks.explode()
        ex = ex[ex.notna()]
        rows = ex.index.to_numpy(dtype=np.int64)
        n_words = toks.str.len().fillna(0).to_numpy(dtype=np.int64)
        tok_lens = ex.str.len().to_numpy(dtype=np.int64)
        word_chars = np.bincount(rows, weights=tok_lens, minlength=n).astype(
            np.int64
        )
        alpha = ex.str.contains("[A-Za-z]", regex=True).to_numpy(dtype=bool)
        n_alpha = np.bincount(rows[alpha], minlength=n).astype(np.int64)
        low = ex.str.lower()
        stop_mask = low.isin(GOPHER_STOPWORDS).to_numpy()
        # DISTINCT stopwords per row
        if stop_mask.any():
            sdf = pd.DataFrame(
                {"r": rows[stop_mask], "w": low.to_numpy()[stop_mask]}
            ).drop_duplicates()
            scount = sdf.groupby("r").size()
            n_stop8 = np.zeros(n, dtype=np.int64)
            n_stop8[scount.index.to_numpy()] = scount.to_numpy()
        else:
            n_stop8 = np.zeros(n, dtype=np.int64)

        # --- character-level symbols
        n_hash = (
            filled.str.len() - filled.str.replace("#", "", regex=False).str.len()
        ).to_numpy(dtype=np.int64)
        # non-overlapping '...' occurrences == (len - len(replace))/3
        n_ellipsis = (
            (
                filled.str.len()
                - filled.str.replace("...", "", regex=False).str.len()
            )
            // 3
        ).to_numpy(dtype=np.int64)

        # --- line-level
        lines = filled.str.split("\n")
        lx = lines.explode()
        lrows = lx.index.to_numpy(dtype=np.int64)
        n_lines = lines.str.len().fillna(0).to_numpy(dtype=np.int64)
        bullet = (
            lx.str.startswith("•") | lx.str.startswith("- ")
        ).fillna(False).to_numpy(dtype=bool)
        ell_end = (
            lx.str.endswith("...") | lx.str.endswith("…")
        ).fillna(False).to_numpy(dtype=bool)
        n_bullet = np.bincount(lrows[bullet], minlength=n).astype(np.int64)
        n_ell_end = np.bincount(lrows[ell_end], minlength=n).astype(np.int64)

        for name, arr in (
            ("n_words", n_words),
            ("word_chars", word_chars),
            ("n_alpha_words", n_alpha),
            ("n_stop8", n_stop8),
            ("n_hash", n_hash),
            ("n_ellipsis", n_ellipsis),
            ("n_lines", n_lines),
            ("n_bullet_lines", n_bullet),
            ("n_ellipsis_end_lines", n_ell_end),
        ):
            t = t.append_column(name, pa.array(arr))
        return t

    return ds.map_batches(fn, batch_format="pyarrow")


def _ratio(x: float) -> Fraction:
    """Exact rational from the (short-decimal) threshold floats."""
    return Fraction(x).limit_denominator(10**6)


def gopher_quality_filter(
    ds: ray.data.Dataset,
    column: str = "text",
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stop_words: int = 2,
    label_only: bool = False,
) -> ray.data.Dataset:
    """Apply the Gopher rules; keep passing docs (or, with
    ``label_only=True``, append a ``gopher_keep`` boolean instead of
    filtering). Ratio rules evaluate by integer cross-multiplication —
    bit-exact, no float boundaries."""
    stats = add_gopher_stats(ds, column)
    r_minlen = _ratio(min_mean_word_len)
    r_maxlen = _ratio(max_mean_word_len)
    r_sym = _ratio(max_symbol_ratio)
    r_bul = _ratio(max_bullet_frac)
    r_ell = _ratio(max_ellipsis_line_frac)
    r_alpha = _ratio(min_alpha_word_frac)

    def fn(t: pa.Table) -> pa.Table:
        g = {
            name: np.asarray(t[name], dtype=np.int64)
            for name in (
                "n_words",
                "word_chars",
                "n_alpha_words",
                "n_stop8",
                "n_hash",
                "n_ellipsis",
                "n_lines",
                "n_bullet_lines",
                "n_ellipsis_end_lines",
            )
        }
        w, wc = g["n_words"], g["word_chars"]
        ln = g["n_lines"]
        keep = (
            (w >= min_words)
            & (w <= max_words)
            & (wc * r_minlen.denominator >= w * r_minlen.numerator)
            & (wc * r_maxlen.denominator <= w * r_maxlen.numerator)
            & (
                (g["n_hash"] + g["n_ellipsis"]) * r_sym.denominator
                <= w * r_sym.numerator
            )
            & (g["n_bullet_lines"] * r_bul.denominator <= ln * r_bul.numerator)
            & (
                g["n_ellipsis_end_lines"] * r_ell.denominator
                <= ln * r_ell.numerator
            )
            & (g["n_alpha_words"] * r_alpha.denominator >= w * r_alpha.numerator)
            & (g["n_stop8"] >= min_stop_words)
        )
        if label_only:
            return t.append_column("gopher_keep", pa.array(keep))
        return t.filter(pa.array(keep))

    return stats.map_batches(fn, batch_format="pyarrow")
