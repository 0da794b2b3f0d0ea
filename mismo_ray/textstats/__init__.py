"""Text analysis for training-data pipelines: language-ID, quality scoring,
token counting, fingerprinting.

Not part of the reference's operator surface (mismo stops at record-linkage
text features); required by the 100 TB training-data brief. All stateless
vectorized ``map_batches`` stages; the language-ID stage is a callable class
(actor pool) because it compiles token tables once per actor.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import ray.data

_WS = re.compile(r"\s+")

STOPWORDS_EN = frozenset(
    "the a an and or of to in is are was were be been it this that for on with as at by from".split()
)
_LANG_MARKERS = {
    "en": STOPWORDS_EN,
    "de": frozenset(
        "der die das und oder von zu im ist sind war für auf mit als bei aus"
        " ein eine nicht auch dass sich wird werden nach dem den des über"
        " noch wie aber wenn nur durch kann haben sein ihre".split()
    ),
    "es": frozenset(
        "el la los las y o de a en es son era para con como por un una que"
        " no se su del al lo más pero sus le ha este cuando muy sin sobre"
        " también hasta hay donde quien desde todo".split()
    ),
    "fr": frozenset(
        "le la les et ou de à en est sont était pour avec comme par un une"
        " que qui ne pas se plus dans ce il elle au aux du des sur son sa"
        " ses mais nous vous leur cette être fait".split()
    ),
    "it": frozenset(
        "il lo la i gli le e o di a in è sono era per con come da un una"
        " che non si suo del al più ma sue gli questo quando molto senza".split()
    ),
    "pt": frozenset(
        "o a os as e ou de em é são era para com como por um uma que não"
        " se seu do ao mais mas suas este quando muito sem também até".split()
    ),
    "nl": frozenset(
        "de het een en of van te in is zijn was voor met als bij uit dat"
        " niet ook wordt naar dan nog maar door kan hebben hun deze".split()
    ),
}

# script-range detection: non-Latin scripts identify the language family
# directly (codepoint ranges are public Unicode knowledge)
_SCRIPT_RANGES = [
    ("zh", 0x4E00, 0x9FFF),   # CJK unified ideographs
    ("ja", 0x3040, 0x30FF),   # hiragana + katakana (checked BEFORE zh)
    ("ko", 0xAC00, 0xD7AF),   # hangul syllables
    ("ru", 0x0400, 0x04FF),   # cyrillic
    ("ar", 0x0600, 0x06FF),   # arabic
    ("el", 0x0370, 0x03FF),   # greek
    ("he", 0x0590, 0x05FF),   # hebrew
    ("th", 0x0E00, 0x0E7F),   # thai
    ("hi", 0x0900, 0x097F),   # devanagari
]


def _detect_script(text: str, *, sample: int = 400, min_frac: float = 0.2):
    """(lang, fraction) when >= min_frac of sampled letters fall in one
    non-Latin script range; None otherwise. Japanese kana beats CJK-han
    (ja text mixes both; kana only appears in Japanese)."""
    counts = {lang: 0 for lang, _, _ in _SCRIPT_RANGES}
    n_letters = 0
    for ch in text[:sample]:
        cp = ord(ch)
        if cp < 0x80:
            if ch.isalpha():
                n_letters += 1
            continue
        n_letters += 1
        for lang, lo, hi in _SCRIPT_RANGES:
            if lo <= cp <= hi:
                counts[lang] += 1
                break
    if not n_letters:
        return None
    if counts["ja"] / n_letters >= 0.05:  # any kana -> Japanese
        return "ja", counts["ja"] / n_letters
    best = max(counts, key=counts.get)
    frac = counts[best] / n_letters
    return (best, frac) if frac >= min_frac else None


def norm_text(s: str | None) -> str | None:
    if s is None:
        return None
    return _WS.sub(" ", s.strip())


def fingerprint(s: str | None) -> str | None:
    """md5 of whitespace-normalized text — a deterministic document
    fingerprint (matches DuckDB ``md5(regexp_replace(trim(s),'\\s+',' ','g'))``)."""
    if s is None:
        return None
    return hashlib.md5(norm_text(s).encode("utf-8")).hexdigest()


def add_fingerprint(
    ds: ray.data.Dataset, column: str, *, result_name: str = "fingerprint"
) -> ray.data.Dataset:
    def fn(t: pa.Table) -> pa.Table:
        vals = [fingerprint(v) for v in t[column].to_pylist()]
        return t.append_column(result_name, pa.array(vals, type=pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow")


def add_token_stats(ds: ray.data.Dataset, column: str) -> ray.data.Dataset:
    """n_chars / n_tokens / n_uniq_tokens / avg_token_len / stopword_ratio
    (english list) per row — the quality-scoring basics.

    Vectorized (pandas split + explode + bincount; no per-row Python).
    Ratios are bit-identical to the scalar definition: integer counts are
    summed exactly (< 2^53) and divided once."""
    import pandas as pd

    stop_list = list(STOPWORDS_EN)

    def fn(t: pa.Table) -> pa.Table:
        n = len(t)
        texts = pd.Series(t[column].to_pylist(), dtype="object")
        n_chars = texts.str.len().fillna(0).to_numpy(dtype=np.int64)
        toks = texts.str.split()
        n_tokens = toks.str.len().fillna(0).to_numpy(dtype=np.int64)
        ex = toks.explode()
        ex = ex[ex.notna()]
        rows = ex.index.to_numpy(dtype=np.int64)
        tok_lens = ex.str.len().to_numpy(dtype=np.int64)
        sum_len = np.bincount(rows, weights=tok_lens, minlength=n)
        uniq = (
            pd.DataFrame({"r": rows, "t": ex.to_numpy()})
            .drop_duplicates()
            .groupby("r")
            .size()
        )
        n_uniq = np.zeros(n, dtype=np.int64)
        if len(uniq):
            n_uniq[uniq.index.to_numpy()] = uniq.to_numpy()
        stop_mask = ex.str.lower().isin(stop_list).to_numpy()
        n_stop = np.bincount(rows[stop_mask], minlength=n)
        denom = np.maximum(n_tokens, 1).astype(np.float64)
        has = n_tokens > 0
        avg_len = np.where(has, sum_len / denom, 0.0)
        stop_ratio = np.where(has, n_stop / denom, 0.0)
        t = t.append_column("n_chars", pa.array(n_chars))
        t = t.append_column("n_tokens", pa.array(n_tokens))
        t = t.append_column("n_uniq_tokens", pa.array(n_uniq))
        t = t.append_column("avg_token_len", pa.array(avg_len))
        return t.append_column("stopword_ratio", pa.array(stop_ratio))

    return ds.map_batches(fn, batch_format="pyarrow")


class LangId:
    """Marker-token language-ID heuristic — an actor-pool stage (token tables
    built once per actor in __init__; `map_batches(LangId, concurrency=N)`).

    ``model_loader`` is the real-model seam (reference _spacy.py loading
    semantics: load once per actor, in __init__): a zero-arg callable
    returning either a fastText-style object (``.predict(list[str]) ->
    (labels, probs)``, ``__label__xx`` labels) or a plain callable
    ``list[str] -> (langs, scores)``. When set, it replaces the heuristic;
    the bundled heuristic remains the no-dependency default (fasttext is
    not installed in this environment — inject it where it exists)."""

    def __init__(
        self,
        languages: dict[str, frozenset] | None = None,
        *,
        model_loader=None,
    ):
        import pandas as pd

        self._model = model_loader() if model_loader is not None else None
        self.markers = languages or _LANG_MARKERS
        # One-pass batch lookup structures (built once per actor): a unique
        # marker-token index plus a CSR (indptr, lang-id) table mapping each
        # marker token to every language that claims it. The batch path then
        # needs ONE hash-probe pass (get_indexer) instead of one isin() scan
        # per language — measured 11 isin passes = ~60% of the whole
        # crawl_clean map chain.
        lang_names = list(self.markers)
        toks = sorted({t for s in self.markers.values() for t in s})
        self._mtok_index = pd.Index(toks)
        counts = np.zeros(len(toks) + 1, dtype=np.int64)
        langs_flat: list[int] = []
        for i, t in enumerate(toks):
            for k, lang in enumerate(lang_names):
                if t in self.markers[lang]:
                    langs_flat.append(k)
                    counts[i + 1] += 1
        self._m_indptr = np.cumsum(counts)
        self._m_langs = np.asarray(langs_flat, dtype=np.int64)

    def classify(self, text: str | None) -> tuple[str, float]:
        if not text:
            return "und", 0.0
        # non-Latin scripts decide directly (codepoint-range evidence)
        hit = _detect_script(text)
        if hit is not None:
            return hit
        toks = [t.lower() for t in text.split()]
        if not toks:
            return "und", 0.0
        best_lang, best_score = "und", 0.0
        for lang, markers in self.markers.items():
            score = sum(1 for t in toks if t in markers) / len(toks)
            if score > best_score:
                best_lang, best_score = lang, score
        return best_lang, best_score

    def _classify_batch(self, texts) -> tuple[np.ndarray, np.ndarray]:
        """Vectorized classify over an object Series; element-identical to
        per-row ``classify`` (same tie-breaks: strict > over dict order,
        integer-count ratios divided once)."""
        import pandas as pd

        n = len(texts)
        langs = np.full(n, "und", dtype=object)
        scores = np.zeros(n, dtype=np.float64)
        filled = texts.fillna("")

        # --- script detection over the first 400 chars, one codepoint pass
        head = filled.str.slice(0, 400)
        lens = head.str.len().to_numpy(dtype=np.int64)
        cp = np.frombuffer(
            "".join(head.tolist()).encode("utf-32-le"), dtype=np.uint32
        )
        rows = np.repeat(np.arange(n, dtype=np.int64), lens)
        lower = cp | np.uint32(0x20)
        is_letter = (cp >= 0x80) | ((lower >= 0x61) & (lower <= 0x7A))
        n_letters = np.bincount(rows[is_letter], minlength=n).astype(np.int64)
        counts = np.zeros((len(_SCRIPT_RANGES), n), dtype=np.int64)
        for k, (_lang, lo, hi) in enumerate(_SCRIPT_RANGES):
            m = (cp >= lo) & (cp <= hi)
            counts[k] = np.bincount(rows[m], minlength=n)
        script_names = np.array([lang for lang, _, _ in _SCRIPT_RANGES])
        ja_row = next(
            k for k, (lang, _, _) in enumerate(_SCRIPT_RANGES) if lang == "ja"
        )
        letters = np.maximum(n_letters, 1).astype(np.float64)
        fracs = counts / letters
        best_k = counts.argmax(axis=0)  # first max wins, = dict-order tiebreak
        best_frac = fracs[best_k, np.arange(n)]
        ja_hit = (n_letters > 0) & (fracs[ja_row] >= 0.05)
        range_hit = (n_letters > 0) & ~ja_hit & (best_frac >= 0.2)
        langs[ja_hit] = "ja"
        scores[ja_hit] = fracs[ja_row][ja_hit]
        langs[range_hit] = script_names[best_k[range_hit]]
        scores[range_hit] = best_frac[range_hit]

        # --- marker-token scoring for the still-undecided rows
        todo = ~(ja_hit | range_hit) & (filled != "").to_numpy()
        if todo.any():
            idx = np.nonzero(todo)[0]
            toks = filled.iloc[idx].str.lower().str.split().reset_index(drop=True)
            tok_counts = toks.str.len().to_numpy(dtype=np.int64)
            ex = toks.explode()
            ex = ex[ex.notna()]
            erows = ex.index.to_numpy(dtype=np.int64)
            m = len(idx)
            lang_names = list(self.markers)
            # one hash-probe pass over all tokens, then a CSR scatter into
            # the (lang, row) count matrix — integer-identical to the
            # previous per-language isin() loop
            tid = self._mtok_index.get_indexer(ex.to_numpy())
            hit = tid >= 0
            th, rh = tid[hit], erows[hit]
            reps = self._m_indptr[th + 1] - self._m_indptr[th]
            total = int(reps.sum())
            row_rep = np.repeat(rh, reps)
            ends = np.cumsum(reps)
            offs = np.arange(total, dtype=np.int64) - np.repeat(ends - reps, reps)
            lang_rep = self._m_langs[np.repeat(self._m_indptr[th], reps) + offs]
            mat = np.bincount(
                lang_rep * m + row_rep, minlength=len(lang_names) * m
            ).reshape(len(lang_names), m)
            denom = np.maximum(tok_counts, 1).astype(np.float64)
            sc = mat / denom
            bk = sc.argmax(axis=0)
            bs = sc[bk, np.arange(m)]
            decided = (bs > 0) & (tok_counts > 0)
            sub_langs = np.full(m, "und", dtype=object)
            sub_langs[decided] = np.array(lang_names, dtype=object)[bk[decided]]
            langs[idx] = sub_langs
            scores[idx] = np.where(decided, bs, 0.0)
        return langs, scores

    def _model_batch(self, texts) -> tuple[np.ndarray, np.ndarray]:
        """Classify through an injected model (see class docstring)."""
        clean = ["" if t is None else str(t).replace("\n", " ") for t in texts]
        if hasattr(self._model, "predict"):  # fastText protocol
            labels, probs = self._model.predict(clean)
            langs = np.array(
                [
                    (ls[0].replace("__label__", "") if ls else "und")
                    for ls in labels
                ],
                dtype=object,
            )
            scores = np.array(
                [float(ps[0]) if len(ps) else 0.0 for ps in probs],
                dtype=np.float64,
            )
        else:  # plain callable
            langs, scores = self._model(clean)
            langs = np.asarray(langs, dtype=object)
            scores = np.asarray(scores, dtype=np.float64)
        empty = np.array([t == "" for t in clean], dtype=bool)
        langs[empty] = "und"
        scores[empty] = 0.0
        return langs, scores

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd

        col = "text" if "text" in batch.column_names else batch.column_names[0]
        texts = pd.Series(batch[col].to_pylist(), dtype="object")
        if self._model is not None:
            langs, scores = self._model_batch(texts)
        else:
            langs, scores = self._classify_batch(texts)
        batch = batch.append_column(
            "lang_pred", pa.array(langs, type=pa.string())
        )
        return batch.append_column("lang_score", pa.array(scores, type=pa.float64()))


def add_lang_id(
    ds: ray.data.Dataset,
    *,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 4096,
    model_loader=None,
) -> ray.data.Dataset:
    """Language-ID actor-pool stage.

    Default concurrency is a FIXED pool of CPUs - 2: Ray Data fuses
    adjacent task maps INTO an actor-pool operator, so the pool size IS
    the parallelism of the whole fused upstream chain. Autoscaling pools
    — even with a near-full minimum — were measured to run the 2M-doc
    crawl chain 1.4-2x slower than a fixed pool (the executor does not
    keep min actors busy from t=0; see BASELINE.md), while a fixed pool
    equal to ALL cluster CPUs stalls small sessions (task operators
    starve). CPUs - 2 fixed is the measured sweet spot at both ends."""
    from mismo_ray._pool import clamp_pool

    concurrency = clamp_pool(concurrency)
    kwargs = {}
    if model_loader is not None:  # real-model seam, loads once per actor
        kwargs["fn_constructor_kwargs"] = {"model_loader": model_loader}
    return ds.map_batches(
        LangId,
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
        **kwargs,
    )


def token_count_bpe_ish(s: str | None) -> int:
    """Cheap token-count proxy: whitespace words + long words split every 4
    chars (a BPE-ish upper bound, deterministic, no model needed)."""
    if not s:
        return 0
    n = 0
    for w in s.split():
        n += max(1, (len(w) + 3) // 4)
    return n


def add_token_count(
    ds: ray.data.Dataset, column: str, *, result_name: str = "n_bpe_tokens"
) -> ray.data.Dataset:
    def fn(t: pa.Table) -> pa.Table:
        vals = [token_count_bpe_ish(v) for v in t[column].to_pylist()]
        return t.append_column(result_name, pa.array(vals, type=pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow")


def rolling_hash_fingerprints(
    s: str | None, *, window: int = 16, keep_every: int = 8
) -> list[int] | None:
    """Rolling (Rabin-Karp style) hash fingerprints of character windows,
    keeping hashes == 0 mod keep_every (winnowing-lite) — document
    fingerprinting for near-dup sketching."""
    if s is None:
        return None
    if len(s) < window:
        return [hash_str64(s)] if s else []
    B = 1000003
    M = (1 << 61) - 1
    h = 0
    pw = pow(B, window - 1, M)
    out = []
    for i, ch in enumerate(s):
        if i >= window:
            h = (h - ord(s[i - window]) * pw) % M
        h = (h * B + ord(ch)) % M
        if i >= window - 1 and h % keep_every == 0:
            out.append(h)
    return out


def hash_str64(s: str) -> int:
    return int.from_bytes(
        hashlib.md5(s.encode("utf-8")).digest()[:8], "little", signed=True
    )


def add_repetition_stats(
    ds: ray.data.Dataset,
    column: str,
    *,
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 6, 7, 8, 9, 10),
) -> ray.data.Dataset:
    """Gopher-style repetition quality signals per document (Rae et al. 2021,
    arXiv:2112.11446 §A1.1; the dup/top n-gram filters every web-scale
    text pipeline runs between exact dedup and model scoring).

    Line metrics (lines = ``text.split("\\n")``, all lines counted):
    - ``n_lines`` / ``n_uniq_lines``; ``dup_line_frac`` = fraction of lines
      that are repeats of an earlier line = 1 - uniq/total;
    - ``dup_line_char_frac`` = chars in lines whose content occurs more than
      once (all occurrences) / chars in all lines.

    Word n-gram metrics (words = ``text.split()``; ``word_chars`` = summed
    word lengths, whitespace excluded):
    - ``top{n}gram_chars`` (n in ``top_ns``) = occurrences x chars of the
      most-repeated n-gram (max over n-grams of count * gram_chars), and
      ``top{n}gram_frac`` = that / word_chars;
    - ``dup{n}gram_chars`` (n in ``dup_ns``) = chars of words covered by at
      least one occurrence of any n-gram that occurs >= 2 times (occurrence
      word-spans are unioned so overlapping repeats are not double-counted),
      and ``dup{n}gram_frac`` = that / word_chars.

    Stateless vectorizable-per-doc map (Counter passes are O(words) per doc
    per n); one map_batches, no shuffle.
    """
    from collections import Counter

    def fn(t: pa.Table) -> pa.Table:
        texts = t[column].to_pylist()
        n = len(texts)
        out_i: dict[str, np.ndarray] = {
            name: np.zeros(n, dtype=np.int64)
            for name in (
                ["n_lines", "n_uniq_lines", "line_chars", "dup_line_chars",
                 "n_words", "word_chars"]
                + [f"top{k}gram_chars" for k in top_ns]
                + [f"dup{k}gram_chars" for k in dup_ns]
            )
        }
        for i, s in enumerate(texts):
            if s is None:
                continue
            lines = s.split("\n")
            lc = Counter(lines)
            out_i["n_lines"][i] = len(lines)
            out_i["n_uniq_lines"][i] = len(lc)
            out_i["line_chars"][i] = sum(len(x) for x in lines)
            out_i["dup_line_chars"][i] = sum(
                len(x) * c for x, c in lc.items() if c > 1
            )
            words = s.split()
            wlen = np.array([len(w) for w in words], dtype=np.int64)
            out_i["n_words"][i] = len(words)
            out_i["word_chars"][i] = int(wlen.sum())
            for k in top_ns:
                if len(words) < k:
                    continue
                grams = Counter(zip(*(words[j:] for j in range(k))))
                out_i[f"top{k}gram_chars"][i] = max(
                    c * sum(len(w) for w in g) for g, c in grams.items()
                )
            for k in dup_ns:
                if len(words) < k:
                    continue
                gl = list(zip(*(words[j:] for j in range(k))))
                gc = Counter(gl)
                covered = np.zeros(len(words), dtype=bool)
                for j, g in enumerate(gl):
                    if gc[g] >= 2:
                        covered[j : j + k] = True
                out_i[f"dup{k}gram_chars"][i] = int(wlen[covered].sum())
        for name, arr in out_i.items():
            t = t.append_column(name, pa.array(arr))
        with np.errstate(invalid="ignore", divide="ignore"):
            nl = out_i["n_lines"].astype(np.float64)
            t = t.append_column(
                "dup_line_frac",
                pa.array(np.where(nl > 0, 1.0 - out_i["n_uniq_lines"] / nl, 0.0)),
            )
            lch = out_i["line_chars"].astype(np.float64)
            t = t.append_column(
                "dup_line_char_frac",
                pa.array(np.where(lch > 0, out_i["dup_line_chars"] / lch, 0.0)),
            )
            wch = out_i["word_chars"].astype(np.float64)
            for kind, k in [("top", k) for k in top_ns] + [
                ("dup", k) for k in dup_ns
            ]:
                t = t.append_column(
                    f"{kind}{k}gram_frac",
                    pa.array(
                        np.where(wch > 0, out_i[f"{kind}{k}gram_chars"] / wch, 0.0)
                    ),
                )
        return t

    return ds.map_batches(fn, batch_format="pyarrow")


from mismo_ray.textstats._pii import (  # noqa: E402
    redact_pii,
    redact_pii_batch,
)


def add_compression_stats(
    ds: ray.data.Dataset,
    column: str = "text",
    *,
    level: int = 6,
) -> ray.data.Dataset:
    """zlib compression-size signal per row: ``deflate_bytes`` (compressed
    size, level ``level``) and ``utf8_bytes``. Low compressed/raw ratios
    flag repetitive or templated text; very high ones flag random noise —
    the CCNet/RedPajama-class quality feature complementing the token and
    repetition stats. Null text -> 0/0.

    Per-row zlib.compress is C code over the document bytes (the work IS
    per-document); one stateless map, no shuffle. Ratios are left to the
    caller (two exact ints divide reproducibly)."""
    import zlib

    def fn(t: pa.Table) -> pa.Table:
        comp = np.zeros(len(t), dtype=np.int64)
        raw = np.zeros(len(t), dtype=np.int64)
        for i, s in enumerate(t[column].to_pylist()):
            if s is None:
                continue
            b = s.encode("utf-8")
            raw[i] = len(b)
            comp[i] = len(zlib.compress(b, level))
        return t.append_column("utf8_bytes", pa.array(raw)).append_column(
            "deflate_bytes", pa.array(comp)
        )

    return ds.map_batches(fn, batch_format="pyarrow")


from mismo_ray.textstats._lm import (  # noqa: E402
    BigramLM,
    PerplexityScorer,
    add_perplexity,
    perplexity_buckets,
    train_bigram_lm,
)
from mismo_ray.textstats._gopher import (  # noqa: E402
    GOPHER_STOPWORDS,
    add_gopher_stats,
    gopher_quality_filter,
)
from mismo_ray.textstats._c4 import c4_clean  # noqa: E402
from mismo_ray.textstats._dsir import (  # noqa: E402
    DsirModel,
    add_dsir_weight,
    dsir_sample,
    fit_dsir,
    hashed_ngram_counts,
)
from mismo_ray.textstats._classifier import (  # noqa: E402
    TextClassifier,
    add_classifier_prob,
    evaluate_classifier,
    train_text_classifier,
)
from mismo_ray.textstats._bpe import (  # noqa: E402
    BpeTokenizer,
    add_bpe_tokens,
    train_bpe,
    word_counts,
)
from mismo_ray.textstats._chunk import chunk_documents  # noqa: E402
