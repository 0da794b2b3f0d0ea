"""Name normalization, tokenization, nickname-aware comparison, blocking
(reference: /root/reference/mismo/lib/name/).

Pinned semantics:
- ``normalize_name_field``: uppercase, strip accents, non-alphanumeric -> " ",
  collapse whitespace (_clean.py:11-29); ``normalize_name`` applies it to
  every field of the struct {prefix, given, middle, surname, suffix,
  nickname} (_clean.py:43-68); ``name_tokens`` flattens all fields to a
  (unique) token array (_clean.py:71-79).
- ``match_level`` tiers (_compare.py:54-107): NULL(0, a given/surname missing)
  > EXACT(1, whole struct equal) > GIVEN_SURNAME(2) > NICKNAMES(3, given
  names are aliases + surnames equal) > TYPO(5, given equal forgiving typos:
  damerau<=1, or <=2 when len>5, or substring>=3 chars) > INITIALS(4, first
  letter matches and one side is a single letter, surnames equal) > ELSE(6).
  NOTE the evaluation ORDER is NICKNAMES, TYPO, INITIALS (the reference
  checks TYPO before INITIALS even though INITIALS has the smaller enum
  value — _compare.py:74-107); we replicate that order.
- nicknames: a bundled ~550-pair English nickname dataset
  (lib/_nickname_data.py) mirrors the reference's bundled lookup
  (_nicknames.py:85-95); a user-supplied pairs iterable overrides it
  (``are_aliases(..., aliases=...)``).
"""

from __future__ import annotations

import re
from collections.abc import Iterable

import pyarrow as pa

from mismo_ray.text import damerau_levenshtein, strip_accents, tokenize

NAME_FIELDS = ["prefix", "given", "middle", "surname", "suffix", "nickname"]

NULL, EXACT, GIVEN_SURNAME, NICKNAMES, INITIALS, TYPO, ELSE = 0, 1, 2, 3, 4, 5, 6
LEVELS = ["NULL", "EXACT", "GIVEN_SURNAME", "NICKNAMES", "INITIALS", "TYPO", "ELSE"]

_NON_ALNUM = re.compile(r"[^A-Z0-9]+|\s+")

# Bundled nickname dataset (mismo_ray/lib/_nickname_data.py; ~300 canonical
# names / 550+ pairs — the reference loads the `nicknames` package the same
# way, _nicknames.py:85-95). Pass your own pairs for other locales.
from mismo_ray.lib._nickname_data import nickname_pairs as _bundled_pairs

SEED_NICKNAMES: frozenset[tuple[str, str]] = frozenset(
    (a.upper(), b.upper()) for a, b in _bundled_pairs()
)


def _alias_lookup(aliases: Iterable[tuple[str, str]] | None) -> frozenset:
    if aliases is None:
        return SEED_NICKNAMES
    return frozenset((a.upper(), b.upper()) for a, b in aliases)


def normalize_name_field(field: str | None) -> str | None:
    if field is None:
        return None
    out = strip_accents(field.upper())
    out = _NON_ALNUM.sub(" ", out)
    return out.strip()


def normalize_name(name: dict | None) -> dict | None:
    if name is None:
        return None
    return {f: normalize_name_field(name.get(f)) for f in NAME_FIELDS}


def name_tokens(name: dict | None, *, unique: bool = True) -> list[str] | None:
    if name is None:
        return None
    toks: list[str] = []
    for f in NAME_FIELDS:
        v = name.get(f)
        if v:
            toks.extend(t for t in tokenize(v.strip()) if t)
    if unique:
        seen: list[str] = []
        for t in toks:
            if t not in seen:
                seen.append(t)
        return seen
    return toks


def are_aliases(
    a: str | None, b: str | None, aliases: Iterable[tuple[str, str]] | None = None
) -> bool:
    """True when the two names are equal or a known nickname/alias pair
    (reference _nicknames.py:20-80; symmetric)."""
    if a is None or b is None:
        return False
    au, bu = a.upper(), b.upper()
    if au == bu:
        return True
    table = _alias_lookup(aliases)
    return (au, bu) in table or (bu, au) in table


def is_nickname_for(
    nick: str | None, canonical: str | None,
    aliases: Iterable[tuple[str, str]] | None = None,
) -> bool:
    if nick is None or canonical is None:
        return False
    nu, cu = nick.upper().strip(), canonical.upper().strip()
    # same name counts (reference _nicknames.py:67-75)
    return nu == cu or (cu, nu) in _alias_lookup(aliases)


def initials_equal(left: str, right: str) -> bool:
    """First letter matches, and at least one is a single letter
    (_compare.py:23-31)."""
    if not left or not right:
        return False
    return left[0] == right[0] and (len(left) == 1 or len(right) == 1)


def _substring_match(left: str, right: str, *, min_len: int = 3) -> bool:
    return (right in left and len(right) >= min_len) or (
        left in right and len(left) >= min_len
    )


def equal_forgiving_typo(left: str | None, right: str | None) -> bool:
    """damerau<=1, or <=2 for strings longer than 5, or substring>=3 chars
    (_compare.py:33-51)."""
    if left is None or right is None:
        return False
    d = damerau_levenshtein(left, right)
    return (
        d <= 1
        or (d <= 2 and len(left) > 5)
        or _substring_match(left, right)
    )


def match_level(
    le: dict | None, ri: dict | None,
    aliases: Iterable[tuple[str, str]] | None = None,
) -> int:
    """NameMatchLevel of two normalized name structs (_compare.py:74-107)."""
    def missing(n):
        return (
            n is None or not n.get("given") or not n.get("surname")
        )

    if missing(le) or missing(ri):
        return NULL
    if all((le.get(f) or None) == (ri.get(f) or None) for f in NAME_FIELDS):
        return EXACT
    same_surname = le["surname"] == ri["surname"]
    if le["given"] == ri["given"] and same_surname:
        return GIVEN_SURNAME
    if are_aliases(le["given"], ri["given"], aliases) and same_surname:
        return NICKNAMES
    # reference order: TYPO is checked before INITIALS (_compare.py:90-107)
    if equal_forgiving_typo(le["given"], ri["given"]) and same_surname:
        return TYPO
    if initials_equal(le["given"], ri["given"]) and same_surname:
        return INITIALS
    return ELSE


def match_level_array(a, b, aliases=None) -> pa.Array:
    al = a.to_pylist() if isinstance(a, (pa.Array, pa.ChunkedArray)) else list(a)
    bl = b.to_pylist() if isinstance(b, (pa.Array, pa.ChunkedArray)) else list(b)
    return pa.array(
        [match_level(x, y, aliases) for x, y in zip(al, bl)], type=pa.int64()
    )


class NameBlocker:
    """Cross-field name-part equality blocking (reference
    mismo/lib/name/_blocker.py:12-104): one KeyLinker per (left_part,
    right_part) pair of normalized name fields, unioned with overlap removal."""

    def __init__(
        self,
        *,
        column: str = "name",
        parts: Iterable[str] = ("given", "surname"),
        column_left: str | None = None,
        column_right: str | None = None,
    ):
        self.column_left = column_left or column
        self.column_right = column_right or column
        self.parts = list(parts)

    def __call__(self, left, right):
        from mismo_ray.keys import KeySpec
        from mismo_ray.linker import KeyLinker, OrLinker

        def part_fn(col: str, part: str):
            def fn(batch: pa.Table) -> pa.Array:
                vals = batch[col].to_pylist()
                return pa.array(
                    [
                        None
                        if v is None
                        else (normalize_name_field(v.get(part)) or None)
                        for v in vals
                    ],
                    type=pa.string(),
                )

            fn.__name__ = f"{col}.{part}"
            return fn

        linkers = [
            KeyLinker(
                [
                    KeySpec(
                        f"{pl}~{pr}",
                        part_fn(self.column_left, pl),
                        part_fn(self.column_right, pr),
                    )
                ]
            )
            for pl in self.parts
            for pr in self.parts
        ]
        return OrLinker(linkers)(left, right)
