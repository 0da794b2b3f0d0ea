"""Email cleaning, parsing, comparison
(reference: /root/reference/mismo/lib/email/_core.py).

Pinned semantics:
- ``clean_email``: lowercase, extract ``\\S+@\\S+``, empty -> null; with
  normalize=True also remove "." and "_" (:16-30);
- ``ParsedEmail``: split into full/user/domain, empty parts -> null (:33-70);
- ``match_level`` tiers: FULL_EXACT(0) > FULL_NEAR(1, damerau<=1) >
  USER_EXACT(2) > USER_NEAR(3) > ELSE(4); inputs given as raw strings are
  cleaned+normalized first (:73-133).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import pyarrow as pa

from mismo_ray.text import damerau_levenshtein

_EMAIL_RE = re.compile(r"(\S+@\S+)")

FULL_EXACT, FULL_NEAR, USER_EXACT, USER_NEAR, ELSE = 0, 1, 2, 3, 4
LEVELS = ["FULL_EXACT", "FULL_NEAR", "USER_EXACT", "USER_NEAR", "ELSE"]


def clean_email(email: str | None, *, normalize: bool = False) -> str | None:
    if email is None:
        return None
    m = _EMAIL_RE.search(email.lower())
    if m is None:
        return None
    out = m.group(1)
    if normalize:
        out = out.replace(".", "").replace("_", "")
    return out or None


@dataclass
class ParsedEmail:
    full: str | None
    user: str | None
    domain: str | None

    @classmethod
    def from_full(cls, full: str | None) -> "ParsedEmail":
        if full is None:
            return cls(None, None, None)
        parts = full.split("@")
        user = parts[0] if parts and parts[0] else None
        domain = parts[1] if len(parts) > 1 and parts[1] else None
        return cls(full or None, user, domain)

    def as_dict(self) -> dict:
        return {"full": self.full, "user": self.user, "domain": self.domain}


def match_level(e1, e2) -> int:
    """EmailMatchLevel of two addresses (str inputs are cleaned+normalized)."""
    if isinstance(e1, str) or e1 is None:
        e1 = ParsedEmail.from_full(clean_email(e1, normalize=True))
    if isinstance(e2, str) or e2 is None:
        e2 = ParsedEmail.from_full(clean_email(e2, normalize=True))
    if e1.full is not None and e1.full == e2.full:
        return FULL_EXACT
    d = damerau_levenshtein(e1.full, e2.full)
    if d is not None and d <= 1:
        return FULL_NEAR
    if e1.user is not None and e1.user == e2.user:
        return USER_EXACT
    d = damerau_levenshtein(e1.user, e2.user)
    if d is not None and d <= 1:
        return USER_NEAR
    return ELSE


def clean_email_array(arr, *, normalize: bool = False) -> pa.Array:
    vals = arr.to_pylist() if isinstance(arr, (pa.Array, pa.ChunkedArray)) else arr
    return pa.array(
        [clean_email(v, normalize=normalize) for v in vals], type=pa.string()
    )


def match_level_array(a, b) -> pa.Array:
    al = a.to_pylist() if isinstance(a, (pa.Array, pa.ChunkedArray)) else list(a)
    bl = b.to_pylist() if isinstance(b, (pa.Array, pa.ChunkedArray)) else list(b)
    return pa.array([match_level(x, y) for x, y in zip(al, bl)], type=pa.int64())
