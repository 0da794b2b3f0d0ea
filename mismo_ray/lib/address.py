"""US street-address parsing and featurization.

Reference: /root/reference/mismo/lib/geo/_regex_parse.py (686-LoC regex street
parser: directionals, street-type normalization) and
mismo/lib/geo/_address.py:38-112 (normalize fields, featurize street1 into
street_name / street_number / is_pobox + trigrams). This is a compact
re-implementation of the same semantics: uppercase/punctuation-fold, PO-box
detection, (number, pre-directional, name, normalized street type,
post-directional, unit) extraction. The libpostal/spaCy parsers the reference
optionally shells out to need native libraries absent here (stub pattern in
mismo_ray.multimodal).
"""

from __future__ import annotations

import re

import pyarrow as pa

from mismo_ray.text import ngrams

ADDRESS_FIELDS = ["street1", "street2", "city", "state", "postal_code", "country"]

_DIRECTIONALS = {
    "N": "N", "NORTH": "N", "S": "S", "SOUTH": "S", "E": "E", "EAST": "E",
    "W": "W", "WEST": "W", "NE": "NE", "NORTHEAST": "NE", "NW": "NW",
    "NORTHWEST": "NW", "SE": "SE", "SOUTHEAST": "SE", "SW": "SW",
    "SOUTHWEST": "SW",
}
_STREET_TYPES = {
    "ST": "ST", "STREET": "ST", "STR": "ST",
    "AVE": "AVE", "AV": "AVE", "AVENUE": "AVE",
    "RD": "RD", "ROAD": "RD",
    "DR": "DR", "DRIVE": "DR", "DRV": "DR",
    "BLVD": "BLVD", "BOULEVARD": "BLVD", "BLV": "BLVD",
    "LN": "LN", "LANE": "LN",
    "CT": "CT", "COURT": "CT",
    "PL": "PL", "PLACE": "PL",
    "WAY": "WAY", "WY": "WAY",
    "CIR": "CIR", "CIRCLE": "CIR",
    "TER": "TER", "TERRACE": "TER", "TERR": "TER",
    "HWY": "HWY", "HIGHWAY": "HWY",
    "PKWY": "PKWY", "PARKWAY": "PKWY", "PKY": "PKWY",
    "TRL": "TRL", "TRAIL": "TRL",
    "SQ": "SQ", "SQUARE": "SQ",
    "LOOP": "LOOP",
}
_UNIT_WORDS = {"APT", "APARTMENT", "STE", "SUITE", "UNIT", "RM", "ROOM", "FL", "FLOOR", "#"}
_POBOX_RE = re.compile(r"^\s*P\.?\s*O\.?\s*BOX\s+(\w+)\s*$", re.IGNORECASE)
_NON_ALNUM = re.compile(r"[^A-Z0-9#]+")


def norm_address_field(s: str | None) -> str | None:
    """Uppercase, de-punctuate, collapse whitespace
    (reference _address.py:38-57)."""
    if s is None:
        return None
    out = _NON_ALNUM.sub(" ", s.upper())
    return re.sub(r"\s+", " ", out).strip()


def norm_address(addr: dict | None) -> dict | None:
    if addr is None:
        return None
    return {f: norm_address_field(addr.get(f)) for f in ADDRESS_FIELDS}


def parse_street1(street1: str | None) -> dict | None:
    """Parse a street1 line into components.

    Returns {street_number, pre_directional, street_name, street_type,
    post_directional, unit, is_pobox}; unrecognized tokens fold into
    street_name (the reference's parser behaves the same for its
    unmatched tail).
    """
    if street1 is None:
        return None
    empty = {
        "street_number": None,
        "pre_directional": None,
        "street_name": None,
        "street_type": None,
        "post_directional": None,
        "unit": None,
        "is_pobox": False,
    }
    m = _POBOX_RE.match(street1)
    if m:
        return {**empty, "street_number": m.group(1).upper(), "is_pobox": True}
    s = norm_address_field(street1)
    if not s:
        return {**empty} if street1 is not None else None
    toks = s.split()
    out = dict(empty)
    # unit tail: "... APT 4B" / "... # 12"
    for i, t in enumerate(toks):
        if t in _UNIT_WORDS and i > 0:
            out["unit"] = " ".join(toks[i + 1 :]) or None
            toks = toks[:i]
            break
    if toks and re.match(r"^\d+[A-Z]?$", toks[0]):
        out["street_number"] = toks[0]
        toks = toks[1:]
    if len(toks) > 1 and toks[0] in _DIRECTIONALS:
        out["pre_directional"] = _DIRECTIONALS[toks[0]]
        toks = toks[1:]
    if toks and toks[-1] in _DIRECTIONALS and len(toks) > 1:
        out["post_directional"] = _DIRECTIONALS[toks[-1]]
        toks = toks[:-1]
    if toks and toks[-1] in _STREET_TYPES and len(toks) > 1:
        out["street_type"] = _STREET_TYPES[toks[-1]]
        toks = toks[:-1]
    out["street_name"] = " ".join(toks) or None
    return out


def featurize_address(addr: dict | None) -> dict | None:
    """Normalized address + parsed street1 + street trigrams for inverted-
    index blocking (reference _address.py:60-112)."""
    if addr is None:
        return None
    normed = norm_address(addr)
    parsed = parse_street1(normed.get("street1")) or {}
    name = parsed.get("street_name")
    return {
        **normed,
        "street_name": name,
        "street_number": parsed.get("street_number"),
        "street_type": parsed.get("street_type"),
        "is_pobox": bool(parsed.get("is_pobox")),
        "street_trigrams": ngrams(name, 3) if name else [],
    }


def parse_street1_array(arr) -> pa.Array:
    vals = arr.to_pylist() if isinstance(arr, (pa.Array, pa.ChunkedArray)) else arr
    out = [parse_street1(v) for v in vals]
    return pa.array(
        out,
        type=pa.struct(
            [
                ("street_number", pa.string()),
                ("pre_directional", pa.string()),
                ("street_name", pa.string()),
                ("street_type", pa.string()),
                ("post_directional", pa.string()),
                ("unit", pa.string()),
                ("is_pobox", pa.bool_()),
            ]
        ),
    )


# address match levels (reference mismo/lib/geo/_address.py:115-202)
STREET1_AND_CITY_OR_POSTAL = 0
POSSIBLE_TYPO = 1
SAME_REGION = 2
WITHIN_100KM = 3
SAME_STATE = 4
ELSE = 5
LEVELS = [
    "STREET1_AND_CITY_OR_POSTAL",
    "POSSIBLE_TYPO",
    "SAME_REGION",
    "WITHIN_100KM",
    "SAME_STATE",
    "ELSE",
]


def match_level(a: dict | None, b: dict | None, *, coords=None) -> int:
    """Tiered address agreement on normalized addresses. ``coords`` optionally
    supplies ((lat1, lon1), (lat2, lon2)) for the WITHIN_100KM tier."""
    from mismo_ray.text import damerau_levenshtein

    if a is None or b is None:
        return ELSE

    def eq(f):
        return a.get(f) is not None and a.get(f) == b.get(f)

    if eq("street1") and (eq("city") or eq("postal_code")):
        return STREET1_AND_CITY_OR_POSTAL
    if (
        a.get("street1")
        and b.get("street1")
        and damerau_levenshtein(a["street1"], b["street1"]) <= 2
        and (eq("city") or eq("postal_code"))
    ):
        return POSSIBLE_TYPO
    if eq("city") or eq("postal_code"):
        return SAME_REGION
    if coords is not None:
        from mismo_ray.lib.geo import distance_km

        (la1, lo1), (la2, lo2) = coords
        if None not in (la1, lo1, la2, lo2) and distance_km(la1, lo1, la2, lo2) <= 100:
            return WITHIN_100KM
    if eq("state"):
        return SAME_STATE
    return ELSE
