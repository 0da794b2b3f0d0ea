"""Pure-python full-address tagger + near-dupe fingerprints.

Re-implements the SEMANTICS of the reference's libpostal wrappers
(/root/reference/mismo/lib/geo/_postal.py:26-76 ``postal_parse_address``,
:79-172 ``postal_fingerprint_address``) without the native library (absent in
this environment): a usaddress-style rule tagger over comma segments + token
patterns, and the libpostal v1.1 near-dupe key shapes
(``act|<road variant>|<house#>|<city>`` / ``apc|<road variant>|<house#>|<postcode>``,
where road variants are the suffix-canonicalized street and the
whitespace-collapsed suffix-free root — "Sea Grape Ln" -> "sea grape lane" /
"seagrape").

Output schema matches the reference exactly:
struct(street1, street2, city, state, postal_code, country).

Stateless + module-level compiled patterns, so the Dataset stage can run as a
plain ``map_batches`` function or inside an actor pool (``AddressTagger``)
when a heavier model replaces the rules.
"""

from __future__ import annotations

import re

import pyarrow as pa

from mismo_ray.lib.address import norm_address_field, parse_street1

ADDRESS_TYPE = pa.struct(
    [
        ("street1", pa.string()),
        ("street2", pa.string()),
        ("city", pa.string()),
        ("state", pa.string()),
        ("postal_code", pa.string()),
        ("country", pa.string()),
    ]
)

# USPS state abbreviations + full names (public reference data)
_STATE_ABBREVS = {
    "AL", "AK", "AZ", "AR", "CA", "CO", "CT", "DE", "FL", "GA", "HI", "ID",
    "IL", "IN", "IA", "KS", "KY", "LA", "ME", "MD", "MA", "MI", "MN", "MS",
    "MO", "MT", "NE", "NV", "NH", "NJ", "NM", "NY", "NC", "ND", "OH", "OK",
    "OR", "PA", "RI", "SC", "SD", "TN", "TX", "UT", "VT", "VA", "WA", "WV",
    "WI", "WY", "DC", "PR",
}
_STATE_NAMES = {
    "ALABAMA": "AL", "ALASKA": "AK", "ARIZONA": "AZ", "ARKANSAS": "AR",
    "CALIFORNIA": "CA", "COLORADO": "CO", "CONNECTICUT": "CT",
    "DELAWARE": "DE", "FLORIDA": "FL", "GEORGIA": "GA", "HAWAII": "HI",
    "IDAHO": "ID", "ILLINOIS": "IL", "INDIANA": "IN", "IOWA": "IA",
    "KANSAS": "KS", "KENTUCKY": "KY", "LOUISIANA": "LA", "MAINE": "ME",
    "MARYLAND": "MD", "MASSACHUSETTS": "MA", "MICHIGAN": "MI",
    "MINNESOTA": "MN", "MISSISSIPPI": "MS", "MISSOURI": "MO", "MONTANA": "MT",
    "NEBRASKA": "NE", "NEVADA": "NV", "NEW HAMPSHIRE": "NH",
    "NEW JERSEY": "NJ", "NEW MEXICO": "NM", "NEW YORK": "NY",
    "NORTH CAROLINA": "NC", "NORTH DAKOTA": "ND", "OHIO": "OH",
    "OKLAHOMA": "OK", "OREGON": "OR", "PENNSYLVANIA": "PA",
    "RHODE ISLAND": "RI", "SOUTH CAROLINA": "SC", "SOUTH DAKOTA": "SD",
    "TENNESSEE": "TN", "TEXAS": "TX", "UTAH": "UT", "VERMONT": "VT",
    "VIRGINIA": "VA", "WASHINGTON": "WA", "WEST VIRGINIA": "WV",
    "WISCONSIN": "WI", "WYOMING": "WY",
}
_COUNTRIES = {
    "US": "US", "USA": "US", "UNITED STATES": "US",
    "UNITED STATES OF AMERICA": "US",
    "CANADA": "CA", "MEXICO": "MX",
    "UNITED KINGDOM": "GB", "UK": "GB", "GREAT BRITAIN": "GB",
    "GERMANY": "DE", "FRANCE": "FR",
}
_ZIP_RE = re.compile(r"^\d{5}(-\d{4})?$")
_UNIT_LEAD_RE = re.compile(
    r"^(APT|APARTMENT|STE|SUITE|UNIT|RM|ROOM|FL|FLOOR|#|PMB|BLDG|BUILDING)\b"
)
_LEADING_DIGIT_RE = re.compile(r"^[0-9]")

# street-suffix canonicalization for fingerprint road variants (libpostal
# expands abbreviations; this is the USPS C1 common subset)
_SUFFIX_CANON = {
    "st": "street", "street": "street", "str": "street",
    "ave": "avenue", "av": "avenue", "avenue": "avenue",
    "rd": "road", "road": "road",
    "dr": "drive", "drive": "drive", "drv": "drive",
    "blvd": "boulevard", "boulevard": "boulevard",
    "ln": "lane", "lane": "lane",
    "ct": "court", "court": "court",
    "pl": "place", "place": "place",
    "way": "way", "wy": "way",
    "cir": "circle", "circle": "circle",
    "ter": "terrace", "terr": "terrace", "terrace": "terrace",
    "hwy": "highway", "highway": "highway",
    "pkwy": "parkway", "pky": "parkway", "parkway": "parkway",
    "trl": "trail", "trail": "trail",
    "sq": "square", "square": "square",
    "loop": "loop",
}


def _match_state(toks: list[str]) -> tuple[str | None, int]:
    """State at the END of toks -> (abbrev, tokens consumed)."""
    if len(toks) >= 2:
        two = " ".join(toks[-2:])
        if two in _STATE_NAMES:
            return _STATE_NAMES[two], 2
    if toks:
        one = toks[-1]
        if one in _STATE_ABBREVS:
            return one, 1
        if one in _STATE_NAMES:
            return _STATE_NAMES[one], 1
    return None, 0


def _match_country(seg: str) -> str | None:
    return _COUNTRIES.get(seg)


def tag_address(s: str | None) -> dict | None:
    """Tag a full single-string address into the reference's 6-field struct.

    Rule order mirrors how libpostal's mapping is consumed by the reference
    (house_number+road -> street1, unit -> street2): comma segments first;
    from the tail: country, then (state, zip) — possibly sharing the city's
    segment — then city; leading segment(s) are street1 (+unit -> street2).
    """
    if s is None:
        return None
    out = {f: None for f in ("street1", "street2", "city", "state", "postal_code", "country")}
    segments = [norm_address_field(x) for x in s.split(",")]
    segments = [x for x in segments if x]
    if not segments:
        return out

    # country
    if len(segments) > 1:
        c = _match_country(segments[-1])
        if c is not None:
            out["country"] = c
            segments = segments[:-1]

    # state + zip (+ possibly city sharing the last segment)
    if segments:
        toks = segments[-1].split()
        changed = False
        if toks and _ZIP_RE.match(toks[-1]):
            out["postal_code"] = toks[-1]
            toks = toks[:-1]
            changed = True
        st, used = _match_state(toks)
        if st is not None:
            out["state"] = st
            toks = toks[: len(toks) - used]
            changed = True
        if changed:
            if toks:
                out["city"] = " ".join(toks)
            segments = segments[:-1]

    # city (its own segment, when not folded into the state/zip segment)
    if out["city"] is None and len(segments) > 1:
        out["city"] = segments[-1]
        segments = segments[:-1]

    # street1 + street2 from what remains
    if segments:
        out["street1"] = segments[0]
        for seg in segments[1:]:
            if _UNIT_LEAD_RE.match(seg) and out["street2"] is None:
                out["street2"] = seg
            else:
                out["street1"] = f"{out['street1']} {seg}"
        # unit embedded in street1 ("123 MAIN ST APT 4") -> street2
        if out["street2"] is None:
            parsed = parse_street1(out["street1"]) or {}
            if parsed.get("unit"):
                unit = parsed["unit"]
                head = re.sub(rf"\s+\S+\s+{re.escape(unit)}$", "", out["street1"])
                # keep the unit word that introduced it
                m = re.search(
                    r"\b(APT|APARTMENT|STE|SUITE|UNIT|RM|ROOM|FL|FLOOR|#|PMB)\s+"
                    + re.escape(unit)
                    + r"$",
                    out["street1"],
                )
                if m:
                    out["street2"] = m.group(0)
                    out["street1"] = out["street1"][: m.start()].strip()
                else:
                    out["street1"] = head
    return out


def road_variants(road: str) -> list[str]:
    """The fingerprint road variants (libpostal near-dupe expansion subset):
    suffix-canonicalized full name + whitespace-collapsed suffix-free root
    ("Sea Grape Ln" -> ["sea grape lane", "seagrape"])."""
    toks = road.lower().split()
    if not toks:
        return []
    if toks[-1] in _SUFFIX_CANON and len(toks) > 1:
        full = " ".join(toks[:-1] + [_SUFFIX_CANON[toks[-1]]])
        root = "".join(toks[:-1])
    else:
        full = " ".join(toks)
        root = "".join(toks)
    return [full] if full == root else [full, root]


def fingerprint_address(address: dict | None) -> list[str] | None:
    """Near-dupe blocking keys for a parsed address (reference
    ``postal_fingerprint_address`` doctest shapes, _postal.py:105-123):
    ``act|<road variant>|<house#>|<city>`` and
    ``apc|<road variant>|<house#>|<postal_code>``."""
    if address is None:
        return None
    street1 = (address.get("street1") or "").strip()
    if not street1 and not any(
        address.get(k) for k in ("city", "state", "postal_code", "country")
    ):
        return []
    house, road = "", street1
    if street1:
        first, *rest = street1.split(" ", 1)
        if _LEADING_DIGIT_RE.match(first):
            house = first.lower()
            road = rest[0] if rest else ""
    variants = road_variants(road)
    if not variants:
        return []
    out = []
    city = (address.get("city") or "").lower()
    zipc = (address.get("postal_code") or "").lower()
    if city:
        out.extend(f"act|{v}|{house}|{city}" for v in variants)
    if zipc:
        out.extend(f"apc|{v}|{house}|{zipc}" for v in variants)
    return out


def tag_address_array(arr) -> pa.Array:
    vals = arr.to_pylist() if isinstance(arr, (pa.Array, pa.ChunkedArray)) else arr
    return pa.array([tag_address(v) for v in vals], type=ADDRESS_TYPE)


def fingerprint_address_array(arr) -> pa.Array:
    vals = arr.to_pylist() if isinstance(arr, (pa.Array, pa.ChunkedArray)) else arr
    return pa.array(
        [fingerprint_address(v) for v in vals], type=pa.list_(pa.string())
    )


def libpostal_tagger():
    """Real-libpostal seam: returns a ``str|None -> dict|None`` tagger
    backed by ``postal.parser.parse_address`` (reference _postal.py:26-76
    semantics), mapping libpostal labels onto this module's 6-field
    schema. Raises ImportError when pypostal is not installed (it is not
    in this environment) — pass as ``AddressTagger(...,
    model_loader=libpostal_tagger)`` where it exists, so the import and
    model mmap happen once per actor."""
    from postal.parser import parse_address  # optional dep

    label_map = {
        "unit": "street2",
        "city": "city",
        "suburb": "city",
        "city_district": "city",
        "state": "state",
        "postcode": "postal_code",
        "country": "country",
    }

    def tag(s):
        if s is None or not str(s).strip():
            return None
        out = {k: None for k in
               ("street1", "street2", "city", "state", "postal_code", "country")}
        house, road = None, None
        for value, label in parse_address(str(s)):
            if label == "house_number" and house is None:
                house = value
            elif label == "road" and road is None:
                road = value
            else:
                k = label_map.get(label)
                if k is not None and out[k] is None:
                    out[k] = value
        out["street1"] = " ".join(x for x in (house, road) if x) or None
        return out

    return tag


class AddressTagger:
    """Actor-pool stage: address string column -> parsed struct (+ optional
    fingerprints). Model setup happens once per actor in ``__init__`` — the
    slot where a spaCy/libpostal-class model loads (reference
    _spacy.py:13-60 pattern; the rules here are the pure-python default).
    ``model_loader``: zero-arg callable returning a ``str|None ->
    dict|None`` tagger over the 6-field schema (see
    :func:`libpostal_tagger`); called in ``__init__`` so a real model is
    imported/mmapped once per actor, never on the driver.

    Use: ``ds.map_batches(AddressTagger("addr"), concurrency=N,
    batch_format="pyarrow")``.
    """

    def __init__(
        self,
        column: str,
        *,
        result_name: str = "address",
        fingerprints_as: str | None = None,
        model_loader=None,
    ):
        self.column = column
        self.result_name = result_name
        self.fingerprints_as = fingerprints_as
        self._tag = model_loader() if model_loader is not None else None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._tag is not None:
            vals = batch[self.column].to_pylist()
            parsed = pa.array([self._tag(v) for v in vals], type=ADDRESS_TYPE)
        else:
            parsed = tag_address_array(batch[self.column])
        batch = batch.append_column(self.result_name, parsed)
        if self.fingerprints_as is not None:
            batch = batch.append_column(
                self.fingerprints_as, fingerprint_address_array(parsed)
            )
        return batch
