"""Address tagger + near-dupe fingerprints (mismo_ray.lib.postal) — parity
with the reference's libpostal wrapper semantics
(reference/mismo/lib/geo/_postal.py:26-172, incl. its doctest)."""

from __future__ import annotations

import pyarrow as pa
import ray.data

from mismo_ray.lib.postal import (
    AddressTagger,
    fingerprint_address,
    road_variants,
    tag_address,
)


def test_reference_doctest_fingerprint():
    # the exact doctest from reference _postal.py:105-123
    address = {
        "street1": "123 Main Street",
        "street2": "",
        "city": "Springfield",
        "state": "IL",
        "postal_code": "62701",
        "country": "us",
    }
    assert fingerprint_address(address) == [
        "act|main street|123|springfield",
        "act|main|123|springfield",
        "apc|main street|123|62701",
        "apc|main|123|62701",
    ]


def test_seagrape_collapse():
    # "Sea Grape Ln" and "Seagrape Ln" must share the collapsed root
    a = road_variants("SEA GRAPE LN")
    b = road_variants("SEAGRAPE LN")
    assert "seagrape" in a and "seagrape" in b


def test_tag_address_variants():
    t = tag_address("123 Main Street, Springfield, IL 62701, USA")
    assert t == {
        "street1": "123 MAIN STREET",
        "street2": None,
        "city": "SPRINGFIELD",
        "state": "IL",
        "postal_code": "62701",
        "country": "US",
    }
    t = tag_address("123 Main St Apt 4B, Springfield IL 62701")
    assert t["street1"] == "123 MAIN ST"
    assert t["street2"] == "APT 4B"
    assert t["city"] == "SPRINGFIELD"
    t = tag_address("789 N Broadway, Suite 200, New York, New York 10003")
    assert t["street2"] == "SUITE 200"
    assert t["state"] == "NY"
    assert t["city"] == "NEW YORK"
    assert tag_address(None) is None
    t = tag_address("just some text")
    assert t["street1"] == "JUST SOME TEXT" and t["city"] is None


def test_abbreviation_invariance():
    """'Main St' and 'Main Street' produce identical fingerprint keys — the
    whole point of the near-dupe expansion."""
    a = tag_address("123 Main St, Springfield, IL 62701")
    b = tag_address("123 Main Street, Springfield, IL 62701")
    assert fingerprint_address(a) == fingerprint_address(b)


def test_fingerprint_missing_fields():
    assert fingerprint_address(None) is None
    assert fingerprint_address({"street1": ""}) == []
    # no city -> only apc keys; no zip -> only act keys
    fp = fingerprint_address({"street1": "1 Elm Rd", "postal_code": "99999"})
    assert fp == ["apc|elm road|1|99999", "apc|elm|1|99999"]
    fp = fingerprint_address({"street1": "1 Elm Rd", "city": "Salem"})
    assert all(k.startswith("act|") for k in fp)


def test_address_tagger_stage(ray_session):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "record_id": [0, 1],
                "addr": [
                    "456 Sea Grape Ln, Key West, Florida 33040",
                    None,
                ],
            }
        )
    )
    out = ds.map_batches(
        AddressTagger("addr", fingerprints_as="fps"),
        batch_format="pyarrow",
        concurrency=1,
    ).take_all()
    by_id = {r["record_id"]: r for r in out}
    assert by_id[0]["address"]["state"] == "FL"
    assert "act|seagrape|456|key west" in by_id[0]["fps"]
    assert by_id[1]["address"] is None and by_id[1]["fps"] is None
