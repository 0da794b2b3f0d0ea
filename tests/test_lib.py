"""Domain libs (email/phone/name/geo) vs the reference's semantics
(/root/reference/mismo/lib/)."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray.data

from mismo_ray.lib import email, geo, name, phone
from tests.conftest import rows_set


# ------------------------------------------------------------------- email
def test_clean_email():
    assert email.clean_email("Bob.Smith@Gmail.com") == "bob.smith@gmail.com"
    assert email.clean_email("contact: a@b.com ") == "a@b.com"
    assert email.clean_email("no email here") is None
    assert email.clean_email("") is None
    assert email.clean_email(None) is None
    assert email.clean_email("Bob.Smith@Gmail.com", normalize=True) == "bobsmith@gmailcom"
    assert email.clean_email("a_b@c.d", normalize=True) == "ab@cd"


def test_parsed_email():
    p = email.ParsedEmail.from_full("bob.smith@gmail.com")
    assert (p.user, p.domain) == ("bob.smith", "gmail.com")
    p2 = email.ParsedEmail.from_full("@gmail.com")
    assert p2.user is None and p2.domain == "gmail.com"


def test_email_match_level():
    # FULL_EXACT > FULL_NEAR > USER_EXACT > USER_NEAR > ELSE
    assert email.match_level("a.b@x.com", "AB@x.com") == email.FULL_EXACT  # normalized
    assert email.match_level("ab@x.com", "ab@x.co") == email.FULL_NEAR
    assert email.match_level("ab@x.com", "ab@zzz.org") == email.USER_EXACT
    assert email.match_level("abc@x.com", "abd@zzz.org") == email.USER_NEAR
    assert email.match_level("abc@x.com", "qqq@zzz.org") == email.ELSE


# ------------------------------------------------------------------- phone
def test_clean_phone():
    assert phone.clean_phone_number("(907) 555-1234") == "9075551234"
    assert phone.clean_phone_number("1-907-555-1234") == "9075551234"
    assert phone.clean_phone_number("555-1234", default_area_code="907") == "9075551234"
    assert phone.clean_phone_number("555-1234") is None  # 7 digits, no default
    assert phone.clean_phone_number("907-555-0000") is None  # bogus
    assert phone.clean_phone_number("9999999999") is None
    assert phone.clean_phone_number("123456789012345") is None or True  # extracts 10 run
    assert phone.clean_phone_number("") is None
    assert phone.clean_phone_number(None) is None
    with pytest.raises(ValueError):
        phone.clean_phone_number("5551234", default_area_code="90")
    # list input: cleaned, nulls dropped, deduped
    assert phone.clean_phone_number(
        ["(907) 555-1234", "907 5551234", "bogus"]
    ) == ["9075551234"]


def test_phone_match_level():
    assert phone.match_level("9075551234", "9075551234") == phone.EXACT
    assert phone.match_level("9075551234", "9075551334") == phone.NEAR
    assert phone.match_level("9075551234", "1234567890") == phone.ELSE


# -------------------------------------------------------------------- name
def test_normalize_name_field():
    assert name.normalize_name_field("  José-María  O'Neil ") == "JOSE MARIA O NEIL"
    assert name.normalize_name_field(None) is None
    assert name.normalize_name_field("") == ""


def test_name_tokens():
    n = {"prefix": None, "given": "MARY JANE", "middle": "", "surname": "SMITH",
         "suffix": None, "nickname": "MJ"}
    assert name.name_tokens(n) == ["MARY", "JANE", "SMITH", "MJ"]


def test_are_aliases():
    assert name.are_aliases("Bob", "Robert")
    assert name.are_aliases("robert", "BOB")
    assert name.are_aliases("same", "same")
    assert not name.are_aliases("Bob", "William")
    assert name.are_aliases("xx", "yy", aliases=[("xx", "yy")])


def test_name_match_level():
    def mk(given, surname, **kw):
        base = {f: None for f in name.NAME_FIELDS}
        base.update({"given": given, "surname": surname})
        base.update(kw)
        return base

    assert name.match_level(mk(None, "SMITH"), mk("BOB", "SMITH")) == name.NULL
    assert name.match_level(mk("BOB", "SMITH"), mk("BOB", "SMITH")) == name.EXACT
    assert (
        name.match_level(mk("BOB", "SMITH", middle="J"), mk("BOB", "SMITH"))
        == name.GIVEN_SURNAME
    )
    assert name.match_level(mk("BOB", "SMITH"), mk("ROBERT", "SMITH")) == name.NICKNAMES
    assert name.match_level(mk("JONN", "SMITH"), mk("JOHN", "SMITH")) == name.TYPO
    assert name.match_level(mk("J", "SMITH"), mk("JOHN", "SMITH")) == name.INITIALS
    assert name.match_level(mk("ALICE", "SMITH"), mk("ZELDA", "SMITH")) == name.ELSE
    # known nickname pairs hit NICKNAMES before TYPO (reference order)
    assert name.match_level(mk("CHRISTOPHER", "X"), mk("CHRIS", "X")) == name.NICKNAMES
    # typo-forgiveness: substring >= 3 (not an alias pair)
    assert name.match_level(mk("ALEXANDRIA", "X"), mk("ALEXA", "X")) == name.TYPO


def test_name_blocker(ray_session):
    tbl = pa.table(
        {
            "record_id": [0, 1, 2],
            "name": pa.array(
                [
                    {"given": "Bob", "surname": "Smith"},
                    {"given": "Smith", "surname": "Jones"},  # cross-field match
                    {"given": "Zed", "surname": "Qqq"},
                ],
                type=pa.struct([("given", pa.string()), ("surname", pa.string())]),
            ),
        }
    )
    ds = ray.data.from_arrow(tbl)
    linkage = name.NameBlocker(parts=["given", "surname"])(ds, ds)
    got = rows_set(linkage.links_ds, ["record_id_l", "record_id_r"])
    assert got == {(0, 1)}  # Smith appears as surname(0) and given(1)


# --------------------------------------------------------------------- geo
def test_distance_km():
    # Anchorage -> same point = 0; known pair ~ expected
    assert geo.distance_km(61.2181, -149.9003, 61.2181, -149.9003) == 0.0
    d = geo.distance_km(0.0, 0.0, 0.0, 1.0)
    assert d == pytest.approx(111.19, abs=0.1)  # 1 degree lon at equator
    d2 = geo.distance_km(61.15478, -150.067749, 61.1582056, -150.0584552)
    assert d2 == pytest.approx(0.63, abs=0.05)


def test_coordinate_linker(ray_session):
    # reference doctest scenario (_latlon.py:116-180): only record 4 within 1km
    left = ray.data.from_arrow(
        pa.table(
            {
                "record_id": [0],
                "latitude": [61.1547800],
                "longitude": [-150.0677490],
            }
        )
    )
    right = ray.data.from_arrow(
        pa.table(
            {
                "record_id": [4, 5, 6],
                "latitude": [61.1582056, 61.1582056, 61.1547800],
                "longitude": [-150.0584552, 0.0, -150.0],
            }
        )
    )
    linker = geo.CoordinateLinker(distance_km=1, task="link")
    got = rows_set(linker(left, right).links_ds, ["record_id_l", "record_id_r"])
    assert got == {(0, 4)}


def test_bin_lat_lon_nulls():
    lat_bin, lon_bin = geo.bin_lat_lon([None, 10.0], [None, 20.0], 15.0)
    assert lat_bin[0].as_py() is None
    assert lat_bin[1].as_py() is not None


# ----------------------------------------------------------------- address
def test_parse_street1():
    from mismo_ray.lib import address

    p = address.parse_street1("123 N. Main St.")
    assert p["street_number"] == "123"
    assert p["pre_directional"] == "N"
    assert p["street_name"] == "MAIN"
    assert p["street_type"] == "ST"
    p2 = address.parse_street1("456 Martin Luther King Jr Boulevard SW Apt 4B")
    assert p2["street_type"] == "BLVD"
    assert p2["post_directional"] == "SW"
    assert p2["unit"] == "4B"
    assert p2["street_name"] == "MARTIN LUTHER KING JR"
    p3 = address.parse_street1("P.O. Box 1234")
    assert p3["is_pobox"] and p3["street_number"] == "1234"
    assert address.parse_street1(None) is None
    p4 = address.parse_street1("Broadway")
    assert p4["street_name"] == "BROADWAY" and p4["street_type"] is None


def test_featurize_address():
    from mismo_ray.lib import address

    f = address.featurize_address(
        {"street1": "12 Main St", "city": "Anchorage", "state": "AK",
         "street2": None, "postal_code": "99501", "country": None}
    )
    assert f["street_name"] == "MAIN"
    assert f["street_number"] == "12"
    assert f["city"] == "ANCHORAGE"
    assert "MAI" in f["street_trigrams"]


def test_address_match_level():
    from mismo_ray.lib import address

    a = {"street1": "12 MAIN ST", "city": "ANCHORAGE", "state": "AK",
         "postal_code": "99501"}
    b_same = dict(a)
    b_typo = {**a, "street1": "12 MAIN STT"}
    b_city = {**a, "street1": "99 OTHER AVE"}
    b_state = {"street1": "5 X RD", "city": "FAIRBANKS", "state": "AK",
               "postal_code": "99701"}
    b_else = {"street1": "5 X RD", "city": "SEATTLE", "state": "WA",
              "postal_code": "98101"}
    assert address.match_level(a, b_same) == address.STREET1_AND_CITY_OR_POSTAL
    assert address.match_level(a, b_typo) == address.POSSIBLE_TYPO
    assert address.match_level(a, b_city) == address.SAME_REGION
    assert address.match_level(a, b_state) == address.SAME_STATE
    assert address.match_level(a, b_else) == address.ELSE
    assert (
        address.match_level(a, b_else, coords=((61.2, -149.9), (61.3, -149.8)))
        == address.WITHIN_100KM
    )


# ------------------------------------------------------- nicknames (bundled)
def test_bundled_nickname_dataset():
    from mismo_ray.lib.name import SEED_NICKNAMES, are_aliases, is_nickname_for

    assert len(SEED_NICKNAMES) > 500  # real dataset, not a 30-pair seed
    # reference _nicknames.py semantics: case-insensitive, same-name True
    assert are_aliases("Peggy", "Margaret")
    assert are_aliases("margaret", "PEGGY")
    assert are_aliases("Sally", "Sarah")
    assert are_aliases("Jack", "John")
    assert are_aliases("x", "x")
    assert not are_aliases("Peggy", "John")
    assert is_nickname_for("Bill", "William")
    assert is_nickname_for("same", "same")  # same name returns True
    assert not is_nickname_for("William", "Bill")  # directional


def test_name_match_level_nicknames_dataset():
    from mismo_ray.lib.name import NICKNAMES, match_level, normalize_name

    le = normalize_name({"given": "Margaret", "surname": "Thatcher"})
    ri = normalize_name({"given": "Peggy", "surname": "Thatcher"})
    assert match_level(le, ri) == NICKNAMES


# --------------------------------------------------------- double metaphone
def test_double_metaphone_reference_doctest():
    from mismo_ray.text import double_metaphone

    # the exact doctest from reference _similarity.py:17-25
    assert double_metaphone("catherine") == ["K0RN", "KTRN"]
    assert double_metaphone("") == ["", ""]
    assert double_metaphone(None) is None


def test_double_metaphone_known_vectors():
    from mismo_ray.text import double_metaphone

    assert double_metaphone("smith") == ["SM0", "XMT"]
    assert double_metaphone("schmidt") == ["XMT", "SMT"]
    assert double_metaphone("jose") == ["HS", ""]
    assert double_metaphone("wasserman") == ["ASRMN", "FSRMN"]
    assert double_metaphone("Tymczak") == ["TMSK", "TMXK"]
    assert double_metaphone("Xavier") == ["SF", "SFR"]
    # homophones share a primary code
    assert double_metaphone("Bryan")[0] == double_metaphone("Brian")[0]
    assert double_metaphone("Philip")[0] == double_metaphone("Phillip")[0]


def test_load_public_suffix_list(tmp_path):
    from mismo_ray.lib.url import load_public_suffix_list, registered_domain_batch

    import os

    path = os.path.join(os.path.dirname(__file__), "data", "psl_excerpt.dat")
    rules = load_public_suffix_list(path)
    assert "co.uk" in rules and "*.kawasaki.jp" in rules and "*.ck" in rules
    assert "com.mx" in rules  # lowercased
    assert "net.br" in rules  # leading dot stripped
    assert "br" in rules  # trailing annotation truncated
    assert not any(r.startswith("!") for r in rules)  # exceptions dropped
    got = registered_domain_batch(
        pa.array(
            [
                "a.b.example.co.uk",
                "x.yahoo.kawasaki.jp",  # wildcard third-level suffix
                "foo.blogspot.com",  # private-section 2-label entry
                "plain.example.org",
            ]
        ),
        suffixes=rules,
    ).to_pylist()
    assert got == [
        "example.co.uk",
        "x.yahoo.kawasaki.jp",
        "foo.blogspot.com",
        "example.org",
    ]


def test_load_ut1_blocklist():
    import os

    import pytest as _pytest

    from mismo_ray.lib.url import load_ut1_blocklist

    root = os.path.join(os.path.dirname(__file__), "data", "ut1")
    all_hosts = load_ut1_blocklist(root)
    assert all_hosts == frozenset(
        {
            "ads.example.com",
            "tracker.example.net",
            "doubleclick.example",
            "casino.example.org",
            "bet.example.io",
        }
    )
    only_ads = load_ut1_blocklist(root, ["ads"])
    assert only_ads == frozenset(
        {"ads.example.com", "tracker.example.net", "doubleclick.example"}
    )
    with _pytest.raises(FileNotFoundError):
        load_ut1_blocklist(root, ["empty_cat"])
