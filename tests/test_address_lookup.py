"""Clean<->dirty address lookup pipeline (reference entry point §3.2,
docs/examples/address_linkage.ipynb): normalize both tables -> trigram
inverted-index blocking with hot-term capping -> ambiguity filtering
(AmbiguousHaystackFilterer + keep_unambiguous window filter)."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray.data

from mismo_ray.lib import address
from mismo_ray.linkage import keep_unambiguous
from mismo_ray.linker import UnnestLinker
from mismo_ray.tf import AmbiguousHaystackFilterer
from tests.conftest import rows_set

CLEAN = [
    (0, "12 N Main St"),
    (1, "99 Glacier Ave"),
    (2, "56 Saint Joseph Street"),
    (3, "700 Spenard Road"),
    (4, "700 Spenard Road"),  # duplicated haystack entry -> ambiguous
    (5, "1 Totally Unique Way"),
]
DIRTY = [
    (100, "12 North Main Street"),   # matches 0 (normalized directional+type)
    (101, "99 Glacier Av."),         # matches 1
    (102, "700 Spenard Rd"),         # ambiguous haystack (3 and 4)
    (103, "8 Nowhere Blvd"),         # no match
]


def addr_table(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "record_id": [r for r, _ in rows],
                "street1": [s for _, s in rows],
            }
        )
    )


def featurized(ds):
    def fn(t: pa.Table) -> pa.Table:
        parsed = [address.parse_street1(v) for v in t["street1"].to_pylist()]
        keys = []
        names = []
        for p in parsed:
            nm = p["street_name"] if p else None
            num = p["street_number"] if p else None
            names.append(nm)
            if nm is None:
                keys.append(None)
            else:
                grams = address.ngrams(nm, 3) or []
                # include the street number as an extra key token
                keys.append(list(set(grams)) + ([num] if num else []))
        t = t.append_column("street_name", pa.array(names, type=pa.string()))
        return t.append_column(
            "block_keys", pa.array(keys, type=pa.list_(pa.string()))
        )

    return ds.map_batches(fn, batch_format="pyarrow").materialize()


@pytest.fixture(scope="module")
def tables(ray_session):
    return featurized(addr_table(CLEAN)), featurized(addr_table(DIRTY))


def test_lookup_with_trigram_blocking(tables):
    clean, dirty = tables
    linkage = UnnestLinker("block_keys", max_pairs=1000, task="link")(clean, dirty)
    pairs = linkage.links.with_both(["street_name", "street1"], ["street_name", "street1"])

    # verify: same parsed street name AND same street number token in keys
    def verify(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(
            pc.equal(t["street_name_l"], t["street_name_r"])
        ).select(["record_id_l", "record_id_r"])

    links = pairs.map_batches(verify, batch_format="pyarrow").materialize()
    got = rows_set(links, ["record_id_l", "record_id_r"])
    assert (0, 100) in got
    assert (1, 101) in got
    assert (3, 102) in got and (4, 102) in got  # ambiguous pair present pre-filter
    assert not any(r == 103 for _, r in got)


def test_lookup_ambiguity_filters(tables):
    clean, dirty = tables
    # 1) haystack side: drop clean records whose street_name appears twice
    unambiguous_clean = AmbiguousHaystackFilterer(["street_name"]).unambiguous_haystack(clean)
    ids = {r["record_id"] for r in unambiguous_clean.take_all()}
    assert 3 not in ids and 4 not in ids
    assert {0, 1, 2, 5} <= ids

    # 2) link side: keep_unambiguous drops needle 102's two candidate links
    linkage = UnnestLinker("block_keys", max_pairs=1000, task="link")(clean, dirty)
    pairs = linkage.links.with_both(["street_name"], ["street_name"])

    def verify(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(
            pc.equal(t["street_name_l"], t["street_name_r"])
        ).select(["record_id_l", "record_id_r"])

    links = pairs.map_batches(verify, batch_format="pyarrow")
    final = keep_unambiguous(links, group="record_id_r", distinct="record_id_l")
    got = rows_set(final, ["record_id_l", "record_id_r"])
    assert got == {(0, 100), (1, 101)}
