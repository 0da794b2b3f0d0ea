"""Golden labeled record-linkage datasets, bundled as parquet.

Mirrors reference mismo/playdata.py:64-317: FEBRL 1-3 (Freely Extensible
Biomedical Record Linkage generator output), the PATSTAT patents dataset
(from the dedupe patent example), and RLdata500/10000 (RecordLinkage R
package). Each loader returns a :class:`~mismo_ray.types.Linkage` whose
``links`` are the ground-truth duplicate pairs — rows sharing ``label_true``
with ``record_id_l < record_id_r`` (reference playdata.py:52-60).

These are the conformance corpus: the FS trainer reproduces the reference's
published m/u anchors on patents (tests/test_playdata.py), and RLdata
supports the documented "90%+ precision and recall with simple linkage
rules" sanity check.

The parquet files under ``mismo_ray/_data/`` are converted from the public
CSVs by ``tools/make_playdata.py`` with the reference's explicit schemas
(uint16/uint32 ids, strings preserving leading zeros, raw date strings).
"""

from __future__ import annotations

import os

import ray.data

from mismo_ray.linker._key_linker import KeyLinker
from mismo_ray.types import Linkage

__all__ = [
    "load_affiliations",
    "load_febrl1",
    "load_febrl2",
    "load_febrl3",
    "load_patents",
    "load_rldata500",
    "load_rldata10000",
]

_DATA_DIR = os.path.join(os.path.dirname(__file__), "_data")


def _linkage_from_labels(records: ray.data.Dataset) -> Linkage:
    """True-pair links: label_true equality, record_id_l < record_id_r
    (KeyLinker dedupe semantics are exactly this unordered-pair join)."""
    return KeyLinker("label_true")(records, records)


def load_records(name: str) -> ray.data.Dataset:
    """Just the records table of a bundled dataset ("febrl1".."febrl3",
    "patents", "rldata500", "rldata10000", "affiliations") — label_true
    column included, true-pair links NOT built. Use this when only the
    records are needed (e.g. running a matcher whose output is evaluated
    elsewhere): the full loaders also run the label KeyLinker, which costs
    a count prepass + pair shuffle that a records-only consumer never
    reads."""
    return ray.data.read_parquet(os.path.join(_DATA_DIR, f"{name}.parquet"))


def _load(name: str) -> Linkage:
    return _linkage_from_labels(load_records(name))


def load_febrl1() -> Linkage:
    """FEBRL dataset 1: 1000 records (500 originals + 500 duplicates).

    Schema (reference playdata.py:33-46): record_id/label_true uint16,
    name/address fields as strings (street_number and postcode keep leading
    zeros), date_of_birth as a raw string (contains invalid dates),
    soc_sec_id int32.
    """
    return _load("febrl1")


def load_febrl2() -> Linkage:
    """FEBRL dataset 2: 5000 records (4000 originals + 1000 duplicates)."""
    return _load("febrl2")


def load_febrl3() -> Linkage:
    """FEBRL dataset 3: 5000 records (2000 originals + 3000 duplicates)."""
    return _load("febrl3")


def load_patents() -> Linkage:
    """PATSTAT patent-inventor dataset (2379 rows, reference
    playdata.py:214-255): disambiguate which patents share an inventor.
    Columns: record_id/label_true uint32, name_true, name, latitude,
    longitude (0.0 = no address found), coauthors and classes as
    '**'-separated strings. Rows ordered by record_id."""
    return _load("patents")


def load_rldata500() -> Linkage:
    """RLdata500: 500 synthetic person records, 10% noisy duplicates
    (reference playdata.py:258-287). Deduplicable at 90%+ precision and
    recall with simple linkage rules — used as an end-to-end sanity check."""
    return _load("rldata500")


def load_rldata10000() -> Linkage:
    """RLdata10000: 10000 synthetic person records, 10% duplicates."""
    return _load("rldata10000")


def load_affiliations() -> Linkage:
    """Leipzig "Affiliations" benchmark: 2260 raw author-affiliation strings
    from publication metadata, 330 labeled entities, 16795 true pairs.

    From the Database Group at Leipzig University (CC BY 4.0), adapted by
    the reference's converter (reference mismo/_data/_datasets/leipzig/
    make_affiliations.py — which itself warns "the ground truth labels are
    not very reliable": identical organization strings can carry different
    labels). Columns: record_id int64, label_true int64, affiliation string.

    Expect materially lower ceilings than febrl/RLdata here — this is the
    realistic-noise end of the conformance corpus (see
    tests/test_affiliations.py for the documented achievable band)."""
    return _load("affiliations")
