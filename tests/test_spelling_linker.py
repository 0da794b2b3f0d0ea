"""SpellingLinker: SymSpell deletion-neighborhood blocking + exact
Levenshtein verify — complete recall for lev <= max_edits, zero false
positives (collisions verified away), prefix path, null/empty safety."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray.data

from mismo_ray.linker import SpellingLinker


def _records(names):
    return ray.data.from_arrow(
        pa.table(
            {
                "record_id": pa.array(range(len(names)), type=pa.int64()),
                "name": pa.array(names, type=pa.string()),
            }
        )
    )


def _pairs(linkage):
    return {
        (r["record_id_l"], r["record_id_r"]) for r in linkage.links_ds.take_all()
    }


def test_edit1_pairs_found_and_verified(ray_session):
    names = [
        "smith",   # 0
        "smyth",   # 1: substitution -> d1
        "smith ",  # 2: insertion -> d1
        "smit",    # 3: deletion -> d1
        "misth",   # 4: transposition = lev 2 (plain): NOT at max_edits=1
        "jones",   # 5: far
        None,      # 6: never pairs
        "smith",   # 7: exact dup -> d0
    ]
    ds = _records(names)
    got = _pairs(SpellingLinker("name", max_edits=1)(ds, ds))
    # compute the truth with the exact kernel instead of hand-listing
    from mismo_ray.text import levenshtein

    truth = {
        (i, j)
        for i in range(len(names))
        for j in range(i + 1, len(names))
        if names[i] is not None
        and names[j] is not None
        and levenshtein(names[i], names[j]) <= 1
    }
    assert got == truth
    assert (0, 4) not in got  # transposition is lev 2 under plain levenshtein


def test_edit2_widens_recall(ray_session):
    names = ["smith", "misth", "smythe", "zzzzz"]
    from mismo_ray.text import levenshtein

    ds = _records(names)
    got = _pairs(SpellingLinker("name", max_edits=2)(ds, ds))
    truth = {
        (i, j)
        for i in range(len(names))
        for j in range(i + 1, len(names))
        if levenshtein(names[i], names[j]) <= 2
    }
    assert got == truth
    assert (0, 1) in got  # transposition now reachable


def test_prefix_path_long_strings(ray_session):
    # keys longer than prefix_len block on the prefix but verify FULL strings:
    # two strings equal in the prefix but far apart beyond it must NOT pair
    a = "abcdefgh" + "x" * 30
    b = "abcdefgh" + "y" * 30
    c = "abcdefgh" + "x" * 29 + "z"  # lev 1 from a
    ds = _records([a, b, c])
    got = _pairs(SpellingLinker("name", max_edits=1, prefix_len=8)(ds, ds))
    assert (0, 2) in got
    assert (0, 1) not in got


def test_empty_and_all_null(ray_session):
    ds = _records([None, None])
    assert _pairs(SpellingLinker("name")(ds, ds)) == set()
    empty = _records([])
    assert _pairs(SpellingLinker("name")(empty, empty)) == set()


def test_link_task_two_tables(ray_session):
    left = _records(["color", "flavor"])
    right = ray.data.from_arrow(
        pa.table(
            {
                "record_id": pa.array([10, 11], type=pa.int64()),
                "name": pa.array(["colour", "flavor"], type=pa.string()),
            }
        )
    )
    got = _pairs(SpellingLinker("name", max_edits=1)(left, right))
    assert got == {(0, 10), (1, 11)}


def test_validation():
    with pytest.raises(ValueError):
        SpellingLinker("name", max_edits=3)
    with pytest.raises(ValueError):
        SpellingLinker("name", max_edits=2, prefix_len=2)
