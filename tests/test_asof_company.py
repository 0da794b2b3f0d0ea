"""As-of / interval joins vs brute force, and the patent-notebook company
cleaners (reference docs/examples/patent_deduplication.ipynb)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from tests.conftest import rows_set


def _rows(ds, cols):
    """Order-insensitive row set via take_all (arrow nulls stay None — the
    pandas path would coerce null ints to NaN)."""
    return {tuple(r[c] for c in cols) for r in ds.take_all()}


def test_asof_join_backward_forward(ray_session):
    from mismo_ray.asof import asof_join

    left = ray.data.from_arrow(
        pa.table(
            {
                "k": [1, 1, 1, 2, 3],
                "t": [10, 20, 4, 10, 10],
                "lv": ["a", "b", "c", "d", "e"],
            }
        )
    )
    right = ray.data.from_arrow(
        pa.table({"k": [1, 1, 2], "t": [5, 15, 30], "rv": [100, 200, 300]})
    )
    back = _rows(
        asof_join(left, right, on="t", by="k"), ["k", "t", "lv", "rv_r", "t_r"]
    )
    assert back == {
        (1, 10, "a", 100, 5),
        (1, 20, "b", 200, 15),
        (1, 4, "c", None, None),  # nothing at or before t=4
        (2, 10, "d", None, None),  # right match is in the future
        (3, 10, "e", None, None),  # no right rows for k=3
    }
    fwd = _rows(
        asof_join(left, right, on="t", by="k", direction="forward"),
        ["k", "t", "rv_r"],
    )
    assert fwd == {
        (1, 10, 200),
        (1, 20, None),
        (1, 4, 100),
        (2, 10, 300),
        (3, 10, None),
    }


def test_asof_join_tolerance(ray_session):
    from mismo_ray.asof import asof_join

    left = ray.data.from_arrow(pa.table({"k": [1, 1], "t": [10, 100]}))
    right = ray.data.from_arrow(pa.table({"k": [1], "t": [5], "rv": [7]}))
    got = _rows(
        asof_join(left, right, on="t", by="k", tolerance=20), ["k", "t", "rv_r"]
    )
    assert got == {(1, 10, 7), (1, 100, None)}  # 100-5 > 20 -> no match


def test_interval_join_matches_bruteforce(ray_session):
    from mismo_ray.asof import interval_join

    rng = np.random.default_rng(4)
    lv = rng.uniform(0, 1000, 300)
    lo = rng.uniform(0, 1000, 80)
    hi = lo + rng.uniform(0, 120, 80)  # intervals span multiple 50-buckets
    left = ray.data.from_arrow(
        pa.table({"lid": np.arange(300, dtype=np.int64), "v": lv})
    )
    right = ray.data.from_arrow(
        pa.table({"rid": np.arange(80, dtype=np.int64), "lo": lo, "hi": hi})
    )
    expected = {
        (int(i), int(j))
        for i in range(300)
        for j in range(80)
        if lo[j] <= lv[i] <= hi[j]
    }
    assert len(expected) > 100
    got = rows_set(
        interval_join(
            left, right, left_value="v", right_lo="lo", right_hi="hi",
            bucket_width=50.0,
        ),
        ["lid", "rid_r"],
    )
    assert got == expected


def test_clean_names_notebook_semantics():
    from mismo_ray.lib.company import clean_coauthors, clean_classes, clean_name

    assert clean_name("  Philips N.V. ") == "PHILIPS"
    assert clean_name("philipsN.V.") == "PHILIPS"
    assert clean_name("Acme Co., Ltd.") == "ACME"
    assert clean_name("Widget CORP") == "WIDGET"
    assert clean_name(None) is None
    # \bCO\b is word-bounded: COLD stays intact
    assert clean_name("COLD FUSION LLC") == "COLD FUSION"
    assert clean_coauthors("DAVID E  SNYDER**THOMAS D  LYSTER") == [
        "DAVID", "LYSTER", "SNYDER", "THOMAS",
    ]
    assert clean_coauthors("NONE") is None
    assert clean_classes("h01l**G06f  3") == ["G06F 3", "H01L"]
