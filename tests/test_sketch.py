"""Sketch operators: exact heavy hitters (Misra-Gries candidates + exact
verify) and HyperLogLog distinct counts."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from mismo_ray.sketch import (
    add_approx_distinct,
    approx_distinct,
    heavy_hitters,
)


def _skewed_strings(seed=7, n_noise=25_000):
    rng = np.random.default_rng(seed)
    head = np.repeat(np.arange(20), 2000 - np.arange(20) * 90)
    noise = rng.integers(100, 30_000, n_noise)
    return np.char.add("v", np.concatenate([head, noise]).astype(str))


def test_heavy_hitters_exact_topk_guaranteed(ray_session):
    strs = _skewed_strings()
    ds = ray.data.from_arrow(pa.table({"x": strs})).repartition(13)
    hh = heavy_hitters(ds, "x", k=8)
    assert hh.guaranteed
    assert hh.n_total == len(strs)
    exact = pd.Series(strs).value_counts()
    got = dict(zip(hh.table["x"].to_pylist(), hh.table["n"].to_pylist()))
    assert got == dict(exact.iloc[:8])


def test_heavy_hitters_partition_invariant(ray_session):
    strs = _skewed_strings(seed=3)
    t = pa.table({"x": strs})
    a = heavy_hitters(ray.data.from_arrow(t).repartition(3), "x", k=5)
    b = heavy_hitters(ray.data.from_arrow(t).repartition(17), "x", k=5)
    assert a.guaranteed and b.guaranteed
    assert a.table.equals(b.table)
    assert a.n_total == b.n_total == len(strs)


def test_heavy_hitters_flat_data_not_guaranteed_but_counts_exact(ray_session):
    # all-distinct data: no true heavy hitter exists; the flag must say so
    # and whatever IS returned must still carry exact counts (= 1)
    strs = np.char.add("u", np.arange(50_000).astype(str))
    ds = ray.data.from_arrow(pa.table({"x": strs})).repartition(11)
    hh = heavy_hitters(ds, "x", k=4, candidate_cap=8)
    assert not hh.guaranteed
    assert all(n == 1 for n in hh.table["n"].to_pylist())


def test_heavy_hitters_nulls_and_ties(ray_session):
    vals = ["a"] * 10 + ["b"] * 10 + ["c"] * 5 + [None] * 7
    ds = ray.data.from_arrow(pa.table({"x": pa.array(vals)})).repartition(4)
    hh = heavy_hitters(ds, "x", k=2)
    assert hh.n_total == 25  # nulls excluded
    # tie between a and b broken by value ascending
    assert hh.table["x"].to_pylist() == ["a", "b"]
    assert hh.table["n"].to_pylist() == [10, 10]
    assert hh.guaranteed  # kth=10 > boundary+E (tie is WITHIN the result)


def test_heavy_hitters_empty_and_all_null(ray_session):
    empty = ray.data.from_arrow(pa.table({"x": pa.array([], type=pa.string())}))
    hh = heavy_hitters(empty, "x", k=3)
    assert len(hh.table) == 0 and hh.guaranteed and hh.n_total == 0
    nulls = ray.data.from_arrow(
        pa.table({"x": pa.array([None, None], type=pa.string())})
    )
    hh2 = heavy_hitters(nulls, "x", k=3)
    assert len(hh2.table) == 0 and hh2.n_total == 0


def test_heavy_hitters_int_column_and_result_name(ray_session):
    ints = np.concatenate([np.repeat([5, 9], 100), np.arange(1000)])
    ds = ray.data.from_arrow(pa.table({"k": ints})).repartition(5)
    hh = heavy_hitters(ds, "k", k=2, result_name="key")
    assert hh.guaranteed
    assert hh.table.column_names == ["key", "n"]
    assert hh.table["key"].to_pylist() == [5, 9]
    assert hh.table["n"].to_pylist() == [101, 101]


def test_heavy_hitters_fewer_distinct_than_k(ray_session):
    ds = ray.data.from_arrow(pa.table({"x": ["a", "a", "b"]}))
    hh = heavy_hitters(ds, "x", k=10)
    assert hh.guaranteed  # nothing was dropped anywhere: E == boundary == 0
    assert hh.table["x"].to_pylist() == ["a", "b"]


def test_approx_distinct_error_bound(ray_session):
    rng = np.random.default_rng(11)
    vals = rng.integers(0, 40_000, 120_000)
    strs = np.char.add("d", vals.astype(str))
    ds = ray.data.from_arrow(pa.table({"x": strs})).repartition(9)
    true_n = len(np.unique(vals))
    est = approx_distinct(ds, "x", precision=12)
    assert abs(est - true_n) / true_n < 0.05  # 3 sigma at p=12 is ~4.9%


def test_approx_distinct_partition_invariant_and_small_range(ray_session):
    strs = np.char.add("s", np.arange(300).astype(str))
    t = pa.table({"x": np.concatenate([strs, strs, strs])})
    a = approx_distinct(ray.data.from_arrow(t).repartition(2), "x")
    b = approx_distinct(ray.data.from_arrow(t).repartition(19), "x")
    assert a == b  # register max is order-free
    assert abs(a - 300) / 300 < 0.05  # linear-counting regime is near-exact


def test_approx_distinct_empty_null_zero(ray_session):
    empty = ray.data.from_arrow(pa.table({"x": pa.array([], type=pa.string())}))
    assert approx_distinct(empty, "x") == 0
    nulls = ray.data.from_arrow(pa.table({"x": pa.array([None], type=pa.string())}))
    assert approx_distinct(nulls, "x") == 0


def test_approx_distinct_precision_validation(ray_session):
    ds = ray.data.from_arrow(pa.table({"x": ["a"]}))
    with pytest.raises(ValueError):
        approx_distinct(ds, "x", precision=3)
    with pytest.raises(ValueError):
        approx_distinct(ds, "x", precision=19)


def test_add_approx_distinct_per_group(ray_session):
    rng = np.random.default_rng(5)
    g = np.repeat(["a", "b", "c"], 10_000)
    x = np.concatenate(
        [
            rng.integers(0, 50, 10_000),
            rng.integers(0, 2_000, 10_000),
            rng.integers(0, 9_000, 10_000),
        ]
    ).astype(str)
    ds = ray.data.from_arrow(pa.table({"g": g, "x": x})).repartition(7)
    got = (
        add_approx_distinct(ds, "g", "x", precision=12)
        .to_pandas()
        .set_index("g")["approx_distinct"]
    )
    exact = pd.DataFrame({"g": g, "x": x}).groupby("g")["x"].nunique()
    for grp in ("a", "b", "c"):
        assert abs(got[grp] - exact[grp]) / exact[grp] < 0.05


def test_add_approx_distinct_null_rows_skipped(ray_session):
    t = pa.table(
        {
            "g": pa.array(["a", "a", None, "b"]),
            "x": pa.array(["1", None, "2", "3"]),
        }
    )
    got = (
        add_approx_distinct(ray.data.from_arrow(t), "g", "x")
        .to_pandas()
        .set_index("g")["approx_distinct"]
    )
    assert dict(got) == {"a": 1, "b": 1}


def test_keylinker_hot_keys_skew_advisory(ray_session):
    from mismo_ray.linker import KeyLinker

    rng = np.random.default_rng(3)
    n_tail = 30_000
    brand = np.concatenate(
        [
            np.repeat([f"H{i}" for i in range(5)], [10_000, 9_000, 8_000, 7_000, 6_000]),
            np.char.add("b", rng.integers(0, 15_000, n_tail).astype(str)),
        ]
    )
    size = np.concatenate(
        [np.repeat(np.arange(5), [10_000, 9_000, 8_000, 7_000, 6_000]), rng.integers(0, 50, n_tail)]
    )
    t = pa.table(
        {"record_id": np.arange(len(brand)), "brand": brand, "size": size}
    )
    ds = ray.data.from_arrow(t).repartition(9)
    tbl, guaranteed = KeyLinker(["brand", "size"]).hot_keys(ds, k=5)
    assert guaranteed
    assert tbl.column_names == ["brand", "size", "n", "share_e6"]
    assert tbl["brand"].to_pylist() == ["H0", "H1", "H2", "H3", "H4"]
    assert tbl["n"].to_pylist() == [10_000, 9_000, 8_000, 7_000, 6_000]
    total = len(brand)
    assert tbl["share_e6"][0].as_py() == round(10_000 * 1e6 / total)


def test_keylinker_hot_keys_flat_not_guaranteed_counts_exact(ray_session):
    from mismo_ray.linker import KeyLinker

    # one hot key over an otherwise flat tail: the hot row must surface with
    # its EXACT count even when the tail is too flat to prove completeness
    n = 60_000
    rng = np.random.default_rng(5)
    brand = np.where(
        np.arange(n) % 3 == 0,
        "HOT",
        np.char.add("b", rng.integers(0, 4_000, n).astype(str)),
    )
    size = np.where(np.arange(n) % 3 == 0, 1, rng.integers(0, 50, n))
    ds = ray.data.from_arrow(
        pa.table({"record_id": np.arange(n), "brand": brand, "size": size})
    ).repartition(9)
    tbl, guaranteed = KeyLinker(["brand", "size"]).hot_keys(ds, k=3)
    assert tbl["brand"][0].as_py() == "HOT"
    assert tbl["n"][0].as_py() == n // 3
    assert not guaranteed  # the count-4 tail ties make top-3 unprovable
