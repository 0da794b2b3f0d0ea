"""util_ops.describe — distributed column profiling."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from mismo_ray.util_ops import describe


def _tbl():
    return pa.table(
        {
            "i": pa.array([5, 1, None, 9, 9, 2], type=pa.int64()),
            "f": pa.array([1.5, None, 2.5, 3.5, 0.5, 2.0], type=pa.float64()),
            "s": pa.array(["b", "a", "c", None, "a", "zz"]),
        }
    )


def test_describe_exact_counts_min_max_mean(ray_session):
    ds = ray.data.from_arrow(_tbl()).repartition(3)
    t = describe(ds, distinct="exact")
    rows = {r["column"]: r for r in t.to_pylist()}
    assert rows["i"]["n"] == 5 and rows["i"]["n_null"] == 1
    assert rows["i"]["n_distinct"] == 4  # 5,1,9,2
    assert rows["i"]["min"] == "1" and rows["i"]["max"] == "9"
    assert rows["i"]["mean_e6"] == round((5 + 1 + 9 + 9 + 2) / 5 * 1e6)
    assert rows["f"]["mean_e6"] == round((1.5 + 2.5 + 3.5 + 0.5 + 2.0) / 5 * 1e6)
    assert rows["s"]["min"] == "a" and rows["s"]["max"] == "zz"
    assert rows["s"]["mean_e6"] is None
    assert rows["s"]["n_distinct"] == 4
    assert rows["s"]["dtype"] == "string"


def test_describe_approx_distinct_and_quantiles(ray_session):
    rng = np.random.default_rng(2)
    vals = rng.integers(0, 5_000, 50_000)
    ds = ray.data.from_arrow(pa.table({"v": vals})).repartition(7)
    t = describe(ds, ["v"], distinct="approx", qs=(0.25, 0.5, 0.75))
    row = t.to_pylist()[0]
    true_distinct = len(np.unique(vals))
    assert abs(row["n_distinct"] - true_distinct) / true_distinct < 0.05
    s = np.sort(vals)
    for q, name in ((0.25, "q25"), (0.5, "q50"), (0.75, "q75")):
        expect = float(s[max(0, int(np.ceil(q * len(s))) - 1)])
        assert row[name] == expect


def test_describe_skip_distinct_and_column_subset(ray_session):
    ds = ray.data.from_arrow(_tbl())
    t = describe(ds, ["i"], distinct=None)
    assert t.column_names == [
        "column", "dtype", "n", "n_null", "n_distinct", "min", "max", "mean_e6",
    ]
    assert len(t) == 1
    assert t.to_pylist()[0]["n_distinct"] is None


def test_describe_all_null_and_empty(ray_session):
    t = pa.table({"x": pa.array([None, None], type=pa.int64())})
    row = describe(ray.data.from_arrow(t), distinct="exact").to_pylist()[0]
    assert row["n"] == 0 and row["n_null"] == 2 and row["n_distinct"] == 0
    assert row["min"] is None and row["mean_e6"] is None
    empty = ray.data.from_arrow(pa.table({"x": pa.array([], type=pa.int64())}))
    row2 = describe(empty, distinct="exact").to_pylist()[0]
    assert row2["n"] == 0 and row2["n_null"] == 0 and row2["n_distinct"] == 0


def test_describe_rejects_bad_distinct(ray_session):
    ds = ray.data.from_arrow(pa.table({"x": [1]}))
    with pytest.raises(ValueError):
        describe(ds, distinct="bogus")


def test_describe_rejects_colliding_quantile_names(ray_session):
    ds = ray.data.from_arrow(pa.table({"x": [1.0, 2.0]}))
    with pytest.raises(ValueError):
        describe(ds, qs=(0.333, 0.334))  # both round to q33
