"""util_ops.quantiles_by — per-group exact discrete quantiles."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data

from mismo_ray.util_ops import quantiles_by


def test_quantiles_by_matches_duckdb_with_nulls(ray_session):
    rng = np.random.default_rng(6)
    n = 20_000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 30, n),
            "v": np.where(
                rng.random(n) < 0.05, np.nan, rng.integers(0, 1000, n).astype(float)
            ),
        }
    )
    got = (
        quantiles_by(ray.data.from_pandas(df).repartition(6), "k", "v", (0.25, 0.5, 0.75))
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        "SELECT k, quantile_disc(v, 0.25) q25, quantile_disc(v, 0.5) q50, "
        "quantile_disc(v, 0.75) q75 FROM df GROUP BY k ORDER BY k"
    ).df()
    assert got[["k", "q25", "q50", "q75"]].equals(exp)


def test_quantiles_by_partition_invariant_int_dtype(ray_session):
    rng = np.random.default_rng(8)
    df = pd.DataFrame(
        {"k": rng.integers(0, 12, 5_000), "v": rng.integers(-500, 500, 5_000)}
    )
    a = (
        quantiles_by(ray.data.from_pandas(df).repartition(2), "k", "v", (0.5,))
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    b = (
        quantiles_by(
            ray.data.from_pandas(df).repartition(13), "k", "v", (0.5,), num_buckets=5
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert str(a["q50"].dtype) == "int64"  # int column stays int end to end


def test_quantiles_by_all_null_group_keeps_row(ray_session):
    df = pd.DataFrame(
        {"k": ["a", "a", "b", "b"], "v": [1.0, 3.0, np.nan, np.nan]}
    )
    got = (
        quantiles_by(ray.data.from_pandas(df), "k", "v", (0.5,))
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert got["k"].tolist() == ["a", "b"]
    assert got["q50"][0] == 1.0  # rank ceil(0.5*2)-1 = 0
    assert pd.isna(got["q50"][1])


def test_quantiles_by_validation(ray_session):
    ds = ray.data.from_pandas(pd.DataFrame({"k": ["a"], "v": [1]}))
    with pytest.raises(ValueError):
        quantiles_by(ds, "k", "v", ())
    with pytest.raises(ValueError):
        quantiles_by(ds, "k", "v", (1.5,))
    with pytest.raises(ValueError):
        quantiles_by(ds, "k", "v", (0.251, 0.252))  # integer-percent collision


def test_quantiles_by_null_key_group_kept(ray_session):
    # SQL GROUP BY emits a row for the NULL key group; it must survive here
    df = pd.DataFrame(
        {"k": ["a", None, "a", None], "v": [1.0, 9.0, 3.0, 11.0]}
    )
    got = (
        quantiles_by(ray.data.from_pandas(df).repartition(3), "k", "v", (0.5,))
        .to_pandas()
        .sort_values("k", na_position="last")
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        "SELECT k, quantile_disc(v, 0.5) q50 FROM df GROUP BY k "
        "ORDER BY k NULLS LAST"
    ).df()
    assert got.equals(exp)


def test_quantiles_by_huge_int_keys_with_null(ray_session):
    # int64 keys above 2^53 with a null in the column: a pandas float64
    # round-trip would merge adjacent distinct keys — boundaries must be
    # detected on exact codes (regression for the dictionary-code fix)
    import pyarrow as pa

    k1 = 2**53 + 0  # 9007199254740992
    k2 = 2**53 + 1  # adjacent, equal as float64
    t = pa.table(
        {
            "k": pa.array([k1, k1, k2, k2, None], type=pa.int64()),
            "v": pa.array([1.0, 3.0, 10.0, 30.0, 7.0]),
        }
    )
    from mismo_ray._util import collect_table

    # stay in Arrow end-to-end: a pandas round-trip would itself collapse
    # these keys to the same float64
    got = collect_table(
        quantiles_by(ray.data.from_arrow(t).repartition(2), "k", "v", (0.5,))
    )
    rows = sorted(
        got.to_pylist(), key=lambda r: (r["k"] is None, r["k"])
    )
    assert [r["k"] for r in rows] == [k1, k2, None]
    assert [r["q50"] for r in rows] == [1.0, 10.0, 7.0]
