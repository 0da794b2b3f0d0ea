"""window.window_over — partitioned row-window functions."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from mismo_ray.window import window_over


def _run(df, specs, **kw):
    ds = ray.data.from_pandas(df).repartition(5)
    out = window_over(
        ds, partition_by="k", order_by="ts", specs=specs, **kw
    ).to_pandas()
    return out.sort_values(["k", "ts"]).reset_index(drop=True)


def test_window_all_kinds_match_pandas_reference(ray_session):
    rng = np.random.default_rng(4)
    n = 5000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 40, n),
            "ts": rng.permutation(n),
            "v": pd.array(
                np.where(rng.random(n) < 0.1, None, rng.integers(0, 100, n)),
                dtype="Int64",
            ),
        }
    )
    out = _run(
        df,
        [
            ("lag", "v", "lag1"),
            ("lead", "v", "lead2", 2),
            ("cumsum", "v", "cum"),
            ("rolling_sum", "v", "roll3", 3),
            ("row_number", None, "rn"),
        ],
    )
    exp = df.sort_values(["k", "ts"]).reset_index(drop=True)
    gg = exp.groupby("k", sort=False)
    exp["lag1"] = gg["v"].shift(1)
    exp["lead2"] = gg["v"].shift(-2)
    nn, filled = exp["v"].notna(), exp["v"].fillna(0)
    cs = filled.groupby(exp["k"]).cumsum()
    cnt = nn.groupby(exp["k"]).cumsum()
    exp["cum"] = cs.mask(cnt == 0)
    csp = cs.groupby(exp["k"]).shift(3).fillna(0)
    cntp = cnt.groupby(exp["k"]).shift(3).fillna(0)
    exp["roll3"] = (cs - csp).mask((cnt - cntp) == 0)
    exp["rn"] = gg.cumcount() + 1
    for c in ("lag1", "lead2", "cum", "roll3", "rn"):
        a = out[c].astype("Float64")
        b = exp[c].astype("Float64")
        assert ((a.isna() & b.isna()) | (a == b)).all(), c


def test_window_partition_invariant(ray_session):
    rng = np.random.default_rng(9)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 10, 2000),
            "ts": rng.permutation(2000),
            "v": rng.integers(0, 50, 2000),
        }
    )
    specs = [("cumsum", "v", "cum"), ("row_number", None, "rn")]
    a = (
        window_over(
            ray.data.from_pandas(df).repartition(2),
            partition_by="k", order_by="ts", specs=specs,
        )
        .to_pandas()
        .sort_values(["k", "ts"])
        .reset_index(drop=True)
    )
    b = (
        window_over(
            ray.data.from_pandas(df).repartition(17),
            partition_by="k", order_by="ts", specs=specs, num_buckets=7,
        )
        .to_pandas()
        .sort_values(["k", "ts"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_window_sql_null_semantics(ray_session):
    # leading nulls: cumsum stays NULL until the first non-null; a rolling
    # window containing only nulls is NULL (SQL SUM OVER semantics), never 0
    df = pd.DataFrame(
        {
            "k": ["a"] * 5,
            "ts": range(5),
            "v": pd.array([None, None, 3, None, 4], dtype="Int64"),
        }
    )
    out = _run(df, [("cumsum", "v", "cum"), ("rolling_sum", "v", "roll2", 2)])
    assert [None if pd.isna(v) else int(v) for v in out["cum"]] == [
        None, None, 3, 3, 7,
    ]
    assert [None if pd.isna(v) else int(v) for v in out["roll2"]] == [
        None, None, 3, 3, 4,
    ]


def test_window_float_column_and_edges(ray_session):
    df = pd.DataFrame(
        {
            "k": ["a", "a", "b"],
            "ts": [1, 2, 1],
            "v": [1.5, 2.5, 9.0],
        }
    )
    out = _run(df, [("lag", "v", "prev"), ("lead", "v", "next")])
    assert out["prev"].tolist()[0] is None or np.isnan(out["prev"][0])
    assert out["prev"][1] == 1.5
    # partitions are independent: b's single row has no neighbors
    brow = out[out["k"] == "b"].iloc[0]
    assert np.isnan(brow["prev"]) and np.isnan(brow["next"])


def test_window_validation(ray_session):
    ds = ray.data.from_pandas(pd.DataFrame({"k": ["a"], "ts": [1], "v": [1]}))
    with pytest.raises(ValueError):
        window_over(ds, partition_by="k", order_by="ts", specs=[("bogus", "v", "x")])
    with pytest.raises(ValueError):
        window_over(
            ds, partition_by="k", order_by="ts", specs=[("rolling_sum", "v", "x", 0)]
        )
    with pytest.raises(ValueError):
        window_over(ds, partition_by="k", order_by="ts", specs=[("lag", "v")])


def test_window_null_partition_key_is_one_partition(ray_session):
    # SQL PARTITION BY groups NULL keys into ONE partition; row_number must
    # not crash (pandas dropna would yield NaN cumcounts) and lag/cumsum
    # must treat the null-key rows as ordinary partition members
    df = pd.DataFrame(
        {
            "k": ["a", None, "a", None, "b"],
            "ts": [1, 1, 2, 2, 1],
            "v": [10, 20, 30, 40, 50],
        }
    )
    out = window_over(
        ray.data.from_pandas(df).repartition(3),
        partition_by="k",
        order_by="ts",
        specs=[
            ("row_number", None, "rn"),
            ("cumsum", "v", "cum"),
            ("lag", "v", "prev"),
        ],
    ).to_pandas()
    out = out.sort_values(["k", "ts"], na_position="last").reset_index(drop=True)
    nulls = out[out["k"].isna()].reset_index(drop=True)
    assert nulls["rn"].tolist() == [1, 2]
    assert nulls["cum"].tolist() == [20, 60]
    assert pd.isna(nulls["prev"][0]) and nulls["prev"][1] == 20


def test_window_cummax_cummin_sql_null_semantics(ray_session):
    # SQL MAX/MIN OVER skip nulls: the running extreme carries THROUGH null
    # rows, and is NULL only while every value so far is null
    df = pd.DataFrame(
        {
            "k": ["a"] * 5 + ["b"] * 2,
            "ts": list(range(5)) + [0, 1],
            "v": pd.array([None, 3, None, 1, 7, 2, None], dtype="Int64"),
        }
    )
    out = _run(df, [("cummax", "v", "mx"), ("cummin", "v", "mn")])
    a = out[out["k"] == "a"]
    assert [None if pd.isna(x) else int(x) for x in a["mx"]] == [
        None, 3, 3, 3, 7,
    ]
    assert [None if pd.isna(x) else int(x) for x in a["mn"]] == [
        None, 3, 3, 1, 1,
    ]
    b = out[out["k"] == "b"]
    assert [None if pd.isna(x) else int(x) for x in b["mx"]] == [2, 2]


def test_window_cummax_float_matches_duckdb(ray_session):
    import duckdb

    rng = np.random.default_rng(14)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 8, 1000),
            "ts": rng.permutation(1000),
            "v": np.where(rng.random(1000) < 0.1, np.nan, rng.normal(size=1000)),
        }
    )
    out = _run(df, [("cummax", "v", "mx"), ("cummin", "v", "mn")])
    exp = duckdb.sql(
        "SELECT k, ts, MAX(v) OVER (PARTITION BY k ORDER BY ts "
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) mx, "
        "MIN(v) OVER (PARTITION BY k ORDER BY ts "
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) mn "
        "FROM df ORDER BY k, ts"
    ).df()
    for c in ("mx", "mn"):
        a, b = out[c], exp[c]
        assert ((a.isna() & b.isna()) | (a == b)).all(), c
