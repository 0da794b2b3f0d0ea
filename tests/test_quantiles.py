"""Exact distributed quantiles (util_ops.quantiles) vs DuckDB quantile_disc."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import ray
import ray.data


def _check(vals: np.ndarray, qs, ray_session=None):
    from mismo_ray.util_ops import quantiles

    t = pa.table({"x": pa.array(vals, type=pa.float64())})
    ds = ray.data.from_arrow(t).repartition(5)
    got = quantiles(ds, "x", qs)
    con = duckdb.connect()
    con.register("t", t)
    for q in qs:
        want = con.execute(f"SELECT quantile_disc(x, {q}) FROM t").fetchone()[0]
        if want is None:
            assert np.isnan(got[q]), (q, got[q])
        else:
            assert got[q] == want, (q, got[q], want)


QS = [0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]


def test_uniform_random(ray_session):
    rng = np.random.default_rng(0)
    _check(rng.random(20_000) * 1000 - 500, QS)


def test_heavy_ties_and_skew(ray_session):
    rng = np.random.default_rng(1)
    vals = np.concatenate(
        [
            np.zeros(5000),
            np.full(3000, 7.5),
            rng.lognormal(0, 4, 2000),
            -rng.lognormal(0, 4, 500),
        ]
    )
    rng.shuffle(vals)
    _check(vals, QS)


def test_negatives_and_extremes(ray_session):
    vals = np.array(
        [-1e300, -1.0, -0.0, 0.0, 1e-308, 2.5, 1e300, 42.0, -42.0, 3.14]
    )
    _check(vals, QS)


def test_nulls_and_nans_excluded(ray_session):
    from mismo_ray.util_ops import quantiles

    t = pa.table(
        {"x": pa.array([1.0, None, 2.0, float("nan"), 3.0], type=pa.float64())}
    )
    got = quantiles(ray.data.from_arrow(t), "x", [0.0, 0.5, 1.0])
    assert got == {0.0: 1.0, 0.5: 2.0, 1.0: 3.0}


def test_integer_column(ray_session):
    from mismo_ray.util_ops import quantiles

    t = pa.table({"x": pa.array(list(range(101)), type=pa.int64())})
    got = quantiles(ray.data.from_arrow(t).repartition(3), "x", [0.5, 0.95])
    assert got[0.5] == 50.0
    assert got[0.95] == 95.0  # ceil(.95*101)-1 = 95


def test_all_null(ray_session):
    from mismo_ray.util_ops import quantiles

    t = pa.table({"x": pa.array([None, None], type=pa.float64())})
    got = quantiles(ray.data.from_arrow(t), "x", [0.5])
    assert np.isnan(got[0.5])
