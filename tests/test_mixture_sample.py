"""Deterministic mixture resampling (util_ops.mixture_sample)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _docs(n: int = 4000):
    rng = np.arange(n, dtype=np.int64)
    t = pa.table(
        {
            "record_id": rng,
            "source": pa.array(np.array(["a", "b", "c", "d"])[rng % 4]),
        }
    )
    return ray.data.from_arrow(t).repartition(4)


def test_rates_hit_expectation(ray_session):
    from mismo_ray.util_ops import mixture_sample

    rates = {"a": 0.25, "b": 1.0, "c": 2.5, "d": 0.0}
    out = mixture_sample(_docs(), rates, seed=3).to_pandas()
    per = out.groupby("source").size().to_dict()
    assert per.get("d", 0) == 0
    assert per["b"] == 1000
    assert 2400 <= per["c"] <= 2600
    assert 200 <= per["a"] <= 300
    # copy indices: every row with k copies carries 0..k-1
    c = out[out["source"] == "c"]
    per_id = c.groupby("record_id")["n_copy"].agg(["size", "min", "max"])
    assert (per_id["min"] == 0).all()
    assert (per_id["max"] == per_id["size"] - 1).all()
    assert set(per_id["size"]) <= {2, 3}


def test_deterministic_and_nested(ray_session):
    from mismo_ray.util_ops import mixture_sample

    a = mixture_sample(_docs(), {"a": 0.3}, seed=9).to_pandas()
    b = mixture_sample(_docs().repartition(7), {"a": 0.3}, seed=9).to_pandas()
    assert sorted(a["record_id"]) == sorted(b["record_id"])
    # nested property: sample at 0.2 is a subset of sample at 0.6
    lo = mixture_sample(_docs(), {"a": 0.2, "b": 0.2, "c": 0.2, "d": 0.2}, seed=9)
    hi = mixture_sample(_docs(), {"a": 0.6, "b": 0.6, "c": 0.6, "d": 0.6}, seed=9)
    lo_ids = set(lo.to_pandas()["record_id"])
    hi_ids = set(hi.to_pandas()["record_id"])
    assert lo_ids <= hi_ids


def test_downsample_only_keeps_schema(ray_session):
    from mismo_ray.util_ops import mixture_sample

    out = mixture_sample(_docs(100), {"a": 0.5}, seed=1)
    df = out.to_pandas()
    assert list(df.columns) == ["record_id", "source"]  # no copy column
    # groups not in rates pass through at default_rate=1.0
    assert (df["source"] != "a").sum() == 75


def test_string_id_path(ray_session):
    from mismo_ray.util_ops import mixture_sample

    t = pa.table(
        {
            "rid": pa.array([f"u{i}" for i in range(1000)]),
            "source": pa.array(["a", "b"] * 500),
        }
    )
    ds = ray.data.from_arrow(t)
    out = mixture_sample(
        ds, {"a": 0.5, "b": 0.0}, id_column="rid", seed=2
    ).to_pandas()
    assert (out["source"] == "a").all()
    assert 180 <= len(out) <= 320
