"""Null-handling contracts for the streaming/asof/window family (round-5
review findings): null merge keys must not crash asof_join, null keys form
ONE session partition, null values must not poison window sums, null
interval bounds never match, and window_over rejects colliding names."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data


def test_asof_join_null_on_rows(ray_session):
    """SQL ASOF semantics: a null `on` never matches — left rows stay
    (unmatched), right rows are unusable; no ValueError from merge_asof."""
    from mismo_ray.asof import asof_join

    left = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 1, 1], pa.int64()),
                "t": pa.array([10, None, 30], pa.int64()),
                "lv": pa.array(["a", "b", "c"]),
            }
        )
    )
    right = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 1], pa.int64()),
                "t": pa.array([5, None], pa.int64()),
                "rv": pa.array(["x", "y"]),
            }
        )
    )
    out = asof_join(left, right, on="t", by="k").to_pandas()
    assert len(out) == 3  # every left row survives
    by_lv = out.set_index("lv")
    assert by_lv.loc["a", "rv_r"] == "x"
    assert by_lv.loc["c", "rv_r"] == "x"
    # the null-on left row is unmatched; the null-on right row matched nobody
    import pandas as pd

    assert pd.isna(by_lv.loc["b", "rv_r"])
    assert pd.isna(by_lv.loc["b", "t_r"])


def test_asof_join_int64_keys_beyond_2_53(ray_session):
    """ns-epoch-scale int64 `on` values must match exactly (no float64
    rounding): two right rows 128ns apart stay distinct keys."""
    from mismo_ray.asof import asof_join

    base = 2**60
    left = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([1], pa.int64()),
                "t": pa.array([base + 200], pa.int64()),
                "lv": pa.array(["L"]),
            }
        )
    )
    right = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 1], pa.int64()),
                "t": pa.array([base, base + 128], pa.int64()),
                "rv": pa.array(["old", "new"]),
            }
        )
    )
    out = asof_join(left, right, on="t", by="k").to_pandas()
    assert out.loc[0, "rv_r"] == "new"
    assert int(out.loc[0, "t_r"]) == base + 128  # exact, not rounded


def test_sessionize_null_and_nan_keys(ray_session):
    """All null keys = ONE partition (SQL PARTITION BY), for float-NaN keys
    too; session ids are exact ints, and null-ts events are dropped."""
    from mismo_ray.streaming import sessionize

    us = 1_000_000
    ev = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array(
                    [None, None, None, 7.0], type=pa.float64()
                ),
                "ts": pa.array(
                    [0, 10 * us, 10_000 * us, None],
                    type=pa.timestamp("us"),
                ),
            }
        )
    )
    out = sessionize(ev, gap_s=1800).to_pandas()
    # null-ts event dropped; the three null-key events form sessions of the
    # SAME partition: [0,10s] in one session, 10000s in the next
    assert len(out) == 2
    assert sorted(out["session_id"].tolist()) == [0, 1]
    assert out["n_events"].sum() == 3


def test_tumbling_null_value_and_ts(ray_session):
    """Null values are SKIPPED by the sum (SQL SUM), not NaN-poisoning it;
    null-ts events are dropped."""
    from mismo_ray.streaming import tumbling_window_agg

    us = 1_000_000
    ev = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array([1, 1, 1], pa.int64()),
                "ts": pa.array([0, 10 * us, None], type=pa.timestamp("us")),
                "value": pa.array([2.5, None, 9.0], pa.float64()),
            }
        )
    )
    out = tumbling_window_agg(ev, window_s=3600).to_pandas()
    assert len(out) == 1
    assert out.loc[0, "n_events"] == 2  # null-ts row dropped, null-value kept
    assert out.loc[0, "value_sum"] == 2.5  # NOT NaN


def test_interval_join_null_bounds(ray_session):
    """A null bound never contains anything (SQL BETWEEN) — and must not
    trigger the undefined NaN->int band cast / replication blowup."""
    from mismo_ray.asof import interval_join

    left = ray.data.from_arrow(
        pa.table(
            {
                "v": pa.array([5.0, None], pa.float64()),
                "lid": pa.array([0, 1], pa.int64()),
            }
        )
    )
    right = ray.data.from_arrow(
        pa.table(
            {
                "lo": pa.array([0.0, None], pa.float64()),
                "hi": pa.array([10.0, 1e9], pa.float64()),
                "rid": pa.array([100, 101], pa.int64()),
            }
        )
    )
    out = interval_join(
        left, right, left_value="v", right_lo="lo", right_hi="hi", bucket_width=8.0
    ).to_pandas()
    assert out["lid"].tolist() == [0]
    assert out["rid_r"].tolist() == [100]


def test_window_over_rejects_colliding_names(ray_session):
    from mismo_ray.window import window_over

    ds = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([1], pa.int64()),
                "t": pa.array([1], pa.int64()),
                "v": pa.array([1], pa.int64()),
            }
        )
    )
    with pytest.raises(ValueError, match="partition"):
        window_over(ds, partition_by="k", order_by="t", specs=[("lag", "v", "k", 1)])
    with pytest.raises(ValueError, match="duplicate"):
        window_over(
            ds,
            partition_by="k",
            order_by="t",
            specs=[("lag", "v", "x", 1), ("lead", "v", "x", 1)],
        )
    with pytest.raises(ValueError, match="later spec"):
        window_over(
            ds,
            partition_by="k",
            order_by="t",
            specs=[("lag", "v", "w", 1), ("cumsum", "w", "w2")],
        )
