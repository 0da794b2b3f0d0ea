"""Link-set evaluation ops (cluster.pr_curve / cluster.blocking_report)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def test_pr_curve_matches_bruteforce(ray_session):
    from mismo_ray.cluster import pr_curve

    rng = np.random.default_rng(11)
    n = 5000
    score = rng.integers(0, 100, n).astype(np.int64)
    # truth correlated with score so the curve is non-trivial
    is_true = rng.random(n) < (score / 120.0)
    links = ray.data.from_arrow(
        pa.table({"s": score, "y": pa.array(is_true)})
    ).repartition(7)
    th = [10, 35, 60, 90]
    out = pr_curve(
        links, score_column="s", truth_column="y", thresholds=th
    ).to_pandas()
    assert list(out["threshold"]) == th
    n_true = int(is_true.sum())
    for _, row in out.iterrows():
        t = row["threshold"]
        tp = int((is_true & (score >= t)).sum())
        fp = int((~is_true & (score >= t)).sum())
        assert row["tp"] == tp and row["fp"] == fp
        assert row["fn"] == n_true - tp
        assert row["precision"] == (tp / (tp + fp) if tp + fp else 1.0)
        assert row["recall"] == tp / n_true
    # precision should be monotone-ish increasing on this synthetic corpus
    assert out["precision"].iloc[-1] > out["precision"].iloc[0]
    assert (np.diff(out["recall"]) <= 0).all()  # recall falls as t rises


def test_pr_curve_empty_classes(ray_session):
    from mismo_ray.cluster import pr_curve

    links = ray.data.from_arrow(
        pa.table({"s": pa.array([1, 2], type=pa.int64()), "y": pa.array([False, False])})
    )
    out = pr_curve(
        links, score_column="s", truth_column="y", thresholds=[0, 5]
    ).to_pandas()
    assert (out["tp"] == 0).all()
    assert (out["recall"] == 1.0).all()  # no true pairs -> recall vacuously 1
    assert out.loc[1, "precision"] == 1.0  # empty prediction at t=5


def test_blocking_report(ray_session):
    from mismo_ray.cluster import blocking_report

    cand = ray.data.from_arrow(
        pa.table(
            {
                "record_id_l": pa.array([0, 0, 1, 2], type=pa.int64()),
                "record_id_r": pa.array([1, 2, 2, 3], type=pa.int64()),
            }
        )
    )
    true = ray.data.from_arrow(
        pa.table(
            {
                "record_id_l": pa.array([0, 1, 5], type=pa.int64()),
                "record_id_r": pa.array([1, 2, 6], type=pa.int64()),
            }
        )
    )
    rep = blocking_report(cand, true, n_left=10)
    assert rep["n_candidates"] == 4
    assert rep["n_true"] == 3
    assert rep["true_found"] == 2  # (0,1) and (1,2); (5,6) was missed
    assert rep["pair_completeness"] == 2 / 3
    assert rep["total_pairs"] == 45
    assert rep["reduction_ratio"] == 1.0 - 4 / 45
