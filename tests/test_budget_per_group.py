"""util_ops.budget_per_group — per-group weight-budget prefix cap."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from mismo_ray._util import splitmix64
from mismo_ray.util_ops import budget_per_group


def _rank(ids: list[int], seed: int = 0) -> np.ndarray:
    with np.errstate(over="ignore"):
        return splitmix64(
            np.asarray(ids, dtype=np.int64).astype(np.uint64)
            + np.uint64(seed & 0xFFFFFFFFFFFFFFFF)
        )


def _oracle(tbl: pa.Table, budget: int, seed: int = 0) -> set[int]:
    """Driver-side reference: per group, hash-rank order, keep the prefix
    whose running sum stays <= budget."""
    import pandas as pd

    pdf = tbl.to_pandas()
    pdf["rk"] = _rank(pdf["record_id"].tolist(), seed)
    keep: set[int] = set()
    for _, g in pdf.groupby("grp", dropna=False):
        run = 0
        for _, row in g.sort_values("rk").iterrows():
            w = 0 if pd.isna(row["w"]) else int(row["w"])
            run += w
            if run > budget:
                break
            keep.add(int(row["record_id"]))
    return keep


def _table(n: int = 60) -> pa.Table:
    return pa.table(
        {
            "record_id": list(range(n)),
            "grp": [f"g{i % 5}" for i in range(n)],
            "w": pa.array(
                [None if i % 13 == 0 else (i % 7) * 10 + 5 for i in range(n)],
                pa.int64(),
            ),
        }
    )


def test_matches_prefix_oracle(ray_session):
    tbl = _table()
    out = budget_per_group(
        ray.data.from_arrow(tbl), "grp", 60, "w", id_column="record_id"
    ).take_all()
    got = {int(r["record_id"]) for r in out}
    assert got == _oracle(tbl, 60)
    assert 0 < len(got) < len(tbl)  # the budget actually bites


def test_prefix_not_greedy(ray_session):
    """The first overflowing rank kills everything after it, even rows that
    would individually fit the remaining budget."""
    ids = [0, 1, 2, 3, 4]
    rk = _rank(ids)
    order = [ids[i] for i in np.argsort(rk)]
    # weights by rank position: 10, 10, 100 (overflow), 1, 1
    w_by_pos = {order[0]: 10, order[1]: 10, order[2]: 100, order[3]: 1, order[4]: 1}
    tbl = pa.table(
        {
            "record_id": ids,
            "grp": ["g"] * 5,
            "w": pa.array([w_by_pos[i] for i in ids], pa.int64()),
        }
    )
    out = budget_per_group(
        ray.data.from_arrow(tbl), "grp", 50, "w", id_column="record_id"
    ).take_all()
    got = {int(r["record_id"]) for r in out}
    assert got == {order[0], order[1]}


def test_null_weight_counts_zero(ray_session):
    tbl = pa.table(
        {
            "record_id": [0, 1, 2],
            "grp": ["g"] * 3,
            "w": pa.array([None, None, None], pa.int64()),
        }
    )
    out = budget_per_group(
        ray.data.from_arrow(tbl), "grp", 0, "w", id_column="record_id"
    ).take_all()
    assert len(out) == 3  # all-zero running sum never exceeds even budget 0


def test_deterministic_and_empty(ray_session):
    tbl = _table(40)
    a = budget_per_group(
        ray.data.from_arrow(tbl), "grp", 45, "w", id_column="record_id"
    ).take_all()
    b = budget_per_group(
        ray.data.from_arrow(tbl), "grp", 45, "w", id_column="record_id"
    ).take_all()
    assert {r["record_id"] for r in a} == {r["record_id"] for r in b}
    empty = budget_per_group(
        ray.data.from_arrow(tbl.slice(0, 0)), "grp", 45, "w", id_column="record_id"
    )
    assert empty.count() == 0
