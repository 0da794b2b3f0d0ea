"""hash_split: deterministic, partition-independent train/val/test splits."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from mismo_ray.util_ops import hash_split, hash_split_datasets

FR = {"train": 0.8, "val": 0.1, "test": 0.1}


def _ids_ds(n: int, parts: int) -> ray.data.Dataset:
    return ray.data.from_arrow(
        pa.table({"record_id": pa.array(np.arange(n, dtype=np.int64))})
    ).repartition(parts)


def test_hash_split_fractions_and_stability(ray_session):
    n = 20_000
    out = hash_split(_ids_ds(n, 8), FR, seed=7).to_pandas()
    counts = out["split"].value_counts()
    for name, frac in FR.items():
        assert abs(counts[name] / n - frac) < 0.01
    # partition-count independent and run-to-run stable
    out2 = hash_split(_ids_ds(n, 3), FR, seed=7).to_pandas()
    m1 = dict(zip(out["record_id"], out["split"]))
    m2 = dict(zip(out2["record_id"], out2["split"]))
    assert m1 == m2
    # growing the corpus never relabels existing rows
    out3 = hash_split(_ids_ds(2 * n, 8), FR, seed=7).to_pandas()
    m3 = dict(zip(out3["record_id"], out3["split"]))
    assert all(m3[k] == v for k, v in m1.items())
    # a different seed produces a different assignment
    out4 = hash_split(_ids_ds(n, 8), FR, seed=8).to_pandas()
    assert dict(zip(out4["record_id"], out4["split"])) != m1


def test_hash_split_string_ids_and_errors(ray_session):
    t = pa.table({"record_id": pa.array([f"doc-{i}" for i in range(5000)])})
    ds = ray.data.from_arrow(t).repartition(4)
    out = hash_split(ds, FR, seed=1).to_pandas()
    counts = out["split"].value_counts()
    assert abs(counts["train"] / 5000 - 0.8) < 0.02
    with pytest.raises(ValueError):
        hash_split(ds, {"a": 0.5, "b": 0.4})


def test_hash_split_datasets_partition(ray_session):
    splits = hash_split_datasets(_ids_ds(3000, 4), FR, seed=3)
    seen = {}
    total = 0
    for name, d in splits.items():
        ids = d.to_pandas()["record_id"].tolist()
        total += len(ids)
        for i in ids:
            assert i not in seen, f"{i} in both {seen.get(i)} and {name}"
            seen[i] = name
        assert "split" not in d.schema().names
    assert total == 3000


def test_hash_split_rejects_negative_fractions(ray_session):
    import pyarrow as pa
    import pytest
    import ray.data

    from mismo_ray.util_ops import hash_split

    ds = ray.data.from_arrow(
        pa.table({"record_id": pa.array([1, 2, 3], type=pa.int64())})
    )
    with pytest.raises(ValueError, match=">= 0"):
        hash_split(ds, {"train": 1.2, "val": -0.2})


def test_hash_split_rejects_null_int_ids(ray_session):
    import pyarrow as pa
    import pytest
    import ray.data

    from mismo_ray.util_ops import hash_split

    ds = ray.data.from_arrow(
        pa.table({"record_id": pa.array([1, None, 3], type=pa.int64())})
    )
    out = hash_split(ds, {"train": 0.5, "test": 0.5})
    with pytest.raises(Exception, match="id column contains nulls"):
        out.to_pandas()


def test_hash_split_negative_seed_and_dataset_split_names(ray_session):
    import pyarrow as pa
    import ray.data

    from mismo_ray.util_ops import hash_split_datasets

    ds = ray.data.from_arrow(
        pa.table({"record_id": pa.array(list(range(200)), type=pa.int64())})
    )
    # negative seed must not raise; awkward split names must filter correctly
    parts = hash_split_datasets(
        ds, {"o'brien": 0.5, "with space": 0.5}, seed=-7
    )
    ids = {k: set(v.to_pandas()["record_id"]) for k, v in parts.items()}
    # disjoint, exhaustive, and labeled consistently with hash_split's
    # assignment (not just count-preserving)
    assert ids["o'brien"] | ids["with space"] == set(range(200))
    assert not (ids["o'brien"] & ids["with space"])
    assert all(len(s) > 0 for s in ids.values())
    from mismo_ray.util_ops import hash_split

    assigned = hash_split(
        ds, {"o'brien": 0.5, "with space": 0.5}, seed=-7
    ).to_pandas()
    for name, s in ids.items():
        want = set(assigned[assigned["split"] == name]["record_id"])
        assert s == want
    for d in parts.values():
        assert "split" not in d.schema().names

    # negative seed on the STRING-id path (hash64's masked-seed branch,
    # _util.py:48-51) — the only other negative-seed code path
    ds_str = ray.data.from_arrow(
        pa.table({"record_id": pa.array([f"u{i}" for i in range(50)])})
    )
    parts_str = hash_split_datasets(ds_str, {"a": 0.5, "b": 0.5}, seed=-7)
    assert sum(v.count() for v in parts_str.values()) == 50
