from __future__ import annotations

import pyarrow as pa
import pytest
import ray
import ray.data


@pytest.fixture(scope="session")
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture
def t1(ray_session) -> ray.data.Dataset:
    """Port of the reference conftest t1 fixture
    (/root/reference/mismo/conftest.py:59-68)."""
    tbl = pa.table(
        {
            "record_id": [0, 1, 2],
            "int": [1, 2, 3],
            "letter": ["a", "b", "c"],
            "array": pa.array([["a", "b"], ["b"], []], type=pa.list_(pa.string())),
        }
    )
    return ray.data.from_arrow(tbl)


@pytest.fixture
def t2(ray_session) -> ray.data.Dataset:
    """Port of the reference conftest t2 fixture
    (/root/reference/mismo/conftest.py:71-81)."""
    tbl = pa.table(
        {
            "record_id": [90, 91, 92, 93],
            "int": [2, 4, None, None],
            "letter": ["b", "c", "d", None],
            "array": pa.array(
                [["b"], ["c"], ["d"], None], type=pa.list_(pa.string())
            ),
        }
    )
    return ray.data.from_arrow(tbl)


def rows_set(ds, cols=None):
    """Order-insensitive row set of a Dataset / pyarrow Table / DataFrame
    (mirrors the reference's assert_tables_equal,
    /root/reference/mismo/tests/util.py:12-49)."""
    import pandas as pd

    if isinstance(ds, ray.data.Dataset):
        df = ds.to_pandas()
    elif isinstance(ds, pa.Table):
        df = ds.to_pandas()
    elif isinstance(ds, pd.DataFrame):
        df = ds
    else:
        raise TypeError(type(ds))
    if cols is not None:
        if len(df) == 0:
            return set()
        df = df[list(cols)]
    return {tuple(r) for r in df.itertuples(index=False, name=None)}
