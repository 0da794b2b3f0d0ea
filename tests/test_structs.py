"""Struct-utility family parity with reference mismo/_structs.py:10-127:
mutate/drop/select/rename/unpack + struct_equal/struct_isnull, with the
top-level-null preservation the Arrow layout makes easy to get wrong."""

from __future__ import annotations

import pyarrow as pa
import pytest

from mismo_ray.structs import (
    struct_drop,
    struct_equal,
    struct_isnull,
    struct_mutate,
    struct_rename,
    struct_select,
    struct_unpack,
    unpack_struct,
)


@pytest.fixture
def arr():
    return pa.array(
        [
            {"a": 1, "b": "x", "c": 1.5},
            {"a": 2, "b": None, "c": 2.5},
            None,
            {"a": None, "b": "z", "c": None},
        ],
        type=pa.struct([("a", pa.int64()), ("b", pa.string()), ("c", pa.float64())]),
    )


def test_mutate_add_and_replace(arr):
    out = struct_mutate(arr, d=pa.array([10, 20, 30, 40]), a=99)
    assert [f.name for f in out.type] == ["a", "b", "c", "d"]
    rows = out.to_pylist()
    assert rows[0] == {"a": 99, "b": "x", "c": 1.5, "d": 10}
    assert rows[2] is None  # null struct row preserved
    assert rows[3]["d"] == 40


def test_drop(arr):
    out = struct_drop(arr, "b")
    assert [f.name for f in out.type] == ["a", "c"]
    assert out.to_pylist()[2] is None
    with pytest.raises(KeyError):
        struct_drop(arr, "nope")
    with pytest.raises(ValueError):
        struct_drop(arr, "a", "b", "c")


def test_select_order(arr):
    out = struct_select(arr, "c", "a")
    assert [f.name for f in out.type] == ["c", "a"]
    assert out.to_pylist()[0] == {"c": 1.5, "a": 1}
    assert out.to_pylist()[2] is None
    with pytest.raises(KeyError):
        struct_select(arr, "nope")


def test_rename_moves_to_end(arr):
    # reference semantics: dict pop + reinsert appends the renamed field
    out = struct_rename(arr, alpha="a")
    assert [f.name for f in out.type] == ["b", "c", "alpha"]
    assert out.to_pylist()[1] == {"b": None, "c": 2.5, "alpha": 2}
    assert out.to_pylist()[2] is None
    with pytest.raises(KeyError):
        struct_rename(arr, x="nope")


def test_struct_equal_null_propagation(arr):
    other = pa.array(
        [
            {"a": 1, "b": "x", "c": 1.5},
            {"a": 2, "b": "y", "c": 2.5},
            {"a": 3, "b": "q", "c": 3.5},
            {"a": None, "b": "z", "c": None},
        ],
        type=arr.type,
    )
    eq = struct_equal(arr, other)
    # row0 all equal -> True; row1 b null -> null; row2 left struct null ->
    # null; row3 nulls in compared fields -> null
    assert eq.to_pylist() == [True, None, None, None]
    eq_b = struct_equal(arr, other, fields=["b"])
    assert eq_b.to_pylist() == [True, None, None, True]
    # Kleene AND (SQL/ibis semantics): a definitely-unequal field decides
    # even when another compared field is null — FALSE AND NULL = FALSE
    l2 = pa.array(
        [{"a": 1, "b": None}],
        type=pa.struct([("a", pa.int64()), ("b", pa.string())]),
    )
    r2 = pa.array([{"a": 2, "b": "x"}], type=pa.struct([("a", pa.int64()), ("b", pa.string())]))
    assert struct_equal(l2, r2).to_pylist() == [False]


def test_struct_isnull(arr):
    assert struct_isnull(arr, how="any").to_pylist() == [False, True, True, True]
    assert struct_isnull(arr, how="all").to_pylist() == [False, False, True, False]
    assert struct_isnull(arr, how="any", fields=["a"]).to_pylist() == [
        False,
        False,
        True,
        True,
    ]
    with pytest.raises(ValueError):
        struct_isnull(arr, how="none")


def test_struct_unpack_table(arr):
    t = pa.table({"id": pa.array([1, 2, 3, 4]), "s": arr})
    out = struct_unpack(t, "s")
    assert out.column_names == ["id", "a", "b", "c"]
    # null struct row unpacks to all-null fields (parent bitmap propagated)
    assert out["a"].to_pylist() == [1, 2, None, None]
    assert out["b"].to_pylist() == ["x", None, None, "z"]
    kept = struct_unpack(t, "s", prefix="s_", keep=True)
    assert kept.column_names == ["id", "s", "s_a", "s_b", "s_c"]
    with pytest.raises(ValueError):
        struct_unpack(pa.table({"a": [1, 2, 3, 4], "s": arr}), "s")


def test_unpack_struct_dataset(ray_session, arr):
    import ray.data

    ds = ray.data.from_arrow(pa.table({"id": pa.array([1, 2, 3, 4]), "s": arr}))
    out = unpack_struct(ds, "s").to_pandas()
    assert sorted(out.columns) == ["a", "b", "c", "id"]
    assert out["a"].tolist()[:2] == [1, 2]


def test_struct_mutate_scalar_type_stable_on_empty():
    """Scalar broadcast must infer the field type from the SCALAR so empty
    and populated batches agree (zero-row blocks in a Dataset otherwise
    split the schema)."""
    t = pa.struct([("a", pa.int64())])
    empty = pa.array([], type=t)
    full = pa.array([{"a": 1}], type=t)
    oe = struct_mutate(empty, x=1.5)
    of = struct_mutate(full, x=1.5)
    assert oe.type.field("x").type == of.type.field("x").type == pa.float64()


# ---------------------------------------------------------------- property
try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAS_HYP = True
except ImportError:  # pragma: no cover
    _HAS_HYP = False


if _HAS_HYP:
    _rows = st.lists(
        st.one_of(
            st.none(),
            st.fixed_dictionaries(
                {
                    "a": st.one_of(st.none(), st.integers(-(2**40), 2**40)),
                    "b": st.one_of(st.none(), st.text(max_size=6)),
                }
            ),
        ),
        max_size=12,
    )

    @settings(max_examples=60, deadline=None)
    @given(rows=_rows)
    def test_struct_roundtrip_properties(rows):
        """select+rename+mutate preserve row-level content and top-level
        validity for arbitrary null layouts."""
        t = pa.struct([("a", pa.int64()), ("b", pa.string())])
        arr = pa.array(rows, type=t)
        # select is a projection: field values and struct validity unchanged
        sel = struct_select(arr, "b", "a")
        assert sel.is_valid().to_pylist() == arr.is_valid().to_pylist()
        for f in ("a", "b"):
            import pyarrow.compute as pc

            assert pc.struct_field(sel, f).to_pylist() == pc.struct_field(
                arr, f
            ).to_pylist()
        # rename then rename back is identity up to field order
        back = struct_rename(struct_rename(arr, z="a"), a="z")
        assert struct_select(back, "a", "b").to_pylist() == arr.to_pylist()
        # mutate with an existing field's own values is identity
        import pyarrow.compute as pc

        same = struct_mutate(arr, a=pc.struct_field(arr, "a"))
        assert same.to_pylist() == arr.to_pylist()
        # drop + unpack agree with the original fields
        tbl = pa.table({"s": arr})
        unp = struct_unpack(tbl, "s")
        assert unp["a"].to_pylist() == pc.struct_field(arr, "a").to_pylist()
