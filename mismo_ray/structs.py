"""Struct-column utilities (reference: /root/reference/mismo/_structs.py:10-127).

The reference exposes small ibis helpers for working with struct VALUES —
mutate/drop/select/rename/unpack plus equality and null predicates.  Here
they are Arrow-native kernels over ``pa.StructArray`` / ``ChunkedArray``
(zero-copy field re-arrangement: a struct rebuild shuffles child-array
POINTERS, never data), usable directly inside ``map_batches`` batch fns —
plus a Dataset-level ``unpack_struct`` that expands a struct column into
top-level columns.

Null semantics (pinned by tests/test_structs.py):

- mutate/drop/select/rename preserve the TOP-LEVEL validity of the input
  struct (a null struct row stays a null struct row).
- ``struct_equal`` is the Kleene AND of per-field equality, mirroring the
  reference's ``ibis.and_(left[f] == right[f])`` (SQL AND): a null
  comparison yields null UNLESS another compared field is definitely
  unequal, in which case FALSE wins.
- ``struct_isnull`` counts a null STRUCT row as null in every field
  (reference ``struct.isnull() | ...``).
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _as_struct(arr) -> pa.StructArray:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not pa.types.is_struct(arr.type):
        raise TypeError(f"expected a struct array, got {arr.type}")
    return arr


def _null_mask(arr: pa.StructArray) -> np.ndarray | None:
    """True-where-NULL mask for from_arrays, or None when fully valid."""
    if arr.null_count == 0:
        return None
    return ~np.asarray(arr.is_valid(), dtype=bool)


def _rebuild(
    fields: dict[str, pa.Array], mask: np.ndarray | None
) -> pa.StructArray:
    names = list(fields.keys())
    arrays = [
        a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
        for a in fields.values()
    ]
    if mask is None:
        return pa.StructArray.from_arrays(arrays, names=names)
    return pa.StructArray.from_arrays(arrays, names=names, mask=pa.array(mask))


def _field_dict(arr: pa.StructArray) -> dict[str, pa.Array]:
    return {f.name: arr.field(f.name) for f in arr.type}


def struct_mutate(arr, **kwargs) -> pa.StructArray:
    """Add or replace struct fields (reference _structs.py:10-16, the
    ``Table.mutate`` analogue).  Values may be ``pa.Array``s (len-matched)
    or python scalars (broadcast)."""
    arr = _as_struct(arr)
    fields = _field_dict(arr)
    for name, val in kwargs.items():
        if not isinstance(val, (pa.Array, pa.ChunkedArray)):
            # pa.repeat infers the type from the SCALAR, so a zero-row
            # batch gets the same field type as a populated one (a bare
            # pa.array([]) would infer null and split the Dataset schema)
            val = pa.repeat(pa.scalar(val), len(arr))
        fields[name] = val
    return _rebuild(fields, _null_mask(arr))


def struct_drop(arr, *drop_fields: str) -> pa.StructArray:
    """Drop struct fields (reference _structs.py:19-26)."""
    arr = _as_struct(arr)
    missing = [f for f in drop_fields if arr.type.get_field_index(f) < 0]
    if missing:
        raise KeyError(f"struct has no field(s) {missing}")
    fields = {
        k: v for k, v in _field_dict(arr).items() if k not in set(drop_fields)
    }
    if not fields:
        raise ValueError("cannot drop every field of a struct")
    return _rebuild(fields, _null_mask(arr))


def struct_select(arr, *keep_fields: str) -> pa.StructArray:
    """Keep only ``keep_fields``, in the given order (reference
    _structs.py:29-33)."""
    arr = _as_struct(arr)
    missing = [f for f in keep_fields if arr.type.get_field_index(f) < 0]
    if missing:
        raise KeyError(f"struct has no field(s) {missing}")
    if not keep_fields:
        raise ValueError("select needs at least one field")
    fields = {f: arr.field(f) for f in keep_fields}
    return _rebuild(fields, _null_mask(arr))


def struct_rename(arr, **renamings: str) -> pa.StructArray:
    """Rename fields, ``new_name=old_name`` (reference _structs.py:36-41).
    Like the reference (dict ``pop`` + reinsert), a renamed field MOVES to
    the end of the struct."""
    arr = _as_struct(arr)
    fields = _field_dict(arr)
    for new, old in renamings.items():
        if old not in fields:
            raise KeyError(f"struct has no field {old!r}")
        fields[new] = fields.pop(old)
    return _rebuild(fields, _null_mask(arr))


def struct_equal(left, right, *, fields: Iterable[str] | None = None):
    """AND of per-field equality with SQL null propagation (reference
    _structs.py:54-62).  Returns a BooleanArray."""
    left, right = _as_struct(left), _as_struct(right)
    if fields is None:
        names_l = [f.name for f in left.type]
        names_r = [f.name for f in right.type]
        if names_l != names_r:
            raise ValueError(
                f"field sets differ: {names_l} vs {names_r}; pass fields="
            )
        fields = names_l
    fields = list(fields)
    if not fields:
        raise ValueError("fields must be non-empty")
    out = None
    for f in fields:
        # pc.struct_field propagates the parent null bitmap (a null struct
        # row has null fields); raw .field() children may hold garbage there.
        # and_kleene = SQL/ibis AND: FALSE AND NULL is FALSE, so one
        # definitely-unequal field decides even when another is null
        eq = pc.equal(pc.struct_field(left, f), pc.struct_field(right, f))
        out = eq if out is None else pc.and_kleene(out, eq)
    return out


def struct_isnull(arr, *, how: str = "any", fields: Iterable[str] | None = None):
    """Are any/all of the fields null? A null struct row is null in every
    field (reference _structs.py:65-80).  Returns a BooleanArray (never
    null)."""
    arr = _as_struct(arr)
    if how not in ("any", "all"):
        raise ValueError(f"how must be 'any' or 'all'. Got {how}")
    names = [f.name for f in arr.type] if fields is None else list(fields)
    if not names:
        raise ValueError("fields must be non-empty")
    acc = None
    for f in names:
        isn = pc.is_null(pc.struct_field(arr, f))
        if acc is None:
            acc = isn
        else:
            acc = pc.or_(acc, isn) if how == "any" else pc.and_(acc, isn)
    return pc.or_(acc, pc.is_null(arr))


def struct_unpack(
    table: pa.Table, column: str, *, prefix: str = "", keep: bool = False
) -> pa.Table:
    """Expand a struct column of ``table`` into top-level columns named
    ``{prefix}{field}`` (reference _structs.py:44-50, the
    ``Table.unpack("my_struct_col")`` analogue).  Null struct rows unpack
    to all-null fields.  ``keep=True`` retains the struct column."""
    arr = _as_struct(table[column])
    idx = table.schema.get_field_index(column)
    out = table if keep else table.remove_column(idx)
    for f in arr.type:
        name = f"{prefix}{f.name}"
        if name in out.schema.names:
            raise ValueError(f"unpacked name {name!r} collides; set prefix=")
        out = out.append_column(name, pc.struct_field(arr, f.name))
    return out


def unpack_struct(ds, column: str, *, prefix: str = "", keep: bool = False):
    """Dataset-level :func:`struct_unpack`: one zero-copy ``map_batches``."""

    def fn(t: pa.Table) -> pa.Table:
        return struct_unpack(t, column, prefix=prefix, keep=keep)

    return ds.map_batches(fn, batch_format="pyarrow")


__all__ = [
    "struct_mutate",
    "struct_drop",
    "struct_select",
    "struct_rename",
    "struct_equal",
    "struct_isnull",
    "struct_unpack",
    "unpack_struct",
]
