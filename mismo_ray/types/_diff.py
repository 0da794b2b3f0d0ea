"""Diff / Updates: 1-1 before/after row comparison
(reference: /root/reference/mismo/types/_diff.py:19-113,
mismo/types/_updates.py:104-120).

Derived via a full-outer hash join on ``record_id``:
- insertions: in after, not in before;
- deletions: in before, not in after;
- updates: in both with any column value changed — each shared column
  represented as struct<before, after>.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from mismo_ray._joins import hash_join


class Diff:
    def __init__(
        self, *, before: ray.data.Dataset, after: ray.data.Dataset
    ):
        self.before = before
        self.after = after
        _b = before.schema(fetch_if_missing=True)
        _a = after.schema(fetch_if_missing=True)
        _empty = pa.schema([pa.field("record_id", pa.int64())])
        bschema = _b.base_schema if _b is not None else _empty
        aschema = _a.base_schema if _a is not None else _empty
        self._shared = [
            c for c in bschema.names if c != "record_id" and c in aschema.names
        ]
        self._btypes = {c: bschema.field(c).type for c in self._shared}
        def tag(name):
            def fn(t: pa.Table) -> pa.Table:
                return t.append_column(name, pa.array([True] * len(t)))

            return fn

        b_pruned = before.select_columns(["record_id", *self._shared]).map_batches(
            tag("__in_b__"), batch_format="pyarrow"
        )
        a_pruned = after.select_columns(["record_id", *self._shared]).map_batches(
            tag("__in_a__"), batch_format="pyarrow"
        )
        # schemas are fully known here (pruned cols + the bool tag), so pass
        # them: a zero-block before/after side has an unobservable schema,
        # and full_outer cannot null-pad the missing side without one
        def pruned_schema(src: pa.Schema, types: dict, tag_name: str) -> pa.Schema:
            rid = (
                src.field("record_id").type
                if "record_id" in src.names
                else pa.int64()
            )
            return pa.schema(
                [
                    pa.field("record_id", rid),
                    *[pa.field(c, types[c]) for c in self._shared],
                    pa.field(tag_name, pa.bool_()),
                ]
            )

        atypes = {c: aschema.field(c).type for c in self._shared}
        self._joined = hash_join(
            b_pruned,
            a_pruned,
            on="record_id",
            how="full_outer",
            left_suffix="__b",
            right_suffix="__a",
            left_schema=pruned_schema(bschema, self._btypes, "__in_b__"),
            right_schema=pruned_schema(aschema, atypes, "__in_a__"),
        )

    def _filtered(self, which: str) -> ray.data.Dataset:
        shared = self._shared
        btypes = self._btypes

        def fn(t: pa.Table) -> pa.Table:
            import numpy as np
            import pyarrow.compute as pc

            in_b = np.asarray(pc.fill_null(t["__in_b__"], False))
            in_a = np.asarray(pc.fill_null(t["__in_a__"], False))
            changed = np.zeros(len(t), dtype=bool)
            for c in shared:
                bcol, acol = t[f"{c}__b"], t[f"{c}__a"]
                # value change incl. null<->value transitions
                eq = pc.fill_null(pc.equal(bcol, acol), False)
                both_null = pc.and_(pc.is_null(bcol), pc.is_null(acol))
                changed |= ~np.asarray(pc.or_(eq, both_null))
            if which == "insertions":
                mask = in_a & ~in_b
            elif which == "deletions":
                mask = in_b & ~in_a
            else:  # updates
                mask = in_b & in_a & changed
            out = t.filter(pa.array(mask))
            cols: dict = {"record_id": out["record_id"]}
            for c in shared:
                cols[c] = pa.StructArray.from_arrays(
                    [
                        out[f"{c}__b"].combine_chunks(),
                        out[f"{c}__a"].combine_chunks(),
                    ],
                    names=["before", "after"],
                )
            return pa.table(cols)

        return self._joined.map_batches(fn, batch_format="pyarrow")

    def insertions(self) -> ray.data.Dataset:
        return self._filtered("insertions")

    def deletions(self) -> ray.data.Dataset:
        return self._filtered("deletions")

    def updates(self) -> ray.data.Dataset:
        return self._filtered("updates")
