"""LevelComparer: tiered agreement levels for one dimension of a record pair.

Reference: EnumComparer (/root/reference/mismo/compare/_enum_comparer.py:14-81).
Semantics: go through the (condition, level) cases in order; FIRST match wins;
pairs matching no case get the "else" level. Appends one column named
``self.name`` to the pairs table, as integers (default) or strings.

Ray-Data mapping: conditions are vectorized predicates
``fn(batch: pa.Table) -> bool ndarray`` over the links batch (with ``_l``/
``_r`` columns attached); the cascade is a ``np.select`` inside one
``map_batches`` — no per-row python.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Sequence

import numpy as np
import pyarrow as pa
import ray.data

ConditionFn = Callable[[pa.Table], np.ndarray]


class LevelComparer:
    def __init__(
        self,
        name: str,
        levels: Sequence[str],
        cases: Iterable[tuple[ConditionFn, str]],
        *,
        representation: str = "integer",
    ):
        self.name = name
        levels = list(levels)
        if "else" not in levels:
            levels.append("else")
        if levels[-1] != "else":
            raise ValueError("'else' must be the last level")
        self.levels = levels
        self.cases = [(cond, lev) for cond, lev in cases]
        for _, lev in self.cases:
            if lev not in self.levels:
                raise ValueError(f"case level {lev!r} not in levels {self.levels}")
        if representation not in ("integer", "string"):
            raise ValueError(f"Invalid representation: {representation}")
        self.representation = representation

    def label_batch(self, batch: pa.Table) -> pa.Array:
        """Vectorized first-match-wins cascade over one batch of pairs."""
        n = len(batch)
        conds = []
        choices = []
        for cond, lev in self.cases:
            mask = np.asarray(cond(batch), dtype=bool)
            if mask.shape != (n,):
                raise ValueError(
                    f"condition for level {lev!r} returned shape {mask.shape}, "
                    f"expected ({n},)"
                )
            conds.append(mask)
            choices.append(self.levels.index(lev))
        else_idx = len(self.levels) - 1
        out = np.select(conds, choices, default=else_idx) if conds else np.full(
            n, else_idx
        )
        if self.representation == "string":
            return pa.array([self.levels[i] for i in out], type=pa.string())
        return pa.array(out.astype(np.int64))

    def __call__(self, pairs: ray.data.Dataset) -> ray.data.Dataset:
        def fn(batch: pa.Table) -> pa.Table:
            return batch.append_column(self.name, self.label_batch(batch))

        return pairs.map_batches(fn, batch_format="pyarrow")

    def __repr__(self) -> str:
        return f"LevelComparer(name={self.name}, levels={self.levels})"


def compare(
    pairs: ray.data.Dataset, comparers: Sequence[LevelComparer]
) -> ray.data.Dataset:
    """Apply every comparer in ONE map_batches pass (one column per comparer)."""

    def fn(batch: pa.Table) -> pa.Table:
        for c in comparers:
            batch = batch.append_column(c.name, c.label_batch(batch))
        return batch

    return pairs.map_batches(fn, batch_format="pyarrow")
