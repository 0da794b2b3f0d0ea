"""Fellegi-Sunter model weights (reference: /root/reference/mismo/fs/_weights.py).

Plain-python dataclasses (NOT tables), broadcast to workers by closure capture
(SURVEY §1.1). Semantics pinned by the reference:

- ``LevelWeights.odds`` = m/u, inf when u == 0 (:59-77);
- ``ComparerWeights`` holds one LevelWeights per non-else level (the else
  level is removed at construction, _train.py:271-280) and maps labels ->
  odds; an else label scores odds 1.0 (reference ``compare_one`` else_=1,
  _weights.py:232-241; we use 1.0 consistently also for ``score_compared``,
  where the reference's SQL cases would yield NULL — a reference wart);
- ``Weights.score_compared`` adds ``{name}_odds`` per comparer plus the total
  ``odds`` product (:269-331); we additionally emit ``log_odds`` (base-10-free
  natural log) for numeric stability at scale;
- JSON round-trip drops else levels (:349-391).
"""

from __future__ import annotations

import json
import math
from collections.abc import Iterable, Iterator
from pathlib import Path

import numpy as np
import pyarrow as pa
import ray.data


def prob_to_odds(p: float) -> float:
    return p / (1 - p) if p < 1 else float("inf")


def odds_to_prob(o: float) -> float:
    return o / (1 + o) if not math.isinf(o) else 1.0


def odds_to_log_odds(o: float) -> float:
    return math.log(o) if o > 0 else float("-inf")


class LevelWeights:
    """m/u weights for one agreement level of one comparer."""

    def __init__(self, name: str, *, m: float, u: float):
        self._name = name
        self._m = m
        self._u = u

    @property
    def name(self) -> str:
        return self._name

    @property
    def m(self) -> float:
        return self._m

    @property
    def u(self) -> float:
        return self._u

    @property
    def odds(self) -> float:
        if self._u == 0:
            return float("inf")
        return self._m / self._u

    @property
    def log_odds(self) -> float:
        return odds_to_log_odds(self.odds)

    def __repr__(self) -> str:
        return f"LevelWeights(name={self.name}, m={self.m}, u={self.u})"

    def __eq__(self, other):
        return (
            isinstance(other, LevelWeights)
            and self.name == other.name
            and self.m == other.m
            and self.u == other.u
        )


class ComparerWeights:
    """Ordered LevelWeights for one comparer; else level excluded."""

    def __init__(self, name: str, level_weights: Iterable[LevelWeights]):
        self.name = name
        self._level_weights = tuple(
            lw for lw in level_weights if lw.name != "else"
        )

    def __getitem__(self, name_or_index: str | int) -> LevelWeights:
        if isinstance(name_or_index, int):
            return self._level_weights[name_or_index]
        for lw in self._level_weights:
            if lw.name == name_or_index:
                return lw
        raise KeyError(name_or_index)

    def __contains__(self, name_or_index) -> bool:
        try:
            self[name_or_index]
            return True
        except (KeyError, IndexError):
            return False

    def __iter__(self) -> Iterator[LevelWeights]:
        return iter(self._level_weights)

    def __len__(self) -> int:
        return len(self._level_weights)

    def odds(self, labels):
        """Odds for a label (str/int) or a vector of labels (ndarray/arrow).

        Integer labels index the comparer's full level list; the else level
        (index len(self)) gets odds 1.0.
        """
        odds_vec = np.array(
            [lw.odds for lw in self._level_weights] + [1.0], dtype=np.float64
        )
        if isinstance(labels, str):
            return self[labels].odds
        if isinstance(labels, (int, np.integer)):
            idx = int(labels)
            return float(odds_vec[min(idx, len(self))])
        if isinstance(labels, (pa.Array, pa.ChunkedArray)):
            # keep the NULL MASK: to_numpy silently widens int-with-null
            # to float64/NaN, which used to miss the integer fast path and
            # send EVERY label (not just the nulls) to the string lookup's
            # odds=1.0 default
            if isinstance(labels, pa.ChunkedArray):
                labels = labels.combine_chunks()
            null_mask = (
                ~np.asarray(labels.is_valid(), dtype=bool)
                if labels.null_count
                else None
            )
            if pa.types.is_integer(labels.type):
                idx = np.asarray(
                    labels.fill_null(len(self)).cast(pa.int64()), dtype=np.int64
                )
                return odds_vec[np.minimum(idx, len(self))]
            labels = labels.to_numpy(zero_copy_only=False)
        else:
            null_mask = None
        labels = np.asarray(labels)
        if labels.dtype.kind in "iu":
            idx = np.minimum(labels.astype(np.int64), len(self))
            return odds_vec[idx]
        if labels.dtype.kind == "f":
            # float labels (a pandas round trip of int-with-null): NaN is
            # the null/else level, finite values index as ints
            nan = np.isnan(labels)
            idx = np.where(nan, len(self), labels).astype(np.int64)
            return odds_vec[np.minimum(idx, len(self))]
        name_to_odds = {lw.name: lw.odds for lw in self._level_weights}
        out = np.array([name_to_odds.get(x, 1.0) for x in labels])
        if null_mask is not None:
            out[null_mask] = 1.0
        return out

    def match_probability(self, labels):
        o = self.odds(labels)
        if isinstance(o, np.ndarray):
            return o / (1 + o)
        return odds_to_prob(o)

    def log_odds(self, labels):
        o = self.odds(labels)
        if isinstance(o, np.ndarray):
            with np.errstate(divide="ignore"):
                return np.log(o)
        return odds_to_log_odds(o)

    def __repr__(self) -> str:
        return f"ComparerWeights(name={self.name}, levels={[lw.name for lw in self]})"

    def __eq__(self, other):
        return (
            isinstance(other, ComparerWeights)
            and self.name == other.name
            and self._level_weights == other._level_weights
        )


class Weights:
    """Dict-like collection of ComparerWeights; JSON-serializable."""

    def __init__(self, comparer_weights: Iterable[ComparerWeights]):
        self._lookup = {cw.name: cw for cw in comparer_weights}

    def __getitem__(self, name: str) -> ComparerWeights:
        return self._lookup[name]

    def __iter__(self) -> Iterator[ComparerWeights]:
        return iter(self._lookup.values())

    def __len__(self) -> int:
        return len(self._lookup)

    def score_compared_batch(self, batch: pa.Table) -> pa.Table:
        """Append {name}_odds per comparer + total ``odds`` and ``log_odds``."""
        total = np.ones(len(batch), dtype=np.float64)
        for cw in self:
            o = cw.odds(batch[cw.name])
            batch = batch.append_column(f"{cw.name}_odds", pa.array(o))
            total = total * o
        with np.errstate(divide="ignore"):
            log_odds = np.log(total)
        batch = batch.append_column("odds", pa.array(total))
        return batch.append_column("log_odds", pa.array(log_odds))

    def score_compared(self, compared: ray.data.Dataset) -> ray.data.Dataset:
        return compared.map_batches(
            self.score_compared_batch, batch_format="pyarrow"
        )

    def compare_and_score(
        self, pairs: ray.data.Dataset, comparers
    ) -> ray.data.Dataset:
        """Label with the comparers and score, all in one map_batches pass."""

        def fn(batch: pa.Table) -> pa.Table:
            for c in comparers:
                batch = batch.append_column(c.name, c.label_batch(batch))
            return self.score_compared_batch(batch)

        return pairs.map_batches(fn, batch_format="pyarrow")

    def to_json(self, path: str | Path | None = None) -> dict:
        d = {
            cw.name: {lw.name: {"m": lw.m, "u": lw.u} for lw in cw}
            for cw in self
        }
        if path is not None:
            Path(path).write_text(json.dumps(d, indent=2))
        return d

    @classmethod
    def from_json(cls, source: dict | str | Path) -> "Weights":
        if not isinstance(source, dict):
            source = json.loads(Path(source).read_text())
        return cls(
            ComparerWeights(
                name,
                [
                    LevelWeights(lev, m=w["m"], u=w["u"])
                    for lev, w in levels.items()
                ],
            )
            for name, levels in source.items()
        )

    def __repr__(self) -> str:
        return f"Weights{tuple(self)}"

    def __eq__(self, other):
        if not isinstance(other, Weights):
            return False
        return sorted(self._lookup) == sorted(other._lookup) and all(
            self[k] == other[k] for k in self._lookup
        )
