"""SymSpell-style deletion-neighborhood spelling linker.

Typo-tolerant blocking the reference reaches only through full JoinLinker
conditions (reference mismo/linker/_join_linker.py predicates evaluate
per candidate pair — O(n^2) unless another blocker narrows first): two
strings within Levenshtein distance <= d share at least one string in
their <=d-character-deletion neighborhoods (Garbe's SymSpell property:
a substitution or insertion at position i maps both sides onto the same
string after deleting position i; a deletion makes one side a variant of
the other; the 0-delete original is always included).  Blocking on hashed
delete-variants therefore has COMPLETE recall for lev <= d, and the exact
vectorized Levenshtein kernel (text/_similarity.py, DuckDB-parity tested)
verifies candidates, so hash collisions or >d variant coincidences never
survive.

Scale shape: one `map_batches` generates all variants of a batch and
hashes them with ONE `hash64` call (the per-row python is bounded string
slicing over `prefix_len`-capped keys); the variant-hash list column then
flows through the same explode -> pairgen (count pre-pass, hot-key
salting, max_pairs) machinery as UnnestLinker; verification is one
`with_both` join + a vectorized edit-distance filter.  Long keys block on
their `prefix_len` prefix — completeness is preserved because the edit
distance of prefixes never exceeds the edit distance of the strings
(standard SymSpell prefix optimization); the verify step always sees the
FULL strings.  Neighborhood sizes are n+1 variants at d=1 and
O(n^2/2) at d=2 of a length-n prefix, so the exploded row count stays
linear in the corpus for fixed `prefix_len`.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from mismo_ray.linker._common import Task, infer_task
from mismo_ray.types import Linkage


class SpellingLinker:
    """Candidates within Levenshtein distance <= ``max_edits`` on
    ``column`` (1 or 2 edits), verified exactly.

    >>> SpellingLinker("name", max_edits=1)(records, records)  # doctest: +SKIP
    """

    def __init__(
        self,
        column: str,
        *,
        max_edits: int = 1,
        prefix_len: int = 24,
        max_pairs: int | None = None,
        salt_rows: int | None = 2048,
        task: Task | None = None,
    ):
        if max_edits not in (1, 2):
            raise ValueError("max_edits must be 1 or 2")
        if prefix_len < max_edits + 1:
            raise ValueError("prefix_len must exceed max_edits")
        self.column = column
        self.max_edits = max_edits
        self.prefix_len = prefix_len
        self.max_pairs = max_pairs
        self.salt_rows = salt_rows
        self.task = task
        self.last_counters: dict = {}

    # ------------------------------------------------------------- blocking
    def _add_variants(self, ds: ray.data.Dataset) -> ray.data.Dataset:
        from mismo_ray._util import hash64

        col, plen, d = self.column, self.prefix_len, self.max_edits

        def fn(t: pa.Table) -> pa.Table:
            texts = t[col].to_pylist()
            variants: list[str] = []
            offsets = np.zeros(len(texts) + 1, dtype=np.int64)
            for i, s in enumerate(texts):
                if s is None:
                    offsets[i + 1] = len(variants)
                    continue
                p = s[:plen]
                seen = {p}
                one = [p[:j] + p[j + 1 :] for j in range(len(p))]
                seen.update(one)
                if d >= 2:
                    for q in one:
                        seen.update(
                            q[:j] + q[j + 1 :] for j in range(len(q))
                        )
                variants.extend(seen)
                offsets[i + 1] = len(variants)
            if variants:
                hashes = pa.array(
                    hash64(variants).astype(np.int64), type=pa.int64()
                )
            else:
                hashes = pa.array([], type=pa.int64())
            lists = pa.ListArray.from_arrays(
                pa.array(offsets, type=pa.int64()).cast(pa.int32()), hashes
            )
            return t.append_column("__spell_keys__", lists)

        return ds.map_batches(fn, batch_format="pyarrow")

    # --------------------------------------------------------------- verify
    def __call__(
        self, left: ray.data.Dataset, right: ray.data.Dataset
    ) -> Linkage:
        from mismo_ray.linker._unnest import UnnestLinker
        from mismo_ray.text import levenshtein_array

        task = infer_task(task=self.task, left=left, right=right)
        bl = self._add_variants(left)
        br = bl if right is left else self._add_variants(right)
        inner = UnnestLinker(
            "__spell_keys__",
            max_pairs=self.max_pairs,
            salt_rows=self.salt_rows,
            task=task,
        )
        cand = inner(bl, br)
        self.last_counters = dict(inner.last_counters)
        col, d = self.column, self.max_edits
        both = cand.links.with_both([col], [col])

        def verify(t: pa.Table) -> pa.Table:
            dist = levenshtein_array(t[f"{col}_l"], t[f"{col}_r"])
            keep = pc.fill_null(pc.less_equal(dist, d), False)
            return t.filter(keep).select(["record_id_l", "record_id_r"])

        links = both.map_batches(verify, batch_format="pyarrow")
        return Linkage(left=left, right=right, links=links)


__all__ = ["SpellingLinker"]
