"""JoinLinker: linker from a structured join condition
(reference: /root/reference/mismo/linker/_join_linker.py:13-68).

The reference accepts arbitrary boolean conditions and inspects the SQL
EXPLAIN plan to reject O(n*m) algorithms (mismo/joins/_analyze.py:42-111).
Here the guard is by construction (SURVEY §2.3): only key-partitionable
conditions exist — equi-keys (strings / callables / (left, right) pairs,
exactly KeyLinker's surface). A condition that cannot be expressed as keys
raises immediately instead of silently planning a cross join: there is no
generic theta-join at 10^12 rows.
"""

from __future__ import annotations

import ray.data

from mismo_ray.linker._common import Task
from mismo_ray.linker._key_linker import KeyLinker
from mismo_ray.types import Linkage


class JoinLinker:
    def __init__(self, condition, *, task: Task | None = None, **key_linker_kwargs):
        try:
            self._linker = KeyLinker(condition, task=task, **key_linker_kwargs)
        except TypeError as e:
            raise TypeError(
                "JoinLinker only supports key-partitionable equi-conditions "
                "(column names, callables, (left, right) pairs); arbitrary "
                "boolean joins would be O(n*m) at scale and are rejected "
                "by construction"
            ) from e

    def __call__(
        self, left: ray.data.Dataset, right: ray.data.Dataset
    ) -> Linkage:
        return self._linker(left, right)
