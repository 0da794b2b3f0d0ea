"""Linker protocol + task inference
(reference: /root/reference/mismo/linker/_common.py:11-28)."""

from __future__ import annotations

from typing import Literal, Protocol, runtime_checkable

import ray.data

from mismo_ray.types import Linkage

Task = Literal["dedupe", "link"]


@runtime_checkable
class Linker(Protocol):
    """Callable ``(left, right) -> Linkage``; the user-extension surface."""

    def __call__(
        self, left: ray.data.Dataset, right: ray.data.Dataset
    ) -> Linkage: ...


def infer_task(
    *, task: Task | None, left: ray.data.Dataset, right: ray.data.Dataset
) -> Task:
    """Same Dataset object on both sides -> "dedupe" (pairs get
    record_id_l < record_id_r), else "link"
    (reference mismo/linker/_common.py:21-28)."""
    if task is not None:
        return task
    return "dedupe" if left is right else "link"
