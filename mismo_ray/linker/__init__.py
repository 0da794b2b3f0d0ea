from mismo_ray.linker._basic import EmptyLinker, FullLinker, IDLinker
from mismo_ray.linker._common import Linker, Task, infer_task
from mismo_ray.linker._key_linker import KeyLinker
from mismo_ray.linker._sample import sample_all_links, sample_records

__all__ = [
    "EmptyLinker",
    "FullLinker",
    "IDLinker",
    "KeyLinker",
    "Linker",
    "Task",
    "infer_task",
    "sample_all_links",
    "sample_records",
]
