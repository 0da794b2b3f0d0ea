from mismo_ray.linker._basic import EmptyLinker, FullLinker, IDLinker
from mismo_ray.linker._common import Linker, Task, infer_task
from mismo_ray.linker._embedding import EmbeddingLinker
from mismo_ray.linker._join_linker import JoinLinker
from mismo_ray.linker._key_linker import KeyLinker
from mismo_ray.linker._lsh import MinhashLshLinker
from mismo_ray.linker._fused_or import FusedOrLinker
from mismo_ray.linker._or_linker import OrLinker
from mismo_ray.linker._sample import sample_all_links, sample_records
from mismo_ray.linker._sorted_neighborhood import SortedNeighborhoodLinker
from mismo_ray.linker._spelling import SpellingLinker
from mismo_ray.linker._unnest import UnnestLinker

__all__ = [
    "EmbeddingLinker",
    "EmptyLinker",
    "FullLinker",
    "IDLinker",
    "JoinLinker",
    "KeyLinker",
    "Linker",
    "MinhashLshLinker",
    "FusedOrLinker",
    "OrLinker",
    "SortedNeighborhoodLinker",
    "SpellingLinker",
    "Task",
    "UnnestLinker",
    "infer_task",
    "sample_all_links",
    "sample_records",
]
