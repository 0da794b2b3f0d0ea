"""mismo_ray — a Ray-Data-native record-linkage / data-processing engine.

A from-scratch rebuild of the query and data-processing capabilities of
NickCrews/mismo (reference at /root/reference, cited per-module as file:line)
on top of ``ray.data.Dataset``: blocking → pairwise comparison →
Fellegi-Sunter scoring → transitive clustering, plus the large-scale
training-data operators (dedup, ANN, text analysis) the 100 TB target needs.

Design rules (SURVEY.md §7):
- every stage is a ``Dataset -> Dataset`` transform over Arrow batches;
- stateful stages are actor pools (callable classes in ``map_batches``);
- shuffles are explicit and keyed (blocking key, pair id, component id);
- randomness derives from (seed, key) hashes — never runtime RNG;
- nothing here calls ``ray.init``/``ray.shutdown`` (the caller owns the session).
"""

from mismo_ray.compare import LevelComparer, compare
from mismo_ray.keys import KeySpec, resolve_keys
from mismo_ray.linker import (
    EmptyLinker,
    FullLinker,
    IDLinker,
    JoinLinker,
    KeyLinker,
    Linker,
    MinhashLshLinker,
    OrLinker,
    SortedNeighborhoodLinker,
    UnnestLinker,
    infer_task,
    sample_all_links,
)
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
from mismo_ray.types import Diff, Linkage, LinksTable, with_linked_values
from mismo_ray.util_ops import describe, explain

__version__ = "0.1.0"

__all__ = [
    "Diff",
    "EmptyLinker",
    "FullLinker",
    "IDLinker",
    "JoinLinker",
    "KeyLinker",
    "KeySpec",
    "LevelComparer",
    "Linkage",
    "Linker",
    "LinksTable",
    "MinhashLshLinker",
    "OrLinker",
    "SortedNeighborhoodLinker",
    "UnnestLinker",
    "__version__",
    "compare",
    "describe",
    "explain",
    "infer_task",
    "resolve_keys",
    "sample_all_links",
    "struct_drop",
    "struct_equal",
    "struct_isnull",
    "struct_mutate",
    "struct_rename",
    "struct_select",
    "struct_unpack",
    "unpack_struct",
    "with_linked_values",
]
