from mismo_ray.types._diff import Diff
from mismo_ray.types._linkage import Linkage, LinksTable
from mismo_ray.types._linked_table import with_linked_values

__all__ = ["Diff", "Linkage", "LinksTable", "with_linked_values"]
