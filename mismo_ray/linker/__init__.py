from mismo_ray.linker._common import Linker, Task, infer_task
from mismo_ray.linker._key_linker import KeyLinker

__all__ = ["KeyLinker", "Linker", "Task", "infer_task"]
