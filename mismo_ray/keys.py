"""Key specs: how blocking keys are derived from record tables.

The reference resolves keys from a DSL of strings / Deferreds / callables /
2-tuples (/root/reference/mismo/_resolve.py:124-260,
mismo/joins/_conditions.py:50-121). Re-imagined Ray-first (SURVEY §2.3): a key
is a named pair of plain Python callables ``fn(batch: pa.Table) -> pa.Array``,
with strings resolving to column lookups.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from dataclasses import dataclass

import pyarrow as pa

KeyFn = Callable[[pa.Table], pa.Array]


@dataclass(frozen=True)
class KeySpec:
    """A named blocking key: ``left_fn`` / ``right_fn`` each map a record batch
    to one key value per row. Rows with null keys never block (SQL equi-join
    semantics: NULL != NULL; reference KeyLinker inherits this from ibis.join)."""

    name: str
    left_fn: KeyFn
    right_fn: KeyFn

    def __call__(self, batch: pa.Table, side: str = "left") -> pa.Array:
        fn = self.left_fn if side == "left" else self.right_fn
        out = fn(batch)
        if isinstance(out, pa.ChunkedArray):
            out = out.combine_chunks()
        if not isinstance(out, pa.Array):
            out = pa.array(out)
        return out


def _column_fn(name: str) -> KeyFn:
    def fn(batch: pa.Table) -> pa.Array:
        return batch[name]

    fn.__name__ = name
    return fn


def resolve_keys(keys) -> list[KeySpec]:
    """Normalize user-provided key specs into a list of KeySpec.

    Accepted forms (mirroring the reference's flexibility):
    - ``"col"``                       — same column both sides
    - ``("left_col", "right_col")``   — different column names
    - ``callable``                    — same fn both sides (name from __name__)
    - ``(callable_l, callable_r)``    — different fns
    - ``KeySpec``                     — passed through
    """
    if isinstance(keys, (str, KeySpec)) or callable(keys):
        keys = [keys]
    elif (
        isinstance(keys, tuple)
        and len(keys) == 2
        and all(isinstance(k, str) or callable(k) for k in keys)
        and not isinstance(keys[0], KeySpec)
    ):
        # a single (left, right) pair
        keys = [keys]
    out: list[KeySpec] = []
    for i, k in enumerate(keys):
        if isinstance(k, KeySpec):
            out.append(k)
        elif isinstance(k, str):
            fn = _column_fn(k)
            out.append(KeySpec(k, fn, fn))
        elif callable(k):
            name = getattr(k, "__name__", f"key_{i}")
            if name == "<lambda>":
                name = f"key_{i}"
            out.append(KeySpec(name, k, k))
        elif isinstance(k, tuple) and len(k) == 2:
            kl, kr = k
            fl = _column_fn(kl) if isinstance(kl, str) else kl
            fr = _column_fn(kr) if isinstance(kr, str) else kr
            name = kl if isinstance(kl, str) else getattr(kl, "__name__", f"key_{i}")
            out.append(KeySpec(name, fl, fr))
        else:
            raise TypeError(f"Cannot resolve key spec: {k!r}")
    names = [k.name for k in out]
    if len(set(names)) != len(names):
        out = [
            KeySpec(f"{k.name}_{i}", k.left_fn, k.right_fn) if names.count(k.name) > 1 else k
            for i, k in enumerate(out)
        ]
    return out


def key_names(keys: Sequence[KeySpec]) -> list[str]:
    return [k.name for k in keys]
