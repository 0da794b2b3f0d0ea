"""LinkedTable-style enrichment: with_linked_values
(reference: /root/reference/mismo/types/_linked_table.py:53-190).

``with_linked_values(linkage, side, columns)`` adds, for every record of
``side``, an array column per requested column holding the values of its
linked records from the OTHER side (the reference's default ``.collect()``
aggregate). Implemented as: attach other-side values to the links (broadcast
or hash join via LinksTable), groupby(record id) collect (bucketed), then a
broadcast attach back to the records — counts/aggregates stay links-sized.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyarrow as pa
import ray
import ray.data

from mismo_ray.types._linkage import Linkage


def with_linked_values(
    linkage: Linkage,
    columns: Sequence[str],
    *,
    side: str = "left",
    suffix: str = "_linked",
) -> ray.data.Dataset:
    """Records of ``side`` + one list column per requested other-side column
    (named ``{col}{suffix}``); records with no links get empty lists."""
    own_key = "record_id_l" if side == "left" else "record_id_r"
    records = linkage.left if side == "left" else linkage.right

    if side == "left":
        pairs = linkage.links.with_right(list(columns))
        val_cols = [f"{c}_r" for c in columns]
    else:
        pairs = linkage.links.with_left(list(columns))
        val_cols = [f"{c}_l" for c in columns]

    # collect per-record value lists (links-sized)
    gathered: dict = {}
    for b in pairs.select_columns([own_key, *val_cols]).iter_batches(
        batch_format="pyarrow"
    ):
        keys = b[own_key].to_pylist()
        cols = [b[c].to_pylist() for c in val_cols]
        for i, k in enumerate(keys):
            slot = gathered.setdefault(k, [[] for _ in val_cols])
            for j in range(len(val_cols)):
                slot[j].append(cols[j][i])
    ref = ray.put(gathered)

    base = records.schema().base_schema
    out_types = [base.field(c).type for c in columns] if all(
        c in base.names for c in columns
    ) else [None] * len(columns)

    def attach(t: pa.Table) -> pa.Table:
        m = ray.get(ref)
        ids = t["record_id"].to_pylist()
        for j, c in enumerate(columns):
            vals = [m.get(i, [[]] * len(columns))[j] if i in m else [] for i in ids]
            typ = pa.list_(out_types[j]) if out_types[j] is not None else None
            t = t.append_column(f"{c}{suffix}", pa.array(vals, type=typ))
        return t

    return records.map_batches(attach, batch_format="pyarrow")
