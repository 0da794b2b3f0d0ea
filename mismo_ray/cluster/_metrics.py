"""Graph metrics (reference: /root/reference/mismo/cluster/_metrics.py:28-69)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count

from mismo_ray._joins import distinct


def degree(links: ray.data.Dataset) -> ray.data.Dataset:
    """Per-node distinct-neighbor count: union of both link directions,
    distinct, then groupby-count. Columns: (record_id, degree)."""

    def both_dirs(t: pa.Table) -> pa.Table:
        l = t["record_id_l"].combine_chunks()
        r = t["record_id_r"].combine_chunks()
        return pa.table(
            {
                "record_id": pa.concat_arrays([l, r]),
                "neighbor": pa.concat_arrays([r, l]),
            }
        )

    sym = links.map_batches(both_dirs, batch_format="pyarrow")
    dedup = distinct(sym, ["record_id", "neighbor"])
    return dedup.groupby("record_id").aggregate(Count(alias_name="degree"))


def subgraph(
    links: ray.data.Dataset,
    seed_ids,
    *,
    hops: int = 2,
) -> dict:
    """The <= ``hops``-hop neighborhood of ``seed_ids`` in the link graph
    (the record/link extraction behind the reference's cluster dashboards,
    cluster/_subgraph.py, minus the solara UI).

    Frontier expansion: per hop, one map-only broadcast semi-join of the
    links against the current node set (EDA-sized by construction — seeds
    are a handful of records under inspection; each hop's filter runs
    distributed over the full link table). Returns
    {"node_ids": set, "links": Dataset of links within the neighborhood}.
    """
    import ray as _ray

    from mismo_ray._joins import broadcast_isin

    nodes = set(seed_ids)
    for _ in range(hops):
        ref = _ray.put(frozenset(nodes))

        def touching(t: pa.Table) -> pa.Table:
            ns = _ray.get(ref)
            l = t["record_id_l"].to_pylist()
            r = t["record_id_r"].to_pylist()
            mask = np.fromiter(
                ((a in ns) or (b in ns) for a, b in zip(l, r)),
                dtype=bool,
                count=len(l),
            )
            return t.filter(pa.array(mask))

        frontier = links.map_batches(touching, batch_format="pyarrow")
        new_nodes = set(nodes)
        for b in frontier.iter_batches(batch_format="pyarrow"):
            new_nodes.update(b["record_id_l"].to_pylist())
            new_nodes.update(b["record_id_r"].to_pylist())
        if new_nodes == nodes:
            break
        nodes = new_nodes

    ref = _ray.put(frozenset(nodes))

    def within(t: pa.Table) -> pa.Table:
        ns = _ray.get(ref)
        l = t["record_id_l"].to_pylist()
        r = t["record_id_r"].to_pylist()
        mask = np.fromiter(
            ((a in ns) and (b in ns) for a, b in zip(l, r)),
            dtype=bool,
            count=len(l),
        )
        return t.filter(pa.array(mask))

    return {
        "node_ids": nodes,
        "links": links.map_batches(within, batch_format="pyarrow"),
    }
