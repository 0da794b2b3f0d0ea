"""EDA / viz surface: the reference's chart helpers re-expressed as
backend-free Vega-Lite spec dicts over collected aggregates.

Reference: mismo/types/_linked_table.py:351-471 (``link_counts.chart``),
mismo/types/_upset.py:47-227 (upset intersection chart), mismo/fs/_plot.py
:22-123 (weights odds plot). Those emit altair charts; altair is not
installed here, and an altair ``Chart`` is just a Vega-Lite JSON spec — so
these return the spec dict directly (``json.dumps``-able, renderable by any
vega-lite host; pass to ``altair.Chart.from_dict`` when altair exists).

Only the AGGREGATES are collected (a handful of rows); the heavy work —
e.g. the upset intersection counts over millions of pairs — runs distributed
first (``upset_counts``).
"""

from __future__ import annotations

from collections.abc import Mapping

import numpy as np
import pyarrow as pa
import ray.data

from mismo_ray._joins import default_num_partitions
from mismo_ray._util import hash64


def _rows(data) -> list[dict]:
    if isinstance(data, ray.data.Dataset):
        return data.take_all()
    if isinstance(data, pa.Table):
        return data.to_pylist()
    return list(data)


def link_counts_chart(link_counts) -> dict:
    """Bar chart of number of records by link count (reference
    _linked_table.py:351-433 semantics: log-ish scale, totals in the title).

    ``link_counts``: the (n_links, n_records) aggregate from
    ``Linkage.link_counts`` — a Dataset, pa.Table or list of dicts.
    """
    rows = sorted(_rows(link_counts), key=lambda r: r["n_links"])
    total = int(sum(r["n_records"] for r in rows))
    values = [
        {
            "n_links": int(r["n_links"]),
            "n_records": int(r["n_records"]),
            "frac_records": (r["n_records"] / total) if total else 0.0,
        }
        for r in rows
    ]
    return {
        "$schema": "https://vega.github.io/schema/vega-lite/v5.json",
        "title": {
            "text": ["Number of Records", f"({total:_} total)"],
            "anchor": "middle",
        },
        "data": {"values": values},
        "mark": "bar",
        "encoding": {
            "x": {"field": "n_links", "type": "ordinal", "title": "Number of Links"},
            "y": {
                "field": "n_records",
                "type": "quantitative",
                "scale": {"type": "symlog"},
                "title": "Number of Records",
            },
            "tooltip": [
                {"field": "n_links", "type": "ordinal"},
                {"field": "n_records", "type": "quantitative"},
                {"field": "frac_records", "type": "quantitative", "format": ".1%"},
            ],
        },
    }


def upset_counts(
    links_by_name: Mapping[str, ray.data.Dataset],
) -> pa.Table:
    """Distributed UpSet intersection counts over several linkers' pair sets
    (reference _upset.py:47-227 input shape).

    Each pair is attributed to the exact SET of linkers that produced it:
    tag each link set with a bit, union, coarse-bucket on the pair hash,
    OR the bits per pair inside each bucket (vectorized), then a tiny final
    groupby over ~2^n_linkers masks. Returns (intersection: list<string>,
    mask: int64, n_pairs: int64) collected to a pa.Table (2^n rows).
    """
    names = list(links_by_name)
    if len(names) > 16:
        raise ValueError("upset_counts supports at most 16 link sets")
    B = default_num_partitions()

    def tag(bit: int):
        def fn(t: pa.Table) -> pa.Table:
            l = t["record_id_l"].combine_chunks().cast(pa.int64())
            r = t["record_id_r"].combine_chunks().cast(pa.int64())
            h = ((hash64(l) ^ hash64(r)) % np.uint64(B)).astype(np.int64)
            return pa.table(
                {
                    "record_id_l": l,
                    "record_id_r": r,
                    "__bit__": pa.array(
                        np.full(len(t), 1 << bit, dtype=np.int64)
                    ),
                    "__ubkt__": pa.array(h),
                }
            )

        return fn

    tagged = None
    for i, name in enumerate(names):
        part = links_by_name[name].map_batches(tag(i), batch_format="pyarrow")
        tagged = part if tagged is None else tagged.union(part)

    def masks_in_bucket(g: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame(
            {
                "l": g["record_id_l"].to_numpy(zero_copy_only=False),
                "r": g["record_id_r"].to_numpy(zero_copy_only=False),
                "b": g["__bit__"].to_numpy(zero_copy_only=False),
            }
        )
        # OR the bits per distinct pair, then count pairs per mask
        masks = df.groupby(["l", "r"], sort=False)["b"].agg(lambda s: int(np.bitwise_or.reduce(s.to_numpy())))
        counts = masks.value_counts()
        return pa.table(
            {
                "mask": pa.array(counts.index.to_numpy(dtype=np.int64)),
                "n": pa.array(counts.to_numpy(dtype=np.int64)),
            }
        )

    from ray.data.aggregate import Sum

    per_mask = (
        tagged.groupby("__ubkt__")
        .map_groups(masks_in_bucket, batch_format="pyarrow")
        .groupby("mask")
        .aggregate(Sum("n", alias_name="n_pairs"))
    )
    rows = sorted(per_mask.take_all(), key=lambda r: -r["n_pairs"])
    return pa.table(
        {
            "intersection": pa.array(
                [
                    [names[i] for i in range(len(names)) if r["mask"] >> i & 1]
                    for r in rows
                ],
                type=pa.list_(pa.string()),
            ),
            "mask": pa.array([int(r["mask"]) for r in rows], type=pa.int64()),
            "n_pairs": pa.array([int(r["n_pairs"]) for r in rows], type=pa.int64()),
        }
    )


def upset_chart(counts: pa.Table) -> dict:
    """Vega-Lite bar chart of the upset intersection counts
    (reference _upset.py rendering, reduced to the count bars)."""
    labels = [
        " ∩ ".join(v) if v else "(none)"
        for v in counts["intersection"].to_pylist()
    ]
    values = [
        {"intersection": lab, "n_pairs": int(n)}
        for lab, n in zip(labels, counts["n_pairs"].to_pylist())
    ]
    return {
        "$schema": "https://vega.github.io/schema/vega-lite/v5.json",
        "title": "Pairs by linker intersection",
        "data": {"values": values},
        "mark": "bar",
        "encoding": {
            "x": {
                "field": "intersection",
                "type": "nominal",
                "sort": "-y",
                "title": "Produced by exactly",
            },
            "y": {
                "field": "n_pairs",
                "type": "quantitative",
                "title": "Number of Pairs",
            },
            "tooltip": [
                {"field": "intersection", "type": "nominal"},
                {"field": "n_pairs", "type": "quantitative"},
            ],
        },
    }


def distribution_chart(
    ds: ray.data.Dataset, column: str, *, limit: int = 1000
) -> dict:
    """Bar chart of a column's value counts, most frequent first (reference
    eda/_plot.py:14-99 `distribution_chart`). The counts are computed with a
    distributed groupby; only the top ``limit`` bars are collected."""
    from ray.data.aggregate import Count

    rows = (
        ds.groupby(column)
        .aggregate(Count(alias_name="n"))
        .sort("n", descending=True)
        .limit(limit)
        .take_all()
    )
    total = int(sum(r["n"] for r in rows))
    values = [
        {
            "value": "(null)" if r[column] is None else str(r[column]),
            "n": int(r["n"]),
        }
        for r in rows
    ]
    return {
        "$schema": "https://vega.github.io/schema/vega-lite/v5.json",
        "title": [f"Distribution of {column}", f"(top {len(values)} values, {total:_} rows shown)"],
        "data": {"values": values},
        "mark": "bar",
        "encoding": {
            "x": {"field": "value", "type": "nominal", "sort": "-y", "title": column},
            "y": {
                "field": "n",
                "type": "quantitative",
                "scale": {"type": "symlog"},
                "title": "Count",
            },
            "tooltip": [
                {"field": "value", "type": "nominal"},
                {"field": "n", "type": "quantitative"},
            ],
        },
    }


def key_counts_chart(key_counts, *, key_columns: list[str] | None = None) -> dict:
    """Histogram of per-key record counts (reference _counts_table.py
    `CountsTable.chart` content: how skewed are the blocking keys?)."""
    rows = _rows(key_counts)
    values = []
    for r in rows:
        keys = (
            {c: r[c] for c in key_columns}
            if key_columns
            else {c: v for c, v in r.items() if c != "n"}
        )
        values.append(
            {"key": ", ".join(str(v) for v in keys.values()), "n": int(r["n"])}
        )
    values.sort(key=lambda v: -v["n"])
    total = int(sum(v["n"] for v in values))
    return {
        "$schema": "https://vega.github.io/schema/vega-lite/v5.json",
        "title": ["Records per blocking key", f"({len(values):_} keys, {total:_} records)"],
        "data": {"values": values},
        "mark": "bar",
        "encoding": {
            "x": {"field": "key", "type": "nominal", "sort": "-y", "title": "Key"},
            "y": {
                "field": "n",
                "type": "quantitative",
                "scale": {"type": "symlog"},
                "title": "Number of Records",
            },
            "tooltip": [
                {"field": "key", "type": "nominal"},
                {"field": "n", "type": "quantitative"},
            ],
        },
    }


def odds_histogram(
    scored: ray.data.Dataset,
    *,
    column: str = "odds",
    bins: int = 40,
    log2: bool = True,
) -> dict:
    """Distribution of match scores (reference compare/_plot.py:23-96
    content: where does the odds mass sit, for threshold picking).

    The histogram is computed DISTRIBUTED — per-batch partial bincounts over
    fixed bin edges, summed by a tiny groupby — only the ``bins`` counts
    reach the driver.
    """
    from ray.data.aggregate import Sum

    # pass 1: global min/max (cheap aggregate)
    lo = scored.min(column)
    hi = scored.max(column)
    if log2:
        lo, hi = np.log2(max(lo, 1e-300)), np.log2(max(hi, 1e-300))
    if hi <= lo:
        hi = lo + 1.0
    edges = np.linspace(lo, hi, bins + 1)

    def partial(t: pa.Table) -> pa.Table:
        x = np.asarray(t[column], dtype=np.float64)
        if log2:
            x = np.log2(np.maximum(x, 1e-300))
        idx = np.clip(np.digitize(x, edges) - 1, 0, bins - 1)
        counts = np.bincount(idx, minlength=bins)
        return pa.table(
            {
                "bin": pa.array(np.arange(bins, dtype=np.int64)),
                "n": pa.array(counts.astype(np.int64)),
            }
        )

    agg = (
        scored.map_batches(partial, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )
    counts = np.zeros(bins, dtype=np.int64)
    for r in agg:
        counts[r["bin"]] = r["n"]
    label = f"log2({column})" if log2 else column
    values = [
        {
            "bin_start": float(edges[i]),
            "bin_end": float(edges[i + 1]),
            "n": int(counts[i]),
        }
        for i in range(bins)
    ]
    return {
        "$schema": "https://vega.github.io/schema/vega-lite/v5.json",
        "title": f"Distribution of {label}",
        "data": {"values": values},
        "mark": "bar",
        "encoding": {
            "x": {"field": "bin_start", "type": "quantitative", "title": label,
                  "bin": {"binned": True}},
            "x2": {"field": "bin_end"},
            "y": {
                "field": "n",
                "type": "quantitative",
                "scale": {"type": "symlog"},
                "title": "Number of Pairs",
            },
        },
    }


def weights_chart(weights) -> dict:
    """Log-odds bar chart per comparer level (reference fs/_plot.py:22-123
    content: one row per (comparer, level) with m, u and log2 odds)."""
    values = []
    for cw in weights:
        for lw in cw:
            values.append(
                {
                    "comparer": cw.name,
                    "level": lw.name,
                    "m": lw.m,
                    "u": lw.u,
                    "log2_odds": float(np.log2(lw.odds))
                    if lw.odds > 0
                    else None,
                }
            )
    return {
        "$schema": "https://vega.github.io/schema/vega-lite/v5.json",
        "title": "Fellegi-Sunter level weights (log2 odds)",
        "data": {"values": values},
        "mark": "bar",
        "encoding": {
            "row": {"field": "comparer", "type": "nominal"},
            "x": {"field": "log2_odds", "type": "quantitative"},
            "y": {"field": "level", "type": "nominal", "sort": None},
            "tooltip": [
                {"field": "comparer", "type": "nominal"},
                {"field": "level", "type": "nominal"},
                {"field": "m", "type": "quantitative", "format": ".4f"},
                {"field": "u", "type": "quantitative", "format": ".4f"},
                {"field": "log2_odds", "type": "quantitative", "format": ".2f"},
            ],
        },
    }


def pr_curve_chart(curve) -> dict:
    """Precision-recall curve over score thresholds (companion to
    cluster.pr_curve — pass its output table). Points are thresholds;
    the tooltip carries the confusion counts for cut-point selection."""
    rows = _rows(curve)
    return {
        "$schema": "https://vega.github.io/schema/vega-lite/v5.json",
        "title": "Precision vs recall by score threshold",
        "data": {"values": rows},
        "mark": {"type": "line", "point": True},
        "encoding": {
            "x": {
                "field": "recall",
                "type": "quantitative",
                "scale": {"domain": [0, 1]},
            },
            "y": {
                "field": "precision",
                "type": "quantitative",
                "scale": {"domain": [0, 1]},
            },
            "order": {"field": "threshold"},
            "tooltip": [
                {"field": "threshold", "type": "quantitative"},
                {"field": "precision", "type": "quantitative", "format": ".4f"},
                {"field": "recall", "type": "quantitative", "format": ".4f"},
                {"field": "f1", "type": "quantitative", "format": ".4f"},
                {"field": "tp", "type": "quantitative"},
                {"field": "fp", "type": "quantitative"},
                {"field": "fn", "type": "quantitative"},
            ],
        },
    }


def dedupe_report_chart(report) -> dict:
    """Cluster-size histogram + savings from ``dedupe.dedupe_report``
    output: bars of n_clusters per cluster_size, with the docs/chars a
    min-id dedupe removes in the tooltip. Input: the report Dataset,
    an Arrow table, or a list of row dicts (already tiny — one row per
    distinct cluster size)."""
    rows = _rows(report)
    values = [
        {
            "cluster_size": int(r["cluster_size"]),
            "n_clusters": int(r["n_clusters"]),
            "n_dup_docs": int(r["n_dup_docs"]),
            "dup_chars": int(r["dup_chars"]),
        }
        for r in rows
    ]
    values.sort(key=lambda v: v["cluster_size"])
    n_docs = sum(v["n_dup_docs"] for v in values)
    n_chars = sum(v["dup_chars"] for v in values)
    return {
        "$schema": "https://vega.github.io/schema/vega-lite/v5.json",
        "title": [
            "Duplicate-cluster sizes",
            f"(dedupe removes {n_docs:_} docs / {n_chars:_} chars)",
        ],
        "data": {"values": values},
        "mark": "bar",
        "encoding": {
            "x": {
                "field": "cluster_size",
                "type": "ordinal",
                "title": "Cluster size",
            },
            "y": {
                "field": "n_clusters",
                "type": "quantitative",
                "scale": {"type": "symlog"},
                "title": "Number of clusters",
            },
            "tooltip": [
                {"field": "cluster_size", "type": "ordinal"},
                {"field": "n_clusters", "type": "quantitative"},
                {"field": "n_dup_docs", "type": "quantitative"},
                {"field": "dup_chars", "type": "quantitative"},
            ],
        },
    }


def lsh_curves_chart(
    band_params: "list[tuple[int, int]] | None" = None,
) -> dict:
    """The MinHash-LSH S-curve picker (reference linker/_lsh.py:105-193):
    P(pair blocks | jaccard J) = 1 - (1 - J^band_size)^n_bands for each
    (band_size, n_bands) setting, J swept 0..1 in 1/50 steps.  Use it to
    pick ``MinhashLshLinker(num_hashes=band_size*n_bands, n_bands=...)``
    — runtime grows with band_size * n_bands, so prefer the smallest
    setting whose curve steps near your target jaccard.  Pure numpy (a
    parameter-grid chart needs no Dataset); same default grid as the
    reference."""
    import numpy as np

    if band_params is None:
        band_params = [
            (2, 10), (2, 25), (2, 50), (2, 100),
            (5, 20), (5, 40),
            (10, 10), (10, 20), (10, 50),
            (20, 5), (20, 10),
            (50, 2), (50, 4),
        ]
    j = np.arange(51, dtype=np.float64) / 50.0
    values = []
    for band_size, n_bands in band_params:
        pr = 1.0 - (1.0 - j**band_size) ** n_bands
        values.extend(
            {
                "band_size": int(band_size),
                "n_bands": int(n_bands),
                "label": f"({band_size}, {n_bands})",
                "jaccard": float(x),
                "pr": float(p),
            }
            for x, p in zip(j, pr)
        )
    return {
        "$schema": "https://vega.github.io/schema/vega-lite/v5.json",
        "title": "Probability of LSH blocking a pair given a Jaccard similarity",
        "width": 400,
        "height": 400,
        "data": {"values": values},
        "mark": {"type": "line", "strokeWidth": 2, "point": True},
        "encoding": {
            "x": {"field": "jaccard", "type": "quantitative"},
            "y": {"field": "pr", "type": "quantitative"},
            "color": {
                "field": "label",
                "type": "nominal",
                "title": "Band size, Number of bands",
                "sort": {"field": "band_size"},
            },
            "tooltip": [
                {"field": "band_size", "type": "quantitative"},
                {"field": "n_bands", "type": "quantitative"},
                {"field": "jaccard", "type": "quantitative"},
                {"field": "pr", "type": "quantitative"},
            ],
        },
    }
