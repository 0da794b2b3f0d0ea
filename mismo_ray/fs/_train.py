"""Fellegi-Sunter training (reference: /root/reference/mismo/fs/_train.py).

Semantics pinned by the reference:

- ``level_proportions``: histogram of labels per level with **add-one
  smoothing for unseen levels** (_train.py:17-41);
- m weights estimated from true pairs (label_true equi-join, dedupe-inferred,
  _train.py:120-175); u weights from a random cross-product sample, splink's
  "assume sampled pairs are non-matches" (_train.py:44-76);
- ``make_weights`` removes the else level (_train.py:271-280).

Ray mapping: pair generation + labeling run distributed; the per-level
histograms are tiny and are computed with a groupby-count collected to the
driver (the sample is bounded by max_pairs by construction).
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import ray.data

from mismo_ray.compare import LevelComparer, compare
from mismo_ray.fs._weights import ComparerWeights, LevelWeights, Weights
from mismo_ray.linker._key_linker import KeyLinker
from mismo_ray.linker._sample import sample_all_links
from mismo_ray.types import Linkage


def level_proportions(levels: Sequence[str], labels) -> list[float]:
    """Proportion of labels per level (integer labels over the full level
    list), add-one smoothed for unseen levels."""
    n_levels = len(levels)
    if isinstance(labels, ray.data.Dataset):
        labels = np.concatenate(
            [
                b["label"].to_numpy(zero_copy_only=False)
                for b in labels.iter_batches(batch_format="pyarrow")
            ]
            or [np.array([], dtype=np.int64)]
        )
    labels = np.asarray(labels)
    if labels.dtype.kind not in "iu":
        if labels.dtype.kind == "f":
            # pandas int-with-null round trip: NaN rows belong to no level
            labels = labels[~np.isnan(labels)]
        else:
            # representation="string" comparers label by LEVEL NAME: map
            # names to indices over the full level list (unknown names ->
            # the implicit else index, same slot integer labels use) — a
            # raw np.asarray(..., int64) raised on the string mode
            name_to_idx = {name: i for i, name in enumerate(levels)}
            labels = np.array(
                [name_to_idx.get(x, n_levels) for x in labels], dtype=np.int64
            )
    labels = labels.astype(np.int64)
    counts = np.bincount(labels, minlength=n_levels).astype(np.float64)
    counts[counts == 0] = 1.0  # add-one smoothing (reference :31-38)
    return list(counts / counts.sum())


def make_weights(
    comparer: LevelComparer, ms: Sequence[float], us: Sequence[float]
) -> ComparerWeights:
    levels = comparer.levels
    assert len(ms) == len(us) == len(levels)
    lws = [
        LevelWeights(lev, m=m, u=u) for lev, m, u in zip(levels, ms, us)
    ]
    return ComparerWeights(comparer.name, [lw for lw in lws if lw.name != "else"])


def _pairs_broadcast(linkage: Linkage, columns: Sequence[str]) -> "ray.data.Dataset":
    """Assemble (ids + suffixed columns) pair rows for a SAMPLE linkage
    without shuffling the corpus: the sample is bounded by max_pairs by
    construction, so the referenced records fit a broadcast — collect them
    via a map-only filter pass, then ``pc.index_in`` + ``take`` per link
    batch (no joins, no corpus reshuffle)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    from mismo_ray._joins import broadcast_isin

    links = linkage.links_ds
    ids_l: set = set()
    ids_r: set = set()
    for b in links.iter_batches(batch_format="pyarrow"):
        ids_l.update(b["record_id_l"].to_pylist())
        ids_r.update(b["record_id_r"].to_pylist())
    same = linkage.right is linkage.left

    def collect(src, idset) -> pa.Table:
        tables = [
            b
            for b in broadcast_isin(
                src.select_columns(["record_id", *columns]), "record_id", idset
            ).iter_batches(batch_format="pyarrow")
        ]
        return (
            pa.concat_tables(tables)
            if tables
            else pa.schema(
                [pa.field("record_id", pa.int64())]
                + [pa.field(c, pa.string()) for c in columns]
            ).empty_table()
        )

    slim_l = collect(linkage.left, ids_l | ids_r if same else ids_l)
    slim_r = slim_l if same else collect(linkage.right, ids_r)
    ref = ray.put((slim_l, slim_r))

    def assemble(t: pa.Table) -> pa.Table:
        sl, sr = ray.get(ref)
        il = pc.index_in(
            t["record_id_l"].combine_chunks(), value_set=sl["record_id"].combine_chunks()
        )
        ir = pc.index_in(
            t["record_id_r"].combine_chunks(), value_set=sr["record_id"].combine_chunks()
        )
        cols = {
            "record_id_l": t["record_id_l"],
            "record_id_r": t["record_id_r"],
        }
        for c in columns:
            cols[f"{c}_l"] = pc.take(sl[c].combine_chunks(), il)
            cols[f"{c}_r"] = pc.take(sr[c].combine_chunks(), ir)
        return pa.table(cols)

    return links.map_batches(assemble, batch_format="pyarrow")


def _labels_matrix(
    linkage: Linkage,
    comparers: Sequence[LevelComparer],
    columns: Sequence[str] | None = None,
) -> np.ndarray:
    """(n_pairs, n_comparers) integer level labels, computed distributed and
    collected (sample-sized by construction). With ``columns`` given, pair
    assembly uses the broadcast path (no corpus shuffle — the right call for
    bounded training samples); otherwise the general with_both joins."""
    # pin the sample links: the pair-assembly consumes them (twice on the
    # join path) and a lazy pair DAG would be re-executed per consumption
    linkage = Linkage(
        left=linkage.left,
        right=linkage.right,
        links=linkage.links_ds.materialize(),
        links_schema=linkage.links.schema,
    )
    if columns is not None:
        pairs = _pairs_broadcast(linkage, list(columns))
    else:
        pairs = linkage.links.with_both()
    labeled = compare(pairs, list(comparers))
    names = [c.name for c in comparers]
    cols = [[] for _ in names]
    for b in labeled.iter_batches(batch_format="pyarrow"):
        for i, name in enumerate(names):
            cols[i].append(b[name].to_numpy(zero_copy_only=False))
    return np.stack(
        [
            np.concatenate(c) if c else np.array([], dtype=np.int64)
            for c in cols
        ],
        axis=1,
    )


def true_pairs_from_labels(
    left: ray.data.Dataset, right: ray.data.Dataset, **linker_kwargs
) -> Linkage:
    """Pairs sharing label_true (reference _train.py:166-175; null labels are
    ignored because null keys never match). ``linker_kwargs`` forward to
    KeyLinker (e.g. count_prepass=False when cluster sizes are bounded)."""
    return KeyLinker("label_true", **linker_kwargs)(left, right)


def train_using_labels(
    comparers: Sequence[LevelComparer],
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    max_pairs: int = 1_000_000,
    seed: int = 0,
    columns: Sequence[str] | None = None,
    true_linker_kwargs: dict | None = None,
) -> Weights:
    """m from true (label_true) pairs, u from a random cross-product sample.
    ``columns``: the record columns the comparers read — enables the
    broadcast (no-shuffle) pair assembly for the bounded samples."""
    comparers = list(comparers)
    # ---- m: true pairs (subsample records if the true-pair set is huge)
    tp = true_pairs_from_labels(left, right, **(true_linker_kwargs or {}))
    tp = Linkage(
        left=tp.left, right=tp.right,
        links=tp.links_ds.materialize(), links_schema=tp.links.schema,
    )
    n_true = tp.links_ds.count()
    if n_true > max_pairs:
        # sample PAIRS independently via a hash threshold on the
        # (record_id_l, record_id_r) pair — sampling by left record would
        # keep/drop whole clusters together and bias m-weights when cluster
        # sizes are skewed (reference samples pairs uniformly)
        import numpy as np
        import pyarrow as pa

        from mismo_ray._util import combine_hash_columns

        thresh = np.uint64(int(min(1.0, max_pairs / n_true) * 2**64))
        pair_seed = (seed or 0) ^ 0xD1CE

        def sample_pairs(t: pa.Table) -> pa.Table:
            h = combine_hash_columns(
                t, ["record_id_l", "record_id_r"], seed=pair_seed
            )
            return t.filter(pa.array(h < thresh))

        links = tp.links_ds.map_batches(sample_pairs, batch_format="pyarrow")
        tp = Linkage(left=tp.left, right=tp.right, links=links)
    m_labels = _labels_matrix(tp, comparers, columns)
    # ---- u: random pair sample, assumed non-matches
    us_sample = sample_all_links(left, right, max_pairs=max_pairs, seed=seed)
    u_labels = _labels_matrix(us_sample, comparers, columns)
    out = []
    for i, c in enumerate(comparers):
        ms = level_proportions(c.levels, m_labels[:, i])
        us = level_proportions(c.levels, u_labels[:, i])
        out.append(make_weights(c, ms, us))
    return Weights(out)


def train_using_pairs(
    comparers: Sequence[LevelComparer],
    true_links: ray.data.Dataset,
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    max_pairs: int = 1_000_000,
    seed: int = 0,
    columns: Sequence[str] | None = None,
) -> Weights:
    """Like train_using_labels but with explicit true (record_id_l, record_id_r)
    pairs (reference _train.py:179-224)."""
    comparers = list(comparers)
    tp = Linkage(left=left, right=right, links=true_links)
    m_labels = _labels_matrix(tp, comparers, columns)
    us_sample = sample_all_links(left, right, max_pairs=max_pairs, seed=seed)
    u_labels = _labels_matrix(us_sample, comparers, columns)
    out = []
    for i, c in enumerate(comparers):
        out.append(
            make_weights(
                c,
                level_proportions(c.levels, m_labels[:, i]),
                level_proportions(c.levels, u_labels[:, i]),
            )
        )
    return Weights(out)
