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
    labels = np.asarray(labels, dtype=np.int64)
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


def _labels_matrix(
    linkage: Linkage, comparers: Sequence[LevelComparer]
) -> np.ndarray:
    """(n_pairs, n_comparers) integer level labels, computed distributed and
    collected (sample-sized by construction)."""
    # pin the sample links: with_both consumes them twice (two joins) and a
    # lazy pair DAG would be re-executed per consumption
    linkage = Linkage(
        left=linkage.left,
        right=linkage.right,
        links=linkage.links_ds.materialize(),
        links_schema=linkage.links.schema,
    )
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
    left: ray.data.Dataset, right: ray.data.Dataset
) -> Linkage:
    """Pairs sharing label_true (reference _train.py:166-175; null labels are
    ignored because null keys never match)."""
    return KeyLinker("label_true")(left, right)


def train_using_labels(
    comparers: Sequence[LevelComparer],
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    max_pairs: int = 1_000_000,
    seed: int = 0,
) -> Weights:
    """m from true (label_true) pairs, u from a random cross-product sample."""
    comparers = list(comparers)
    # ---- m: true pairs (subsample records if the true-pair set is huge)
    tp = true_pairs_from_labels(left, right)
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
    m_labels = _labels_matrix(tp, comparers)
    # ---- u: random pair sample, assumed non-matches
    us_sample = sample_all_links(left, right, max_pairs=max_pairs, seed=seed)
    u_labels = _labels_matrix(us_sample, comparers)
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
) -> Weights:
    """Like train_using_labels but with explicit true (record_id_l, record_id_r)
    pairs (reference _train.py:179-224)."""
    comparers = list(comparers)
    tp = Linkage(left=left, right=right, links=true_links)
    m_labels = _labels_matrix(tp, comparers)
    us_sample = sample_all_links(left, right, max_pairs=max_pairs, seed=seed)
    u_labels = _labels_matrix(us_sample, comparers)
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
