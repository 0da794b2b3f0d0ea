from mismo_ray.cluster._connected_components import Factorizer, connected_components
from mismo_ray.cluster._eval import (
    adjusted_rand_score,
    blocking_report,
    completeness_score,
    fowlkes_mallows_score,
    homogeneity_score,
    mutual_info_score,
    normalized_mutual_info_score,
    pairwise_metrics_from_links,
    pairwise_precision_recall_f1,
    pr_curve,
    rand_score,
    v_measure_score,
)
from mismo_ray.cluster._metrics import degree, subgraph

__all__ = [
    "Factorizer",
    "adjusted_rand_score",
    "blocking_report",
    "pr_curve",
    "completeness_score",
    "connected_components",
    "degree",
    "subgraph",
    "fowlkes_mallows_score",
    "homogeneity_score",
    "mutual_info_score",
    "normalized_mutual_info_score",
    "pairwise_metrics_from_links",
    "pairwise_precision_recall_f1",
    "rand_score",
    "v_measure_score",
]
