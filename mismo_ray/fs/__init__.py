from mismo_ray.fs._train import (
    level_proportions,
    make_weights,
    train_using_labels,
    train_using_pairs,
    true_pairs_from_labels,
)
from mismo_ray.fs._train_em import train_using_em
from mismo_ray.fs._weights import (
    ComparerWeights,
    LevelWeights,
    Weights,
    odds_to_log_odds,
    odds_to_prob,
    prob_to_odds,
)

__all__ = [
    "ComparerWeights",
    "LevelWeights",
    "Weights",
    "level_proportions",
    "make_weights",
    "odds_to_log_odds",
    "odds_to_prob",
    "prob_to_odds",
    "train_using_em",
    "train_using_labels",
    "train_using_pairs",
    "true_pairs_from_labels",
]
