from mismo_ray.text._features import ngrams, tokenize
from mismo_ray.text._similarity import (
    damerau_levenshtein,
    damerau_levenshtein_array,
    damerau_levenshtein_ratio,
    double_metaphone,
    jaro_similarity,
    jaro_similarity_array,
    jaro_winkler_similarity,
    jaro_winkler_similarity_array,
    levenshtein,
    levenshtein_array,
    levenshtein_ratio,
    levenshtein_ratio_array,
)
from mismo_ray.text._strings import norm_whitespace, strip_accents

__all__ = [
    "damerau_levenshtein",
    "damerau_levenshtein_array",
    "damerau_levenshtein_ratio",
    "double_metaphone",
    "jaro_similarity",
    "jaro_similarity_array",
    "jaro_winkler_similarity",
    "jaro_winkler_similarity_array",
    "levenshtein",
    "levenshtein_array",
    "levenshtein_ratio",
    "levenshtein_ratio_array",
    "ngrams",
    "norm_whitespace",
    "strip_accents",
    "tokenize",
]
