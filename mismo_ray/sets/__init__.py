from mismo_ray.sets._compare import jaccard, jaccard_array
from mismo_ray.sets._tfidf import (
    add_array_value_counts,
    add_tfidf,
    document_counts,
    rare_terms,
    term_idf,
)

__all__ = [
    "add_array_value_counts",
    "add_tfidf",
    "document_counts",
    "jaccard",
    "jaccard_array",
    "rare_terms",
    "term_idf",
]
