"""EmbeddingLinker: cosine-similarity blocking as a Linker.

No direct reference analog (mismo's vector module stops at pairwise
similarity functions, /root/reference/mismo/vector/_vector.py, and its
linkers block on discrete keys); this closes the gap between the ANN tier
and the record-linkage surface — "block pairs whose embeddings agree" is
the modern counterpart of minhash-LSH blocking, usable anywhere a Linker
is (OrLinker terms, compare/score pipelines, blocking reports).

Routing mirrors ``dedupe.embedding_neardup_pairs``: exact 1-Bucket-Theta
chunk-pair join up to ``auto_exact_max_rows`` (recall 1), banded
hyperplane LSH + exact verify beyond (near-linear, the 100 TB path). Both
support the link task: the exact join fans each side over the OTHER
side's chunks; LSH buckets both corpora with the same seeded hyperplanes.
"""

from __future__ import annotations

import ray.data

from mismo_ray.linker._common import Task
from mismo_ray.types import Linkage


class EmbeddingLinker:
    """Blocks pairs with embedding cosine >= ``tau``.

    >>> linker = EmbeddingLinker("embedding", tau=0.9)
    >>> linkage = linker(customers, suppliers)   # link task
    >>> dupes = linker(docs, docs)               # dedupe task (id_l < id_r)
    """

    def __init__(
        self,
        vector_column: str = "embedding",
        *,
        tau: float = 0.95,
        id_column: str = "record_id",
        method: str = "auto",
        auto_exact_max_rows: int = 100_000,
        chunk_rows: int = 8192,
        bits_per_band: int = 8,
        n_bands: int = 8,
        max_pairs: int | None = 5_000_000,
        seed: int = 7,
        task: Task | None = None,
    ):
        self.vector_column = vector_column
        self.tau = float(tau)
        self.id_column = id_column
        self.method = method
        self.auto_exact_max_rows = auto_exact_max_rows
        self.chunk_rows = chunk_rows
        self.bits_per_band = bits_per_band
        self.n_bands = n_bands
        self.max_pairs = max_pairs
        self.seed = seed
        self.task = task

    def __call__(
        self, left: ray.data.Dataset, right: ray.data.Dataset
    ) -> Linkage:
        from mismo_ray.ann import cosine_threshold_pairs, lsh_threshold_pairs
        from mismo_ray.linker._common import infer_task

        task = infer_task(task=self.task, left=left, right=right)
        rhs = right if task == "link" else None
        method = self.method
        if method == "auto":
            n = left.count() + (right.count() if task == "link" else 0)
            method = "exact" if n <= self.auto_exact_max_rows else "lsh"
        if method == "exact":
            links = cosine_threshold_pairs(
                left,
                tau=self.tau,
                right=rhs,
                id_column=self.id_column,
                vector_column=self.vector_column,
                chunk_rows=self.chunk_rows,
            )
        elif method == "lsh":
            links = lsh_threshold_pairs(
                left,
                tau=self.tau,
                right=rhs,
                id_column=self.id_column,
                vector_column=self.vector_column,
                bits_per_band=self.bits_per_band,
                n_bands=self.n_bands,
                max_pairs=self.max_pairs,
                seed=self.seed,
            )
        else:
            raise ValueError("method must be 'auto', 'exact' or 'lsh'")
        return Linkage(left=left, right=right, links=links)
