"""MinhashLshLinker: probabilistic near-duplicate blocking as a Linker
(reference: /root/reference/mismo/linker/_lsh.py:17-102; NOTE the reference's
``__call__`` body is unfinished — it ends without producing a join at
:95-98 — so the blocking semantics here follow its documented intent:
pairs block with probability 1-(1-J^band_size)^n_bands).

Determinism: the reference samples band members RANDOMLY per call (:17-43);
ours derives every hash from fixed seeded families (SURVEY §4), so runs are
reproducible across processes and parallelism levels.
"""

from __future__ import annotations

import ray.data

from mismo_ray.linker._common import Task
from mismo_ray.types import Linkage


class MinhashLshLinker:
    def __init__(
        self,
        column: str,
        *,
        num_hashes: int = 64,
        n_bands: int = 16,
        shingle_w: int = 5,
        max_pairs: int | None = None,
        verify_jaccard: float | None = None,
        seed: int = 7,
        task: Task | None = None,
    ):
        if num_hashes % n_bands:
            raise ValueError("num_hashes must be divisible by n_bands")
        self.column = column
        self.num_hashes = num_hashes
        self.n_bands = n_bands
        self.shingle_w = shingle_w
        self.max_pairs = max_pairs
        self.verify_jaccard = verify_jaccard
        self.seed = seed
        self.task = task
        self.last_counters: dict = {}

    @property
    def band_size(self) -> int:
        return self.num_hashes // self.n_bands

    def blocking_probability(self, jaccard: float) -> float:
        """P(pair blocks | true jaccard J) = 1-(1-J^band_size)^n_bands
        (reference _lsh.py:131-135 cost model)."""
        return 1 - (1 - jaccard**self.band_size) ** self.n_bands

    def __call__(
        self, left: ray.data.Dataset, right: ray.data.Dataset
    ) -> Linkage:
        from mismo_ray.dedupe import minhash_lsh_pairs
        from mismo_ray.linker._common import infer_task

        task = infer_task(task=self.task, left=left, right=right)
        return minhash_lsh_pairs(
            left,
            self.column,
            right=right if task == "link" else None,
            num_hashes=self.num_hashes,
            n_bands=self.n_bands,
            shingle_w=self.shingle_w,
            verify_jaccard=self.verify_jaccard,
            max_pairs=self.max_pairs,
            seed=self.seed,
        )
