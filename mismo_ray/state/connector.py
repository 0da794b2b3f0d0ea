"""Generic async external-service connector stage with AIMD concurrency.

Re-expresses the reference's census-geocoder execution pattern
(reference/mismo/lib/geo/_census.py:39-100 `_AdaptiveLimiter`, :102-195
chunked async batch calls) as a reusable Ray Data ACTOR-POOL stage:

- ``AdaptiveLimiter``: TCP-style AIMD concurrency control — start optimistic,
  halve on the FIRST overload signal of a failure wave (generation-tagged so
  one wave only halves once), creep +1 after a full round of successes.
- ``AsyncConnectorStage``: callable class for
  ``ds.map_batches(AsyncConnectorStage(client_factory, ...), concurrency=N,
  batch_size=B)``. Each actor owns one event loop + one limiter + one client
  (built once in ``__init__`` — the actor-pool state rule); ``__call__``
  splits a batch into request chunks, dispatches them concurrently under the
  limiter with bounded retries, and returns the batch with the response
  columns appended. Cluster-wide concurrency = actors x per-actor limit.

The actual census HTTP client needs network access (absent here); the
deterministic ``FakeGeocodeClient`` exercises the full machinery — chunking,
AIMD backoff/recovery, retries — and stands in for any real
``async (rows) -> responses`` client.
"""

from __future__ import annotations

import asyncio
from collections.abc import Callable

import numpy as np
import pyarrow as pa

from mismo_ray._util import hash64


class OverloadError(Exception):
    """Raise from a client to signal server overload (502s, timeouts):
    triggers AIMD backoff + retry instead of failing the task."""


class AdaptiveLimiter:
    """AIMD concurrency limiter (reference _census.py:39-100 semantics)."""

    def __init__(self, max_limit: int):
        self.max_limit = max_limit
        self.limit = max_limit
        self._active = 0
        self._cond = asyncio.Condition()
        # a whole wave of in-flight requests fails together on overload;
        # requests record the generation they started in and only the first
        # failure of a generation halves the limit
        self.generation = 0
        self._n_successes = 0

    async def acquire(self) -> int:
        async with self._cond:
            await self._cond.wait_for(lambda: self._active < self.limit)
            self._active += 1
            return self.generation

    async def release(self) -> None:
        async with self._cond:
            self._active -= 1
            self._cond.notify_all()

    async def on_success(self) -> None:
        async with self._cond:
            self._n_successes += 1
            if self._n_successes >= self.limit and self.limit < self.max_limit:
                self._n_successes = 0
                self.limit += 1
                self._cond.notify_all()

    async def on_overload(self, generation: int) -> None:
        async with self._cond:
            if generation != self.generation:
                return  # this failure wave already backed off
            self.generation += 1
            self._n_successes = 0
            self.limit = max(1, self.limit // 2)


class AsyncConnectorStage:
    """Actor-pool stage: batch -> chunked concurrent client calls -> batch +
    response columns.

    ``client_factory() -> async callable (list[dict]) -> list[dict]``: one
    client per actor, called per chunk; each returned dict's keys become
    output columns (missing keys -> null). Chunks that keep raising
    ``OverloadError`` past ``max_retries`` produce null rows rather than
    failing the task (``strict=True`` to raise instead).
    """

    def __init__(
        self,
        client_factory: Callable[[], Callable],
        *,
        input_columns: list[str],
        output_schema: pa.Schema,
        chunk_size: int = 1000,
        n_concurrent: int = 16,
        max_retries: int = 4,
        strict: bool = False,
    ):
        self.client_factory = client_factory
        self.input_columns = list(input_columns)
        self.output_schema = output_schema
        self.chunk_size = chunk_size
        self.n_concurrent = n_concurrent
        self.max_retries = max_retries
        self.strict = strict
        self.counters = {"chunks": 0, "overloads": 0, "failed_chunks": 0}
        # client / limiter / event loop are created lazily ON THE ACTOR at
        # first call (none of them pickle; pass the class via
        # ``map_batches(AsyncConnectorStage, fn_constructor_kwargs=...)`` or
        # an instance — both work)
        self.client = None
        self.limiter = None
        self.loop = None

    def _ensure_state(self) -> None:
        if self.loop is None:
            self.loop = asyncio.new_event_loop()
            self.limiter = AdaptiveLimiter(self.n_concurrent)
            self.client = self.client_factory()

    async def _run_chunk(self, rows: list[dict]) -> list[dict] | None:
        for _ in range(self.max_retries + 1):
            gen = await self.limiter.acquire()
            try:
                out = await self.client(rows)
            except OverloadError:
                self.counters["overloads"] += 1
                await self.limiter.on_overload(gen)
                continue
            else:
                await self.limiter.on_success()
                return out
            finally:
                await self.limiter.release()
        self.counters["failed_chunks"] += 1
        if self.strict:
            raise OverloadError(
                f"chunk still overloaded after {self.max_retries} retries"
            )
        return None

    async def _run_all(self, chunks: list[list[dict]]) -> list[list[dict] | None]:
        return await asyncio.gather(*(self._run_chunk(c) for c in chunks))

    def __call__(self, batch: pa.Table) -> pa.Table:
        self._ensure_state()
        rows = batch.select(self.input_columns).to_pylist()
        chunks = [
            rows[i : i + self.chunk_size]
            for i in range(0, len(rows), self.chunk_size)
        ]
        self.counters["chunks"] += len(chunks)
        results = self.loop.run_until_complete(self._run_all(chunks))
        flat: list[dict] = []
        for chunk, res in zip(chunks, results):
            flat.extend(res if res is not None else [{}] * len(chunk))
        for name in self.output_schema.names:
            batch = batch.append_column(
                name,
                pa.array(
                    [r.get(name) for r in flat],
                    type=self.output_schema.field(name).type,
                ),
            )
        return batch


class FakeGeocodeClient:
    """Deterministic stand-in for the census batch geocoder: lat/lon derived
    from the address hash; optionally simulates overload for the first
    ``fail_first`` calls (exercises AIMD backoff + retry)."""

    def __init__(self, *, fail_first: int = 0, delay_s: float = 0.0):
        self._calls = 0
        self.fail_first = fail_first
        self.delay_s = delay_s

    async def __call__(self, rows: list[dict]) -> list[dict]:
        self._calls += 1
        if self.delay_s:
            await asyncio.sleep(self.delay_s)
        if self._calls <= self.fail_first:
            raise OverloadError("simulated 502")
        keys = [
            "|".join(str(r.get(c)) for c in sorted(r)) for r in rows
        ]
        h = hash64(keys)
        lat = (h % np.uint64(180_000_000)).astype(np.float64) / 1e6 - 90.0
        lon = ((h >> np.uint64(32)) % np.uint64(360_000_000)).astype(
            np.float64
        ) / 1e6 - 180.0
        return [
            {
                "is_match": True,
                "latitude": float(la),
                "longitude": float(lo),
            }
            for la, lo in zip(lat, lon)
        ]


GEOCODE_SCHEMA = pa.schema(
    [
        pa.field("is_match", pa.bool_()),
        pa.field("latitude", pa.float64()),
        pa.field("longitude", pa.float64()),
    ]
)
