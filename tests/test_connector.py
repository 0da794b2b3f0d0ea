"""AIMD async connector stage (reference census-geocoder execution pattern,
_census.py:39-100) — limiter unit behavior + the actor-pool Dataset stage
end-to-end with a flaky fake client."""

from __future__ import annotations

import asyncio

import pyarrow as pa
import ray.data

from mismo_ray.state.connector import (
    GEOCODE_SCHEMA,
    AdaptiveLimiter,
    AsyncConnectorStage,
    FakeGeocodeClient,
)


def test_adaptive_limiter_aimd():
    async def run():
        lim = AdaptiveLimiter(8)
        g = await lim.acquire()
        await lim.on_overload(g)
        assert lim.limit == 4
        # same generation: a second failure from the same wave must NOT halve
        await lim.on_overload(g)
        assert lim.limit == 4
        await lim.release()
        # a failure from the NEW generation halves again
        g2 = await lim.acquire()
        await lim.on_overload(g2)
        assert lim.limit == 2
        await lim.release()
        # additive recovery: one full round of successes -> +1
        for _ in range(2):
            gg = await lim.acquire()
            await lim.on_success()
            await lim.release()
        assert lim.limit == 3

    asyncio.run(run())


def test_connector_stage_end_to_end(ray_session):
    addrs = pa.table(
        {
            "addr_id": list(range(250)),
            "street": [f"{i} MAIN ST" for i in range(250)],
            "zipcode": [f"{99500 + i % 99}" for i in range(250)],
        }
    )
    ds = ray.data.from_arrow(addrs).repartition(2)
    stage = AsyncConnectorStage(
        lambda: FakeGeocodeClient(fail_first=3),  # first 3 calls 502 -> AIMD
        input_columns=["street", "zipcode"],
        output_schema=GEOCODE_SCHEMA,
        chunk_size=25,
        n_concurrent=8,
    )
    out = ds.map_batches(
        stage, batch_format="pyarrow", concurrency=1, batch_size=125
    ).take_all()
    assert len(out) == 250
    assert all(r["is_match"] for r in out)
    assert all(-90 <= r["latitude"] <= 90 for r in out)
    # deterministic: same address -> same coordinates
    by_street = {}
    for r in out:
        by_street.setdefault((r["street"], r["zipcode"]), set()).add(
            (r["latitude"], r["longitude"])
        )
    assert all(len(v) == 1 for v in by_street.values())


def test_connector_stage_gives_nulls_after_retries(ray_session):
    ds = ray.data.from_arrow(pa.table({"street": ["1 A ST"] * 10}))
    stage = AsyncConnectorStage(
        lambda: FakeGeocodeClient(fail_first=10**9),  # always overloaded
        input_columns=["street"],
        output_schema=GEOCODE_SCHEMA,
        chunk_size=5,
        n_concurrent=4,
        max_retries=2,
    )
    out = ds.map_batches(
        stage, batch_format="pyarrow", concurrency=1
    ).take_all()
    assert len(out) == 10
    assert all(r["is_match"] is None and r["latitude"] is None for r in out)


def test_connector_stage_strict_raises(ray_session):
    import pytest
    from mismo_ray.state.connector import OverloadError

    ds = ray.data.from_arrow(pa.table({"street": ["1 A ST"] * 4}))
    stage = AsyncConnectorStage(
        lambda: FakeGeocodeClient(fail_first=10**9),
        input_columns=["street"],
        output_schema=GEOCODE_SCHEMA,
        chunk_size=2,
        n_concurrent=2,
        max_retries=1,
        strict=True,
    )
    with pytest.raises(Exception):  # OverloadError surfaces as a Ray task error
        ds.map_batches(stage, batch_format="pyarrow", concurrency=1).take_all()
