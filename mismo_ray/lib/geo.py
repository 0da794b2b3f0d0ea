"""Geospatial comparison and blocking
(reference: /root/reference/mismo/lib/geo/_latlon.py).

- ``distance_km``: haversine great-circle distance (:16-57), numpy-vectorized;
- ``bin_lat_lon``: latitude-aware grid binning (:265-301) — step sizes derived
  from km-per-degree at the point's latitude; both-null coords -> null bins;
- ``CoordinateLinker``: KeyLinker on (lat_bin, lon_bin) with grid size
  3 x distance_km (:180-216; approximate: can block pairs up to ~2x the
  distance, inaccurate at poles/date line, same caveats as the reference).

Address parsing (libpostal/spaCy in the reference, lib/geo/_postal.py,
_spacy.py) requires native libraries absent here; see
mismo_ray.multimodal for the actor-pool stub pattern those stages follow.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

R_EARTH_KM = 6371.0


def distance_km(lat1, lon1, lat2, lon2):
    """Haversine distance in km; scalars or numpy arrays."""
    scalar = np.isscalar(lat1) or lat1 is None
    def _arr(x):
        return np.asarray(x, dtype=np.float64)

    la1, lo1 = np.radians(_arr(lat1)), np.radians(_arr(lon1))
    la2, lo2 = np.radians(_arr(lat2)), np.radians(_arr(lon2))
    a = (
        np.sin((la2 - la1) / 2) ** 2
        + np.cos(la1) * np.cos(la2) * np.sin((lo2 - lo1) / 2) ** 2
    )
    out = (R_EARTH_KM * 2) * np.arcsin(np.sqrt(a))
    return float(out) if scalar else out


def bin_lat_lon(lat, lon, grid_size_km: float):
    """(lat_bin, lon_bin) int64 arrays; rows with BOTH coords null -> null.

    Matches the reference's floor-division binning with latitude-dependent
    longitude step (_latlon.py:265-301).
    """
    def to_float(x) -> np.ndarray:
        if isinstance(x, np.ndarray):
            return x.astype(np.float64)
        if isinstance(x, (pa.Array, pa.ChunkedArray)):
            x = x.to_pylist()
        return np.asarray(
            [np.nan if v is None else float(v) for v in x], dtype=np.float64
        )

    lat_a = to_float(lat)
    lon_a = to_float(lon)
    km_per_lat = (math.pi * R_EARTH_KM) / 180.0
    km_per_lon = np.cos(np.radians(lat_a)) * km_per_lat
    with np.errstate(divide="ignore", invalid="ignore"):
        lat_bin = np.floor(lat_a / (grid_size_km / km_per_lat))
        lon_bin = np.floor(lon_a / (grid_size_km / km_per_lon))
    both_null = np.isnan(lat_a) & np.isnan(lon_a)
    lat_out = pa.array(
        [None if both_null[i] or np.isnan(lat_bin[i]) else int(lat_bin[i]) for i in range(len(lat_a))],
        type=pa.int64(),
    )
    lon_out = pa.array(
        [None if both_null[i] or np.isnan(lon_bin[i]) else int(lon_bin[i]) for i in range(len(lon_a))],
        type=pa.int64(),
    )
    return lat_out, lon_out


class CoordinateLinker:
    """Block coordinate pairs within ~distance_km of each other via grid
    binning + KeyLinker (_latlon.py:116-263)."""

    def __init__(
        self,
        *,
        distance_km: float,
        lat_left: str = "latitude",
        lon_left: str = "longitude",
        lat_right: str | None = None,
        lon_right: str | None = None,
        task=None,
    ):
        self.distance_km = distance_km
        self.lat_l, self.lon_l = lat_left, lon_left
        self.lat_r = lat_right or lat_left
        self.lon_r = lon_right or lon_left
        self.task = task

    def _key(self, which: str):
        from mismo_ray.keys import KeySpec

        grid = self.distance_km * 3  # reference: 3x to avoid boundary splits

        def make(lat_col, lon_col, idx):
            def fn(batch: pa.Table) -> pa.Array:
                la = np.asarray(
                    [x if x is not None else np.nan for x in batch[lat_col].to_pylist()],
                    dtype=np.float64,
                )
                lo = np.asarray(
                    [x if x is not None else np.nan for x in batch[lon_col].to_pylist()],
                    dtype=np.float64,
                )
                bins = bin_lat_lon(la, lo, grid)
                return bins[idx]

            fn.__name__ = f"{which}_bin"
            return fn

        idx = 0 if which == "lat" else 1
        return KeySpec(
            f"{which}_bin",
            make(self.lat_l, self.lon_l, idx),
            make(self.lat_r, self.lon_r, idx),
        )

    def __call__(self, left, right):
        from mismo_ray.linker import KeyLinker

        linker = KeyLinker(
            [self._key("lat"), self._key("lon")], task=self.task
        )
        return linker(left, right)
