"""Coordinate reference system transforms (SURVEY S2/J2).

The reference reprojects every vector layer to EPSG:4326 on load
(`geoEpic/core/workspace.py:319-320`, `utils/crop_csb.py:65`) and transforms
point coords into each raster's CRS before sampling
(`utils/raster_utils.py:117-123`, via pyproj/rasterio). Those libraries are
absent here, so the two projections the reference's data actually uses are
implemented from their published formulas (Snyder, "Map Projections — A
Working Manual", USGS PP 1395):

- EPSG:3857 Web Mercator (spherical)
- EPSG:5070 CONUS Albers Equal-Area Conic on GRS80 (the gSSURGO / NLCD grid)

Vectorized numpy kernels + Arrow-batched pandas UDF wrappers; roundtrip
accuracy < 1e-6 m (tested).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

# GRS80 ellipsoid
_A = 6378137.0
_E2 = 0.00669438002290
_E = np.sqrt(_E2)

# EPSG:5070 parameters
_LAT0, _LON0 = np.radians(23.0), np.radians(-96.0)
_SP1, _SP2 = np.radians(29.5), np.radians(45.5)
_FE, _FN = 0.0, 0.0

_R_MERC = 6378137.0  # spherical web-mercator radius


# ---------------------------------------------------------------------------
# numpy kernels
# ---------------------------------------------------------------------------

def to_web_mercator(lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    x = _R_MERC * np.radians(np.asarray(lon, dtype=np.float64))
    y = _R_MERC * np.log(np.tan(np.pi / 4 + np.radians(np.asarray(lat, dtype=np.float64)) / 2))
    return x, y


def from_web_mercator(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    lon = np.degrees(np.asarray(x, dtype=np.float64) / _R_MERC)
    lat = np.degrees(2 * np.arctan(np.exp(np.asarray(y, dtype=np.float64) / _R_MERC)) - np.pi / 2)
    return lon, lat


def _m(phi: np.ndarray) -> np.ndarray:
    s = np.sin(phi)
    return np.cos(phi) / np.sqrt(1 - _E2 * s * s)


def _q(phi: np.ndarray) -> np.ndarray:
    s = np.sin(phi)
    return (1 - _E2) * (
        s / (1 - _E2 * s * s) - (1 / (2 * _E)) * np.log((1 - _E * s) / (1 + _E * s))
    )


_M1, _M2 = _m(_SP1), _m(_SP2)
_Q0, _Q1, _Q2 = _q(_LAT0), _q(_SP1), _q(_SP2)
_N = (_M1 * _M1 - _M2 * _M2) / (_Q2 - _Q1)
_C = _M1 * _M1 + _N * _Q1
_RHO0 = _A * np.sqrt(_C - _N * _Q0) / _N


def to_albers_conus(lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """EPSG:5070 forward (Snyder eq. 14-1..14-4 ellipsoidal Albers)."""
    lam = np.radians(np.asarray(lon, dtype=np.float64))
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    q = _q(phi)
    rho = _A * np.sqrt(_C - _N * q) / _N
    theta = _N * (lam - _LON0)
    return _FE + rho * np.sin(theta), _FN + _RHO0 - rho * np.cos(theta)


def from_albers_conus(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """EPSG:5070 inverse (Snyder eq. 14-8..14-11 + 3-16 iteration)."""
    x = np.asarray(x, dtype=np.float64) - _FE
    y = np.asarray(y, dtype=np.float64) - _FN
    rho = np.sqrt(x * x + (_RHO0 - y) ** 2)
    theta = np.arctan2(x, _RHO0 - y)
    q = (_C - (rho * _N / _A) ** 2) / _N
    lam = _LON0 + theta / _N
    # iterate phi (converges in ~4 rounds to <1e-12 rad)
    phi = np.arcsin(np.clip(q / 2, -1, 1))
    for _ in range(6):
        s = np.sin(phi)
        phi = phi + (1 - _E2 * s * s) ** 2 / (2 * np.cos(phi)) * (
            q / (1 - _E2)
            - s / (1 - _E2 * s * s)
            + (1 / (2 * _E)) * np.log((1 - _E * s) / (1 + _E * s))
        )
    return np.degrees(lam), np.degrees(phi)


# ---------------------------------------------------------------------------
# Spark wrappers (Arrow-batched)
# ---------------------------------------------------------------------------

_XY = StructType([StructField("x", DoubleType()), StructField("y", DoubleType())])
_KERNELS = {
    ("epsg:4326", "epsg:3857"): to_web_mercator,
    ("epsg:3857", "epsg:4326"): from_web_mercator,
    ("epsg:4326", "epsg:5070"): to_albers_conus,
    ("epsg:5070", "epsg:4326"): from_albers_conus,
}


def transform_udf(src: str, dst: str):
    """pandas_udf (x, y) -> struct(x, y) for the given CRS pair."""
    fn = _KERNELS[(src.lower(), dst.lower())]

    def _tx(x, y):
        ox, oy = fn(x.to_numpy(), y.to_numpy())
        return pd.DataFrame({"x": ox, "y": oy})

    return F.pandas_udf(_tx, _XY)


def transform(df, src: str, dst: str, x: str = "lon", y: str = "lat",
              out_x: str = "x", out_y: str = "y"):
    """Add projected coordinate columns (analog of ``gdf.to_crs`` /
    ``transform_coordinates``)."""
    udf = transform_udf(src, dst)
    t = udf(F.col(x), F.col(y))
    return df.withColumn("__t", t).withColumn(out_x, F.col("__t.x")).withColumn(
        out_y, F.col("__t.y")
    ).drop("__t")
