"""Pure-numpy computational geometry used inside Arrow-batched pandas UDFs.

Replaces the reference's shapely/geopandas/rasterio geometry calls
(`geoEpic/core/workspace.py:318-326`, `geoEpic/utils/raster_utils.py:53-108`)
— those native libs are not in this container, and at 100 TB scale the
geometry test runs vectorized per Arrow batch anyway, so a numpy ray-cast is
both the portable and the fast choice.

Conventions: polygons are vertex arrays (xs, ys) in order, NOT closed
(first vertex not repeated). Containment is ray-casting with half-open edge
semantics; fixture points never fall exactly on edges, so results match the
closed-containment DuckDB oracles bit-for-bit.
"""

from __future__ import annotations

import numpy as np


def points_in_polygon(px: np.ndarray, py: np.ndarray, xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    """Vectorized ray-cast: bool mask of which (px, py) fall inside polygon.

    Loop over the (few) polygon edges, vectorized over the (many) points —
    the same shape as the reference's per-polygon rasterio mask
    (`utils/raster_utils.py:75-80`) but batch-oriented.
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    n = len(xs)
    inside = np.zeros(px.shape, dtype=bool)
    j = n - 1
    for i in range(n):
        yi, yj = ys[i], ys[j]
        xi, xj = xs[i], xs[j]
        crosses = (yi > py) != (yj > py)
        if np.any(crosses):
            x_at = (xj - xi) * (py - yi) / (yj - yi) + xi
            inside ^= crosses & (px < x_at)
        j = i
    return inside


def polygon_area(xs: np.ndarray, ys: np.ndarray) -> float:
    """Shoelace area (positive regardless of winding)."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    return float(abs(np.dot(xs, np.roll(ys, -1)) - np.dot(ys, np.roll(xs, -1))) / 2.0)


def polygon_centroid(xs: np.ndarray, ys: np.ndarray) -> tuple[float, float]:
    """Area-weighted centroid (matches shapely `.centroid` used at
    `core/workspace.py:321-322` for lat/lon extraction)."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    x1, y1 = np.roll(xs, -1), np.roll(ys, -1)
    cross = xs * y1 - x1 * ys
    a = cross.sum() / 2.0
    if a == 0.0:
        return float(xs.mean()), float(ys.mean())
    cx = ((xs + x1) * cross).sum() / (6.0 * a)
    cy = ((ys + y1) * cross).sum() / (6.0 * a)
    return float(cx), float(cy)


def wkt_polygon(xs: np.ndarray, ys: np.ndarray) -> str:
    """WKT POLYGON text (ring closed), matching the reference's WKT usage
    for SDA point/polygon queries (`soil/fetch_usda.py:48`)."""
    # 17 significant digits: exact double round-trip (%.10g loses ~1e-9)
    pts = [f"{x:.17g} {y:.17g}" for x, y in zip(xs, ys)]
    pts.append(pts[0])
    return "POLYGON ((" + ", ".join(pts) + "))"


def parse_wkt_polygon(wkt: str) -> tuple[np.ndarray, np.ndarray]:
    """Parse a simple single-ring WKT POLYGON back to vertex arrays
    (closing vertex dropped)."""
    body = wkt.strip()
    assert body.upper().startswith("POLYGON"), wkt
    inner = body[body.index("((") + 2 : body.rindex("))")]
    coords = [tuple(map(float, p.strip().split())) for p in inner.split(",")]
    if coords[0] == coords[-1]:
        coords = coords[:-1]
    xs = np.array([c[0] for c in coords], dtype=np.float64)
    ys = np.array([c[1] for c in coords], dtype=np.float64)
    return xs, ys


def haversine_km(lon1, lat1, lon2, lat2) -> np.ndarray:
    """Great-circle distance in km (numpy mirror of the Column version in
    functions/scalars.py; reference haversine path `utils/raster_utils.py:196`)."""
    r = 6371.0088
    lon1, lat1, lon2, lat2 = (np.radians(np.asarray(a, dtype=np.float64)) for a in (lon1, lat1, lon2, lat2))
    dlon = lon2 - lon1
    dlat = lat2 - lat1
    h = np.sin(dlat / 2.0) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2.0) ** 2
    return 2.0 * r * np.arcsin(np.sqrt(h))
