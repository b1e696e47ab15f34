import numpy as np

from geo_epic_spark.geometry import (
    haversine_km,
    parse_wkt_polygon,
    points_in_polygon,
    polygon_area,
    polygon_centroid,
    wkt_polygon,
)


def test_pip_square():
    xs = np.array([0.0, 1.0, 1.0, 0.0])
    ys = np.array([0.0, 0.0, 1.0, 1.0])
    px = np.array([0.5, 1.5, -0.1, 0.99, 0.5])
    py = np.array([0.5, 0.5, 0.5, 0.01, 2.0])
    assert points_in_polygon(px, py, xs, ys).tolist() == [True, False, False, True, False]


def test_pip_concave():
    # L-shape: point in the notch must be outside
    xs = np.array([0, 2, 2, 1, 1, 0], dtype=float)
    ys = np.array([0, 0, 1, 1, 2, 2], dtype=float)
    assert points_in_polygon(np.array([1.5]), np.array([1.5]), xs, ys).tolist() == [False]
    assert points_in_polygon(np.array([0.5]), np.array([1.5]), xs, ys).tolist() == [True]
    assert points_in_polygon(np.array([1.5]), np.array([0.5]), xs, ys).tolist() == [True]


def test_area_centroid():
    xs = np.array([0.0, 2.0, 2.0, 0.0])
    ys = np.array([0.0, 0.0, 1.0, 1.0])
    assert polygon_area(xs, ys) == 2.0
    assert polygon_centroid(xs, ys) == (1.0, 0.5)


def test_wkt_roundtrip():
    xs = np.array([-97.1, -97.0, -97.05])
    ys = np.array([41.0, 41.0, 41.1])
    x2, y2 = parse_wkt_polygon(wkt_polygon(xs, ys))
    assert np.allclose(x2, xs) and np.allclose(y2, ys)


def test_haversine_known():
    # 1 degree of latitude ~ 111.19 km
    d = haversine_km(0.0, 0.0, 0.0, 1.0)
    assert abs(d - 111.19) < 0.1
