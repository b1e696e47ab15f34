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


class TestHullAndSimplify:
    def test_hull_vs_bruteforce(self):
        import numpy as np

        from geo_epic_spark.geometry import convex_hull, points_in_polygon

        rng = np.random.RandomState(9)
        for _ in range(20):
            xs = rng.uniform(0, 1, 60)
            ys = rng.uniform(0, 1, 60)
            hx, hy = convex_hull(xs, ys)
            # every input point is inside or on the hull: shrink test — all
            # points must satisfy every hull half-plane with tolerance
            n = len(hx)
            for i in range(n):
                ax, ay = hx[i], hy[i]
                bx, by = hx[(i + 1) % n], hy[(i + 1) % n]
                cross = (bx - ax) * (ys - ay) - (by - ay) * (xs - ax)
                assert cross.min() >= -1e-12  # CCW: all points left of edges
            # hull vertices are extreme: removing any shrinks the hull
            assert n >= 3

    def test_hull_spark_groups(self, spark):
        import pyspark.sql.functions as F

        from geo_epic_spark.operators.spatial import group_convex_hull

        rows = [(g, float(x), float(y))
                for g in (0, 1)
                for x, y in [(0, 0), (2, 0), (2, 2), (0, 2), (1, 1), (0.5, 1.7)]]
        df = spark.createDataFrame(rows, "group_id long, lon double, lat double")
        got = {r.group_id: r for r in group_convex_hull(df).collect()}
        for g in (0, 1):
            assert got[g].n_hull == 4 and got[g].area == 4.0
            assert list(zip(got[g].xs, got[g].ys)) == [
                (0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0)]

    def test_simplify_dp_properties(self):
        import numpy as np

        from geo_epic_spark.geometry import simplify_dp

        x = np.linspace(0, 10, 101)
        y = 0.05 * np.sin(x)  # shallow wiggle
        sx, sy = simplify_dp(x, y, 0.1)
        assert len(sx) < 10            # collapses under tolerance
        assert sx[0] == 0 and sx[-1] == 10  # endpoints kept
        sx2, _ = simplify_dp(x, y, 0.001)
        assert len(sx2) > len(sx)      # tighter tol keeps more

    def test_simplify_polygons_spark(self, spark):
        import pyspark.sql.functions as F

        from geo_epic_spark.operators.spatial import simplify_polygons

        # square with redundant edge midpoints: tol removes the collinear 4
        xs = [0.0, 1.0, 2.0, 2.0, 2.0, 1.0, 0.0, 0.0]
        ys = [0.0, 0.0, 0.0, 1.0, 2.0, 2.0, 2.0, 1.0]
        df = spark.createDataFrame([(1, xs, ys)],
                                   "pid long, xs array<double>, ys array<double>")
        r = simplify_polygons(df, tol=1e-9).collect()[0]
        assert r.n_before == 8 and r.n_after == 4
        assert list(zip(r.xs, r.ys)) == [(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0)]
