"""Overlay join: Sutherland–Hodgman kernel + cell-bucketed pair join.

Parity spine: the general convex-clip kernel must reproduce the closed-form
rect∩rect min/max formula on axis-aligned fixtures (the same argument the
q_overlay_area oracle makes at sf scale), and the join must emit each
intersecting pair exactly once despite multi-cell bbox coverings.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geo_epic_spark import synth
from geo_epic_spark.operators.overlay import (
    _clip_convex_one,
    overlay_join,
    rect_overlap_expr,
)


def rect_poly(x0, y0, x1, y1):
    return [x0, x1, x1, x0], [y0, y0, y1, y1]


class TestKernel:
    def test_rect_rect_matches_closed_form(self):
        rng = np.random.RandomState(7)
        for _ in range(200):
            ax0, ay0 = rng.uniform(-2, 2, 2)
            aw, ah = rng.uniform(0.1, 2, 2)
            bx0, by0 = rng.uniform(-2, 2, 2)
            bw, bh = rng.uniform(0.1, 2, 2)
            sx, sy = rect_poly(ax0, ay0, ax0 + aw, ay0 + ah)
            cx, cy = rect_poly(bx0, by0, bx0 + bw, by0 + bh)
            w = max(min(ax0 + aw, bx0 + bw) - max(ax0, bx0), 0.0)
            h = max(min(ay0 + ah, by0 + bh) - max(ay0, by0), 0.0)
            assert _clip_convex_one(sx, sy, cx, cy) == pytest.approx(w * h, abs=1e-12)

    def test_winding_invariance(self):
        sx, sy = rect_poly(0, 0, 2, 2)
        cw = _clip_convex_one(sx, sy, [1, 1, 3, 3], [1, 3, 3, 1])
        ccw = _clip_convex_one(sx, sy, [1, 3, 3, 1], [1, 1, 3, 3])
        assert cw == pytest.approx(1.0) and ccw == pytest.approx(1.0)
        # subject winding is also irrelevant (|shoelace|)
        assert _clip_convex_one(sx[::-1], sy[::-1], [1, 3, 3, 1], [1, 1, 3, 3]) \
            == pytest.approx(1.0)

    def test_triangle_contained_and_partial(self):
        # triangle fully inside a big clip rect: own area survives
        assert _clip_convex_one([0, 4, 0], [0, 0, 4], *rect_poly(-1, -1, 10, 10)) \
            == pytest.approx(8.0)
        # triangle (0,0)(2,0)(1,3) clipped to y<=1 strip: trapezoid 5/3
        assert _clip_convex_one([0, 2, 1], [0, 0, 3], *rect_poly(0, 0, 2, 1)) \
            == pytest.approx(5.0 / 3.0)

    def test_degenerate(self):
        assert _clip_convex_one([0, 1], [0, 0], *rect_poly(0, 0, 1, 1)) == 0.0
        assert _clip_convex_one([5, 6, 6, 5], [5, 5, 6, 6], *rect_poly(0, 0, 1, 1)) == 0.0


class TestOverlayJoin:
    @pytest.fixture(scope="class")
    def frames(self, spark):
        imgs = synth.images_meta_df(spark, 400).select(
            "image_id", "lon_min", "lat_min", "lon_max", "lat_max",
            F.array("lon_min", "lon_max", "lon_max", "lon_min").alias("xs"),
            F.array("lat_min", "lat_min", "lat_max", "lat_max").alias("ys"),
        )
        flds = synth.fields_df(spark, 60).select(
            "poly_id", "x0", "y0", "x1", "y1",
            F.col("xs").alias("zxs"), F.col("ys").alias("zys"))
        return imgs, flds

    def test_pairs_match_bruteforce_closed_form(self, frames):
        imgs, flds = frames
        got = (
            overlay_join(imgs.drop("lon_min", "lat_min", "lon_max", "lat_max"),
                         flds.drop("x0", "y0", "x1", "y1"), res=0.05)
            .select("image_id", "poly_id", F.round("overlap_area", 12).alias("a"))
        )
        brute = (
            imgs.crossJoin(flds)
            .select(
                "image_id", "poly_id",
                F.round(rect_overlap_expr(
                    F.col("lon_min"), F.col("lat_min"), F.col("lon_max"), F.col("lat_max"),
                    F.col("x0"), F.col("y0"), F.col("x1"), F.col("y1"),
                ), 12).alias("a"),
            )
            .where(F.col("a") > 0)
        )
        g = {(r.image_id, r.poly_id): r.a for r in got.collect()}
        b = {(r.image_id, r.poly_id): r.a for r in brute.collect()}
        assert set(g) == set(b)          # exactly once per intersecting pair
        for k in b:
            assert g[k] == pytest.approx(b[k], abs=1e-10)

    def test_zones_broadcast_plan(self, frames):
        imgs, flds = frames
        out = overlay_join(imgs.drop("lon_min", "lat_min", "lon_max", "lat_max"),
                           flds.drop("x0", "y0", "x1", "y1"), res=0.05)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
