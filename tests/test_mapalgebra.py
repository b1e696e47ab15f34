"""Focal map algebra: scatter/aggregate window stats + Horn slope/aspect.

Ground truth is a tiny numpy stencil evaluated directly; the plan check pins
the single-Exchange scatter shape (no raster self-join).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geo_epic_spark import synth
from geo_epic_spark.operators.mapalgebra import focal_stats, slope_aspect

NR, NC, SP = 12, 15, 0.05


@pytest.fixture(scope="module")
def dem_np():
    g = np.arange(NR * NC, dtype=np.int64)
    r, c = (g // NC).astype(float), (g % NC).astype(float)
    jit = synth.u_np(g, synth.M[7], 53) * 4.0
    return (200.0 + r * 1.7 - c * 0.9 + r * c * 0.013 + jit).reshape(NR, NC)


class TestFocal:
    def test_focal_mean_matches_numpy(self, spark, dem_np):
        dem = synth.elev_grid_df(spark, NR, NC, SP)
        got = {r.grid_id: (r.focal_mean, r.focal_count)
               for r in focal_stats(dem, nc=NC, nr=NR, value="elev").collect()}
        assert len(got) == NR * NC
        for rr in range(NR):
            for cc in range(NC):
                win = dem_np[max(rr - 1, 0):rr + 2, max(cc - 1, 0):cc + 2]
                mean, cnt = got[rr * NC + cc]
                assert cnt == win.size
                assert mean == pytest.approx(win.mean(), rel=1e-12)

    def test_nodata_holes_shrink_window(self, spark):
        raster = synth.soil_grid_df(spark, 20, 20, 0.01)
        n_cells = raster.count()
        assert n_cells < 400  # generator drops ~2%
        out = focal_stats(raster, nc=20, nr=20, value="mukey", stats=("count",))
        # a dropped cell still RECEIVES contributions (it has a target row
        # only if it exists in the raster — scatter targets may include the
        # hole's id); holes contribute nothing, so neighbors of a hole see
        # a smaller window.
        counts = {r.grid_id: r.focal_count for r in out.collect()}
        assert min(counts.values()) < 9 <= max(counts.values())

    def test_single_exchange_plan(self, spark):
        dem = synth.elev_grid_df(spark, NR, NC, SP)
        plan = (focal_stats(dem, nc=NC, nr=NR, value="elev")
                ._jdf.queryExecution().executedPlan().toString())
        assert plan.count("Exchange") == 1  # one hash-agg shuffle, no join

    def test_min_neighbors_gate(self, spark, dem_np):
        dem = synth.elev_grid_df(spark, NR, NC, SP)
        out = focal_stats(dem, nc=NC, nr=NR, value="elev",
                          stats=("mean",), min_neighbors=9)
        assert out.count() == (NR - 2) * (NC - 2)  # interior only


class TestSlope:
    def test_horn_matches_numpy(self, spark, dem_np):
        dem = synth.elev_grid_df(spark, NR, NC, SP)
        got = {r.grid_id: (r.slope, r.aspect_octant)
               for r in slope_aspect(dem, nc=NC, nr=NR, spacing=SP).collect()}
        assert len(got) == (NR - 2) * (NC - 2)
        z = dem_np
        for rr in range(1, NR - 1):
            for cc in range(1, NC - 1):
                gx = ((z[rr - 1, cc + 1] + 2 * z[rr, cc + 1] + z[rr + 1, cc + 1])
                      - (z[rr - 1, cc - 1] + 2 * z[rr, cc - 1] + z[rr + 1, cc - 1])) / (8 * SP)
                gy = ((z[rr + 1, cc - 1] + 2 * z[rr + 1, cc] + z[rr + 1, cc + 1])
                      - (z[rr - 1, cc - 1] + 2 * z[rr - 1, cc] + z[rr - 1, cc + 1])) / (8 * SP)
                slope, octant = got[rr * NC + cc]
                assert slope == pytest.approx(np.hypot(gx, gy), rel=1e-9)
                # octant consistent with atan2 of the downslope vector
                ang = np.degrees(np.arctan2(-gy, -gx)) % 360.0
                assert octant == int(((ang + 22.5) % 360) // 45.0)

    def test_plane_has_constant_slope(self, spark):
        # pure tilted plane: slope = |grad| everywhere, aspect constant
        n = 8
        dem = (synth.grid_df(spark, n, n, 1.0)
               .withColumn("elev",
                           (F.col("grid_id") / n).cast("long").cast("double") * 2.0))
        out = slope_aspect(dem, nc=n, nr=n, spacing=1.0).collect()
        for r in out:
            assert r.slope == pytest.approx(2.0)
            assert r.aspect_octant == 6  # downslope due south (row index falls)


class TestRegrid:
    def test_interior_matches_manual_bilinear(self, spark, dem_np):
        from geo_epic_spark.operators.mapalgebra import regrid_bilinear

        src = synth.elev_grid_df(spark, NR, NC, SP)
        out = regrid_bilinear(src, src_nc=NC, src_nr=NR, src_spacing=SP,
                              dst_nc=20, dst_nr=16, dst_spacing=0.035,
                              value="elev", lon0=synth.AOI["lon0"],
                              lat0=synth.AOI["lat0"])
        got = {r.dst_id: (r.elev, r.w_total) for r in out.collect()}
        for d in range(20 * 16):
            fx = ((d % 20) + 0.5) * 0.035 / SP - 0.5
            fy = ((d // 20) + 0.5) * 0.035 / SP - 0.5
            i0, j0 = int(np.floor(fx)), int(np.floor(fy))
            dx, dy = fx - i0, fy - j0
            num = den = 0.0
            for dj in (0, 1):
                for di in (0, 1):
                    if 0 <= i0 + di < NC and 0 <= j0 + dj < NR:
                        w = (dx if di else 1 - dx) * (dy if dj else 1 - dy)
                        num += w * dem_np[j0 + dj, i0 + di]
                        den += w
            if den == 0.0:
                assert d not in got
            else:
                assert got[d][0] == pytest.approx(num / den, rel=1e-9)
                assert got[d][1] == pytest.approx(den, abs=1e-12)

    def test_identity_regrid_preserves_values(self, spark, dem_np):
        from geo_epic_spark.operators.mapalgebra import regrid_bilinear

        src = synth.elev_grid_df(spark, NR, NC, SP)
        out = regrid_bilinear(src, src_nc=NC, src_nr=NR, src_spacing=SP,
                              dst_nc=NC, dst_nr=NR, dst_spacing=SP,
                              value="elev", lon0=synth.AOI["lon0"],
                              lat0=synth.AOI["lat0"])
        got = {r.dst_id: r.elev for r in out.collect()}
        for g, v in got.items():
            assert v == pytest.approx(dem_np[g // NC, g % NC], rel=1e-12)
