"""Join-strategy variants promised by DESIGN_AT_SCALE.md: the co-partitioned
(non-broadcast) PIP join and the haversine kNN metric must match their
primary-path results."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from geo_epic_spark import synth
from geo_epic_spark.geometry import haversine_km
from geo_epic_spark.operators.spatial import nearest_grid_join, pip_join
from geo_epic_spark.plans.checks import formatted_plan


def test_pip_join_copartitioned_matches_broadcast(spark):
    """broadcast_polys=False is the at-scale path when the polygon side
    outgrows broadcast: both sides shuffle on the cell key. Same results,
    and the plan must show a non-broadcast join."""
    imgs = synth.images_meta_df(spark, 20000).select("i", "cx", "cy")
    flds = synth.fields_df(spark, 300).select("poly_id", "xs", "ys")
    bc = pip_join(imgs, flds, res=0.05, lon="cx", lat="cy")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        co = pip_join(imgs, flds, res=0.05, lon="cx", lat="cy",
                      broadcast_polys=False)
        plan = formatted_plan(co)
        assert "BroadcastHashJoin" not in plan, plan
        assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan), plan
        assert bc.count() == co.count()
        assert bc.select("i", "poly_id").exceptAll(co.select("i", "poly_id")).count() == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_nearest_grid_haversine_matches_numpy_oracle(spark):
    """metric='haversine' replicates the reference's GeoInterface path
    (`utils/raster_utils.py:196` BallTree(haversine)); checked row-for-row
    against a numpy brute-force oracle."""
    n_pts, nr, nc, sp = 300, 12, 18, 0.125
    pts = synth.images_meta_df(spark, n_pts).select("i", "cx", "cy")
    grid = synth.grid_df(spark, nr, nc, sp)
    got = (
        nearest_grid_join(
            pts, grid, res=sp, metric="haversine", point_id="i",
            point_lon="cx", point_lat="cy",
        )
        .select("i", "grid_id")
        .toPandas()
        .sort_values("i")
        .reset_index(drop=True)
    )
    p = pts.toPandas().sort_values("i").reset_index(drop=True)
    g = grid.toPandas()
    want = []
    for _, r in p.iterrows():
        d = haversine_km(r["cx"], r["cy"], g["lon"].to_numpy(), g["lat"].to_numpy())
        # engine tie-break: (distance, grid_id) ascending
        order = np.lexsort((g["grid_id"].to_numpy(), d))
        want.append(int(g["grid_id"].to_numpy()[order[0]]))
    assert got["grid_id"].tolist() == want


def test_bbox_join_matches_pip_join_on_rectangles(spark):
    """bbox_join is the codegen fast path for axis-aligned layers; must agree
    with the general ray-cast on the rectangle fixtures."""
    from geo_epic_spark.operators.spatial import bbox_join

    imgs = synth.images_meta_df(spark, 30000).select("i", "cx", "cy")
    flds = synth.fields_df(spark, 300)
    a = pip_join(imgs, flds.select("poly_id", "xs", "ys"),
                 res=0.05, lon="cx", lat="cy")
    b = bbox_join(imgs, flds.select("poly_id", "x0", "y0", "x1", "y1"),
                  res=0.05, lon="cx", lat="cy")
    assert a.count() == b.count()
    assert a.select("i", "poly_id").exceptAll(b.select("i", "poly_id")).count() == 0


def test_brute_fallback_guard_corner(spark):
    """fallback='brute' must re-resolve points whose final-ring best candidate
    is OUTSIDE the guard radius (a closer grid point can sit just beyond the
    block) and k>1 points with < k in-block candidates (round-2 advisor
    finding). Sparse 1-D lattice: point at x=1.9 sees only x=0 in its ring-1
    block (d=1.9 >= guard 1.0) while the true nearest x=3.1 lies outside."""
    res = 1.0
    grid = spark.createDataFrame(
        [(0, 0.0, 0.0), (1, 3.1, 0.0), (2, 7.3, 0.0)],
        "grid_id long, lon double, lat double",
    )
    pts = spark.createDataFrame(
        [(0, 1.9, 0.0), (1, 3.0, 0.0), (2, 5.4, 0.0), (3, 20.0, 0.0)],
        "i long, cx double, cy double",
    )
    got = (
        nearest_grid_join(
            pts, grid, res=res, point_id="i", point_lon="cx", point_lat="cy",
            max_ring=1, fallback="brute",
        )
        .select("i", "grid_id")
        .toPandas()
        .set_index("i")["grid_id"]
        .to_dict()
    )
    # numpy oracle: true nearest by (distance, grid_id)
    g = grid.toPandas()
    p = pts.toPandas()
    for _, r in p.iterrows():
        d = (g["lon"] - r["cx"]) ** 2 + (g["lat"] - r["cy"]) ** 2
        order = np.lexsort((g["grid_id"].to_numpy(), d.to_numpy()))
        assert got[r["i"]] == g["grid_id"].iloc[order[0]], (r["i"], got)
    # k=3 over a 3-point grid: every point must get exactly 3 ranked rows
    # even though its ring-1 block holds at most one candidate
    got3 = nearest_grid_join(
        pts, grid, res=res, k=3, point_id="i", point_lon="cx", point_lat="cy",
        max_ring=1, fallback="brute",
    )
    counts = got3.groupBy("i").count().toPandas()
    assert counts["count"].tolist() == [3, 3, 3, 3]
