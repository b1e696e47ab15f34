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
