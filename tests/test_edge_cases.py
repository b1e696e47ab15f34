"""Edge conditions: empty sides, degenerate polygons, single-row series —
the engine must return empty/identity results, never throw."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from geo_epic_spark import synth
from geo_epic_spark.operators.dedup import exact_dedup, minhash_lsh_pairs
from geo_epic_spark.operators.spatial import (
    bbox_join, nearest_grid_join, pip_join, zonal_stats,
)
from geo_epic_spark.operators.timeseries import interpolate_daily


def test_pip_join_empty_polys(spark):
    imgs = synth.images_meta_df(spark, 100).select("i", "cx", "cy")
    empty = spark.createDataFrame([], "poly_id long, xs array<double>, ys array<double>")
    assert pip_join(imgs, empty, res=0.05, lon="cx", lat="cy").count() == 0
    # left join keeps all points with null poly_id
    left = pip_join(imgs, empty, res=0.05, lon="cx", lat="cy", how="left")
    assert left.count() == 100
    assert left.filter(F.col("poly_id").isNull()).count() == 100


def test_pip_join_empty_points(spark):
    empty = spark.createDataFrame([], "i long, cx double, cy double")
    flds = synth.fields_df(spark, 10).select("poly_id", "xs", "ys")
    assert pip_join(empty, flds, res=0.05, lon="cx", lat="cy").count() == 0


def test_bbox_join_degenerate_box(spark):
    # zero-area box contains nothing under half-open semantics
    pts = spark.createDataFrame(pd.DataFrame({"i": [0], "cx": [1.0], "cy": [1.0]}))
    boxes = spark.createDataFrame(pd.DataFrame(
        {"poly_id": [7], "x0": [1.0], "y0": [1.0], "x1": [1.0], "y1": [1.0]}))
    assert bbox_join(pts, boxes, res=0.5, lon="cx", lat="cy").count() == 0


def test_nearest_grid_empty_grid_drop_vs_brute(spark):
    pts = synth.images_meta_df(spark, 50).select("i", "cx", "cy")
    empty = spark.createDataFrame([], "grid_id long, lon double, lat double")
    out = nearest_grid_join(
        pts, empty, res=0.1, point_id="i", point_lon="cx", point_lat="cy",
        max_ring=1, fallback="drop",
    )
    assert out.count() == 0
    # brute fallback against an empty grid also yields nothing (no crash)
    out2 = nearest_grid_join(
        pts, empty, res=0.1, point_id="i", point_lon="cx", point_lat="cy",
        max_ring=1, fallback="brute",
    )
    assert out2.count() == 0


def test_zonal_stats_no_overlap(spark):
    raster = synth.soil_grid_df(spark, 10, 10, 0.01)
    # polygon far outside the raster extent
    polys = spark.createDataFrame(pd.DataFrame({
        "poly_id": [1],
        "xs": [[50.0, 51.0, 51.0, 50.0]],
        "ys": [[50.0, 50.0, 51.0, 51.0]],
    }))
    assert zonal_stats(raster, polys, value="mukey", res=0.5).count() == 0


def test_dedup_empty_and_single(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert exact_dedup(empty).count() == 0
    assert minhash_lsh_pairs(empty).count() == 0
    one = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": ["hello world one"]}))
    assert exact_dedup(one).count() == 1
    assert minhash_lsh_pairs(one).count() == 0


def test_interpolate_single_observation(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "site": ["a"], "date": [pd.Timestamp("2020-01-01").date()], "v": [5.0],
    }))
    out = interpolate_daily(df, "v", by=["site"]).toPandas()
    assert len(out) == 1 and out.iloc[0]["v_interp"] == 5.0


def test_opc_append_empty_second(spark):
    from geo_epic_spark.operators.relational import opc_append

    first = spark.createDataFrame([(1, 3, 15, 2)], "Yid int, Mn int, Dy int, CODE int")
    empty = spark.createDataFrame([], "Yid int, Mn int, Dy int, CODE int")
    # empty second: first passes through unchanged (no offsets resolvable)
    out = opc_append(first, empty, start_year=2000).toPandas()
    assert out["Yid"].tolist() == [1] and out["Yr"].tolist() == [2000]


def test_bilinear_resize_upscale_and_identity():
    import numpy as np

    from geo_epic_spark.images import codec

    img = codec.synth_pixels(3, 32, 32)
    # identity resize is exact
    np.testing.assert_array_equal(codec.bilinear_resize(img, 32, 32), img)
    # upscale keeps range and shape
    up = codec.bilinear_resize(img, 96, 64)
    assert up.shape == (64, 96, 3)
    assert up.min() >= img.min() - 1 and up.max() <= img.max() + 1


def test_frame_sample_stride_beyond_length(spark):
    from geo_epic_spark import media

    df = media.synth_video_df(spark, 2)
    out = media.frame_sample(df, every=100).toPandas()
    # stride past the container: only frame 0 per video
    assert out["frame_idx"].tolist() == [0, 0]


def test_minhash_single_doc_no_pairs(spark):
    from geo_epic_spark.operators.dedup import minhash_lsh_pairs

    one = spark.createDataFrame([(1, "only one document here")],
                                "doc_id long, text string")
    assert minhash_lsh_pairs(one, threshold=0.5).count() == 0
