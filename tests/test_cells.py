import numpy as np
import pyspark.sql.functions as F

from geo_epic_spark import cells


def test_np_roundtrip():
    lon = np.array([-100.0, -95.001, 0.0, 179.99])
    lat = np.array([40.0, 42.5, -89.9, 89.9])
    cid = cells.np_cell_id(lon, lat, cells.RES_1KM)
    clon, clat = cells.np_cell_center(cid, cells.RES_1KM)
    assert np.all(np.abs(clon - lon) <= cells.RES_1KM)
    assert np.all(np.abs(clat - lat) <= cells.RES_1KM)


def test_spark_matches_numpy(spark):
    df = spark.range(1000).select(
        (F.col("id") * 0.359 - 179.9).alias("lon"),
        (F.col("id") * 0.1797 - 89.9).alias("lat"),
    )
    got = df.select(cells.cell_id(F.col("lon"), F.col("lat"), 0.25).alias("c")).toPandas()
    i = np.arange(1000)
    want = cells.np_cell_id(i * 0.359 - 179.9, i * 0.1797 - 89.9, 0.25)
    assert np.array_equal(got["c"].to_numpy(), want)


def test_k_ring_and_shell(spark):
    df = spark.createDataFrame([(-97.5, 41.2)], "lon double, lat double")
    cid = cells.cell_id(F.col("lon"), F.col("lat"), 0.1)
    row = df.select(
        F.size(cells.k_ring(cid, 2)).alias("ring"),
        F.size(cells.ring_shell(cid, 2)).alias("shell"),
        F.size(F.array_except(cells.ring_shell(cid, 2), cells.k_ring(cid, 2))).alias("extra"),
    ).collect()[0]
    assert row.ring == 25
    assert row.shell == 16
    assert row.extra == 0


def test_cover_bbox_counts(spark):
    df = spark.createDataFrame([(0.0, 0.0, 0.35, 0.25)], "a double, b double, c double, d double")
    n = df.select(
        F.size(
            cells.cover_bbox(F.col("a"), F.col("b"), F.col("c"), F.col("d"), 0.1)
        ).alias("n")
    ).collect()[0].n
    assert n == 4 * 3  # cols 0..3, rows 0..2


def test_sql_emitter_matches():
    import duckdb

    got = duckdb.sql(
        f"SELECT {cells.sql_cell_id('-97.5', '41.2', 0.00901)} AS c"
    ).fetchone()[0]
    want = int(cells.np_cell_id(np.array([-97.5]), np.array([41.2]), 0.00901)[0])
    assert got == want


def test_tile_bounds_and_covering(spark):
    """§2.10 derived placement: deterministic, inside the AOI, covering set
    contains the center cell and matches the numpy covering."""
    import numpy as np
    from pyspark.sql import functions as F

    from geo_epic_spark import cells as C
    from geo_epic_spark.images.tiles import cells_for_bounds, tile_bounds, tile_center

    df = spark.createDataFrame(
        [(f"img{i:012d}", 32 * (1 + i % 3), 64) for i in range(50)],
        "image_id string, w int, h int",
    )
    res = 0.01
    b = tile_center(cells_for_bounds(tile_bounds(df), res))
    p = b.toPandas()
    # deterministic: same ids -> same bounds
    p2 = tile_bounds(df).toPandas().sort_values("image_id").reset_index(drop=True)
    p1 = p.sort_values("image_id").reset_index(drop=True)
    np.testing.assert_allclose(p1["lon_min"], p2["lon_min"])
    assert (p["lon_min"] >= -100.0).all() and (p["lon_max"] <= -94.9).all()
    assert (p["lat_min"] >= 40.0).all() and (p["lat_max"] <= 43.2).all()
    for _, r in p.iterrows():
        center_cell = C.np_cell_id(
            np.array([r["cx"]]), np.array([r["cy"]]), res
        )[0]
        assert center_cell in set(r["cell_ids"])
