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


def test_zorder_key_matches_numpy_and_bit_reference(spark):
    """Spark Column z-order == numpy mirror == naive per-bit interleave,
    on random points plus the quantization-clamp edges (lat=90, lon=180)."""
    import numpy as np

    from geo_epic_spark.cells import np_zorder_key, zorder_key

    rng = np.random.Generator(np.random.PCG64(7))
    lon = np.concatenate([rng.uniform(-180, 180, 500), [180.0, -180.0, 0.0]])
    lat = np.concatenate([rng.uniform(-90, 90, 500), [90.0, -90.0, 0.0]])
    want = np_zorder_key(lon, lat, bits=12)

    df = spark.createDataFrame(
        [(i, float(a), float(b)) for i, (a, b) in enumerate(zip(lon, lat))],
        ["i", "lon", "lat"],
    )
    got = {
        r["i"]: r["z"]
        for r in df.select(
            "i", zorder_key(F.col("lon"), F.col("lat"), bits=12).alias("z")
        ).collect()
    }
    assert all(got[i] == int(want[i]) for i in range(len(lon)))
    assert max(got.values()) < 4**12

    def ref(lo, la, bits=12):
        n = 1 << bits
        qr = min(int((la + 90.0) / 180.0 * n), n - 1)
        qc = min(int((lo + 180.0) / 360.0 * n), n - 1)
        z = 0
        for k in range(bits):
            z |= ((qc >> k) & 1) << (2 * k) | ((qr >> k) & 1) << (2 * k + 1)
        return z

    assert all(got[i] == ref(lon[i], lat[i]) for i in range(len(lon)))


def test_zorder_locality_and_plan(spark):
    """Same quantized cell -> same key; quadrant containment -> shared key
    prefix (the property range-pruning relies on); and the whole expression
    is map-only JVM arithmetic (no Exchange, no Python eval in the plan)."""
    import numpy as np

    from geo_epic_spark.cells import np_zorder_key, zorder_key

    # two points in the same 2^bits cell
    assert np_zorder_key(np.array([10.0, 10.001]), np.array([45.0, 45.001]),
                         bits=8).ptp() == 0
    # quadrant prefix: halving bits = dropping the low 2 bits of the key
    z_hi = np_zorder_key(np.array([10.0]), np.array([45.0]), bits=10)[0]
    z_lo = np_zorder_key(np.array([10.0]), np.array([45.0]), bits=9)[0]
    assert z_hi >> 2 == z_lo

    df = spark.range(10).select(
        (F.col("id") * 0.1).alias("lon"), (F.col("id") * 0.05).alias("lat")
    )
    plan = (
        df.select(zorder_key(F.col("lon"), F.col("lat")).alias("z"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Python" not in plan


class TestHexCells:
    def test_assignment_is_nearest_center(self, spark):
        import numpy as np
        from geo_epic_spark import cells as C

        rng = np.random.RandomState(3)
        lon = rng.uniform(-100, -96, 5000)
        lat = rng.uniform(40, 42, 5000)
        cid = C.np_hex_cell_id(lon, lat, 0.05)
        fr = (cid // C._SHIFT) - C._HEX_OFF
        fq = (cid % C._SHIFT) - C._HEX_OFF
        cx = 0.05 * 1.7320508075688772 * (fq + fr / 2.0)
        cy = 0.05 * 1.5 * fr
        # every point lies within the circumradius of its assigned hex
        assert np.hypot(lon - cx, lat - cy).max() <= 0.05 + 1e-9

    def test_spark_matches_numpy(self, spark):
        import numpy as np
        import pyspark.sql.functions as F
        from geo_epic_spark import cells as C, synth

        pts = synth.images_meta_df(spark, 2000).select("i", "cx", "cy")
        got = {r.i: r.h for r in pts.select(
            "i", C.hex_cell_id(F.col("cx"), F.col("cy"), 0.05).alias("h")).collect()}
        m = synth.images_meta_np(2000)
        want = C.np_hex_cell_id(m["cx"], m["cy"], 0.05)
        assert all(got[i] == want[i] for i in range(2000))

    def test_hex_ring_sizes(self, spark):
        import pyspark.sql.functions as F
        from geo_epic_spark import cells as C

        df = spark.createDataFrame([(C.np_hex_cell_id(
            __import__("numpy").array([-98.0]),
            __import__("numpy").array([41.0]), 0.05)[0].item(),)], "cid long")
        sizes = df.select(
            F.size(C.hex_ring(F.col("cid"), 1)).alias("r1"),
            F.size(C.hex_ring(F.col("cid"), 2)).alias("r2"),
        ).collect()[0]
        assert sizes.r1 == 7 and sizes.r2 == 19  # 1 + 3k(k+1)
