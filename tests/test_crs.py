"""CRS transforms: known-point checks + roundtrip properties + Spark UDF."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from geo_epic_spark.functions import crs


def test_web_mercator_known_points():
    x, y = crs.to_web_mercator(np.array([0.0, 180.0]), np.array([0.0, 0.0]))
    np.testing.assert_allclose(x, [0.0, 20037508.342789244], rtol=1e-9)
    np.testing.assert_allclose(y[0], 0.0, atol=1e-6)


def test_albers_conus_known_point():
    # projection center maps to (FE, FN-ish): lon0=-96, lat0=23
    x, y = crs.to_albers_conus(np.array([-96.0]), np.array([23.0]))
    np.testing.assert_allclose(x[0], 0.0, atol=1e-6)
    np.testing.assert_allclose(y[0], 0.0, atol=1e-6)
    # a CONUS point lands in the plausible EPSG:5070 range
    x, y = crs.to_albers_conus(np.array([-100.0]), np.array([40.0]))
    assert -400_000 < x[0] < -200_000
    assert 1_800_000 < y[0] < 2_100_000


@given(st.floats(-120, -70), st.floats(25, 49))
@settings(max_examples=200, deadline=None)
def test_albers_roundtrip(lon, lat):
    x, y = crs.to_albers_conus(np.array([lon]), np.array([lat]))
    lon2, lat2 = crs.from_albers_conus(x, y)
    assert abs(lon2[0] - lon) < 1e-9
    assert abs(lat2[0] - lat) < 1e-9


@given(st.floats(-179, 179), st.floats(-85, 85))
@settings(max_examples=200, deadline=None)
def test_mercator_roundtrip(lon, lat):
    x, y = crs.to_web_mercator(np.array([lon]), np.array([lat]))
    lon2, lat2 = crs.from_web_mercator(x, y)
    assert abs(lon2[0] - lon) < 1e-9
    assert abs(lat2[0] - lat) < 1e-9


def test_transform_spark_udf(spark):
    from geo_epic_spark import synth

    df = synth.images_meta_df(spark, 500).select("i", "cx", "cy")
    out = crs.transform(df, "EPSG:4326", "EPSG:5070", x="cx", y="cy").toPandas()
    ex, ey = crs.to_albers_conus(out["cx"].to_numpy(), out["cy"].to_numpy())
    np.testing.assert_allclose(out["x"].to_numpy(), ex, rtol=1e-12)
    np.testing.assert_allclose(out["y"].to_numpy(), ey, rtol=1e-12)
