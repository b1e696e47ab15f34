"""Aspect-ratio bucketing: bucket-set generation invariants, nearest-ratio
assignment exactness (vs a brute-force python argmin with exact rational
comparison), and map-only plan shape."""

import pytest
from fractions import Fraction

import pyspark.sql.functions as F

from geo_epic_spark.images.aspect import assign_aspect_buckets, generate_buckets


def test_generate_buckets_invariants():
    bks = generate_buckets(1024 * 1024, 64, 512, 2048)
    assert all(w * h <= 1024 * 1024 for w, h in bks)
    assert all(w % 64 == 0 and h % 64 == 0 for w, h in bks)
    ratios = [Fraction(w, h) for w, h in bks]
    assert ratios == sorted(ratios)          # deterministic ratio order
    assert len(set(ratios)) == len(ratios)   # one bucket per ratio
    assert (1024, 1024) in bks


def test_assignment_matches_exact_rational_argmin(spark):
    bks = generate_buckets(1024 * 1024, 256, 512, 2048)
    imgs = [(i, 160 + (i * 37) % 1900, 160 + (i * 53) % 1400) for i in range(400)]
    df = spark.createDataFrame(imgs, "img_id long, w int, h int")
    got = {r["img_id"]: (r["bucket_w"], r["bucket_h"])
           for r in assign_aspect_buckets(df, bks).collect()}

    def brute(w, h):
        target = Fraction(w, h)
        return min(bks, key=lambda b: (abs(Fraction(b[0], b[1]) - target),
                                       bks.index(b)))

    for i, w, h in imgs:
        assert got[i] == brute(w, h), (i, w, h)


def test_assignment_is_map_only(spark):
    df = spark.createDataFrame([(1, 640, 480)], "img_id long, w int, h int")
    plan = assign_aspect_buckets(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_empty_bucket_list_rejected(spark):
    df = spark.createDataFrame([(1, 640, 480)], "img_id long, w int, h int")
    with pytest.raises(ValueError):
        assign_aspect_buckets(df, [])
