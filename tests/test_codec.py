"""Image payload invariants (BASELINE.json input_hint): PNG lossless,
lossy PSNR >= 40 dB, caption byte-equality through the pipeline, phash
stability."""

import numpy as np
import pyspark.sql.functions as F

from geo_epic_spark.images import codec
from geo_epic_spark.images.udfs import decode_stats, full_images_df, psnr_vs_regen


def test_png_lossless_roundtrip():
    for i, (w, h) in enumerate([(32, 32), (64, 32), (128, 64)]):
        arr = codec.synth_pixels(i, w, h)
        assert np.array_equal(codec.decode_png(codec.encode_png(arr)), arr)


def test_fjpg_psnr_above_40():
    for i in range(5):
        arr = codec.synth_pixels(i, 64, 64)
        dec = codec.decode_fjpg(codec.encode_fjpg(arr))
        assert codec.psnr(arr, dec) >= 40.0


def test_phash_properties():
    a = codec.synth_pixels(1, 64, 64)
    b = codec.synth_pixels(2, 64, 64)
    ha, hb = codec.phash64(a), codec.phash64(b)
    assert ha == codec.phash64(a)  # deterministic
    assert ha != hb  # distinct content -> distinct hash (w.h.p.)
    # lossy encode barely moves the hash
    dec = codec.decode_fjpg(codec.encode_fjpg(a))
    ham = bin(ha ^ codec.phash64(dec)).count("1")
    assert ham <= 6


def test_spark_image_pipeline_invariants(spark):
    df = full_images_df(spark, 120).cache()
    checked = df.select(
        "i", "w", "h", "fmt", "caption", "phash",
        decode_stats("bytes", "fmt").alias("s"),
        psnr_vs_regen("bytes", "fmt", "i").alias("p"),
    )
    bad = checked.filter(
        (F.col("s.dec_w") != F.col("w"))
        | (F.col("s.dec_h") != F.col("h"))
        | (F.col("s.phash_rt") != F.col("phash"))
        | (F.col("p") < 40.0)
    ).count()
    assert bad == 0
    # caption survives a shuffle + join round trip byte-for-byte
    joined = (
        df.select("image_id", "caption")
        .join(df.select("image_id", F.col("caption").alias("c2")), "image_id")
        .filter(F.col("caption") != F.col("c2"))
        .count()
    )
    assert joined == 0


def test_unsupported_fmt_raises():
    import pytest

    with pytest.raises(NotImplementedError):
        codec.decode_image(b"xxxx", "jpeg-real")


def test_phash_dedup_planted_duplicates(spark):
    """seed_mod=90 plants byte-identical payload copies; phash groups must
    collapse exactly to the 90 distinct seeds with 3 copies each."""
    from pyspark.sql import functions as F

    from geo_epic_spark.images.udfs import full_images_df

    df = full_images_df(spark, 270, seed_mod=90)
    groups = df.groupBy("phash").agg(F.count(F.lit(1)).alias("n")).toPandas()
    assert len(groups) == 90
    assert (groups["n"] == 3).all()
