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


def test_bilinear_resize_exact_on_linear_gradient():
    """Bilinear interpolation reproduces per-axis linear functions exactly
    (closed-form check, no image library needed)."""
    h, w = 64, 96
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    # f(x, y) = 2x + y  mapped into uint8 range
    grad = (2 * xx + yy).astype(np.float64)
    img = np.repeat(grad[:, :, None], 3, axis=2).astype(np.uint8)
    out = codec.bilinear_resize(img, 48, 32)
    # expected: sample the same linear fn at half-pixel-centre src coords
    sx = (np.arange(48) + 0.5) * (w / 48) - 0.5
    sy = (np.arange(32) + 0.5) * (h / 32) - 0.5
    want = 2 * np.clip(sx, 0, w - 1)[None, :] + np.clip(sy, 0, h - 1)[:, None]
    np.testing.assert_allclose(out[:, :, 0], np.rint(want), atol=1)


def test_resize_images_spark(spark):
    from geo_epic_spark.images.udfs import resize_images

    df = full_images_df(spark, 12)
    out = resize_images(df, target=16)
    pdf = out.select("image_id", "bytes", "w", "h", "fmt", "phash").toPandas()
    assert (pdf["w"] == 16).all() and (pdf["h"] == 16).all()
    assert (pdf["fmt"] == "png").all()
    for blob in pdf["bytes"]:
        arr = codec.decode_image(bytes(blob), "png")
        assert arr.shape == (16, 16, 3)
    # deterministic: same input -> same payload + phash
    pdf2 = resize_images(df, target=16).select("image_id", "phash").toPandas()
    m = pdf.merge(pdf2, on="image_id", suffixes=("", "_2"))
    assert (m["phash"] == m["phash_2"]).all()
