"""Audio/video payload operators (multimodal axis beyond images)."""

import numpy as np
import pyspark.sql.functions as F

from geo_epic_spark import media


def test_audio_features_match_numpy(spark):
    df = media.synth_audio_df(spark, 8)
    out = (
        df.select("i", media.audio_features("bytes", "sr").alias("f"))
        .select("i", "f.rms", "f.peak", "f.zero_crossings", "f.duration_s")
        .toPandas()
        .sort_values("i")
    )
    for _, r in out.iterrows():
        s = media.audio_samples_np(int(r["i"])).astype(np.int64)
        assert abs(r["rms"] - np.sqrt(np.sum(s * s) / len(s))) < 1e-9
        assert r["peak"] == np.max(np.abs(s))
        assert r["zero_crossings"] == int(np.sum(s[:-1] * s[1:] < 0))
        assert r["duration_s"] == len(s) / media.AUDIO_SR


def test_resample_audio_exact_on_ramp(spark):
    """Linear interpolation reproduces a linear ramp exactly at any rate."""
    import pandas as pd

    n, sr = 1000, 8000
    ramp = np.arange(n, dtype="<i2")  # s[k] = k, linear
    pdf = pd.DataFrame({
        "audio_id": ["r0"], "bytes": [ramp.tobytes()],
        "sr": np.array([sr], dtype=np.int32),
        "n_samples": np.array([n], dtype=np.int32),
    })
    df = spark.createDataFrame(pdf)
    out = media.resample_audio(df, target_sr=4000).toPandas().iloc[0]
    got = np.frombuffer(out["bytes"], dtype="<i2")
    assert out["sr"] == 4000 and out["n_samples"] == 500
    # position t maps to source 2t; ramp value = 2t (clamped at the end)
    want = np.minimum(2 * np.arange(500), n - 1)
    np.testing.assert_array_equal(got, want)
    # round trip back up: still the ramp on the interior
    up = media.resample_audio(media.resample_audio(df, 4000), 8000)
    got2 = np.frombuffer(up.toPandas().iloc[0]["bytes"], dtype="<i2")
    np.testing.assert_allclose(got2[:-2], ramp[:-2], atol=1)


def test_frame_sample_stride_and_values(spark):
    df = media.synth_video_df(spark, 5)
    out = media.frame_sample(df, every=3).toPandas()
    # frames 0, 3, 6 of 8
    assert sorted(out["frame_idx"].unique().tolist()) == [0, 3, 6]
    assert len(out) == 5 * 3
    r = out[(out.video_id == "vid000000002") & (out.frame_idx == 3)].iloc[0]
    frame = media.video_frame_np(2, 3).astype(np.int64)
    assert abs(r["mean_lum"] - frame.sum() / frame.size) < 1e-9
    # frame hashes: identical frames hash equal, distinct frames differ
    assert out["frame_hash"].nunique() == len(out)


def test_video_container_layout(spark):
    row = media.synth_video_df(spark, 1).collect()[0]
    arr = np.frombuffer(row["bytes"], dtype=np.uint8).reshape(
        media.VIDEO_FRAMES, media.VIDEO_H, media.VIDEO_W, 3
    )
    for f in range(media.VIDEO_FRAMES):
        np.testing.assert_array_equal(arr[f], media.video_frame_np(0, f))


def test_image_quality_flags_flat_frames(spark):
    """Planted constant-pixel frames (i % 7 == 0) are flagged low_info;
    every natural frame passes; stats carry the expected ordering."""
    from geo_epic_spark.images.udfs import full_images_df, image_quality_report

    df = full_images_df(spark, 42, flat_mod=7)
    out = {r["i"]: r for r in image_quality_report(df).collect()}
    assert len(out) == 42
    for i, r in out.items():
        if i % 7 == 0:
            assert r["low_info"] == 1
            assert r["contrast"] == 0.0 and r["entropy_bits"] == 0.0
            assert r["sharpness"] == 0.0
        else:
            assert r["low_info"] == 0
            assert r["contrast"] > 10.0 and r["entropy_bits"] > 4.0
            assert r["sharpness"] > 1.0
    # bytes column is dropped (report is safe to collect/inspect)
    assert "bytes" not in next(iter(out.values())).asDict()


class TestAugment:
    def test_pixel_semantics(self, spark):
        import numpy as np

        from geo_epic_spark.images import codec, full_images_df
        from geo_epic_spark.images.udfs import augment_images

        imgs = full_images_df(spark, 80)
        out = {r.image_id: r for r in augment_images(imgs, salt=0).collect()}
        src = {r.image_id: r for r in imgs.collect()}
        assert len(out) == 80
        ops = set()
        for iid, r in out.items():
            s = src[iid]
            orig = codec.decode_image(bytes(s.bytes), s.fmt)
            aug = codec.decode_image(bytes(r.bytes), s.fmt)
            ops.add(r.aug)
            if r.aug == "hflip":
                assert np.array_equal(aug, orig[:, ::-1])
            elif r.aug == "vflip":
                assert np.array_equal(aug, orig[::-1, :])
            elif r.aug == "rot90":
                assert (r.out_w, r.out_h) == (s.h, s.w)
                assert np.array_equal(aug, np.rot90(orig))
            else:
                assert r.out_w == max(int(s.w * 0.75), 1)
                assert r.out_h == max(int(s.h * 0.75), 1)
                y0 = (s.h - r.out_h) // 2
                x0 = (s.w - r.out_w) // 2
                assert np.array_equal(aug, orig[y0:y0 + r.out_h, x0:x0 + r.out_w])
        assert ops == {"hflip", "vflip", "rot90", "crop"}  # all ops exercised

    def test_new_salt_changes_assignment(self, spark):
        from geo_epic_spark.images import full_images_df
        from geo_epic_spark.images.udfs import augment_images

        imgs = full_images_df(spark, 60)
        a = {r.image_id: r.aug for r in augment_images(imgs, salt=0).collect()}
        b = {r.image_id: r.aug for r in augment_images(imgs, salt=1).collect()}
        assert a != b                      # a new epoch re-rolls ops
        assert set(a) == set(b)            # but covers the same images
