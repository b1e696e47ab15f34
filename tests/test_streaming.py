"""Streaming ingest: stream-static PIP join matches the batch flagship;
checkpoint makes re-runs incremental (no reprocessing of consumed files)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from geo_epic_spark import synth
from geo_epic_spark.operators.spatial import pip_join
from geo_epic_spark.streaming.ingest import (
    assign_stream, read_image_stream, start_assignment_sink,
)

RES = 0.05


def _img_batch(spark, lo, hi):
    return synth.images_meta_df(spark, hi).filter(F.col("i") >= lo)


def test_stream_matches_batch_and_resumes(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    lineage = str(tmp_path / "lineage")
    os.makedirs(in_dir, exist_ok=True)

    flds = synth.fields_df(spark, 100).select("poly_id", "xs", "ys")

    # drop 1: images 0..499
    _img_batch(spark, 0, 500).write.mode("append").parquet(in_dir)
    stream = read_image_stream(spark, in_dir)
    assigned = assign_stream(stream, flds, RES)
    q = start_assignment_sink(assigned, out_dir, ckpt, lineage_path=lineage)
    q.awaitTermination(120)

    batch_expect = pip_join(
        synth.images_meta_df(spark, 500), flds, res=RES, lon="cx", lat="cy"
    )
    got1 = spark.read.parquet(out_dir)
    assert got1.count() == batch_expect.count()
    # same (i, poly_id) assignment set as the batch engine
    assert (
        got1.select("i", "poly_id").exceptAll(batch_expect.select("i", "poly_id")).count() == 0
    )

    # drop 2: images 500..799 — restart from checkpoint; only new files run
    _img_batch(spark, 500, 800).write.mode("append").parquet(in_dir)
    stream2 = read_image_stream(spark, in_dir)
    q2 = start_assignment_sink(assign_stream(stream2, flds, RES), out_dir, ckpt,
                               lineage_path=lineage)
    q2.awaitTermination(120)

    full_expect = pip_join(
        synth.images_meta_df(spark, 800), flds, res=RES, lon="cx", lat="cy"
    )
    got2 = spark.read.parquet(out_dir)
    assert got2.count() == full_expect.count()  # no duplicates => no reprocessing

    lin = spark.read.parquet(lineage)
    assert lin.count() >= 2  # one lineage row per non-empty micro-batch
    assert lin.agg(F.sum("rows")).collect()[0][0] == full_expect.count()
