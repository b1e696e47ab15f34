"""Checkpoint/lineage resume semantics: skip-existing, selective re-run."""

import pyspark.sql.functions as F

from geo_epic_spark.operators.resume import (
    invalidate_partitions,
    pending_partitions,
    read_manifest,
    run_with_resume,
)


def _process(df):
    return df.withColumn("double_v", F.col("v") * 2)


def test_run_resume_invalidate(spark, tmp_path):
    out = str(tmp_path / "out")
    man = str(tmp_path / "manifest")
    work = spark.range(100).select(
        (F.col("id") % 10).cast("string").alias("part"),
        F.col("id").alias("v"),
    )
    r1 = run_with_resume(spark, work, "part", _process, out, man)
    assert r1["partitions"] == 10
    assert r1["rows_out"] == 100
    m1 = read_manifest(spark, man).toPandas()
    assert len(m1) == 10
    assert (m1.rows_in == 10).all() and (m1.rows_out == 10).all()

    # second run: nothing pending
    r2 = run_with_resume(spark, work, "part", _process, out, man)
    assert r2["partitions"] == 0
    assert spark.read.parquet(out).count() == 100  # no duplicates appended

    # invalidate 3 partitions -> exactly those recompute
    invalidate_partitions(spark, man, ["1", "3", "5"])
    pend = pending_partitions(spark, work, "part", man).toPandas()
    assert sorted(pend.part) == ["1", "3", "5"]
    r3 = run_with_resume(spark, work, "part", _process, out, man)
    assert r3["partitions"] == 3
    total = spark.read.parquet(out).count()
    assert total == 100  # dynamic partition overwrite: no duplicates on re-run
    m3 = read_manifest(spark, man).toPandas()
    assert len(m3) == 10
    # checksums of recomputed partitions match the originals (same input)
    orig = m1.set_index("partition_id").checksum
    new = m3.set_index("partition_id").checksum
    for p in ["1", "3", "5"]:
        assert new[p] == orig[p]


def test_observed_metrics_match_manifest(spark, tmp_path):
    """observe()-based in-flight metrics (DataLogger analog) must agree with
    the manifest aggregates, and land in the metrics table when requested."""
    work = spark.range(100).select(
        (F.col("id") % 4).cast("string").alias("part"), F.col("id").alias("v")
    )
    out_p, man_p, met_p = (str(tmp_path / d) for d in ("out", "man", "met"))
    res = run_with_resume(
        spark, work, "part", lambda df: df.filter(F.col("v") % 2 == 0),
        out_p, man_p, metrics_path=met_p,
    )
    assert res["observed"]["input_rows"] == 100
    assert res["observed"]["output_rows"] == 50
    assert res["observed"]["output_rows"] == res["rows_out"]
    man = spark.read.parquet(man_p).toPandas()
    assert man["rows_in"].sum() == res["observed"]["input_rows"]
    assert man["rows_out"].sum() == res["observed"]["output_rows"]
    met = spark.read.parquet(met_p).toPandas()
    assert set(met["stage"]) == {"input", "output"}
    assert met.loc[(met.stage == "output") & (met.metric == "rows"), "value"].iloc[0] == 50
