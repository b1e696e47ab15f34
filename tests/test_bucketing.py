"""Bucketed co-located join: correct results and a shuffle-free plan."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from geo_epic_spark.plans.checks import formatted_plan
from geo_epic_spark.sources.bucketing import colocated_join, write_bucketed


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    import shutil

    # managed-table locations survive a crashed session even after DROP (the
    # in-memory catalog forgets them); clear both metadata and location
    for t in ("t_sites", "t_weather"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        shutil.rmtree(f"{wh.removeprefix('file:')}/{t}", ignore_errors=True)
    sites = spark.range(1000).select(
        F.col("id").alias("site_id"), (F.col("id") % 7).alias("region")
    )
    weather = spark.range(5000).select(
        (F.col("id") % 1000).alias("site_id"), F.rand(7).alias("tmax")
    )
    write_bucketed(sites, "t_sites", "site_id", buckets=8)
    write_bucketed(weather, "t_weather", "site_id", buckets=8)

    # tiny test tables would be broadcast-joined (which hides bucketing);
    # disable broadcast to expose the co-located sort-merge path that a
    # fact⋈fact join takes at scale
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(spark, "t_sites", "t_weather", on="site_id")
        assert joined.count() == 5000
        plan = formatted_plan(joined)
        # bucketed sort-merge join: no Exchange anywhere in the plan
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
