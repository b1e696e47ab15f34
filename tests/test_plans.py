"""Physical-plan shape pins: the 100 TB-critical properties must hold.

- flagship PIP join: broadcast hash join, zero shuffle of the image stream
- nearest-grid join ring-1: broadcast join for the candidate stage
- parquet scans: predicate pushdown + column pruning reach the scan
- whole-stage codegen present on the hot path
"""

from __future__ import annotations

from pyspark.sql import functions as F

from geo_epic_spark import synth
from geo_epic_spark.operators.spatial import pip_join
from geo_epic_spark.plans.checks import (
    codegen_stage_count,
    formatted_plan,
    has_broadcast_hash_join,
    pushed_filters,
    read_schemas,
    shuffle_free,
)


def test_pip_join_is_broadcast_and_shuffle_free(spark):
    imgs = synth.images_meta_df(spark, 1000).select("i", "cx", "cy")
    flds = synth.fields_df(spark, 50).select("poly_id", "xs", "ys")
    out = pip_join(imgs, flds, res=0.05, lon="cx", lat="cy")
    assert has_broadcast_hash_join(out)
    # the image stream must not shuffle: broadcast exchanges only
    assert shuffle_free(out)
    assert codegen_stage_count(out) >= 1


def test_parquet_scan_pushdown_and_pruning(spark, tmp_path):
    p = str(tmp_path / "t")
    synth.images_meta_df(spark, 1000).write.mode("overwrite").parquet(p)
    df = spark.read.parquet(p).filter(F.col("i") > 500).select("i", "cx")
    pf = pushed_filters(df)
    assert pf and any("i" in f and "500" in f for f in pf), pf
    rs = read_schemas(df)
    # only the two projected columns reach the scan
    assert rs and "cx" in rs[0] and "caption" not in rs[0], rs


def test_groupby_uses_partial_aggregation(spark):
    # partial (map-side) aggregation: two HashAggregate nodes around the
    # exchange — the shape that keeps 100 TB group-bys network-light
    from geo_epic_spark.plans.checks import formatted_plan

    df = (
        synth.images_meta_df(spark, 1000)
        .groupBy((F.col("i") % 10).alias("k"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = formatted_plan(df)
    assert plan.count("HashAggregate") >= 2, plan


def test_opc_append_fact_side_shuffle_free(spark):
    """opc_append's offsets come from broadcast aggregates: the schedule
    fact streams must union without any hash-partition Exchange of the fact
    rows (only BroadcastExchange of the tiny per-group offset tables)."""
    from geo_epic_spark.operators.relational import opc_append

    first = spark.createDataFrame(
        [("a", 1, 3, 1, 2)], "site string, Yid int, Mn int, Dy int, CODE int")
    second = spark.createDataFrame(
        [("a", 1, 4, 2, 650)], "site string, Yid int, Mn int, Dy int, CODE int")
    plan = formatted_plan(opc_append(first, second, by=["site"]))
    import re
    # every Exchange must be a broadcast, never hashpartitioning of the facts
    for m in re.finditer(r"Exchange (\w+)", plan):
        assert "hashpartitioning" not in m.group(1), plan


def test_media_pipelines_are_single_stage(spark):
    """Audio features and frame sampling are scan -> mapInPandas/pandas_udf
    with no shuffle: the payload never repartitions."""
    from geo_epic_spark import media

    a = media.synth_audio_df(spark, 4).select(
        "audio_id", media.audio_features("bytes", "sr").alias("f"))
    assert shuffle_free(a), formatted_plan(a)
    v = media.frame_sample(media.synth_video_df(spark, 4), every=2)
    assert shuffle_free(v), formatted_plan(v)


def test_sessionize_single_exchange(spark):
    """The sessionization DAG (lag window -> running-sum session id ->
    per-session rollup) must reuse ONE user_id hash partitioning: Catalyst
    recognizes HashPartitioning(user_id) satisfies the (user_id, session_no)
    clustering of the final aggregate, so 10^12 events shuffle exactly once."""
    import re

    import __spark_entry__ as entry

    df = entry.q_sessionize(spark, "/root/testdata/sf0.001")
    plan = formatted_plan(df)
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchanges == 1, plan


def test_aqe_skew_join_splits_hot_cell(spark):
    """North-rule AQE witness (r4 VERDICT item 4): on the planted hot cell
    (synth.images_meta_df puts 20% of rows in a 0.2x0.15 deg box — ONE
    0.25-deg covering cell, ~60x the median cell), a shuffled cell join
    under AQE skew settings must actually SPLIT the hot partition:
    `SortMergeJoin(skew=true)` with an `AQEShuffleRead ... skewed` input in
    the final adaptive plan. Thresholds are scaled to test bytes the same
    way they would be scaled to 256MB defaults at cluster scale — the
    mechanism, not the constant, is what's pinned. `add_salt`
    (q_salted_pip) is the manual alternative; this proves the automatic
    path the north rule names.

    Gotchas this test encodes (found while building it): AQE refuses
    the split when the join's partitioning is REUSED downstream (a
    groupBy on the join key right after would veto it — the downstream agg
    here is key-free), and the skew factor compares against the MEDIAN map
    partition, so the right side must be big enough not to be broadcast.
    """
    import re

    from geo_epic_spark import synth

    conf = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "128KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {}
    for k in conf:
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        pts = synth.images_meta_df(spark, 2_000_000).select("i", "cx", "cy")
        cell = (
            F.floor(F.col("cx") / 0.25).cast("long") * 10000
            + F.floor(F.col("cy") / 0.25).cast("long")
        ).alias("cell_id")
        left = pts.select("i", cell)
        right = left.select("cell_id").distinct().join(
            spark.range(20).select(F.col("id").alias("k")), how="cross")
        j = left.join(right, "cell_id").agg(F.count(F.lit(1)).alias("n"))
        (row,) = j.collect()
        assert row.n == 40_000_000  # every point x 20 payload rows
        plan = j._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
        assert "SortMergeJoin(skew=true)" in plan, plan
        assert re.search(r"AQEShuffleRead.*skewed", plan), plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_topk_window_trims_map_side(spark):
    """_ranked_topk relies on the optimizer's InferWindowGroupLimit: the
    rank-window-under-limit-filter shape must produce a
    WindowGroupLimit(Partial) BEFORE the per-query exchange, so each map
    partition forwards at most k rows per query instead of shipping the
    whole scored relation to one task per query. If this pin breaks on a
    Spark upgrade, reintroduce the manual two-phase rank (rank within
    (q_key, spark_partition_id()) first) retired in r5."""
    import re

    from geo_epic_spark.operators.similarity import cosine_topk

    vecs = synth.embeddings_synth_df(spark, 5000)
    q = (
        synth.embeddings_synth_df(spark, 5000)
        .filter(F.col("vec_id") % 1000 == 3)
        .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    )
    r = cosine_topk(vecs, q, k=5)
    assert r.count() == 25
    plan = r._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    # Partial trim below the exchange, Final above it.
    assert re.search(r"WindowGroupLimit .*row_number\(\), 5, Partial", plan), plan
    assert re.search(r"WindowGroupLimit .*row_number\(\), 5, Final", plan), plan
    pre, _, post = plan.partition("Exchange hashpartitioning(q_id")
    assert "Partial" in post and "Final" in pre, plan
