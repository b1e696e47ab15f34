"""Sampling / sharding / packing: determinism across partitionings, rate
accuracy, window-vs-ranged shard equivalence (the distributed prefix-scan),
and next-fit packing invariants."""

import pyspark.sql.functions as F
import pytest

from geo_epic_spark.operators.sampling import (
    deterministic_sample,
    hash_unit,
    pack_greedy,
    shard_by_token_budget,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.range(5000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).cast("string").alias("source"),
        ((F.xxhash64("id") % 900 + 900) % 900 + 50).alias("n_tokens"),
    )


def test_sample_partition_invariance(spark, docs):
    """The keep set is a pure function of the key: identical ids whether the
    input arrives in 1 partition or 16 (DataFrame.sample fails this)."""
    a = {r[0] for r in deterministic_sample(docs.coalesce(1), "doc_id", 0.3).select("doc_id").collect()}
    b = {r[0] for r in deterministic_sample(docs.repartition(16), "doc_id", 0.3).select("doc_id").collect()}
    assert a == b and 0 < len(a) < 5000


def test_sample_rate_and_salt(spark, docs):
    n = deterministic_sample(docs, "doc_id", 0.3).count()
    assert abs(n / 5000 - 0.3) < 0.03
    a = {r[0] for r in deterministic_sample(docs, "doc_id", 0.3, salt=1).select("doc_id").collect()}
    b = {r[0] for r in deterministic_sample(docs, "doc_id", 0.3, salt=2).select("doc_id").collect()}
    assert a != b  # different salt, different subset
    assert deterministic_sample(docs, "doc_id", 0.0).count() == 0
    assert deterministic_sample(docs, "doc_id", 1.0).count() == 5000


def test_hash_unit_range(spark, docs):
    row = docs.select(
        F.min(hash_unit(F.col("doc_id"))).alias("lo"),
        F.max(hash_unit(F.col("doc_id"))).alias("hi"),
    ).first()
    assert 0.0 <= row["lo"] and row["hi"] < 1.0


def test_stratified_rates(spark, docs):
    out = stratified_sample(docs, "doc_id", "source", {"0": 1.0, "1": 0.25})
    got = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert got["0"] == 1250          # rate 1.0 keeps everything
    assert abs(got.get("1", 0) / 1250 - 0.25) < 0.07
    assert "2" not in got and "3" not in got  # default_rate=0 drops unlisted


def test_shard_window_matches_ranged(spark, docs):
    """The two-phase ranged prefix scan is bit-identical to the single
    window — on an input scattered across 16 unordered partitions, AND with
    Arrow batches forced far below the partition size so every partition
    spans many batches (the running total must carry across the batch
    iterator; a per-batch sort+cumsum silently corrupts shard ids — caught
    live when the session batch default dropped 10000→2048)."""
    scattered = docs.repartition(16)
    w = shard_by_token_budget(scattered, "doc_id", "n_tokens", budget=10_000)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "128")
    try:
        r = shard_by_token_budget(scattered, "doc_id", "n_tokens", budget=10_000, method="ranged")
        assert w.select("doc_id", "shard_id").exceptAll(r.select("doc_id", "shard_id")).count() == 0
        assert r.count() == w.count() == 5000
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_shard_budget_semantics(spark):
    rows = [(i, t) for i, t in enumerate([400, 400, 400, 400, 900, 100])]
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    got = {
        r["doc_id"]: r["shard_id"]
        for r in shard_by_token_budget(df, "doc_id", "n_tokens", budget=1000).collect()
    }
    # exclusive prefix sums: 0,400,800,1200,1600,2500 -> floor(/1000)
    assert got == {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 2}


def test_shard_grouped(spark):
    df = spark.createDataFrame(
        [("a", 1, 600), ("a", 2, 600), ("b", 1, 600), ("b", 2, 600)],
        ["g", "doc_id", "n_tokens"],
    )
    got = {
        (r["g"], r["doc_id"]): r["shard_id"]
        for r in shard_by_token_budget(df, "doc_id", "n_tokens", budget=500, group="g").collect()
    }
    # exclusive prefix sums restart per group: 0,600 -> floor(/500) = 0,1
    assert got == {("a", 1): 0, ("a", 2): 1, ("b", 1): 0, ("b", 2): 1}


def test_pack_greedy_invariants(spark, docs):
    out = pack_greedy(docs, "source", "doc_id", "n_tokens", budget=2000).toPandas()
    assert len(out) == 5000
    for _, grp in out.groupby("source"):
        grp = grp.sort_values("doc_id")
        # bin ids are contiguous 0..max and non-decreasing in doc order
        assert grp["bin_id"].is_monotonic_increasing
        assert set(grp["bin_id"]) == set(range(grp["bin_id"].max() + 1))
        sums = grp.groupby("bin_id")["n_tokens"].sum()
        singleton = grp.groupby("bin_id")["n_tokens"].count() == 1
        # every bin fits the budget unless it is a single oversized row
        assert ((sums <= 2000) | singleton).all()
        # greedy boundary: bin i's sum + bin i+1's FIRST row must exceed budget
        firsts = grp.groupby("bin_id")["n_tokens"].first()
        for b in range(int(grp["bin_id"].max())):
            assert sums[b] + firsts[b + 1] > 2000


def test_pack_oversized_row_own_bin(spark):
    df = spark.createDataFrame(
        [("a", 1, 100), ("a", 2, 5000), ("a", 3, 100)], ["g", "doc_id", "n_tokens"]
    )
    got = {r["doc_id"]: r["bin_id"] for r in pack_greedy(df, "g", "doc_id", "n_tokens", 1000).collect()}
    assert got == {1: 0, 2: 1, 3: 2}


def test_rate_validation(spark, docs):
    with pytest.raises(ValueError):
        deterministic_sample(docs, "doc_id", 1.5)
    with pytest.raises(ValueError):
        stratified_sample(docs, "doc_id", "source", {"0": -0.1})
    with pytest.raises(ValueError):
        shard_by_token_budget(docs, "doc_id", "n_tokens", 100, group="source", method="ranged")


def test_sampling_plan_shapes(spark, docs):
    """Scale pins: stratified sampling is a map-only filter (zero Exchange);
    the ranged shard path's only Exchange is the range partitioning itself
    (the offsets merge moves one tiny row per partition, driver-side)."""
    from geo_epic_spark.plans.checks import formatted_plan, shuffle_free

    samp = stratified_sample(docs, "doc_id", "source", {"0": 0.5}, default_rate=0.1)
    assert shuffle_free(samp), formatted_plan(samp)

    ranged = shard_by_token_budget(docs, "doc_id", "n_tokens", 10_000, method="ranged")
    plan = formatted_plan(ranged)
    import re

    kinds = set(re.findall(r"Exchange (\w+)", plan))
    assert kinds <= {"rangepartitioning"}, plan


# ---------------------------------------------------------------------------
# sample_to_mix: exact blend, equivalence to the naive global rank, edges
# ---------------------------------------------------------------------------

from geo_epic_spark.operators.sampling import sample_to_mix


def test_mix_exact_counts(spark, docs):
    """Realized counts are exactly weight * n_units per group; unlisted
    groups are dropped."""
    out = sample_to_mix(docs, "doc_id", "source", {"0": 5, "1": 3, "2": 2})
    got = {r["source"]: r["n"] for r in
           out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    # 1250 per source -> n_units = min(1250//5, 1250//3, 1250//2) = 250
    assert got == {"0": 1250, "1": 750, "2": 500}


def test_mix_matches_naive_rank(spark, docs):
    """The histogram-threshold selection (prefix buckets + ranked boundary)
    returns EXACTLY the take smallest rows under (hash_unit, key) — the same
    set a single per-group window rank would pick."""
    from pyspark.sql import Window

    weights = {"0": 3, "1": 1}
    out = sample_to_mix(docs, "doc_id", "source", weights, salt=11, buckets=32)
    naive = (
        docs.filter(F.col("source").isin("0", "1"))
        .withColumn(
            "__rk",
            F.row_number().over(
                Window.partitionBy("source").orderBy(
                    hash_unit(F.col("doc_id"), 11).asc(), F.col("doc_id").asc()
                )
            ),
        )
    )
    n_units = 1250 // 3
    take = F.when(F.col("source") == "0", 3 * n_units).otherwise(1 * n_units)
    want = naive.filter(F.col("__rk") <= take).select("doc_id")
    a = sorted(r[0] for r in out.select("doc_id").collect())
    b = sorted(r[0] for r in want.collect())
    assert a == b


def test_mix_partition_invariance(spark, docs):
    a = sorted(r[0] for r in sample_to_mix(
        docs.coalesce(1), "doc_id", "source", {"0": 2, "3": 1}).select("doc_id").collect())
    b = sorted(r[0] for r in sample_to_mix(
        docs.repartition(16), "doc_id", "source", {"0": 2, "3": 1}).select("doc_id").collect())
    assert a == b and len(a) > 0


def test_mix_absent_group_empty(spark, docs):
    out = sample_to_mix(docs, "doc_id", "source", {"0": 1, "missing": 1})
    assert out.count() == 0


def test_mix_weight_validation(spark, docs):
    with pytest.raises(ValueError):
        sample_to_mix(docs, "doc_id", "source", {"0": 0})


def test_shuffle_ranged_matches_window_and_is_partition_invariant(spark, docs):
    """The distributed-rank shuffle is bit-identical to the global window
    rank, on a 16-partition scatter with Arrow batches far smaller than a
    partition (rank must carry across the batch iterator), and the
    permutation is identical from a different input partitioning."""
    from geo_epic_spark.operators.sampling import shuffle_rows

    scattered = docs.repartition(16)
    w = shuffle_rows(scattered, "doc_id", salt=3, method="window")
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "128")
    try:
        r = shuffle_rows(scattered, "doc_id", salt=3)
        assert (
            w.select("doc_id", "shuffle_pos")
            .exceptAll(r.select("doc_id", "shuffle_pos"))
            .count()
            == 0
        )
        assert r.count() == 5000
        r2 = shuffle_rows(docs.coalesce(1), "doc_id", salt=3)
        assert (
            r.select("doc_id", "shuffle_pos")
            .exceptAll(r2.select("doc_id", "shuffle_pos"))
            .count()
            == 0
        )
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_shuffle_is_a_permutation_and_salt_changes_order(spark, docs):
    from geo_epic_spark.operators.sampling import shuffle_rows

    r = shuffle_rows(docs, "doc_id", salt=0)
    pos = [x["shuffle_pos"] for x in r.select("shuffle_pos").collect()]
    assert sorted(pos) == list(range(5000))
    # epoch reshuffle: a different salt is a different permutation
    a = {x["doc_id"]: x["shuffle_pos"] for x in shuffle_rows(docs.limit(200), "doc_id", salt=0).collect()}
    b = {x["doc_id"]: x["shuffle_pos"] for x in shuffle_rows(docs.limit(200), "doc_id", salt=1).collect()}
    assert a != b


def test_split_assign_deterministic_bands_and_stability(spark, docs):
    """Every row labeled; bands hit their expected sizes within tolerance;
    the assignment is identical across partitionings AND unchanged for old
    rows when the corpus grows (the property randomSplit lacks)."""
    from geo_epic_spark.operators.sampling import split_assign

    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {r["doc_id"]: r["split"] for r in split_assign(docs, "doc_id", fr).collect()}
    assert len(a) == 5000 and set(a.values()) == {"train", "val", "test"}
    counts = {s: sum(1 for v in a.values() if v == s) for s in fr}
    assert abs(counts["train"] - 4000) < 300
    b = {r["doc_id"]: r["split"]
         for r in split_assign(docs.repartition(16), "doc_id", fr).collect()}
    assert a == b
    # growing corpus: first 1000 rows keep their labels
    small = {r["doc_id"]: r["split"]
             for r in split_assign(docs.filter(F.col("doc_id") < 1000), "doc_id", fr).collect()}
    assert all(a[k] == v for k, v in small.items())
    import pytest
    with pytest.raises(ValueError):
        split_assign(docs, "doc_id", {"train": 0.8, "val": 0.1})
