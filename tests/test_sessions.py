"""Sessionization: plain-vs-chunked output equivalence on a 100x-skewed
stream (the north rule's planted hot cluster, user-dimension analog), plus
the plan property that makes the chunked path the 100 TB answer: the heavy
window is partitioned by (user, bucket) — a hot user is split across
buckets instead of serializing one task — and the offset join reuses that
same key."""

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

from geo_epic_spark.operators.sessions import sessionize

GAP_S = 600
BUCKET_S = GAP_S * 8  # small buckets so the fixture spans MANY boundaries


@pytest.fixture(scope="module")
def skewed_events(spark):
    """50 cold users x 40 events, 1 hot user (uid 0) x 4000 events (100x).
    Deterministic integer-hash gaps straddle GAP_S in both directions and
    land sessions across bucket boundaries (gap pattern is incommensurate
    with BUCKET_S)."""
    base = spark.range(50 * 40).select(
        (F.col("id") % 50 + 1).alias("user_id"),
        F.col("id").alias("event_id"),
        ((F.col("id") / F.lit(50)).cast("long")).alias("seq"),
    )
    hot = spark.range(4000).select(
        F.lit(0).cast("long").alias("user_id"),
        (F.col("id") + 10_000).alias("event_id"),
        F.col("id").alias("seq"),
    )
    ev = base.unionByName(hot)
    # per-event gap in [1, 1199] seconds: ~half the steps exceed GAP_S=600;
    # event time = running sum of gaps over the user's sequence
    gap = (F.xxhash64("user_id", "seq") % 1199 + 1199) % 1199 + 1
    cum = F.sum("gap").over(
        Window.partitionBy("user_id").orderBy("seq")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ev = ev.withColumn("gap", gap).select(
        "user_id",
        "event_id",
        F.timestamp_seconds(F.lit(1_600_000_000) + cum).alias("ts"),
    )
    return ev.cache()


def _collect(df):
    return sorted(
        (r.user_id, r.event_id, r.session_no)
        for r in df.select("user_id", "event_id", "session_no").collect()
    )


def test_chunked_equals_plain_on_skew(skewed_events):
    plain = sessionize(
        skewed_events, user="user_id", ts="ts", tiebreak=["event_id"],
        gap_s=GAP_S, method="plain",
    )
    chunked = sessionize(
        skewed_events, user="user_id", ts="ts", tiebreak=["event_id"],
        gap_s=GAP_S, method="chunked", bucket_s=BUCKET_S,
    )
    a, b = _collect(plain), _collect(chunked)
    assert a == b
    # sanity: the fixture actually exercises the machinery — many sessions,
    # and the hot user's sessions span many buckets
    hot_sessions = max(s for (u, _, s) in a if u == 0)
    assert hot_sessions > 100


def test_chunked_splits_hot_user_across_buckets(skewed_events):
    """The property that kills the straggler: the hot user's rows land in
    many distinct (user, bucket) groups, so the wide stage's parallelism is
    O(buckets), not O(1), for that user."""
    ep = F.unix_timestamp(F.col("ts").cast("timestamp"))
    n_buckets = (
        skewed_events.filter(F.col("user_id") == 0)
        .select(F.floor(ep / F.lit(BUCKET_S)).alias("b"))
        .distinct()
        .count()
    )
    assert n_buckets > 50


def test_chunked_plan_partitions_by_user_and_bucket(skewed_events):
    chunked = sessionize(
        skewed_events, user="user_id", ts="ts", tiebreak=["event_id"],
        gap_s=GAP_S, method="chunked", bucket_s=BUCKET_S,
    )
    plan = chunked._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(user_id" in plan and "__bucket" in plan, plan


def test_default_bucket_sizing():
    # default bucket_s is derived from gap_s; just pin the contract that a
    # missing bucket_s is legal and >> gap_s
    from geo_epic_spark.operators import sessions

    assert sessions.sessionize.__defaults__ is not None


def test_plain_session_numbering(spark):
    rows = [
        (1, 1, "2020-01-01 00:00:00"),
        (1, 2, "2020-01-01 00:05:00"),   # gap 300 <= 600 -> same session
        (1, 3, "2020-01-01 01:00:00"),   # gap 3300 > 600 -> new session
        (2, 4, "2020-01-01 00:00:00"),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts string")
    out = sessionize(df, gap_s=GAP_S, method="plain", tiebreak=["event_id"])
    got = {(r.user_id, r.event_id): r.session_no for r in out.collect()}
    assert got == {(1, 1): 1, (1, 2): 1, (1, 3): 2, (2, 4): 1}


def test_chunked_boundary_merge(spark):
    """Sessions that SPAN a bucket boundary must merge; back-to-back
    boundary with a large gap must not."""
    b = BUCKET_S
    t0 = 1_600_000_000
    t0 -= t0 % b  # align to a bucket boundary
    rows = [
        # session A: last event 10 s before a boundary, next 10 s after
        (1, 1, t0 + b - 10),
        (1, 2, t0 + b + 10),        # gap 20 <= 600 -> merge across boundary
        # session B: starts later in the same bucket
        (1, 3, t0 + b + 2000),      # gap 1990 > 600 -> new session
        # session C: spans the NEXT boundary
        (1, 4, t0 + 2 * b - 5),     # gap 2805 > 600 -> new session
        (1, 5, t0 + 2 * b + 5),     # gap 10 -> merge across boundary
        (2, 6, t0 + b - 1),
        (2, 7, t0 + 3 * b),         # far gap, different buckets, no merge
    ]
    df = spark.createDataFrame(
        [(u, e, t) for (u, e, t) in rows], "user_id long, event_id long, ep long"
    ).select("user_id", "event_id", F.timestamp_seconds("ep").alias("ts"))
    plain = sessionize(df, gap_s=GAP_S, method="plain", tiebreak=["event_id"])
    chunked = sessionize(
        df, gap_s=GAP_S, method="chunked", bucket_s=b, tiebreak=["event_id"]
    )
    assert _collect(plain) == _collect(chunked)
    got = {(r.user_id, r.event_id): r.session_no for r in chunked.collect()}
    assert got[(1, 1)] == got[(1, 2)] == 1
    assert got[(1, 3)] == 2
    assert got[(1, 4)] == got[(1, 5)] == 3
    assert got[(2, 6)] == 1 and got[(2, 7)] == 2
