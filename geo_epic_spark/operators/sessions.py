"""Gap-based sessionization.

The reference has no sessionizer (its closest analog is season pairing,
`geoEpic/io/opc.py:252-301` — ordered per-entity event grouping); this is the
engine's W-family extension for event streams, and the canonical shape is one
per-user window: ``lag`` to find gaps, running ``sum`` to number sessions.

Why two methods: a window ``partitionBy(user_id)`` requires every row of a
user in ONE task — AQE can split skewed *join* partitions but never window
partitions, so a 100x hot user (the north rule's planted-hot-cluster analog)
is a hard straggler for the plain path at scale. ``method='chunked'``
redistributes the heavy lag/running-sum work over ``(user, time_bucket)``
and reduces the per-user sequential part to one tiny window over bucket
summaries (one row per (user, bucket)):

1. bucket = floor(epoch / bucket_s); local sessionization inside each
   (user, bucket) — the wide shuffle key, hot users split across buckets.
2. per-bucket summary (first/last epoch, #local sessions) — tiny.
3. per-user window over summaries: a bucket's first local session merges
   with the previous bucket's last session iff the boundary gap <= gap_s;
   global offset = sum of earlier buckets' session counts minus merges.
4. join the offset back on (user, bucket) — same key as step 1's window
   partitioning, so Catalyst reuses the exchange (pinned in test_sessions).

Output session numbers are bit-identical to the plain path (proved by
equivalence test on a 100x-skewed fixture, tests/test_sessions.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["sessionize"]


def sessionize(
    df: DataFrame,
    user: str = "user_id",
    ts: str = "ts",
    tiebreak: list[str] | None = None,
    gap_s: int = 1800,
    method: str = "plain",
    bucket_s: int | None = None,
) -> DataFrame:
    """Assign a 1-based ``session_no`` per ``user``: a new session starts
    when the gap to the previous event exceeds ``gap_s`` seconds.

    method='plain': one window per user (right default when no user is
    pathologically hot). method='chunked': two-phase over (user, bucket)
    as described in the module docstring; identical output."""
    tiebreak = tiebreak or []
    tscol = F.col(ts).cast("timestamp")
    ep = F.unix_timestamp(tscol)

    if method == "plain":
        w = Window.partitionBy(user).orderBy(ts, *tiebreak)
        gap = ep - F.unix_timestamp(F.lag(tscol).over(w))
        return (
            df.withColumn(
                "__new", F.when(gap.isNull() | (gap > gap_s), 1).otherwise(0)
            )
            .withColumn(
                "session_no",
                F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
            )
            .drop("__new")
        )
    if method != "chunked":
        raise ValueError(f"method {method!r} not supported")

    # -- phase 1: local sessionization inside (user, bucket) ----------------
    if bucket_s is None:
        # buckets must be >> gap_s so most sessions close inside one bucket
        # (merges are correct regardless; this only sizes the summary table)
        bucket_s = gap_s * 64
    b = df.withColumn("__ep", ep).withColumn(
        "__bucket", F.floor(F.col("__ep") / F.lit(int(bucket_s)))
    )
    wl = Window.partitionBy(user, "__bucket").orderBy(ts, *tiebreak)
    lgap = F.col("__ep") - F.lag("__ep").over(wl)
    loc = (
        b.withColumn(
            "__new", F.when(lgap.isNull() | (lgap > gap_s), 1).otherwise(0)
        ).withColumn(
            "__loc",
            F.sum("__new").over(wl.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )

    # -- phase 2: per-(user,bucket) summary + per-user offsets (tiny) -------
    summ = loc.groupBy(user, "__bucket").agg(
        F.min("__ep").alias("__first"),
        F.max("__ep").alias("__last"),
        F.max("__loc").alias("__n_loc"),
    )
    wu = Window.partitionBy(user).orderBy("__bucket")
    merge = F.when(
        F.col("__first") - F.lag("__last").over(wu) <= gap_s, 1
    ).otherwise(0)
    offsets = summ.withColumn("__merge", merge).select(
        user,
        "__bucket",
        (
            F.coalesce(
                F.sum("__n_loc").over(
                    wu.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            )
            - F.sum("__merge").over(wu.rowsBetween(Window.unboundedPreceding, 0))
        ).alias("__offset"),
    )

    # -- join back on the SAME key as phase 1's window partitioning ---------
    out = loc.join(offsets, [user, "__bucket"]).withColumn(
        "session_no", F.col("__loc") + F.col("__offset")
    )
    return out.drop("__ep", "__bucket", "__new", "__loc", "__offset")
