"""Watermarked windowed aggregation + applyInPandasWithState dedup,
end-to-end over file-source drops with availableNow triggers."""

from __future__ import annotations

import os

import datetime as dt

import pyspark.sql.functions as F

from geo_epic_spark.streaming.stateful import (
    stateful_dedup_stream,
    windowed_event_counts,
)

EV_SCHEMA = "cell_id long, event_ts timestamp, value double"
DOC_SCHEMA = "doc_id long, text string, first_seen_ts timestamp"


def _drop(spark, path, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(path)


def _run_available_now(q_builder):
    q = q_builder()
    q.awaitTermination()


def test_windowed_counts_with_watermark(spark, tmp_path):
    in_dir = str(tmp_path / "ev")
    os.makedirs(in_dir, exist_ok=True)
    ts = dt.datetime.fromisoformat
    # two 10-min windows for cell 1, one for cell 2
    _drop(spark, in_dir, [
        (1, ts("2024-01-01 00:01:00"), 1.0),
        (1, ts("2024-01-01 00:05:00"), 2.0),
        (1, ts("2024-01-01 00:12:00"), 4.0),
        (2, ts("2024-01-01 00:03:00"), 8.0),
    ], EV_SCHEMA)

    stream = spark.readStream.schema(EV_SCHEMA).parquet(in_dir)
    agg = windowed_event_counts(stream)
    q = (
        agg.writeStream.format("memory").queryName("wincounts")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {
        (r["cell_id"], str(r["win_start"])): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM wincounts").collect()
    }
    assert got[(1, "2024-01-01 00:00:00")] == (2, 3.0)
    assert got[(1, "2024-01-01 00:10:00")] == (1, 4.0)
    assert got[(2, "2024-01-01 00:00:00")] == (1, 8.0)


def test_stateful_dedup_suppresses_across_batches(spark, tmp_path):
    in_dir = str(tmp_path / "docs")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir, exist_ok=True)
    ts = dt.datetime.fromisoformat

    out_dir = str(tmp_path / "out")

    def run_once():
        # memory sink can't recover from a checkpoint; foreachBatch + append
        # parquet is the production-shaped sink for update-mode state output
        stream = spark.readStream.schema(DOC_SCHEMA).parquet(in_dir)
        q = (
            stateful_dedup_stream(stream)
            .writeStream.foreachBatch(
                lambda df, _id: df.write.mode("append").parquet(out_dir)
            )
            .outputMode("update").option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()

    # batch 1: duplicate content within the batch -> lowest doc_id wins
    _drop(spark, in_dir, [
        (10, "alpha beta", ts("2024-01-01 00:00:00")),
        (11, "alpha beta", ts("2024-01-01 00:00:10")),
        (12, "gamma", ts("2024-01-01 00:00:20")),
    ], DOC_SCHEMA)
    run_once()
    got1 = {r["doc_id"] for r in spark.read.parquet(out_dir).collect()}
    assert got1 == {10, 12}

    # batch 2 (same checkpoint -> state persists): a re-arrival of batch-1
    # content must be suppressed, new content passes
    _drop(spark, in_dir, [
        (13, "alpha beta", ts("2024-01-01 00:01:00")),   # dup of batch 1
        (14, "delta", ts("2024-01-01 00:01:10")),
    ], DOC_SCHEMA)
    run_once()
    got2 = {r["doc_id"] for r in spark.read.parquet(out_dir).collect()}
    assert 14 in got2 and 13 not in got2


def test_watermark_drops_late_events(spark, tmp_path):
    """Late-data semantics: after the watermark advances past a window, a
    late arrival for that window is dropped (state already evicted) — the
    second micro-batch must not resurrect the finalized count."""
    in_dir = str(tmp_path / "ev2")
    ckpt = str(tmp_path / "ck2")
    out_dir = str(tmp_path / "out2")
    os.makedirs(in_dir, exist_ok=True)
    ts = dt.datetime.fromisoformat

    def run_once():
        stream = spark.readStream.schema(EV_SCHEMA).parquet(in_dir)
        q = (
            windowed_event_counts(stream, window_len="10 minutes",
                                  watermark="20 minutes")
            .writeStream.foreachBatch(
                lambda df, _id: df.write.mode("append").parquet(out_dir)
            )
            .outputMode("append").option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()

    # batch 1: one event in the 00:00 window + a sentinel far ahead that
    # pushes the watermark beyond 00:10 (02:00 - 20min = 01:40)
    _drop(spark, in_dir, [
        (1, ts("2024-01-01 00:04:00"), 1.0),
        (1, ts("2024-01-01 02:00:00"), 1.0),
    ], EV_SCHEMA)
    run_once()

    # batch 2: a LATE event for the (already finalized) 00:00 window — the
    # checkpointed watermark is 01:40, so the row drops BEFORE aggregation:
    # the window must appear EXACTLY once, with the original count/sum, and
    # the late 99.0 must never surface anywhere in the output
    _drop(spark, in_dir, [(1, ts("2024-01-01 00:05:00"), 99.0)], EV_SCHEMA)
    run_once()
    import pandas as pd

    got = spark.read.parquet(out_dir).toPandas()
    w0 = got[got.win_start == pd.Timestamp("2024-01-01 00:00:00")]
    assert len(w0) == 1, got
    assert w0.iloc[0]["n_events"] == 1 and w0.iloc[0]["sum_value"] == 1.0
    assert not (got["sum_value"] == 99.0).any()


def test_stateful_dedup_generic_schema(spark, tmp_path):
    """The dedup state function must adapt to the INPUT schema: custom key/
    text column names and extra payload columns all pass through; nothing is
    hardcoded to (doc_id, text, first_seen_ts) (r2 advisory finding)."""
    in_dir = str(tmp_path / "docs_g")
    ckpt = str(tmp_path / "ckpt_g")
    out_dir = str(tmp_path / "out_g")
    os.makedirs(in_dir, exist_ok=True)
    schema = "img_id long, caption string, lang string, score double"
    _drop(spark, in_dir, [
        (20, "a red barn", "en", 0.9),
        (21, "a red barn", "en", 0.4),   # dup content, higher key -> dropped
        (22, "ein rotes haus", "de", 0.7),
    ], schema)
    stream = spark.readStream.schema(schema).parquet(in_dir)
    q = (
        stateful_dedup_stream(stream, text="caption", key="img_id")
        .writeStream.foreachBatch(
            lambda df, _id: df.write.mode("append").parquet(out_dir))
        .outputMode("update").option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out_dir).orderBy("img_id").toPandas()
    assert got["img_id"].tolist() == [20, 22]
    assert set(got.columns) == {"img_id", "caption", "lang", "score"}
    assert got.set_index("img_id").loc[20, "score"] == 0.9

    # misuse: missing columns fail fast with a clear error, not a worker KeyError
    import pytest

    bad = spark.readStream.schema("x long, y string").parquet(in_dir)
    with pytest.raises(ValueError, match="must carry"):
        stateful_dedup_stream(bad, text="caption", key="img_id")


def test_sessionize_stream_gap_and_timeout_close(spark, tmp_path):
    """Streaming sessionization: the in-data gap closes session 1 in run 1;
    a much-later unrelated key advances the watermark so run 3's batch
    fires the EventTimeTimeout and flushes user 1's open session; user 2's
    own session stays open (its timeout is ahead of the watermark)."""
    from geo_epic_spark.streaming.stateful import sessionize_stream

    in_dir = str(tmp_path / "sess")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    os.makedirs(in_dir, exist_ok=True)
    ts = dt.datetime.fromisoformat
    schema = "user_id long, event_ts timestamp"

    def run_once():
        stream = spark.readStream.schema(schema).parquet(in_dir)
        q = (
            sessionize_stream(stream, gap="30 minutes", watermark="10 minutes")
            .writeStream.foreachBatch(
                lambda df, _id: df.write.mode("append").parquet(out_dir)
            )
            .outputMode("append").option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()

    # run 1: user 1 -> session A (00:00, 00:05) closed by the 55-min gap to
    # 01:00, which opens session B (stays in state, timeout 01:30)
    _drop(spark, in_dir, [
        (1, ts("2024-01-01 00:00:00")),
        (1, ts("2024-01-01 00:05:00")),
        (1, ts("2024-01-01 01:00:00")),
    ], schema)
    run_once()
    # run 2: user 2 at 03:00 pushes the watermark to 02:50 (> 01:30) at
    # batch END; run 3's batch start then fires user 1's timeout
    _drop(spark, in_dir, [(2, ts("2024-01-01 03:00:00"))], schema)
    run_once()
    _drop(spark, in_dir, [], schema)  # empty drop -> one more batch
    run_once()

    rows = {
        (r["user_id"], str(r["session_start"])): (str(r["session_end"]), r["n_events"])
        for r in spark.read.parquet(out_dir).collect()
    }
    assert rows[(1, "2024-01-01 00:00:00")] == ("2024-01-01 00:05:00", 2)
    assert rows[(1, "2024-01-01 01:00:00")] == ("2024-01-01 01:00:00", 1)
    assert len(rows) == 2  # user 2's session still open -> not emitted


def test_sessionize_stream_exact_gap_stays_in_session(spark, tmp_path):
    """An event exactly gap after the previous one continues the session
    (strict > boundary — same rule as the batch sessionizer), and a
    cross-batch continuation merges with the open state."""
    from geo_epic_spark.streaming.stateful import sessionize_stream

    in_dir = str(tmp_path / "sess2")
    ckpt = str(tmp_path / "ckpt2")
    out_dir = str(tmp_path / "out2")
    os.makedirs(in_dir, exist_ok=True)
    ts = dt.datetime.fromisoformat
    schema = "user_id long, event_ts timestamp"

    def run_once():
        stream = spark.readStream.schema(schema).parquet(in_dir)
        q = (
            sessionize_stream(stream, gap="30 minutes", watermark="10 minutes")
            .writeStream.foreachBatch(
                lambda df, _id: df.write.mode("append").parquet(out_dir)
            )
            .outputMode("append").option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()

    _drop(spark, in_dir, [(5, ts("2024-01-01 00:00:00"))], schema)
    run_once()
    # exactly 30 min later, in a LATER batch: continues the open session
    _drop(spark, in_dir, [(5, ts("2024-01-01 00:30:00"))], schema)
    run_once()
    # 31 min later: strict-greater gap -> closes (00:00-00:30, n=2)
    _drop(spark, in_dir, [(5, ts("2024-01-01 01:01:00"))], schema)
    run_once()

    rows = [
        (r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n_events"])
        for r in spark.read.parquet(out_dir).collect()
    ]
    assert rows == [(5, "2024-01-01 00:00:00", "2024-01-01 00:30:00", 2)]


class TestIntervalJoin:
    def test_matches_batch_join(self, spark, tmp_path):
        import uuid

        from geo_epic_spark.streaming.stateful import interval_join_streams

        rows = [
            # user 1: click 10:00, errors 10:05 (pairs) and 10:20 (outside 10m)
            (1, "click", "2024-01-01 10:00:00"),
            (2, "error", "2024-01-01 10:05:00"),
            (3, "error", "2024-01-01 10:20:00"),
            # user 2: click AFTER the error -> never pairs
            (4, "error", "2024-01-01 11:00:00"),
            (5, "click", "2024-01-01 11:01:00"),
        ]
        src = str(tmp_path / "src")
        spark.createDataFrame(
            [(eid, 1 if eid < 4 else 2, et, ts) for eid, et, ts in rows],
            "event_id long, user_id long, event_type string, ts_s string",
        ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s") \
            .write.parquet(src)

        def stream():
            return spark.readStream.schema(
                "event_id long, user_id long, event_type string, ts timestamp"
            ).parquet(src)

        errors = stream().where("event_type = 'error'").select(
            F.col("event_id").alias("eid"), "user_id", F.col("ts").alias("ts_l"))
        clicks = stream().where("event_type = 'click'").select(
            F.col("event_id").alias("cid"), "user_id", F.col("ts").alias("ts_r"))
        joined = interval_join_streams(errors, clicks, lookback="10 minutes",
                                       watermark="1 hour")
        name = "tij_" + uuid.uuid4().hex[:8]
        q = (joined.writeStream.format("memory").queryName(name)
             .outputMode("append")
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .trigger(availableNow=True).start())
        q.awaitTermination()
        got = [(r.eid, r.cid) for r in spark.table(name).collect()]
        assert got == [(2, 1)]

    def test_left_outer_null_emission_timing(self, spark, tmp_path):
        """Pin WHEN the null-padded side of a left-outer stream-stream
        interval join is emitted (r5): an unmatched left row is released
        only after the event-time watermark passes its own timestamp.
        With availableNow the final no-data batch runs at watermark
        max(ts) - delay, so an old unmatched error IS null-emitted, a
        young unmatched error (inside the watermark horizon) is NOT —
        it stays in state awaiting a possible future click."""
        import uuid

        from geo_epic_spark.streaming.stateful import interval_join_streams

        rows = [
            # user 1: unmatched error far below the final watermark -> null row
            (1, 1, "error", "2024-01-01 08:00:00"),
            # user 2: matched pair (click 10:00 within 10m before error 10:05)
            (2, 2, "click", "2024-01-01 10:00:00"),
            (3, 2, "error", "2024-01-01 10:05:00"),
            # user 3: unmatched error ABOVE the final watermark (12:00 - 1h)
            (4, 3, "error", "2024-01-01 11:55:00"),
            # user 4: click that only advances max event time to 12:00
            (5, 4, "click", "2024-01-01 12:00:00"),
        ]
        src = str(tmp_path / "src")
        spark.createDataFrame(
            rows, "event_id long, user_id long, event_type string, ts_s string",
        ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s") \
            .write.parquet(src)

        def stream():
            return spark.readStream.schema(
                "event_id long, user_id long, event_type string, ts timestamp"
            ).parquet(src)

        errors = stream().where("event_type = 'error'").select(
            F.col("event_id").alias("eid"), "user_id", F.col("ts").alias("ts_l"))
        clicks = stream().where("event_type = 'click'").select(
            F.col("event_id").alias("cid"), "user_id", F.col("ts").alias("ts_r"))
        joined = interval_join_streams(errors, clicks, lookback="10 minutes",
                                       watermark="1 hour", how="left_outer")
        name = "tijo_" + uuid.uuid4().hex[:8]
        q = (joined.writeStream.format("memory").queryName(name)
             .outputMode("append")
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .trigger(availableNow=True).start())
        q.awaitTermination()
        got = sorted((r.eid, r.cid) for r in spark.table(name).collect())
        # eid=1 null-emitted (watermark-closed), eid=3 matched,
        # eid=4 withheld (young unmatched -> still in state)
        assert got == [(1, None), (3, 2)]

    def test_interval_join_rejects_unsupported_how(self, spark):
        import pytest

        from geo_epic_spark.streaming.stateful import interval_join_streams

        df = spark.range(1).select(
            F.col("id").alias("user_id"),
            F.current_timestamp().alias("ts_l"))
        with pytest.raises(ValueError, match="left_outer"):
            interval_join_streams(df, df.withColumnRenamed("ts_l", "ts_r"),
                                  how="full_outer")
