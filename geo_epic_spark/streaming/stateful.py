"""Event-time windowed aggregation and custom stateful streaming operators.

The reference is batch-only (SURVEY §2.8); these are the engine extensions a
continuously-ingesting deployment needs on top of `streaming/ingest.py`:

* ``windowed_event_counts`` — watermarked event-time tumbling-window
  aggregation: late rows beyond the watermark are dropped, everything else
  lands in its event-time bucket regardless of arrival order. Built-ins
  only (``window()`` + groupBy), so state eviction and late-data handling
  are Spark's own battle-tested path.
* ``stateful_dedup_stream`` — first-seen-wins streaming deduplication via
  ``applyInPandasWithState``: state is one flag per content fingerprint
  group, so re-arrivals of the same content in LATER micro-batches are
  suppressed too (a plain ``dropDuplicates`` on a stream keeps unbounded
  state; here the state payload is a single boolean per distinct content,
  and a production deployment bounds it with a processing-time timeout).

Both operators are exercised end-to-end (file-source drops + availableNow)
in tests/test_streaming_stateful.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType


def windowed_event_counts(
    stream: DataFrame,
    window_len: str = "10 minutes",
    watermark: str = "20 minutes",
    ts: str = "event_ts",
    key: str = "cell_id",
) -> DataFrame:
    """Per-(key, event-time window) counts + value sum with a watermark:
    rows later than ``watermark`` behind the max seen event time are
    dropped; windows finalize (and their state evicts) once the watermark
    passes their end. Partial aggregation applies per micro-batch, so the
    shuffle carries one row per (key, window) per batch."""
    return (
        stream.withWatermark(ts, watermark)
        .groupBy(F.window(F.col(ts), window_len).alias("win"), F.col(key))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            key,
            "n_events",
            "sum_value",
        )
    )


_DEDUP_STATE = StructType([StructField("seen", LongType())])


def stateful_dedup_stream(
    stream: DataFrame, text: str = "text", key: str = "doc_id"
) -> DataFrame:
    """First-seen-wins streaming dedup keyed by a 128-bit content
    fingerprint (same key discipline as the batch ``exact_dedup``: the
    shuffle key is 16 bytes, never the document text). State per distinct
    content is one long.

    The output schema is the input schema (fingerprint columns dropped), so
    any (key, text, ...) frame works — column names are NOT hardcoded
    (r2 advisory finding). The survivor per content group is the lowest
    ``key`` row of the first micro-batch that sees the group."""
    if text not in stream.columns or key not in stream.columns:
        raise ValueError(
            f"stateful_dedup_stream: input must carry '{key}' and '{text}' "
            f"columns; got {stream.columns}"
        )
    out_cols = list(stream.columns)
    out_schema = StructType([stream.schema[c] for c in out_cols])

    def _dedup_fn(
        _k, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        # emit the lowest-key row of this content group the FIRST time the
        # group is seen across the whole stream; afterwards the state flag
        # suppresses every re-arrival
        batch = pd.concat(list(pdfs), ignore_index=True)
        if state.exists:
            return iter(())
        state.update((1,))
        best = batch.sort_values(key).iloc[:1]
        return iter([best[out_cols]])

    # FlatMapGroupsInPandasWithState requires plain grouping attributes, so
    # the fingerprint halves are materialized as columns first
    fp = stream.withColumn("__fp1", F.xxhash64(F.col(text))).withColumn(
        "__fp2", F.xxhash64(F.col(text), F.lit(41))
    )
    keyed = fp.groupBy("__fp1", "__fp2")
    return keyed.applyInPandasWithState(
        _dedup_fn,
        outputStructType=out_schema,
        stateStructType=_DEDUP_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
