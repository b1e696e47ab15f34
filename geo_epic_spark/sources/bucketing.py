"""Bucketed (co-located) table layout for repeated big-big joins.

At 100 TB the flagship joins are broadcast (polygon/grid side is small), but
site⋈daily-weather and site⋈soil-layer joins are fact⋈fact: both sides huge,
joined on the same key every run. Writing both sides bucketed by that key
(`bucketBy(n, key)` + sortBy) lets every subsequent join run as a zero-
shuffle sort-merge join — the shuffle is paid once at write time, amortized
over every downstream run. The reference has no analog (pandas re-hashes per
merge); this is the Spark-native replacement for its per-site file layout
(one directory per site, `core/workspace.py:225-259`).

tests/test_bucketing.py asserts the joined plan contains no Exchange on
either side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed managed table. ``buckets`` should be
    sized so bucket_size ≈ 100-500 MB at the target scale (e.g. 100 TB /
    0.25 GB ≈ 400k buckets is too many files — pick the partition column ×
    bucket count product so files stay in that band)."""
    keys = [key] if isinstance(key, str) else list(key)
    w = df.write.mode(mode).format("parquet").bucketBy(buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.read.table(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two tables bucketed on the join key: Catalyst recognizes the
    matching output partitioning and plans a sort-merge join with NO
    Exchange on either side."""
    return read_table(spark, left_table).join(
        read_table(spark, right_table), on=on, how=how
    )
