"""Data-quality + distribution diagnostics: one-pass table profiling and
key-skew reporting.

Both are the operational preludes to every 100 TB job in this engine:
`profile_table` is the scan-once data-quality snapshot (null rates,
cardinalities, ranges) a pipeline asserts before committing compute, and
`key_skew_report` measures the shuffle-key concentration that decides
whether a join/agg needs salting (`spatial.add_salt`) or AQE skew-split —
the north rule calls out dense-cell skew explicitly; this is the operator
that detects it.

Both are pure DataFrame aggregations: `profile_table` is ONE full-table
aggregate (every metric for every column in a single pass — no per-column
jobs, no driver loop over collect()s), `key_skew_report` is one hash
aggregate on the key plus a tiny top-k, with the totals attached via a
single-row broadcast cross join, never a second scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double",
            "decimal", "date", "timestamp"}


def profile_table(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Per-column profile in ONE aggregation pass.

    Output: (col_name, n_rows, n_null, n_distinct, min_val, max_val, mean)
    — min/max rendered as strings so one schema fits every column type;
    mean is NULL for non-numeric columns. n_distinct is exact
    (count(DISTINCT col) — Spark expands multiple distinct aggregates
    into a single expand+agg, still one pass over the scan).
    """
    if cols is None:
        cols = df.columns
    types = dict(df.dtypes)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        base = types[c].split("(")[0]
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"__null_{c}"),
            F.countDistinct(c).alias(f"__nd_{c}"),
            F.min(c).cast("string").alias(f"__min_{c}"),
            F.max(c).cast("string").alias(f"__max_{c}"),
            (F.avg(F.col(c).cast("double")) if base in _NUMERIC
             else F.first(F.lit(None).cast("double"))).alias(f"__mean_{c}"),
        ]
    row = df.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("__n").alias("n_rows"),
            F.col(f"__null_{c}").alias("n_null"),
            F.col(f"__nd_{c}").alias("n_distinct"),
            F.col(f"__min_{c}").alias("min_val"),
            F.col(f"__max_{c}").alias("max_val"),
            F.round(F.col(f"__mean_{c}"), 6).alias("mean"),
        )
        for c in cols
    ]
    return row.select(F.explode(F.array(*per_col)).alias("p")).select("p.*")


def sql_profile_table(table: str, cols: list[tuple[str, bool]]) -> str:
    """DuckDB mirror of `profile_table` — ``cols`` is (name, is_numeric).
    Same single-aggregate shape, unpivoted via UNION ALL."""
    branches = []
    for c, is_num in cols:
        mean = f"ROUND(AVG(CAST({c} AS DOUBLE)), 6)" if is_num else "CAST(NULL AS DOUBLE)"
        branches.append(
            f"SELECT '{c}' AS col_name, COUNT(*) AS n_rows, "
            f"SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS n_null, "
            f"COUNT(DISTINCT {c}) AS n_distinct, "
            f"CAST(MIN({c}) AS VARCHAR) AS min_val, "
            f"CAST(MAX({c}) AS VARCHAR) AS max_val, "
            f"{mean} AS mean FROM {table}"
        )
    return "\n    UNION ALL\n    ".join(branches)


def key_skew_report(
    df: DataFrame,
    key: str,
    top: int = 10,
) -> DataFrame:
    """Shuffle-key concentration report: the ``top`` heaviest keys with
    their row counts, share of the table, and the multiple of the mean
    group size (``hot_factor`` — the number AQE's skew-split threshold and
    `add_salt`'s salt factor should be sized against).

    Output: (rank, key_val, n_rows, share, hot_factor), rank 1..top by
    (count DESC, key ASC — deterministic). One hash aggregate on the key;
    totals ride a single-row broadcast cross join. The top-k itself is
    orderBy().limit(top) — TakeOrderedAndProject, a distributed per-
    partition heap + tiny driver merge — NOT a global single-partition
    window: the counts frame has one row per DISTINCT key, which at web
    scale is still billions of rows.
    """
    counts = df.groupBy(F.col(key).cast("string").alias("key_val")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    totals = counts.agg(
        F.sum("n_rows").alias("__total"),
        F.count(F.lit(1)).alias("__groups"),
    )
    topk = counts.orderBy(F.desc("n_rows"), F.col("key_val")).limit(top)
    # ranking the ≤top surviving rows is a window over a handful of rows
    w = Window.orderBy(F.desc("n_rows"), F.col("key_val"))
    return (
        topk.withColumn("rank", F.row_number().over(w))
        .crossJoin(F.broadcast(totals))
        .select(
            "rank",
            "key_val",
            "n_rows",
            F.round(F.col("n_rows") / F.col("__total"), 6).alias("share"),
            F.round(
                F.col("n_rows") * F.col("__groups") / F.col("__total"), 6
            ).alias("hot_factor"),
        )
    )


def sql_key_skew_report(table: str, key: str, top: int = 10) -> str:
    """DuckDB mirror of `key_skew_report`."""
    return f"""
    WITH counts AS (
      SELECT CAST({key} AS VARCHAR) AS key_val, COUNT(*) AS n_rows
      FROM {table} GROUP BY 1
    ),
    totals AS (SELECT SUM(n_rows) AS total, COUNT(*) AS groups FROM counts),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY n_rows DESC, key_val) AS rank
      FROM counts
    )
    SELECT CAST(rank AS INTEGER) AS rank, key_val, n_rows,
           ROUND(CAST(n_rows AS DOUBLE) / total, 6) AS share,
           ROUND(CAST(n_rows AS DOUBLE) * groups / total, 6) AS hot_factor
    FROM ranked CROSS JOIN totals
    WHERE rank <= {top}
    """
