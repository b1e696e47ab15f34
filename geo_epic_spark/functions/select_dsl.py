"""Selection mini-DSL — parity with the reference's run-selection strings.

`geoEpic/utils/misc.py:44-93` (`filter_dataframe`): a config string like
``"CNTYFIPS == '19001'; Range(0.35, 0.8) + Random(0.1)"`` where

  * ``expr`` — boolean predicate (pandas ``query`` -> Spark SQL ``filter``),
  * ``Range(lo, hi)`` — fractional slice of the *ordered* rows
    (floor(lo*n) .. ceil(hi*n), `misc.py:60-73`),
  * ``Random(frac)`` — random sample (seeded here for determinism),
  * ``;`` — composition (AND, applied left to right),
  * ``+`` — union of two selections with last-wins dedup on SiteID
    (`misc.py:88-90`).

Spark mapping: filter / row_number window / sample / unionByName +
row_number-dedup. ``order_by`` supplies the deterministic row order pandas
got implicitly from the index.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _apply_single(df: DataFrame, expr: str, order_by: str, seed: int, n: int) -> DataFrame:
    expr = expr.strip()
    if expr.startswith("Range(") and expr.endswith(")"):
        lo, hi = (float(v) for v in expr[6:-1].split(","))
        low_idx = max(0, math.floor(lo * n))
        high_idx = min(n, math.ceil(hi * n))
        w = Window.orderBy(order_by)
        return (
            df.withColumn("__rn", F.row_number().over(w) - 1)
            .filter((F.col("__rn") >= low_idx) & (F.col("__rn") < high_idx))
            .drop("__rn")
        )
    if expr.startswith("Random(") and expr.endswith(")"):
        frac = float(expr[7:-1])
        return df.sample(fraction=frac, seed=seed)
    return df.filter(expr)


def select_str(
    df: DataFrame,
    expression: str | None,
    order_by: str = "SiteID",
    dedup_key: str = "SiteID",
    seed: int = 42,
) -> DataFrame:
    """Apply a selection-DSL string. ``Range`` needs a total order; pandas
    used positional index, we use ``order_by``. ``+`` keeps the *last*
    selection's row per dedup_key (reference keep='last')."""
    if expression is None or not expression.strip():
        return df
    branches = [b.strip() for b in expression.split("+")]
    n = df.count() if "Range(" in expression else 0
    outs = []
    for bi, branch in enumerate(branches):
        cur = df
        for sub in branch.split(";"):
            cur = _apply_single(cur, sub, order_by, seed + bi, n)
        outs.append(cur.withColumn("__branch", F.lit(bi)))
    if len(outs) == 1:
        return outs[0].drop("__branch")
    unioned = outs[0]
    for o in outs[1:]:
        unioned = unioned.unionByName(o)
    w = Window.partitionBy(dedup_key).orderBy(F.col("__branch").desc())
    return (
        unioned.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__branch")
    )
