"""Runtime validators as distributed DataFrame assertions (SURVEY §5).

The reference enforces correctness with per-object ``validate()`` loops —
DLY date-continuity + column ranges (`geoEpic/io/inputs.py:224-265`), SOL
per-layer physical ranges (`io/inputs.py:104-153`), SIT site bounds
(`io/inputs.py:412-440`), OPC year coverage / monotonic dates / plantation+
harvest presence (`io/opc.py:638-671`). Here each validator is one
aggregation over the whole table returning a *violations* DataFrame
(empty == valid) — same checks, executed set-at-a-time across the cluster
instead of a Python row loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# column: (lo, hi, zero_allowed) — zero_allowed mirrors the reference's
# "row[col] != 0 and not (lo <= ... <= hi)" escape for sentinel zeros.
DLY_RANGES: dict[str, tuple[float, float, bool]] = {
    "month": (1, 12, False), "day": (1, 31, False),
    "srad": (0.01, 900, False), "tmin": (-50, 100, False),
    "tmax": (-50, 100, False), "prcp": (0, 900, False),
    "rh": (0, 1, False), "ws": (0, 900, False),
}
SOL_RANGES: dict[str, tuple[float, float, bool]] = {
    "Layer_depth": (0.01, 10.0, False), "Bulk_Density": (0.5, 2.5, False),
    "Wilting_capacity": (0.01, 0.5, True), "Field_Capacity": (0.1, 0.9, False),
    "Sand_content": (1, 99, False), "Silt_content": (1, 99, False),
    "N_concen": (100, 5000, True), "pH": (3, 9, False),
    "Sum_Bases": (0, 150, True), "Organic_Carbon": (0.1, 10, True),
    "Calcium_Carbonate": (0, 99, True), "Cation_exchange": (0, 150, True),
    "Course_Fragment": (0, 99, True), "cnds": (0.01, 500, True),
    "pkrz": (0, 20, True), "rsd": (0, 20, True),
    "Bulk_density_dry": (0, 2.0, True), "psp": (0, 0.9, False),
    "Saturated_conductivity": (1e-5, 100, True),
}
SIT_RANGES: dict[str, tuple[float, float, bool]] = {
    "lat": (-90, 90, False), "lon": (-180, 180, False),
    "elevation": (-200, 8000, False), "slope_steep": (0, 1, False),
    "slope_length": (0, 90, False),
}

# OPC code sets (io/opc.py plantation/harvest/fallow class attributes)
PLANTATION_CODES = (2, 3)
HARVEST_CODES = (650,)
FALLOW_CODES = (14,)


# P2: the reference's run-info load assertion (`core/workspace.py:315-317`
# required = {SiteID, soil, opc, dly, lat, lon}; `sites/generate.py:33-35`)
RUN_INFO_REQUIRED = ("SiteID", "soil", "opc", "dly", "lat", "lon")


def require_columns(df: DataFrame, required: list[str] | tuple[str, ...]) -> DataFrame:
    """P2 required-column validation, assertion form: raise at plan-build
    time (driver-side, zero jobs) when the frame is missing any required
    column — the distributed analog of the reference's load-time
    ``if not required.issubset(columns): raise`` (`core/workspace.py:
    315-317`). Returns the frame unchanged for chaining."""
    missing = [c for c in required if c not in df.columns]
    if missing:
        raise ValueError(
            f"missing required columns {missing}; present: {df.columns}"
        )
    return df


def required_column_violations(
    df: DataFrame, required: list[str] | tuple[str, ...]
) -> DataFrame:
    """P2, report form: one violations row per problem — absent required
    columns (issue `__missing_column`, n_bad = row count: every row lacks
    it) and NULLs inside present required columns (issue `__null`). Empty
    output == the frame satisfies the contract. One single-pass aggregate
    (count + per-column null sums), then a stack() melt — same shape as
    ``range_violations`` so `workspace validate` surfaces all checks in one
    union."""
    present = [c for c in required if c in df.columns]
    missing = [c for c in required if c not in df.columns]
    aggs = [F.count(F.lit(1)).alias("__n")] + [
        F.sum(F.col(c).isNull().cast("long")).alias(c) for c in present
    ]
    counts = df.agg(*aggs)
    items = [f"'{c}', '__missing_column', __n" for c in missing] + [
        f"'{c}', '__null', `{c}`" for c in present
    ]
    melted = counts.selectExpr(
        f"stack({len(items)}, {', '.join(items)}) as (col_name, issue, n_bad)"
    )
    return melted.filter(F.col("n_bad") > 0)


def _bad(col: str, lo: float, hi: float, zero_ok: bool) -> F.Column:
    # nulls count as violations in BOTH branches (the reference's row loop
    # treats NaN as bad regardless of the sentinel-zero escape; `x & (c != 0)`
    # would three-value-logic nulls away for zero-allowed columns).
    c = F.col(col)
    out_of_range = (c < lo) | (c > hi)
    if zero_ok:
        out_of_range = out_of_range & (c != 0)
    return c.isNull() | out_of_range


def range_violations(
    df: DataFrame,
    ranges: dict[str, tuple[float, float, bool]],
    by: list[str] | None = None,
) -> DataFrame:
    """Generic range validator: one pass, one partial-aggregating groupBy.
    Output (by..., column, n_bad) with n_bad > 0 only."""
    by = by or []
    aggs = [
        F.sum(_bad(c, lo, hi, z).cast("long")).alias(c)
        for c, (lo, hi, z) in ranges.items()
    ]
    counts = df.groupBy(*by).agg(*aggs) if by else df.agg(*aggs)
    stack = ", ".join(f"'{c}', `{c}`" for c in ranges)
    melted = counts.selectExpr(
        *by, f"stack({len(ranges)}, {stack}) as (column, n_bad)"
    )
    return melted.filter(F.col("n_bad") > 0)


def dly_violations(
    daily: DataFrame,
    by: list[str],
    start_year: int,
    end_year: int,
    date_col: str = "date",
) -> DataFrame:
    """DLY validate: duplicates, missing dates over the full span, and column
    ranges — each reported as (by..., column, n_bad)."""
    dups = (
        daily.groupBy(*by, date_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .groupBy(*by)
        .agg(F.sum(F.col("n") - 1).alias("n_bad"))
        .withColumn("column", F.lit("__duplicate_date"))
        .select(*by, "column", "n_bad")
    )
    spine = (
        daily.select(*by).distinct()
        .withColumn(
            date_col,
            F.explode(F.sequence(
                F.to_date(F.lit(f"{start_year}-01-01")),
                F.to_date(F.lit(f"{end_year}-12-31")),
            )),
        )
    )
    missing = (
        spine.join(daily.select(*by, date_col).distinct(), on=[*by, date_col],
                   how="left_anti")
        .groupBy(*by)
        .agg(F.count(F.lit(1)).alias("n_bad"))
        .withColumn("column", F.lit("__missing_date"))
        .select(*by, "column", "n_bad")
    )
    # month/day are derived columns in the reference loader, not part of the
    # stored daily schema — derive them from the date column when absent so
    # `workspace validate` works on any daily parquet; and (like
    # sol_violations) only check ranges whose column is actually present.
    with_md = daily
    if "month" not in daily.columns:
        with_md = with_md.withColumn("month", F.month(date_col))
    if "day" not in daily.columns:
        with_md = with_md.withColumn("day", F.dayofmonth(date_col))
    present = {c: v for c, v in DLY_RANGES.items() if c in with_md.columns}
    ranges = range_violations(with_md, present, by)
    return dups.unionByName(missing).unionByName(ranges)


def sol_violations(layers: DataFrame, by: list[str] | None = None) -> DataFrame:
    """SOL validate: 19 per-layer physical ranges (+ albedo when present)."""
    ranges = dict(SOL_RANGES)
    if "albedo" in layers.columns:
        ranges["albedo"] = (0, 1, False)
    present = {c: v for c, v in ranges.items() if c in layers.columns}
    return range_violations(layers, present, by)


def sit_violations(sites: DataFrame, by: list[str] | None = None) -> DataFrame:
    present = {c: v for c, v in SIT_RANGES.items() if c in sites.columns}
    return range_violations(sites, present, by)


def opc_violations(
    ops: DataFrame,
    by: list[str],
    duration: int | None = None,
) -> DataFrame:
    """OPC validate per schedule group: year-coverage gaps, non-monotonic
    dates, crops missing plantation/harvest codes."""
    # missing years 1..duration (duration = max Yid per group when None)
    yr = ops.groupBy(*by).agg(
        F.max("Yid").alias("__maxy"),
        F.count(F.when(F.col("Yid").isNotNull(), 1)).alias("__n"),
        F.size(F.collect_set("Yid")).alias("__ny"),
    )
    dur = F.lit(duration) if duration is not None else F.col("__maxy")
    missing_years = (
        yr.withColumn("n_bad", dur - F.col("__ny"))
        .filter(F.col("n_bad") > 0)
        .withColumn("column", F.lit("__missing_year"))
        .select(*by, "column", "n_bad")
    )
    # monotonic dates: count of strict decreases over the file order
    w = F.expr("date < lag(date) over (partition by {} order by Yid, Mn, Dy)".format(
        ", ".join(by)))
    non_mono = (
        ops.withColumn("__dec", w.cast("long"))
        .groupBy(*by).agg(F.sum("__dec").alias("n_bad"))
        .filter(F.col("n_bad") > 0)
        .withColumn("column", F.lit("__date_not_monotonic"))
        .select(*by, "column", "n_bad")
    )
    crops = (
        ops.filter(~F.col("CRP").isin(*FALLOW_CODES))
        .groupBy(*by, "CRP")
        .agg(
            F.max(F.col("CODE").isin(*PLANTATION_CODES).cast("int")).alias("__p"),
            F.max(F.col("CODE").isin(*HARVEST_CODES).cast("int")).alias("__h"),
        )
    )
    no_plant = (
        crops.filter(F.col("__p") == 0).groupBy(*by)
        .agg(F.count(F.lit(1)).alias("n_bad"))
        .withColumn("column", F.lit("__crop_without_plantation"))
        .select(*by, "column", "n_bad")
    )
    no_harv = (
        crops.filter(F.col("__h") == 0).groupBy(*by)
        .agg(F.count(F.lit(1)).alias("n_bad"))
        .withColumn("column", F.lit("__crop_without_harvest"))
        .select(*by, "column", "n_bad")
    )
    return missing_years.unionByName(non_mono).unionByName(no_plant).unionByName(no_harv)
