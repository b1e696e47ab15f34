"""Grouped time-series operators — DLY/OPC analytics re-expressed in Spark.

Faithful ports of the reference *semantics* (not its pandas mechanics):
monthly climate normals (`geoEpic/io/inputs.py:293-332`), heat-unit
accumulation over growing seasons (`geoEpic/io/opc.py:222-250`), as-of
plantation→harvest pairing (`io/opc.py:276-290`), rolling-median outlier
frames and envelope clipping (`geoEpic/utils/profile.py:40-51`, `:430-440`),
date-range validation anti-join (`io/inputs.py:230-256`).

Everything is built-in expressions + windows — no Python in the plan — so the
partial aggregation, WSCG, and shuffle placement all come from Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DAYS_IN_MONTH = [31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31]


def monthly_normals(
    daily: DataFrame,
    by: list[str] | None = None,
    wet_threshold: float = 0.5,
) -> DataFrame:
    """`DLY.to_monthly` (`io/inputs.py:293-332`) as one Spark plan.

    Per (group, month): means of all climate columns; prcp scaled by
    days-in-month; std of tmax/tmin/prcp; DAYP wet-day fraction (prcp > 0.5);
    PRW1 dry-after-wet and PRW2 wet-after-wet transition fractions computed
    with a lag over date order *within the month group across years* (exactly
    the reference's np.diff over the date-sorted month group); RST3 rainfall
    skew 3*|RMO - median(RMO)|/RST2 where the median is across the group's 12
    monthly values.

    ``by``: extra partition columns (e.g. site/cell id) — the reference is
    per-site by construction; here one plan covers every site.
    ``wet_threshold``: the prcp cutoff defining a wet day (reference
    hard-codes 0.5; exposed for the calibration loop in
    scripts/calibrate_example.py).
    """
    by = by or []
    month = F.month("date").alias("month")
    wet = (F.col("prcp") > F.lit(wet_threshold)).cast("int")
    w_lag = Window.partitionBy(*by, F.month("date")).orderBy("date")
    d = (
        daily.withColumn("month", month)
        .withColumn("__wet", wet)
        .withColumn("__wet_prev", F.lag("__wet").over(w_lag))
    )
    dim = F.element_at(
        F.array(*[F.lit(x) for x in DAYS_IN_MONTH]), F.col("month")
    ).cast("double")
    agg = d.groupBy(*by, "month").agg(
        F.avg("tmax").alias("OBMX"),
        F.avg("tmin").alias("OBMN"),
        F.avg("srad").alias("OBSL"),
        F.avg("rh").alias("RH"),
        F.avg("ws").alias("UAVO"),
        (F.avg("prcp")).alias("__prcp_mean"),
        F.stddev("tmax").alias("SDTMX"),
        F.stddev("tmin").alias("SDTMN"),
        F.stddev("prcp").alias("RST2"),
        (F.sum(F.col("__wet")) / F.count(F.lit(1))).alias("DAYP"),
        # np.diff(wet) == -1  <=>  prev==1 and cur==0 counted over diffs;
        # reference divides by group length (not diffs length)
        (
            F.sum(((F.col("__wet_prev") == 1) & (F.col("__wet") == 0)).cast("int"))
            / F.count(F.lit(1))
        ).alias("PRW1"),
        # wet.shift(fill_value=False) & wet
        (
            F.sum(((F.col("__wet_prev") == 1) & (F.col("__wet") == 1)).cast("int"))
            / F.count(F.lit(1))
        ).alias("PRW2"),
    )
    agg = agg.withColumn("RMO", F.col("__prcp_mean") * dim).drop("__prcp_mean")
    w_all = Window.partitionBy(*by) if by else Window.partitionBy(F.lit(1))
    agg = agg.withColumn(
        "RST3",
        F.lit(3.0) * F.abs(F.col("RMO") - F.median("RMO").over(w_all)) / F.col("RST2"),
    ).withColumn("WI", F.lit(0.0))
    cols = ["OBMX", "OBMN", "SDTMX", "SDTMN", "RMO", "RST2", "RST3", "PRW1",
            "PRW2", "DAYP", "WI", "OBSL", "RH", "UAVO"]
    return agg.select(*by, "month", *cols)


def heat_units(
    daily: DataFrame,
    seasons: DataFrame,
    tbs_col: str = "tbs",
    by: list[str] | None = None,
) -> DataFrame:
    """`OPC.update_phu` (`io/opc.py:222-250`): for each season row
    (season_id, plantation_date, harvest_date, tbs[, site keys]) sum
    HU = max(0, (tmax+tmin)/2 - TBS) over daily rows with
    plantation_date < date < harvest_date (strict, per reference `:247`).

    Non-equi range join; Spark broadcasts the (small) season side or AQE
    picks the strategy at scale.
    """
    by = by or []
    cond = (daily["date"] > seasons["plantation_date"]) & (
        daily["date"] < seasons["harvest_date"]
    )
    for c in by:
        cond = cond & (daily[c] == seasons[c])
    hu = F.greatest(
        F.lit(0.0), (daily["tmax"] + daily["tmin"]) * F.lit(0.5) - seasons[tbs_col]
    )
    return (
        daily.join(seasons, cond, "inner")
        .groupBy(seasons["season_id"], *[seasons[c] for c in by])
        .agg(F.sum(hu).alias("phu"))
    )


def pair_seasons(ops: DataFrame, by: list[str] | None = None) -> DataFrame:
    """`OPC.iter_seasons` pairing (`io/opc.py:276-290`): each plantation row
    pairs with the *first* harvest of the same crop strictly after it.

    ops: (date, code, crop[, by...]) with code in {'plant','harvest'}.
    Output: (by..., crop, plantation_date, harvest_date) — plantations with no
    later harvest are dropped, like the reference's ``continue``.
    """
    by = by or []
    plants = ops.filter(F.col("code") == "plant").select(
        *by, "crop", F.col("date").alias("plantation_date")
    )
    harvests = ops.filter(F.col("code") == "harvest").select(
        *by, "crop", F.col("date").alias("harvest_date")
    )
    cond = [plants[c] == harvests[c] for c in by] + [
        plants["crop"] == harvests["crop"],
        harvests["harvest_date"] > plants["plantation_date"],
    ]
    joined = plants.join(harvests, cond, "inner").select(
        *[plants[c] for c in by],
        plants["crop"].alias("crop"),
        "plantation_date",
        "harvest_date",
    )
    w = Window.partitionBy(*by, "crop", "plantation_date").orderBy("harvest_date")
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def rolling_median(
    df: DataFrame, value: str, order: str, by: list[str], half_window: int
) -> DataFrame:
    """Centered rolling median (`utils/profile.py:40-51` rolling(center=True))
    as a rows-between window — adds ``{value}_rmed``."""
    w = (
        Window.partitionBy(*by)
        .orderBy(order)
        .rowsBetween(-half_window, half_window)
    )
    # median/percentile are not frame-capable window aggregates in Spark;
    # a sorted frame array + middle pick is (arrays are tiny: 2k+1 elems)
    arr = F.array_sort(F.collect_list(value).over(w))
    n = F.size(arr)
    lo = F.element_at(arr, ((n + 1) / 2).cast("int"))
    hi = F.element_at(arr, (n / 2 + 1).cast("int"))
    return df.withColumn(f"{value}_rmed", (lo + hi) / 2.0)


def envelope_clip(
    df: DataFrame, envelope: DataFrame, value: str, on: list[str]
) -> DataFrame:
    """Join per-key (lo, hi) envelope and clip (`utils/profile.py:430-440`):
    greatest(least(v, hi), lo)."""
    return df.join(F.broadcast(envelope), on=on, how="left").withColumn(
        f"{value}_clipped",
        F.greatest(F.least(F.col(value), F.col("hi")), F.col("lo")),
    )


def missing_dates(daily: DataFrame, by: list[str]) -> DataFrame:
    """`DLY.validate` date-coverage anti-join (`io/inputs.py:230-256`):
    build the full per-group date spine from min..max and anti-join actuals;
    output the missing (by..., date) rows."""
    spans = daily.groupBy(*by).agg(
        F.min("date").alias("__d0"), F.max("date").alias("__d1")
    )
    spine = spans.select(
        *by, F.explode(F.sequence("__d0", "__d1")).alias("date")
    )
    return spine.join(daily.select(*by, "date"), on=[*by, "date"], how="left_anti")


def interpolate_daily(
    df: DataFrame, value: str, by: list[str]
) -> DataFrame:
    """Reindex-to-daily + linear interpolation (`utils/profile.py:30-76`):
    explode the date spine, then blend last/next non-null values weighted by
    date distance. Pure window functions — no UDF."""
    spans = df.groupBy(*by).agg(F.min("date").alias("__d0"), F.max("date").alias("__d1"))
    spine = spans.select(*by, F.explode(F.sequence("__d0", "__d1")).alias("date"))
    full = spine.join(df, on=[*by, "date"], how="left")
    w_bwd = Window.partitionBy(*by).orderBy("date").rowsBetween(Window.unboundedPreceding, 0)
    w_fwd = Window.partitionBy(*by).orderBy("date").rowsBetween(0, Window.unboundedFollowing)
    vdate = F.when(F.col(value).isNotNull(), F.col("date"))
    full = (
        full.withColumn("__pv", F.last(value, ignorenulls=True).over(w_bwd))
        .withColumn("__pd", F.last(vdate, ignorenulls=True).over(w_bwd))
        .withColumn("__nv", F.first(value, ignorenulls=True).over(w_fwd))
        .withColumn("__nd", F.first(vdate, ignorenulls=True).over(w_fwd))
    )
    frac = F.datediff("date", "__pd") / F.datediff("__nd", "__pd")
    interp = (
        F.when(F.col(value).isNotNull(), F.col(value))
        .when(F.col("__pv").isNull(), F.col("__nv"))
        .when(F.col("__nv").isNull(), F.col("__pv"))
        .otherwise(F.col("__pv") + (F.col("__nv") - F.col("__pv")) * frac)
    )
    return full.withColumn(f"{value}_interp", interp).drop("__pv", "__pd", "__nv", "__nd")


PLANT_CODES = (2, 3)
HARVEST_CODE = 650


def edit_crop_season(
    ops: DataFrame,
    new_dates: DataFrame,
    by: list[str] | None = None,
    pos: str = "pos",
    date: str = "date",
    crop: str = "CRP",
    code: str = "CODE",
) -> DataFrame:
    """Re-anchor a crop season to new planting/harvest dates, set-at-a-time
    (`io/opc.py:431-498` `edit_crop_season` + `_stretch_middle_operations`,
    `:365-428` pre/post adjusters — the reference edits one schedule in a
    pandas loop; here every (group, crop) season adjusts in one pass of
    window expressions):

    * the plantation row (CODE in 2/3) and harvest row (CODE 650) move to
      the new dates exactly;
    * operations strictly BETWEEN them (by file position) stretch linearly:
      ``new = new_plant + floor(days_from_old_plant * new_span / old_span)``
      (int truncation matches the reference's ``astype(int)``);
    * pre-planting ops (date <= old_plant, >= new_plant - 14d) keep their
      day offset, compressed so the max offset maps to 14 days
      (``ceil(off / max_off * 14)``) when it exceeds 14;
    * post-harvest ops mirror the same rule after the harvest row.

    ``new_dates``: one row per (by..., crop) with ``new_plant``/``new_harv``
    DateType columns — broadcast onto the ops stream (the fact side never
    shuffles on more than the season key). Winter-crop cross-year seasons
    are out of scope here (pair with ``pair_seasons`` first).
    Output: input columns with ``date``/``Mn``/``Dy`` rewritten.
    """
    by = by or []
    keys = [*by, crop]
    joined = ops.join(F.broadcast(new_dates), on=keys, how="left")
    w = Window.partitionBy(*keys)
    is_plant = F.col(code).isin(*PLANT_CODES)
    is_harv = F.col(code) == HARVEST_CODE
    old_plant = F.max(F.when(is_plant, F.col(date))).over(w)
    old_harv = F.max(F.when(is_harv, F.col(date))).over(w)
    plant_pos = F.max(F.when(is_plant, F.col(pos))).over(w)
    harv_pos = F.max(F.when(is_harv, F.col(pos))).over(w)

    d = joined.withColumns({
        "__op": old_plant, "__oh": old_harv,
        "__pp": plant_pos, "__hp": harv_pos,
    })
    have = (
        F.col("new_plant").isNotNull() & F.col("new_harv").isNotNull()
        & F.col("__op").isNotNull() & F.col("__oh").isNotNull()
    )
    old_span = F.datediff(F.col("__oh"), F.col("__op"))
    new_span = F.datediff(F.col("new_harv"), F.col("new_plant"))
    middle = (F.col(pos) > F.col("__pp")) & (F.col(pos) < F.col("__hp"))
    stretched = F.date_add(
        F.col("new_plant"),
        F.floor(
            F.datediff(F.col(date), F.col("__op")) * new_span
            / F.greatest(old_span, F.lit(1))
        ).cast("int"),
    )
    pre_cand = (
        (F.col(date) <= F.col("__op"))
        & (F.col(date) >= F.date_sub(F.col("new_plant"), 14))
        & (F.col(pos) != F.col("__pp")) & ~middle
    )
    pre_off = F.datediff(F.col("__op"), F.col(date))
    pre_max = F.max(F.when(pre_cand, pre_off)).over(w)
    pre_scaled = F.when(
        pre_max > 14, F.ceil(pre_off / pre_max * 14)
    ).otherwise(pre_off).cast("int")
    post_cand = (
        (F.col(date) >= F.col("__oh"))
        & (F.col(date) <= F.date_add(F.col("new_harv"), 14))
        & (F.col(pos) != F.col("__hp")) & ~middle
    )
    post_off = F.datediff(F.col(date), F.col("__oh"))
    post_max = F.max(F.when(post_cand, post_off)).over(w)
    post_scaled = F.when(
        post_max > 14, F.ceil(post_off / post_max * 14)
    ).otherwise(post_off).cast("int")

    new_date = (
        F.when(~have, F.col(date))
        .when(F.col(pos) == F.col("__pp"), F.col("new_plant"))
        .when(F.col(pos) == F.col("__hp"), F.col("new_harv"))
        .when(middle, stretched)
        .when(pre_cand, F.date_sub(F.col("new_plant"), pre_scaled))
        .when(post_cand, F.date_add(F.col("new_harv"), post_scaled))
        .otherwise(F.col(date))
    )
    out = d.withColumn("__nd", new_date).withColumns({
        date: F.col("__nd"),
        "Mn": F.month("__nd"),
        "Dy": F.dayofmonth("__nd"),
    })
    return out.drop("__op", "__oh", "__pp", "__hp", "__nd", "new_plant", "new_harv")


def build_opc_schedules(
    crop_data: DataFrame,
    templates: DataFrame,
    start_year: int,
    site: str = "site_id",
) -> DataFrame:
    """Build multi-year operation schedules from a year-wise crop sequence
    plus per-crop template schedules (`opc/generate_opc.py:60-201` flow):

    1. join each (site, year, crop_code) to its crop template (broadcast —
       templates are a small dim);
    2. ``Yid = year - start_year + 1``; template ops keep their file order;
    3. where the crop row carries planting/harvest dates, re-anchor the
       season with ``edit_crop_season`` (stretch/adjust semantics).

    ``crop_data``: (site, year, crop_code[, planting_date, harvest_date]).
    ``templates``: (crop_code, pos, Mn, Dy, CODE[, OPV...]); template dates
    materialize in each target year. Output: one ops row per
    (site, year, template op) with Yid/date/Mn/Dy set.
    """
    has_dates = (
        "planting_date" in crop_data.columns and "harvest_date" in crop_data.columns
    )
    joined = crop_data.join(F.broadcast(templates), on="crop_code", how="inner")
    ops = joined.withColumns({
        "Yid": (F.col("year") - start_year + 1).cast("int"),
        "date": F.make_date(F.col("year"), F.col("Mn"), F.col("Dy")),
    })
    if not has_dates:
        return ops
    nd = (
        crop_data.filter(
            F.col("planting_date").isNotNull() & F.col("harvest_date").isNotNull()
        )
        .select(
            site, "year",
            F.col("crop_code").alias("CRP"),
            F.col("planting_date").alias("new_plant"),
            F.col("harvest_date").alias("new_harv"),
        )
    )
    adjusted = edit_crop_season(
        ops.withColumnRenamed("crop_code", "CRP"),
        nd,
        by=[site, "year"],
    )
    return adjusted.withColumnRenamed("CRP", "crop_code")
