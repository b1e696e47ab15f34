"""Focal (moving-window) map algebra over raster-as-table grids.

The reference samples rasters pointwise (`utils/raster_utils.py:16-51`); a
focal pass is the raster-side complement — neighborhood mean/min/max and
Horn slope/aspect over a row-major grid table (grid_id = r·nc + c, the
layout every lattice generator in this engine emits).

Scale shape: NO self-join. Each cell SCATTERS its value to the target ids
of the (2·radius+1)² window (map-side explode of a constant offsets array),
then ONE hash aggregate on target id with map-side partial combine — the
same single-Exchange shape as `cell_rollup`. A self-join formulation would
shuffle the raster twice and build a hash table per partition; the scatter
costs only the ~9× map-side row fan-out, which the partial aggregate
collapses before the wire at 100 TB.

Missing cells (nodata holes) simply contribute nothing; `min_neighbors`
lets callers demand a full window (Horn's stencil needs all 8 neighbors).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["focal_stats", "slope_aspect", "sql_focal_stats", "sql_slope_aspect"]

# tan(22.5°): octant sector boundary for the comparison-only aspect encode —
# the same double literal in both engines, so boundary comparisons agree.
_TAN_22_5 = 0.41421356237309503


def _scatter(raster: DataFrame, nc: int, n_cells: int, value: str,
             grid_id: str, radius: int) -> DataFrame:
    """Explode each cell into (target_id, dr, dc, v) contributions, clipped
    at the grid edges (column wraparound guarded via the cell's own col)."""
    offs = F.array(*[
        F.struct(F.lit(dr).alias("dr"), F.lit(dc).alias("dc"))
        for dr in range(-radius, radius + 1)
        for dc in range(-radius, radius + 1)
    ])
    g = F.col(grid_id)
    c = g % F.lit(nc)
    e = F.explode(offs).alias("o")
    return (
        raster.select(g.alias("__g"), c.alias("__c"), F.col(value).alias("__v"), e)
        .select(
            (F.col("__g") + F.col("o.dr") * F.lit(nc) + F.col("o.dc")).alias("__tgt"),
            "o.dr", "o.dc", "__c", "__v",
        )
        .where(
            (F.col("__c") + F.col("o.dc") >= 0)
            & (F.col("__c") + F.col("o.dc") < nc)
            & (F.col("__tgt") >= 0) & (F.col("__tgt") < n_cells)
        )
    )


def focal_stats(
    raster: DataFrame,
    nc: int,
    nr: int,
    value: str,
    stats: tuple[str, ...] = ("mean", "min", "max", "count"),
    radius: int = 1,
    grid_id: str = "grid_id",
    min_neighbors: int = 1,
) -> DataFrame:
    """Focal statistics: per cell, aggregates of `value` over the window of
    cells within `radius` rows/cols (the cell itself included). Output:
    (grid_id, focal_<stat>...)."""
    contrib = _scatter(raster, nc, nr * nc, value, grid_id, radius)
    agg_map = {
        "mean": F.avg("__v").alias("focal_mean"),
        "min": F.min("__v").alias("focal_min"),
        "max": F.max("__v").alias("focal_max"),
        "sum": F.sum("__v").alias("focal_sum"),
        "count": F.count(F.lit(1)).alias("focal_count"),
    }
    aggs = [agg_map[s] for s in stats]
    out = contrib.groupBy(F.col("__tgt").alias(grid_id)).agg(*aggs)
    if min_neighbors > 1:
        n = F.count(F.lit(1)) if "count" not in stats else None
        if n is not None:
            out = (
                contrib.groupBy(F.col("__tgt").alias(grid_id))
                .agg(*aggs, F.count(F.lit(1)).alias("__n"))
                .where(F.col("__n") >= min_neighbors).drop("__n")
            )
        else:
            out = out.where(F.col("focal_count") >= min_neighbors)
    return out


def slope_aspect(
    raster: DataFrame,
    nc: int,
    nr: int,
    spacing: float,
    value: str = "elev",
    grid_id: str = "grid_id",
) -> DataFrame:
    """Horn (1981) slope + comparison-only aspect octant over a DEM table.

    gx = Σ wx·z / (8·dx), wx = dc·(2 if dr=0 else 1) — the classic 3×3
    Sobel-style stencil, computed in the scatter/aggregate shape (each cell
    contributes wx·z and wy·z to its neighbors; one hash agg). Only cells
    with the full 9-cell window emit (Horn is undefined at edges/holes).

    aspect_octant encodes the downslope direction into 0..7 (E, NE, N, NW,
    W, SW, S, SE) by sign/ratio comparisons against tan(22.5°) — no atan2,
    so the oracle mirror is decided by identical double comparisons rather
    than transcendental rounding.
    """
    contrib = _scatter(raster, nc, nr * nc, value, grid_id, 1)
    dr, dc, v = F.col("dr"), F.col("dc"), F.col("__v")
    # weight as seen FROM the target: the contributor sits at (-dr, -dc)
    # relative to the target cell, so flip signs.
    wx = (-dc) * F.when(dr == 0, F.lit(2.0)).otherwise(F.lit(1.0))
    wy = (-dr) * F.when(dc == 0, F.lit(2.0)).otherwise(F.lit(1.0))
    g = (
        contrib.groupBy(F.col("__tgt").alias(grid_id))
        .agg(
            F.sum(v * wx).alias("__sx"),
            F.sum(v * wy).alias("__sy"),
            F.count(F.lit(1)).alias("__n"),
        )
        .where(F.col("__n") == 9)
    )
    gx = (F.col("__sx") / F.lit(8.0 * spacing)).alias("gx")
    gy = (F.col("__sy") / F.lit(8.0 * spacing)).alias("gy")
    out = g.select(grid_id, gx, gy)
    ax, ay = F.abs(F.col("gx")), F.abs(F.col("gy"))
    t = F.lit(_TAN_22_5)
    # downslope = direction of -(gx, gy); classify into 8 sectors.
    east = F.col("gx") < 0
    north = F.col("gy") < 0
    octant = (
        F.when(ay <= ax * t, F.when(east, F.lit(0)).otherwise(F.lit(4)))       # E / W
        .when(ax <= ay * t, F.when(north, F.lit(2)).otherwise(F.lit(6)))       # N / S
        .when(east & north, F.lit(1))                                          # NE
        .when(~east & north, F.lit(3))                                         # NW
        .when(~east & ~north, F.lit(5))                                        # SW
        .otherwise(F.lit(7))                                                   # SE
    )
    return out.select(
        grid_id,
        F.sqrt(F.col("gx") * F.col("gx") + F.col("gy") * F.col("gy")).alias("slope"),
        octant.alias("aspect_octant"),
    )


# ---------------------------------------------------------------------------
# DuckDB mirrors (same scatter/aggregate arithmetic)
# ---------------------------------------------------------------------------

def _sql_contrib(raster_cte: str, nc: int, n_cells: int, value: str,
                 grid_id: str, radius: int) -> str:
    r = radius
    return f"""
      SELECT r.{grid_id} + o.dr * {nc} + o.dc AS tgt, o.dr, o.dc, r.{value} AS v
      FROM {raster_cte} r
      CROSS JOIN (
        SELECT CAST(a.range AS BIGINT) AS dr, CAST(b.range AS BIGINT) AS dc
        FROM range({-r}, {r + 1}) a, range({-r}, {r + 1}) b
      ) o
      WHERE (r.{grid_id} % {nc}) + o.dc >= 0
        AND (r.{grid_id} % {nc}) + o.dc < {nc}
        AND r.{grid_id} + o.dr * {nc} + o.dc >= 0
        AND r.{grid_id} + o.dr * {nc} + o.dc < {n_cells}
    """


def sql_focal_stats(raster_cte: str, nc: int, nr: int, value: str,
                    stats: tuple[str, ...] = ("mean", "min", "max", "count"),
                    radius: int = 1, grid_id: str = "grid_id",
                    min_neighbors: int = 1) -> str:
    sel = {
        "mean": "avg(v) AS focal_mean",
        "min": "min(v) AS focal_min",
        "max": "max(v) AS focal_max",
        "sum": "sum(v) AS focal_sum",
        "count": "COUNT(*) AS focal_count",
    }
    cols = ", ".join(sel[s] for s in stats)
    having = f"HAVING COUNT(*) >= {min_neighbors}" if min_neighbors > 1 else ""
    return f"""
    SELECT tgt AS {grid_id}, {cols}
    FROM ({_sql_contrib(raster_cte, nc, nr * nc, value, grid_id, radius)})
    GROUP BY tgt {having}
    """


def sql_slope_aspect(raster_cte: str, nc: int, nr: int, spacing: float,
                     value: str = "elev", grid_id: str = "grid_id") -> str:
    t = repr(_TAN_22_5)
    return f"""
    WITH contrib AS ({_sql_contrib(raster_cte, nc, nr * nc, value, grid_id, 1)}),
    grad AS (
      SELECT tgt AS {grid_id},
             sum(v * ((-dc) * (CASE WHEN dr = 0 THEN 2.0 ELSE 1.0 END))) / {8.0 * spacing!r} AS gx,
             sum(v * ((-dr) * (CASE WHEN dc = 0 THEN 2.0 ELSE 1.0 END))) / {8.0 * spacing!r} AS gy,
             COUNT(*) AS n
      FROM contrib GROUP BY tgt
    )
    SELECT {grid_id},
           sqrt(gx * gx + gy * gy) AS slope,
           CASE
             WHEN abs(gy) <= abs(gx) * {t} THEN (CASE WHEN gx < 0 THEN 0 ELSE 4 END)
             WHEN abs(gx) <= abs(gy) * {t} THEN (CASE WHEN gy < 0 THEN 2 ELSE 6 END)
             WHEN gx < 0 AND gy < 0 THEN 1
             WHEN gx >= 0 AND gy < 0 THEN 3
             WHEN gx >= 0 AND gy >= 0 THEN 5
             ELSE 7
           END AS aspect_octant
    FROM grad WHERE n = 9
    """


# ---------------------------------------------------------------------------
# bilinear regrid: resample a grid raster table to a new lattice
# ---------------------------------------------------------------------------

def regrid_bilinear(
    src: DataFrame,
    src_nc: int,
    src_nr: int,
    src_spacing: float,
    dst_nc: int,
    dst_nr: int,
    dst_spacing: float,
    value: str,
    lon0: float,
    lat0: float,
    grid_id: str = "grid_id",
) -> DataFrame:
    """Bilinear resample of a row-major grid raster onto a new lattice over
    the same origin (the raster half of CRS/resolution harmonization; the
    reference resamples by nearest-neighbor only, `utils/raster_utils.py`).

    Spark shape: the TARGET lattice is generated (`spark.range`, no input
    scan), each target computes its fractional source coordinate, explodes
    its 4 surrounding source ids with bilinear weights (pure arithmetic,
    map-side), and ONE equi-join on source id + ONE hash aggregate produce
    sum(w·v)/sum(w). Nodata holes drop their corner row and the weight
    renormalization degrades gracefully; targets outside the source hull
    get no rows. Both shuffles key on ids — scales like any equi-join.
    """
    spark = src.sparkSession
    g = F.col("id")
    tlon = F.lit(lon0) + ((g % F.lit(dst_nc)).cast("double") + F.lit(0.5)) * F.lit(dst_spacing)
    tlat = F.lit(lat0) + ((g / F.lit(dst_nc)).cast("long").cast("double") + F.lit(0.5)) * F.lit(dst_spacing)
    fx = (tlon - F.lit(lon0)) / F.lit(src_spacing) - F.lit(0.5)
    fy = (tlat - F.lit(lat0)) / F.lit(src_spacing) - F.lit(0.5)
    i0 = F.floor(fx).cast("long")
    j0 = F.floor(fy).cast("long")
    dx = fx - i0.cast("double")
    dy = fy - j0.cast("double")
    tgt = spark.range(dst_nr * dst_nc).select(
        g.alias("dst_id"), i0.alias("__i0"), j0.alias("__j0"),
        dx.alias("__dx"), dy.alias("__dy"),
    )
    corner = F.explode(F.array(*[
        F.struct(F.lit(di).alias("di"), F.lit(dj).alias("dj"))
        for dj in (0, 1) for di in (0, 1)
    ])).alias("c")
    w = (
        F.when(F.col("c.di") == 0, F.lit(1.0) - F.col("__dx")).otherwise(F.col("__dx"))
        * F.when(F.col("c.dj") == 0, F.lit(1.0) - F.col("__dy")).otherwise(F.col("__dy"))
    )
    fan = (
        tgt.select("dst_id", "__dx", "__dy", "__i0", "__j0", corner)
        .where((F.col("__i0") + F.col("c.di") >= 0)
               & (F.col("__i0") + F.col("c.di") < src_nc)
               & (F.col("__j0") + F.col("c.dj") >= 0)
               & (F.col("__j0") + F.col("c.dj") < src_nr))
        .select(
            "dst_id",
            ((F.col("__j0") + F.col("c.dj")) * F.lit(src_nc)
             + F.col("__i0") + F.col("c.di")).alias("__src_id"),
            w.alias("__w"),
        )
    )
    joined = fan.join(
        src.select(F.col(grid_id).alias("__src_id"), F.col(value).alias("__v")),
        on="__src_id", how="inner",
    )
    return (
        joined.groupBy("dst_id")
        .agg((F.sum(F.col("__w") * F.col("__v")) / F.sum("__w")).alias(value),
             F.sum("__w").alias("w_total"))
    )


def sql_regrid_bilinear(
    src_cte: str,
    src_nc: int,
    src_nr: int,
    src_spacing: float,
    dst_nc: int,
    dst_nr: int,
    dst_spacing: float,
    value: str,
    lon0: float,
    lat0: float,
    grid_id: str = "grid_id",
) -> str:
    """DuckDB mirror: identical fractional-coordinate arithmetic (same
    operation order, so the floor()s agree bit-for-bit), 4-corner fan-out
    via a 2x2 range cross join, same join + weighted aggregate."""
    tlon = f"({lon0!r} + ((g % {dst_nc}) + 0.5) * {dst_spacing!r})"
    tlat = f"({lat0!r} + ((g // {dst_nc}) + 0.5) * {dst_spacing!r})"
    fx = f"(({tlon} - {lon0!r}) / {src_spacing!r} - 0.5)"
    fy = f"(({tlat} - {lat0!r}) / {src_spacing!r} - 0.5)"
    return f"""
    WITH tgt AS (
      SELECT g AS dst_id,
             CAST(floor({fx}) AS BIGINT) AS i0, CAST(floor({fy}) AS BIGINT) AS j0,
             {fx} - floor({fx}) AS dx, {fy} - floor({fy}) AS dy
      FROM (SELECT CAST(range AS BIGINT) AS g FROM range({dst_nr * dst_nc}))
    ),
    fan AS (
      SELECT t.dst_id, (t.j0 + c.dj) * {src_nc} + t.i0 + c.di AS src_id,
             (CASE WHEN c.di = 0 THEN 1.0 - t.dx ELSE t.dx END)
           * (CASE WHEN c.dj = 0 THEN 1.0 - t.dy ELSE t.dy END) AS w
      FROM tgt t
      CROSS JOIN (SELECT CAST(a.range AS BIGINT) AS di, CAST(b.range AS BIGINT) AS dj
                  FROM range(0, 2) a, range(0, 2) b) c
      WHERE t.i0 + c.di >= 0 AND t.i0 + c.di < {src_nc}
        AND t.j0 + c.dj >= 0 AND t.j0 + c.dj < {src_nr}
    )
    SELECT f.dst_id, sum(f.w * s.{value}) / sum(f.w) AS {value},
           sum(f.w) AS w_total
    FROM fan f JOIN ({src_cte}) s ON s.{grid_id} = f.src_id
    GROUP BY f.dst_id
    """
