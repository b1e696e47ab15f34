"""Per-track trajectory analytics over (track_id, seq, lon, lat) tables.

GPS-track statistics as one window + one aggregate: step lengths from a
`lag` window ordered by sequence inside each track, then per-track path
length / net displacement / straightness / max step. One shuffle, keyed on
track_id (the natural partition key for trajectory tables at any scale —
a hot track is bounded by its own length, not corpus size).

The reference handles time series per site (`operators/timeseries.py`
analogs); this is the same per-entity window discipline applied to the
spatial dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["trajectory_stats", "sql_trajectory_stats"]


def trajectory_stats(
    tracks: DataFrame,
    track_id: str = "track_id",
    seq: str = "seq",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Per-track metrics: n_points, path_len (sum of step lengths),
    displacement (first->last straight line), straightness
    (displacement/path_len, NULL for zero-length paths), max_step."""
    w = Window.partitionBy(track_id).orderBy(seq)
    x, y = F.col(lon), F.col(lat)
    step = F.sqrt(
        (x - F.lag(x).over(w)) * (x - F.lag(x).over(w))
        + (y - F.lag(y).over(w)) * (y - F.lag(y).over(w))
    )
    stepped = tracks.select(track_id, seq, lon, lat, step.alias("__step"))
    agg = stepped.groupBy(track_id).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum("__step").alias("path_len"),
        F.max("__step").alias("max_step"),
        F.min_by(x, F.col(seq)).alias("__x0"),
        F.min_by(y, F.col(seq)).alias("__y0"),
        F.max_by(x, F.col(seq)).alias("__x1"),
        F.max_by(y, F.col(seq)).alias("__y1"),
    )
    disp = F.sqrt(
        (F.col("__x1") - F.col("__x0")) * (F.col("__x1") - F.col("__x0"))
        + (F.col("__y1") - F.col("__y0")) * (F.col("__y1") - F.col("__y0"))
    )
    return agg.select(
        track_id, "n_points", "path_len", "max_step",
        disp.alias("displacement"),
        F.when(F.col("path_len") > 0, disp / F.col("path_len")).alias("straightness"),
    )


def sql_trajectory_stats(
    tracks_cte: str,
    track_id: str = "track_id",
    seq: str = "seq",
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """DuckDB mirror: identical lag-window step arithmetic, min_by/max_by
    endpoints, same aggregate order."""
    return f"""
    WITH t AS ({tracks_cte}),
    stepped AS (
      SELECT {track_id}, {seq}, {lon}, {lat},
             sqrt(({lon} - lag({lon}) OVER w) * ({lon} - lag({lon}) OVER w)
                + ({lat} - lag({lat}) OVER w) * ({lat} - lag({lat}) OVER w)) AS step
      FROM t WINDOW w AS (PARTITION BY {track_id} ORDER BY {seq})
    ),
    agg AS (
      SELECT {track_id}, COUNT(*) AS n_points, sum(step) AS path_len,
             max(step) AS max_step,
             min_by({lon}, {seq}) AS x0, min_by({lat}, {seq}) AS y0,
             max_by({lon}, {seq}) AS x1, max_by({lat}, {seq}) AS y1
      FROM stepped GROUP BY {track_id}
    )
    SELECT {track_id}, n_points, path_len, max_step,
           sqrt((x1 - x0) * (x1 - x0) + (y1 - y0) * (y1 - y0)) AS displacement,
           CASE WHEN path_len > 0
                THEN sqrt((x1 - x0) * (x1 - x0) + (y1 - y0) * (y1 - y0)) / path_len
           END AS straightness
    FROM agg
    """


def track_encounters(
    tracks: DataFrame,
    radius: float,
    seq_tol: int = 1,
    res: float | None = None,
    track_id: str = "track_id",
    seq: str = "seq",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Encounter (contact) detection between trajectories: pairs of tracks
    that came within planar ``radius`` of each other at nearly the same
    sequence position (|Δseq| <= seq_tol) — the proximity join of movement
    analytics (contact tracing, convoy detection, near-miss analysis).

    Plan: side A carries its ONE cell (res defaults to radius), side B
    explodes the k-ring of its cell with k = ceil(radius/res) — the
    Chebyshev covering guarantee: two points within planar ``radius`` sit
    at most ceil(radius/res) cells apart on each axis, so the ring is a
    complete candidate cover for ANY res (a caller passing res < radius,
    e.g. to shrink dense-cell fan-in, widens the ring instead of silently
    dropping pairs). The equi-join runs on the cell id with the exact
    distance + seq-window + (a < b) predicates inside the join condition.
    A matching point pair meets exactly once (A has one cell; B's ring
    cells are distinct). One final (a, b) aggregate: contact count +
    closest approach.
    """
    import math

    from geo_epic_spark import cells
    from geo_epic_spark.operators.spatial import _dist2_deg

    res = radius if res is None else res
    k = max(1, math.ceil(radius / res))
    a = tracks.select(
        F.col(track_id).alias("ta"), F.col(seq).alias("sa"),
        F.col(lon).alias("xa"), F.col(lat).alias("ya"),
    ).withColumn("__cell", cells.cell_id(F.col("xa"), F.col("ya"), res))
    b = tracks.select(
        F.col(track_id).alias("tb"), F.col(seq).alias("sb"),
        F.col(lon).alias("xb"), F.col(lat).alias("yb"),
    ).withColumn(
        "__cell",
        F.explode(cells.k_ring(
            cells.cell_id(F.col("xb"), F.col("yb"), res), k)),
    )
    d2 = _dist2_deg(F.col("xa"), F.col("ya"), F.col("xb"), F.col("yb"))
    pairs = a.join(
        b,
        on=(a["__cell"] == b["__cell"])
        & (F.col("ta") < F.col("tb"))
        & (F.abs(F.col("sa") - F.col("sb")) <= F.lit(seq_tol))
        & (d2 <= F.lit(radius * radius)),
        how="inner",
    )
    return pairs.groupBy("ta", "tb").agg(
        F.count(F.lit(1)).alias("n_contacts"),
        F.min(d2).alias("min_d2"),
    )
