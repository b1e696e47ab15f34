"""Streaming tile-assignment ingest.

The reference has no streaming engine — it simulates incremental arrival with
per-day file drops + skip-existing scans (`geoEpic/weather/nldas_ws_gee.py:
108-122`). Here the same semantics are native Structured Streaming:

  readStream(new image files) -> cell encode (pure Column arithmetic)
  -> stream-static PIP join against the (small, broadcast) polygon cell table
  -> writeStream.foreachBatch: append assignments + one lineage row per batch

``Trigger.AvailableNow`` processes whatever has arrived and stops — the
streaming twin of the batch engine's resume manifest; the checkpoint dir
replaces the manifest's left-anti join (Spark tracks consumed files).
At scale the same topology runs continuously against an Iceberg/Kafka source;
the PIP join is stateless (no watermark needed) so throughput scales with
executors exactly like the batch path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geo_epic_spark import cells
from geo_epic_spark.operators.spatial import pip_expr

IMAGE_META_SCHEMA = (
    "i long, image_id string, cx double, cy double, w int, h int, "
    "fmt string, caption string, phash long"
)


def read_image_stream(spark: SparkSession, path: str,
                      max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream of image-metadata rows (parquet drops into ``path``).
    maxFilesPerTrigger bounds micro-batch size for steady-state latency."""
    r = spark.readStream.schema(IMAGE_META_SCHEMA)
    if max_files_per_trigger is not None:
        r = r.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return r.parquet(path)


def assign_stream(
    stream: DataFrame,
    polys: DataFrame,
    res: float,
    lon: str = "cx",
    lat: str = "cy",
    poly_id: str = "poly_id",
    xs: str = "xs",
    ys: str = "ys",
) -> DataFrame:
    """Stream-static PIP join: the static polygon side is exploded to its
    covering cells and broadcast; each micro-batch equi-joins on the cell id
    then refines with the JVM ray-cast expression. Stateless — no watermark,
    no state store; identical plan shape to the batch flagship."""
    poly_cells = polys.select(
        F.col(poly_id).alias("__pid"),
        F.col(xs).alias("__xs"),
        F.col(ys).alias("__ys"),
        F.explode(cells.cover_polygon(F.col(xs), F.col(ys), res)).alias("__cell"),
    )
    pts = stream.withColumn("__cell", cells.cell_id(F.col(lon), F.col(lat), res))
    cand = pts.join(F.broadcast(poly_cells), "__cell", "inner")
    inside = pip_expr(F.col(lon), F.col(lat), F.col("__xs"), F.col("__ys"))
    return (
        cand.filter(inside)
        .drop("__xs", "__ys", "__cell")
        .withColumnRenamed("__pid", poly_id)
    )


def start_assignment_sink(
    assigned: DataFrame,
    out_path: str,
    checkpoint_path: str,
    lineage_path: str | None = None,
    available_now: bool = True,
):
    """foreachBatch sink: append assignment rows; optionally append one
    lineage row (batch_id, rows, checksum) per micro-batch — the streaming
    analog of the batch resume manifest's per-partition metrics."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        batch_df.write.mode("append").parquet(out_path)
        if lineage_path is not None:
            spark = batch_df.sparkSession
            stats = batch_df.agg(
                F.count(F.lit(1)).alias("rows"),
                F.coalesce(
                    F.bit_xor(F.xxhash64(*batch_df.columns)), F.lit(0)
                ).alias("checksum"),
            ).collect()[0]
            spark.createDataFrame(
                [(int(batch_id), int(stats["rows"]), int(stats["checksum"]))],
                "batch_id long, rows long, checksum long",
            ).write.mode("append").parquet(lineage_path)
        batch_df.unpersist()

    w = (
        assigned.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
