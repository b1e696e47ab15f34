"""Partitioned table IO behind one interface: Iceberg when a catalog is
configured, identically-partitioned Parquet otherwise (SURVEY §7 risk
register: "if the Iceberg runtime jar is absent, fall back to partitioned
Parquet with identical partition columns and keep the writer behind one
interface").

The north rule targets Iceberg tables of image+caption pairs; every engine
operator consumes/produces plain DataFrames, so only this module knows which
format backs a table name.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def iceberg_available(spark: SparkSession) -> bool:
    """True iff an Iceberg SparkCatalog is on the classpath AND a spark_catalog
    / named catalog is configured for it."""
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.SparkCatalog"
        )
    except Exception:
        return False
    confs = spark.sparkContext.getConf().getAll()
    return any(k.startswith("spark.sql.catalog.") and "iceberg" in v.lower()
               for k, v in confs)


def read_layer(
    spark: SparkSession,
    path: str,
    columns: list[int],
    names: list[str],
    fmt: str = "parquet",
) -> DataFrame:
    """S3 column-pruned layer scan (`geoEpic/utils/misc.py:9-41`
    ``read_gdb_layer(gdb, layer, columns, names)``): project a wide layer
    down to the requested column INDEXES, renamed — the reference's
    column-index contract for ESRI GDB layers, where reading all fields of a
    state-level gSSURGO layer is the 30-minute path and the pruned read is
    the semantic. Declaring the projection at scan construction lets
    Catalyst prune the file ReadSchema to exactly these columns; the wide
    layer is never materialized (q_pruned_scan asserts this in-query)."""
    if len(columns) != len(names):
        raise ValueError("columns and names must have the same length")
    df = spark.read.format(fmt).load(path)
    all_cols = df.columns
    return df.select(
        *[F.col(all_cols[i]).alias(n) for i, n in zip(columns, names)]
    )


class TableIO:
    """Read/write partitioned tables by name.

    Iceberg mode: ``name`` is a catalog table identifier; writes use the v2
    ``writeTo`` API (append / overwritePartitions — the dynamic-overwrite the
    resume manifest relies on). Parquet mode: ``name`` is a directory under
    ``root``; writes use partitionOverwriteMode=dynamic for the same
    idempotent-per-partition semantics.
    """

    def __init__(self, spark: SparkSession, root: str = "", force_parquet: bool = False):
        self.spark = spark
        self.root = root.rstrip("/")
        self.iceberg = (not force_parquet) and iceberg_available(spark)

    def _path(self, name: str) -> str:
        return f"{self.root}/{name}" if self.root else name

    def read(self, name: str) -> DataFrame:
        if self.iceberg:
            return self.spark.read.table(name)
        return self.spark.read.parquet(self._path(name))

    def append(self, df: DataFrame, name: str, partition_by: list[str] | None = None) -> None:
        if self.iceberg:
            df.writeTo(name).append()
            return
        w = df.write.mode("append")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self._path(name))

    def overwrite_partitions(self, df: DataFrame, name: str,
                             partition_by: list[str]) -> None:
        """Replace exactly the partitions present in ``df`` (idempotent
        re-run of a subset; everything else untouched)."""
        if self.iceberg:
            df.writeTo(name).overwritePartitions()
            return
        (
            df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*partition_by)
            .parquet(self._path(name))
        )
