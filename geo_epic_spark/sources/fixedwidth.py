"""Fixed-width text scans/sinks (SURVEY S5/S11).

The reference persists daily weather (DLY), operation schedules (OPC), soil
(SOL) and parameter files as fixed-width text read with ``pd.read_fwf``
(`geoEpic/io/inputs.py:213-218`, `geoEpic/io/opc.py:32-36`). Here the scan is
``spark.read.text`` + ``substring`` column slicing — a distributed, splittable
scan that stays in whole-stage codegen; no Python ever touches the rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# (name, width, type) layouts mirrored from the reference loaders
DLY_LAYOUT = [
    ("year", 6, "int"), ("month", 4, "int"), ("day", 4, "int"),
    ("srad", 6, "double"), ("tmax", 6, "double"), ("tmin", 6, "double"),
    ("prcp", 6, "double"), ("rh", 6, "double"), ("ws", 6, "double"),
]  # io/inputs.py:212-218 base_widths
OPC_LAYOUT = [
    ("Yid", 3, "int"), ("Mn", 3, "int"), ("Dy", 3, "int"),
    ("CODE", 5, "int"), ("TRAC", 5, "int"), ("CRP", 5, "int"),
    ("XMTU", 5, "int"),
] + [(f"OPV{i}", 8, "double") for i in range(1, 9)]  # io/opc.py:32-36


def read_fwf(
    spark: SparkSession,
    path: str,
    layout: list[tuple[str, int, str]],
    skiprows: int = 0,
) -> DataFrame:
    """Distributed fixed-width read: one substring+cast per column, all
    JVM-side. ``skiprows`` drops the first N header lines of EVERY input file
    (OPC has 2): line numbers are computed per file via a window on
    ``input_file_name`` ordered by ``monotonically_increasing_id`` (which
    preserves each file's line order — split/partition indexes follow file
    offset order). A bare global-id filter would only strip the first file's
    headers when ``path`` is a directory/glob of OPC files. skiprows=0 stays
    a pure codegen scan (no shuffle)."""
    df = spark.read.text(path)
    if skiprows:
        w = Window.partitionBy(F.input_file_name()).orderBy(
            F.monotonically_increasing_id()
        )
        df = (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") > skiprows)
            .drop("__rn")
        )
    cols = []
    pos = 1  # substring() is 1-indexed
    for name, width, typ in layout:
        cols.append(
            F.trim(F.substring(F.col("value"), pos, width)).cast(typ).alias(name)
        )
        pos += width
    out = df.select(*cols)
    # pd.read_fwf drops all-blank trailing lines; mirror by requiring the
    # first field to parse
    first = layout[0][0]
    return out.filter(F.col(first).isNotNull())


def format_fwf(df: DataFrame, layout: list[tuple[str, int, str]],
               decimals: int = 2) -> DataFrame:
    """Fixed-width sink formatting (S11, `io/inputs.py:281-286` '%8.2f'-style):
    produce a single 'value' string column ready for ``df.write.text``.
    Numeric columns are right-aligned in their field width."""
    parts = []
    for name, width, typ in layout:
        c = F.col(name)
        if typ == "double":
            s = F.format_number(c, decimals).cast("string")
            s = F.regexp_replace(s, ",", "")
        else:
            s = c.cast("string")
        parts.append(F.lpad(s, width, " "))
    return df.select(F.concat(*parts).alias("value"))
