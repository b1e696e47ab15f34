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

# EPIC annual carbon/management output (.ACM): the one truly fixed-width
# reference OUTPUT layout (`geoEpic/io/outputs.py:155-160`,
# widths = [5,5,5] + [9]*24 with the 31-name header the loader re-applies)
_ACM_NAMES = [
    "Y", "RT", "PRCP", "ET_pot", "ET", "Q", "SSF", "PRK", "CVF", "MUSS",
    "YW", "GMN", "NMN", "NFIX", "NITR", "AVOL", "DN", "YON", "QNO3", "SSFN",
    "PRKN", "MNP", "YP", "QAP", "PRKP", "LIME", "OCPD",
]
ACM_LAYOUT = (
    [("Y", 5, "int"), ("RT", 5, "int"), ("PRCP", 5, "double")]
    + [(n, 9, "double") for n in _ACM_NAMES[3:]]
)

# EPIC whitespace-separated output families (`geoEpic/io/outputs.py`): rows
# start after ``skiprows`` header lines, the first kept line names the
# columns; families with Y/M/D columns get the assembled Date the reference
# loaders add.
EPIC_OUTPUT_KINDS = {
    # kind: (skiprows, has_ymd_date)   — outputs.py:19/47/72/103/131
    "ACY": (10, False),
    "DWC": (10, True),
    "DGN": (10, True),
    "DTP": (12, True),
    "DCS": (12, True),
}


def _skip_file_header(df: DataFrame, skiprows: int) -> DataFrame:
    """Drop the first N lines of EVERY input file: line numbers come from a
    window on ``input_file_name`` ordered by ``monotonically_increasing_id``
    (which preserves each file's line order — split/partition indexes follow
    file offset order). A bare global-id filter would only strip the first
    file's headers when the path is a directory/glob."""
    w = Window.partitionBy(F.input_file_name()).orderBy(
        F.monotonically_increasing_id()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") > skiprows)
        .drop("__rn")
    )


def parse_fwf_lines(
    df: DataFrame, layout: list[tuple[str, int, str]], value: str = "value"
) -> DataFrame:
    """The fixed-width parse kernel: one substring+trim+cast per column, all
    JVM-side whole-stage codegen — factored out of ``read_fwf`` so the
    kernel is drivable (and oracle-checkable) on any line column, not just
    file scans."""
    cols = []
    pos = 1  # substring() is 1-indexed
    for name, width, typ in layout:
        cols.append(
            F.trim(F.substring(F.col(value), pos, width)).cast(typ).alias(name)
        )
        pos += width
    out = df.select(*cols)
    # pd.read_fwf drops all-blank trailing lines; mirror by requiring the
    # first field to parse
    first = layout[0][0]
    return out.filter(F.col(first).isNotNull())


def read_fwf(
    spark: SparkSession,
    path: str,
    layout: list[tuple[str, int, str]],
    skiprows: int = 0,
) -> DataFrame:
    """Distributed fixed-width read (``skiprows`` drops per-FILE headers;
    OPC has 2, ACM has 1). skiprows=0 stays a pure codegen scan (no
    shuffle)."""
    df = spark.read.text(path)
    if skiprows:
        df = _skip_file_header(df, skiprows)
    return parse_fwf_lines(df, layout)


def read_epic_output(spark: SparkSession, path: str, kind: str) -> DataFrame:
    """Reference EPIC output reader (`geoEpic/io/outputs.py` ACY/DWC/DGN/
    DTP/DCS families): whitespace-separated, ``skiprows`` junk lines, then a
    header line naming the columns. Columns are cast to double when every
    sampled value parses (the pandas type-inference analog, decided once
    driver-side from the header + first data line); Y/M/D families get the
    assembled ``Date`` string the reference loaders add. The scan itself is
    a distributed regex-split over ``spark.read.text`` — no Python per row."""
    skiprows, has_date = EPIC_OUTPUT_KINDS[kind.upper()]
    lines = _skip_file_header(spark.read.text(path), skiprows)
    head = lines.limit(2).collect()
    if not head:
        raise ValueError(f"read_epic_output: no rows in {path}")
    names = head[0]["value"].split()
    sample = head[1]["value"].split() if len(head) > 1 else []

    def _numeric(tok: str) -> bool:
        try:
            float(tok)
            return True
        except ValueError:
            return False

    # body = everything after skiprows junk lines + 1 header line, per file
    body = _skip_file_header(spark.read.text(path), skiprows + 1)
    toks = F.split(F.regexp_replace(F.trim("value"), r"\s+", " "), " ")
    cols = []
    for i, name in enumerate(names):
        c = F.element_at(toks, i + 1)
        if i < len(sample) and _numeric(sample[i]):
            c = c.cast("double")
        cols.append(c.alias(name))
    out = body.select(*cols).filter(F.col(names[0]).isNotNull())
    if has_date and all(c in names for c in ("Y", "M", "D")):
        out = out.withColumn(
            "Date",
            F.date_format(
                F.make_date(
                    F.col("Y").cast("int"), F.col("M").cast("int"),
                    F.col("D").cast("int"),
                ),
                "yyyy-MM-dd",
            ),
        )
    if kind.upper() == "DGN" and "BIOM" in names and "RW" in names:
        # outputs.py:82-84 derived above-ground biomass
        out = out.withColumn("AGB", F.col("BIOM") - F.col("RW"))
    return out


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
