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
# reference OUTPUT layout (`geoEpic/io/outputs.py:150-160`). NOTE: the
# reference loader is self-inconsistent — it parses widths [5,5,5]+[9]*24
# (27 columns) and then assigns a 31-name header ("Y RT# PRCP ... OCPD TOC
# APBC TAP TNO3"), an assignment pandas would reject on a 27-column frame;
# real ACM files therefore carry the four trailing columns and the widths
# list is the reference's bug (r3 ADVICE). This layout resolves the
# inconsistency the other way: all 31 names with widths [5,5,5]+[9]*28.
# One deliberate rename: the reference's "RT#" is "RT" here ('#' forces
# backtick quoting in every SQL surface).
_ACM_NAMES = [
    "Y", "RT", "PRCP", "ET_pot", "ET", "Q", "SSF", "PRK", "CVF", "MUSS",
    "YW", "GMN", "NMN", "NFIX", "NITR", "AVOL", "DN", "YON", "QNO3", "SSFN",
    "PRKN", "MNP", "YP", "QAP", "PRKP", "LIME", "OCPD", "TOC", "APBC",
    "TAP", "TNO3",
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
        # try_cast, not cast: a field past the end of a short line is '',
        # which ANSI cast rejects — pd.read_fwf semantics are NaN there
        # (e.g. an ACM file truncated to the reference's 27-width list)
        cols.append(
            F.trim(F.substring(F.col(value), pos, width)).try_cast(typ).alias(name)
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
    driver-side from the header + up to 20 sampled body lines); Y/M/D
    families get the
    assembled ``Date`` string the reference loaders add. The scan itself is
    a distributed regex-split over ``spark.read.text`` — no Python per row."""
    skiprows, has_date = EPIC_OUTPUT_KINDS[kind.upper()]
    # header = the (skiprows+1)-th line of each file — addressed by its
    # per-file row number, never by a bare limit() that could surface a
    # mid-file data row or (multi-file dirs) another file's body.
    # Cost note (r4 advisory nit): this per-file window is a sort keyed on
    # input_file_name(), which exists only to locate line N of each file.
    # It is acceptable here because EPIC output files are small (a few
    # hundred rows each — the reference writes one per site) and this is a
    # cold ingest path; text files are also read as ONE split per file at
    # these sizes, so the sort is per-partition-local in practice. For a
    # huge directory the header text is constant across files, so the
    # shuffle-free alternative is: read ONE file's header driver-side,
    # then filter body rows by `value != header_text` — not taken because
    # it cannot detect files that DISAGREE on the header, which this path
    # deliberately treats as an error (see the len(headers) > 1 check).
    w = Window.partitionBy(F.input_file_name()).orderBy(
        F.monotonically_increasing_id()
    )
    numbered = spark.read.text(path).withColumn("__rn", F.row_number().over(w))
    headers = [
        r["value"]
        for r in numbered.filter(F.col("__rn") == skiprows + 1)
        .select("value").distinct().collect()
    ]
    if not headers:
        raise ValueError(f"read_epic_output: no rows in {path}")
    if len(headers) > 1:
        raise ValueError(
            f"read_epic_output: files in {path} disagree on the header "
            f"line: {headers[:3]}"
        )
    names = headers[0].split()

    def _numeric(tok: str) -> bool:
        try:
            float(tok)
            return True
        except ValueError:
            return False

    # a header is column NAMES: at least one token must be non-numeric.
    # (r3 ADVICE: a wrong skiprows — or a headerless file — used to degrade
    # every column to string silently; fail loudly instead.)
    if names and all(_numeric(t) for t in names):
        raise ValueError(
            f"read_epic_output: line {skiprows + 1} of {path} does not look "
            f"like a header (every token is numeric): {headers[0]!r}"
        )
    # body = everything after skiprows junk lines + 1 header line, per file
    body = numbered.filter(F.col("__rn") > skiprows + 1).drop("__rn")
    # type inference from up to 20 BODY rows (headers are already stripped,
    # so a multi-file dir can never leak another file's header into the
    # sample; r3 ADVICE: a single sampled row silently cast mixed columns
    # to NULL-on-parse-failure). A column is numeric only when every
    # sampled value for it parses.
    sampled = [r["value"].split() for r in body.limit(20).collect()]
    toks = F.split(F.regexp_replace(F.trim("value"), r"\s+", " "), " ")
    cols = []
    for i, name in enumerate(names):
        c = F.element_at(toks, i + 1)
        vals = [row[i] for row in sampled if i < len(row)]
        if vals and all(_numeric(v) for v in vals):
            # try_cast: a non-numeric straggler PAST the 20-row sample
            # becomes NULL rather than failing the whole scan under ANSI
            c = c.try_cast("double")
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
