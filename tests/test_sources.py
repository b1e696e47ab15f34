"""Fixed-width scan/sink (S5/S11) and TableIO partitioned writer."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pytest

from geo_epic_spark.sources.fixedwidth import (
    DLY_LAYOUT, OPC_LAYOUT, format_fwf, read_fwf,
)
from geo_epic_spark.sources.tables import TableIO, iceberg_available


def _dly_lines(n=10):
    # replicate the reference's %6.2f-ish fixed-width daily weather layout
    lines = []
    for d in range(n):
        y, m, day = 2020, 1, d + 1
        vals = [15.0 + d, 10.0 + d, -2.0 + d, 0.5 * d, 0.6, 3.5]
        line = f"{y:6d}{m:4d}{day:4d}" + "".join(f"{v:6.2f}"[:6].rjust(6) for v in vals)
        lines.append(line)
    return lines


def test_read_fwf_dly_roundtrip(spark, tmp_path):
    p = tmp_path / "w.DLY"
    p.write_text("\n".join(_dly_lines(10)) + "\n")
    df = read_fwf(spark, str(p), DLY_LAYOUT).toPandas().sort_values("day")
    assert len(df) == 10
    assert df["year"].unique().tolist() == [2020]
    np.testing.assert_allclose(df["srad"].to_numpy(), 15.0 + np.arange(10))
    np.testing.assert_allclose(df["ws"].to_numpy(), 3.5)


def test_read_fwf_skiprows_opc(spark, tmp_path):
    body = "  1  3 15  100    1    2    0" + "    1.50" * 8
    p = tmp_path / "s.OPC"
    p.write_text("header line 1\nheader line 2\n" + body + "\n")
    df = read_fwf(spark, str(p), OPC_LAYOUT, skiprows=2).toPandas()
    assert len(df) == 1
    r = df.iloc[0]
    assert (r["Yid"], r["Mn"], r["Dy"], r["CODE"]) == (1, 3, 15, 100)
    assert r["OPV8"] == 1.5


def test_format_fwf_parses_back(spark, tmp_path):
    pdf = pd.DataFrame({
        "year": [2020], "month": [2], "day": [29],
        "srad": [12.34], "tmax": [5.0], "tmin": [-3.25],
        "prcp": [0.0], "rh": [0.66], "ws": [3.5],
    })
    df = spark.createDataFrame(pdf)
    out = format_fwf(df, DLY_LAYOUT)
    path = str(tmp_path / "out")
    out.write.mode("overwrite").text(path)
    back = read_fwf(spark, path, DLY_LAYOUT).toPandas()
    assert len(back) == 1
    assert back.iloc[0]["tmin"] == -3.25
    assert back.iloc[0]["year"] == 2020


def test_tableio_parquet_fallback_partition_overwrite(spark, tmp_path):
    # no Iceberg jar in this sandbox -> parquet path engages
    assert not iceberg_available(spark)
    io = TableIO(spark, root=str(tmp_path))
    df1 = spark.createDataFrame(pd.DataFrame({"p": ["a", "a", "b"], "v": [1, 2, 3]}))
    io.append(df1, "t", partition_by=["p"])
    assert io.read("t").count() == 3
    # overwrite only partition 'a'; 'b' rows must survive
    df2 = spark.createDataFrame(pd.DataFrame({"p": ["a"], "v": [9]}))
    io.overwrite_partitions(df2, "t", partition_by=["p"])
    got = io.read("t").toPandas().sort_values("v")
    assert got[got["p"] == "b"]["v"].tolist() == [3]
    assert got[got["p"] == "a"]["v"].tolist() == [9]


def test_read_fwf_skiprows_multifile(spark, tmp_path):
    """Headers must be dropped per FILE, not just for the first file of a
    directory read (round-2 advisor finding: a global monotonic-id filter
    only strips the first partition's lines, so later files' header rows
    survive whenever their first field casts to int)."""
    d = tmp_path / "opcdir"
    d.mkdir()
    body_a = "  1  3 15  100    1    2    0" + "    1.50" * 8
    body_b = "  2  4 16  200    1    2    0" + "    2.50" * 8
    # header lines whose first 3 chars parse as int — the poison case
    hdr = "999 CROP ROTATION SCHEDULE\n  7 operations follow\n"
    (d / "a.OPC").write_text(hdr + body_a + "\n")
    (d / "b.OPC").write_text(hdr + body_b + "\n")
    df = read_fwf(spark, str(d), OPC_LAYOUT, skiprows=2).toPandas().sort_values("Yid")
    assert len(df) == 2, df
    assert df["Yid"].tolist() == [1, 2]
    assert df["CODE"].tolist() == [100, 200]


def test_acm_fixture_roundtrip(spark, tmp_path):
    """Reference ACM output layout (`geoEpic/io/outputs.py:150-160`): the
    reference parses 27 widths then assigns a 31-name header — ACM_LAYOUT
    resolves that inconsistency as 31 columns / widths [5,5,5]+[9]*28 (r3
    ADVICE). A full 31-column fixture reads back exactly, and a truncated
    27-column file (the reference widths list taken literally) still parses
    with the four trailing columns null."""
    from geo_epic_spark.sources.fixedwidth import ACM_LAYOUT, read_fwf

    assert [w for _, w, _ in ACM_LAYOUT] == [5, 5, 5] + [9] * 28
    assert [n for n, _, _ in ACM_LAYOUT][-4:] == ["TOC", "APBC", "TAP", "TNO3"]
    hdr = "   Y  RT# PRCP" + "".join(f"{n:>9}" for n, _, _ in ACM_LAYOUT[3:])
    row1 = f"{2020:>5}{1:>5}{32.1:>5}" + "".join(
        f"{(i + 1) * 1.25:>9}" for i in range(28))
    row2 = f"{2021:>5}{1:>5}{28.4:>5}" + "".join(
        f"{(i + 2) * 0.5:>9}" for i in range(28))
    p = tmp_path / "site1.ACM"
    p.write_text(hdr + "\n" + row1 + "\n" + row2 + "\n")
    df = read_fwf(spark, str(p), ACM_LAYOUT, skiprows=1).toPandas()
    assert df["Y"].tolist() == [2020, 2021]
    assert df["ET"].tolist() == [2.5, 1.5]   # ET is the 2nd 9-wide column
    assert df["OCPD"].tolist() == [30.0, 12.5]
    assert df["TNO3"].tolist() == [35.0, 14.5]  # 28th 9-wide column
    # truncated file (reference widths taken literally): trailing cols null
    p27 = tmp_path / "short.ACM"
    p27.write_text(
        hdr[: 15 + 9 * 24] + "\n" + row1[: 15 + 9 * 24] + "\n"
    )
    short = read_fwf(spark, str(p27), ACM_LAYOUT, skiprows=1).toPandas()
    assert short["OCPD"].tolist() == [30.0]
    assert short["TOC"].isna().all() and short["TNO3"].isna().all()


def test_read_epic_output_acy_dgn(spark, tmp_path):
    """Whitespace-separated EPIC output families (ACY/DGN): skiprows junk,
    header-line column names, numeric inference, Y/M/D -> Date assembly and
    the DGN AGB=BIOM-RW derived column (`geoEpic/io/outputs.py:15-21,69-84`).
    Read distributed, per-file header discipline."""
    from geo_epic_spark.sources.fixedwidth import read_epic_output

    junk = "".join(f"junk header line {i}\n" for i in range(10))
    acy = junk + "YR CPNM YLDG YLDF BIOM\n" \
        "2020 CORN 9.13 0.00 21.50\n2021 SOYB 3.20 0.10 8.75\n"
    (tmp_path / "a.ACY").write_text(acy)
    df = read_epic_output(spark, str(tmp_path / "a.ACY"), "ACY").toPandas()
    assert df["CPNM"].tolist() == ["CORN", "SOYB"]    # string survives
    assert df["YLDG"].tolist() == [9.13, 3.20]        # numeric cast
    dgn = junk + "Y M D BIOM RW LAI\n" \
        "2020 5 1 12.5 2.5 3.1\n2020 5 2 13.0 2.6 3.3\n"
    d = tmp_path / "dgndir"
    d.mkdir()
    (d / "s1.DGN").write_text(dgn)
    (d / "s2.DGN").write_text(dgn.replace("12.5", "20.0"))
    out = read_epic_output(spark, str(d), "DGN").toPandas()
    assert len(out) == 4                              # headers dropped per file
    assert set(out["Date"]) == {"2020-05-01", "2020-05-02"}
    assert sorted(out["AGB"]) == [10.0, 10.4, 10.4, 17.5]


def test_read_epic_output_inference_hardening(spark, tmp_path):
    """r3 ADVICE fixes: (a) a numeric 'header' (wrong skiprows / headerless
    file) raises instead of silently degrading every column to string;
    (b) inference samples many body rows, so a column that is numeric in
    row 1 but mixed later stays string instead of casting the strings to
    NULL; (c) a multi-file dir where one file has an EMPTY body still
    infers from the other file's rows, never from a header line."""
    import pytest

    from geo_epic_spark.sources.fixedwidth import read_epic_output

    junk = "".join(f"junk header line {i}\n" for i in range(10))
    # (a) numeric header
    bad = junk + "2020 5 1 12.5\n2020 5 2 13.0\n"
    (tmp_path / "bad.ACY").write_text(bad)
    with pytest.raises(ValueError, match="does not look like a header"):
        read_epic_output(spark, str(tmp_path / "bad.ACY"), "ACY")
    # (b) mixed column: first row numeric, third row a flag string
    mixed = junk + "YR CPNM YLDG\n2020 CORN 9.13\n2021 SOYB 3.20\n2022 WWHT NA\n"
    (tmp_path / "mix.ACY").write_text(mixed)
    got = read_epic_output(spark, str(tmp_path / "mix.ACY"), "ACY").toPandas()
    assert got["YLDG"].tolist() == ["9.13", "3.20", "NA"]  # stays string
    assert got["YR"].tolist() == [2020.0, 2021.0, 2022.0]
    # (c) empty-body file alongside a populated one
    d = tmp_path / "acydir"
    d.mkdir()
    (d / "full.ACY").write_text(junk + "YR CPNM YLDG\n2020 CORN 9.13\n")
    (d / "empty.ACY").write_text(junk + "YR CPNM YLDG\n")
    out = read_epic_output(spark, str(d), "ACY").toPandas()
    assert out["YLDG"].tolist() == [9.13]                  # numeric survives
    # and disagreeing headers across files raise
    (d / "other.ACY").write_text(junk + "YR CPNM OTHER\n2020 CORN 1.0\n")
    with pytest.raises(ValueError, match="disagree on the header"):
        read_epic_output(spark, str(d), "ACY")


def test_read_layer_prunes_to_named_indexes(spark, tmp_path):
    """S3: read_gdb_layer(columns, names) parity (`utils/misc.py:9-41`) —
    column-index projection with rename, and the parquet ReadSchema holds
    ONLY the selected columns (the pruned read IS the semantic)."""
    from geo_epic_spark.plans.checks import read_schemas
    from geo_epic_spark.sources.tables import read_layer

    wide = spark.range(100).select(
        "id", *[(F.col("id") * (i + 1)).alias(f"w{i}") for i in range(1, 12)]
    )
    path = str(tmp_path / "layer")
    wide.write.parquet(path)
    out = read_layer(spark, path, [2, 9], ["depth", "om"])
    assert out.columns == ["depth", "om"]
    schemas = read_schemas(out)
    assert schemas and all("w2" in s and "w9" in s and "w3" not in s
                           and "id" not in s for s in schemas)
    rows = {r.depth: r.om for r in out.collect()}
    assert rows[3 * 7] == 10 * 7  # id=7: w2=id*3, w9=id*10
    with pytest.raises(ValueError, match="same length"):
        read_layer(spark, path, [1, 2], ["only_one"])
