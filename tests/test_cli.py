"""CLI dispatcher end-to-end (`dispatcher.py:6-40` parity surface): each
command is driven in-process via main(argv) against parquet fixtures."""

from __future__ import annotations

import json

import pyspark.sql.functions as F

from geo_epic_spark import synth
from geo_epic_spark.__main__ import main


def test_cli_sites_assign_and_resume_run(spark, tmp_path, capsys):
    imgs_p = str(tmp_path / "imgs")
    polys_p = str(tmp_path / "polys")
    synth.images_meta_df(spark, 2000).select("i", "cx", "cy").write.parquet(imgs_p)
    synth.fields_df(spark, 50).select("poly_id", "xs", "ys").write.parquet(polys_p)

    out1 = str(tmp_path / "o1")
    assert main(["sites", "assign", "--images", imgs_p, "--polys", polys_p,
                 "--out", out1]) == 0
    n1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])["rows"]
    assert n1 > 0

    # resumable run: second invocation with the same manifest does nothing
    out2, man = str(tmp_path / "o2"), str(tmp_path / "man")
    assert main(["workspace", "run", "--images", imgs_p, "--polys", polys_p,
                 "--out", out2, "--manifest", man, "--partitions", "4"]) == 0
    first = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert first["partitions"] == 4 and first["rows_out"] == n1
    assert main(["workspace", "run", "--images", imgs_p, "--polys", polys_p,
                 "--out", out2, "--manifest", man, "--partitions", "4"]) == 0
    second = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert second["partitions"] == 0 and second["rows_out"] == 0


def test_cli_validate_dedup_media(spark, tmp_path, capsys):
    # validate: plant one bad rh row; daily parquet WITHOUT month/day columns
    daily_p = str(tmp_path / "daily")
    w = synth.weather_daily_df(spark, 1, 365).select(
        "cell_id", "date", "srad", "tmax", "tmin", "prcp",
        F.when(F.dayofmonth("date") == 1, 5.0).otherwise(F.col("rh")).alias("rh"),
        "ws",
    )
    w.write.parquet(daily_p)
    rc = main(["workspace", "validate", "--daily", daily_p, "--by", "cell_id",
               "--start", "2019", "--end", "2019"])
    out = capsys.readouterr().out.strip().splitlines()
    assert rc == 1  # violations found -> nonzero exit
    assert json.loads(out[-1])["violations"] >= 1

    docs_p = str(tmp_path / "docs")
    spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e"), (3, "x y z w v")],
        "doc_id long, text string",
    ).write.parquet(docs_p)
    dd = str(tmp_path / "dd")
    assert main(["dedup", "exact", "--docs", docs_p, "--out", dd]) == 0
    assert json.loads(capsys.readouterr().out.strip().splitlines()[-1])["rows"] == 2

    from geo_epic_spark.media import synth_audio_df
    aud_p, af = str(tmp_path / "aud"), str(tmp_path / "af")
    synth_audio_df(spark, 5).write.parquet(aud_p)
    assert main(["media", "audio-features", "--audio", aud_p, "--out", af]) == 0
    assert json.loads(capsys.readouterr().out.strip().splitlines()[-1])["rows"] == 5
