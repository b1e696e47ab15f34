"""Time-series operator parity vs a pandas reimplementation of the reference
semantics (`io/inputs.py:293-332` to_monthly, `io/opc.py:222-290` PHU)."""

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pytest

from geo_epic_spark import synth
from geo_epic_spark.operators.timeseries import (
    heat_units,
    interpolate_daily,
    missing_dates,
    monthly_normals,
    pair_seasons,
    rolling_median,
)

DAYS_IN_MONTH = [31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31]


@pytest.fixture(scope="module")
def daily(spark):
    return synth.weather_daily_df(spark, 3, 730).cache()


def _pandas_to_monthly(pdf: pd.DataFrame) -> pd.DataFrame:
    """Faithful pandas port of DLY.to_monthly (`io/inputs.py:293-332`)."""
    pdf = pdf.sort_values("date").reset_index(drop=True)
    pdf["month"] = pd.to_datetime(pdf["date"]).dt.month
    grouped = pdf.groupby("month")
    ss = grouped[["srad", "tmax", "tmin", "prcp", "rh", "ws"]].mean()
    ss["RMO"] = ss["prcp"] * np.array(DAYS_IN_MONTH)
    ss["SDTMX"] = grouped["tmax"].std()
    ss["SDTMN"] = grouped["tmin"].std()
    ss["RST2"] = grouped["prcp"].std()
    ss["DAYP"] = grouped.apply(lambda x: (x["prcp"] > 0.5).sum() / len(x), include_groups=False)
    ss["RST3"] = 3 * abs(ss["RMO"] - ss["RMO"].median()) / ss["RST2"]
    # reference writes np.diff(bool)==-1 (`io/inputs.py:311`) which is a no-op
    # on numpy>=1.13 (bool diff is XOR); the documented intent is the count of
    # wet->dry transitions, i.e. int diff == -1 — implemented here and in Spark.
    ss["PRW1"] = grouped.apply(
        lambda x: np.sum(np.diff((x["prcp"] > 0.5).astype(int)) == -1) / len(x),
        include_groups=False,
    )
    ss["PRW2"] = grouped.apply(
        lambda x: np.sum((x["prcp"].fillna(0) > 0.5).shift(fill_value=False) & (x["prcp"].fillna(0) > 0.5)) / len(x),
        include_groups=False,
    )
    return ss


def test_monthly_normals_vs_pandas(spark, daily):
    got = monthly_normals(daily, by=["cell_id"]).toPandas()
    pdf = daily.toPandas()
    for cid in [0, 1, 2]:
        want = _pandas_to_monthly(pdf[pdf.cell_id == cid])
        g = got[got.cell_id == cid].set_index("month").sort_index()
        for col_g, col_w in [
            ("OBMX", "tmax"), ("OBMN", "tmin"), ("OBSL", "srad"), ("RH", "rh"),
            ("RMO", "RMO"), ("SDTMX", "SDTMX"), ("SDTMN", "SDTMN"), ("RST2", "RST2"),
            ("DAYP", "DAYP"), ("RST3", "RST3"), ("PRW1", "PRW1"), ("PRW2", "PRW2"),
        ]:
            np.testing.assert_allclose(
                g[col_g].to_numpy(), want[col_w].to_numpy(), rtol=1e-9,
                err_msg=f"{col_g} mismatch for cell {cid}",
            )


def test_heat_units_vs_pandas(spark, daily):
    seasons = spark.createDataFrame(
        [
            (1, 0, "2019-04-15", "2019-10-01", 10.0),
            (2, 1, "2019-05-01", "2019-09-15", 8.0),
            (3, 2, "2020-04-20", "2020-10-10", 12.0),
        ],
        "season_id long, cell_id long, plantation_date string, harvest_date string, tbs double",
    ).select(
        "season_id", "cell_id",
        F.col("plantation_date").cast("date").alias("plantation_date"),
        F.col("harvest_date").cast("date").alias("harvest_date"),
        "tbs",
    )
    got = heat_units(daily, seasons, by=["cell_id"]).toPandas().set_index("season_id")
    pdf = daily.toPandas()
    pdf["date"] = pd.to_datetime(pdf["date"])
    for sid, cid, pdt, hdt, tbs in [
        (1, 0, "2019-04-15", "2019-10-01", 10.0),
        (2, 1, "2019-05-01", "2019-09-15", 8.0),
        (3, 2, "2020-04-20", "2020-10-10", 12.0),
    ]:
        sub = pdf[(pdf.cell_id == cid) & (pdf.date > pdt) & (pdf.date < hdt)]
        want = (0.5 * (sub.tmax + sub.tmin) - tbs).clip(lower=0).sum()
        assert abs(got.loc[sid, "phu"] - want) < 1e-8


def test_pair_seasons_first_harvest(spark):
    ops = spark.createDataFrame(
        [
            ("plant", "corn", "2019-04-01"),
            ("harvest", "corn", "2019-09-01"),
            ("harvest", "corn", "2019-10-01"),
            ("plant", "corn", "2019-09-15"),
            ("plant", "soy", "2019-05-01"),  # no harvest -> dropped
            ("harvest", "soy", "2019-04-30"),  # before plant -> not eligible
        ],
        "code string, crop string, date string",
    ).withColumn("date", F.col("date").cast("date"))
    got = pair_seasons(ops).toPandas().sort_values("plantation_date")
    assert len(got) == 2
    assert str(got.iloc[0].harvest_date) == "2019-09-01"
    assert str(got.iloc[1].harvest_date) == "2019-10-01"


def test_missing_dates_anti_join(spark):
    df = spark.createDataFrame(
        [(1, "2019-01-01"), (1, "2019-01-02"), (1, "2019-01-05"), (2, "2019-01-01")],
        "cell_id long, date string",
    ).withColumn("date", F.col("date").cast("date"))
    got = missing_dates(df, ["cell_id"]).toPandas()
    assert sorted(str(d) for d in got[got.cell_id == 1].date) == ["2019-01-03", "2019-01-04"]
    assert (got.cell_id == 2).sum() == 0


def test_rolling_median_centered(spark):
    df = spark.createDataFrame(
        [(1, i, float(v)) for i, v in enumerate([1, 100, 3, 4, 5, 6, 7])],
        "g long, t long, v double",
    )
    got = rolling_median(df, "v", "t", ["g"], half_window=1).toPandas().sort_values("t")
    want = pd.Series([1.0, 100, 3, 4, 5, 6, 7]).rolling(3, center=True, min_periods=1).median()
    np.testing.assert_allclose(got.v_rmed.to_numpy(), want.to_numpy())


def test_interpolate_daily_linear(spark):
    df = spark.createDataFrame(
        [(1, "2019-01-01", 10.0), (1, "2019-01-05", 18.0), (1, "2019-01-07", None)],
        "g long, date string, v double",
    ).withColumn("date", F.col("date").cast("date"))
    got = (
        interpolate_daily(df, "v", ["g"]).toPandas().sort_values("date").reset_index(drop=True)
    )
    np.testing.assert_allclose(got.v_interp.to_numpy(), [10, 12, 14, 16, 18, 18, 18])


def test_edit_crop_season_stretch_and_adjust(spark):
    """`io/opc.py:431-498` parity on a hand-computed schedule: anchors move
    exactly, middle ops stretch linearly with int truncation, pre/post ops
    keep (or compress) their day offsets, other groups pass through."""
    import datetime as dt

    from geo_epic_spark.operators.timeseries import edit_crop_season

    D = dt.date
    ops = spark.createDataFrame([
        ("a", 2, 1, D(2020, 4, 10), 10),   # pre-plant op, 5 days before
        ("a", 2, 2, D(2020, 4, 15), 2),    # plantation
        ("a", 2, 3, D(2020, 5, 15), 100),  # middle: 30d from plant
        ("a", 2, 4, D(2020, 8, 15), 110),  # middle: 122d (old span 153)
        ("a", 2, 5, D(2020, 9, 15), 650),  # harvest
        ("a", 2, 6, D(2020, 9, 17), 120),  # post-harvest +2d
        ("b", 2, 1, D(2020, 4, 1), 2),     # other site: no new_dates row
        ("b", 2, 2, D(2020, 9, 1), 650),
    ], "site string, CRP int, pos int, date date, CODE int")
    nd = spark.createDataFrame(
        [("a", 2, D(2020, 4, 20), D(2020, 9, 20))],
        "site string, CRP int, new_plant date, new_harv date",
    )
    out = {(r["site"], r["pos"]): str(r["date"])
           for r in edit_crop_season(ops, nd, by=["site"]).collect()}
    assert out[("a", 2)] == "2020-04-20"            # plantation anchor
    assert out[("a", 5)] == "2020-09-20"            # harvest anchor
    # new span == old span (153d) -> middle ops shift by +5d
    assert out[("a", 3)] == "2020-05-20"
    assert out[("a", 4)] == "2020-08-20"
    assert out[("a", 1)] == "2020-04-15"            # pre: offset 5 kept
    assert out[("a", 6)] == "2020-09-22"            # post: offset 2 kept
    assert out[("b", 1)] == "2020-04-01"            # untouched group
    assert out[("b", 2)] == "2020-09-01"
    # Mn/Dy rewritten consistently
    row = [r for r in edit_crop_season(ops, nd, by=["site"]).collect()
           if r["site"] == "a" and r["pos"] == 3][0]
    assert (row["Mn"], row["Dy"]) == (5, 20)


def test_edit_crop_season_offset_compression(spark):
    """Pre-planting offsets compress when the max exceeds 14 days
    (ceil(off / max_off * 14)); ops outside [new_plant - 14, old_plant]
    are untouched — the reference's candidate window."""
    import datetime as dt

    from geo_epic_spark.operators.timeseries import edit_crop_season

    D = dt.date
    ops = spark.createDataFrame([
        ("a", 2, 1, D(2020, 4, 5), 10),    # outside window (< 04-11)
        ("a", 2, 2, D(2020, 4, 12), 11),   # off 19 from old plant
        ("a", 2, 3, D(2020, 4, 28), 12),   # off 3
        ("a", 2, 4, D(2020, 5, 1), 2),     # plantation -> 04-25
        ("a", 2, 5, D(2020, 9, 1), 650),   # harvest unchanged
    ], "site string, CRP int, pos int, date date, CODE int")
    nd = spark.createDataFrame(
        [("a", 2, D(2020, 4, 25), D(2020, 9, 1))],
        "site string, CRP int, new_plant date, new_harv date",
    )
    out = {r["pos"]: str(r["date"])
           for r in edit_crop_season(ops, nd, by=["site"]).collect()}
    assert out[1] == "2020-04-05"                   # outside the window
    # max candidate offset 19 > 14: ceil(19/19*14)=14 -> 04-25 - 14 = 04-11
    assert out[2] == "2020-04-11"
    # ceil(3/19*14) = ceil(2.21) = 3 -> 04-22
    assert out[3] == "2020-04-22"
    assert out[4] == "2020-04-25" and out[5] == "2020-09-01"


def test_build_opc_schedules_composition(spark):
    """generate_opc flow: crop sequence x templates -> Yid'd ops with
    per-season re-anchoring where dates are provided."""
    import datetime as dt

    from geo_epic_spark.operators.timeseries import build_opc_schedules

    D = dt.date
    crop_data = spark.createDataFrame([
        ("s1", 2019, 41, D(2019, 5, 10), D(2019, 10, 1)),
        ("s1", 2020, 81, None, None),            # template dates as-is
        ("s2", 2019, 41, D(2019, 4, 25), D(2019, 9, 20)),
    ], "site_id string, year int, crop_code int, planting_date date, harvest_date date")
    templates = spark.createDataFrame([
        (41, 1, 4, 30, 2), (41, 2, 7, 1, 100), (41, 3, 9, 30, 650),
        (81, 1, 5, 5, 2), (81, 2, 10, 10, 650),
    ], "crop_code int, pos int, Mn int, Dy int, CODE int")
    out = build_opc_schedules(crop_data, templates, start_year=2019)
    rows = {(r["site_id"], r["year"], r["pos"]): r for r in out.collect()}
    assert len(rows) == 8
    # Yid assignment
    assert rows[("s1", 2019, 1)]["Yid"] == 1 and rows[("s1", 2020, 1)]["Yid"] == 2
    # re-anchored season: plantation moves to the crop_data date
    assert str(rows[("s1", 2019, 1)]["date"]) == "2019-05-10"
    assert str(rows[("s1", 2019, 3)]["date"]) == "2019-10-01"
    # middle op stretched: old span 04-30 -> 09-30 = 153d, op at 62d;
    # new span 05-10 -> 10-01 = 144d; floor(62*144/153) = 58 -> 07-07
    assert str(rows[("s1", 2019, 2)]["date"]) == "2019-07-07"
    # no dates provided -> template dates in target year
    assert str(rows[("s1", 2020, 1)]["date"]) == "2020-05-05"
    assert str(rows[("s1", 2020, 2)]["date"]) == "2020-10-10"
    # s2 anchors independent of s1
    assert str(rows[("s2", 2019, 1)]["date"]) == "2019-04-25"


class TestTrajectory:
    def test_straight_line_track(self, spark):
        from geo_epic_spark.operators.trajectory import trajectory_stats

        rows = [(0, s, float(s) * 3.0, float(s) * 4.0) for s in range(5)]
        df = spark.createDataFrame(rows, "track_id long, seq long, lon double, lat double")
        r = trajectory_stats(df).collect()[0]
        assert r.n_points == 5
        assert r.path_len == pytest.approx(20.0)       # 4 steps of length 5
        assert r.displacement == pytest.approx(20.0)
        assert r.straightness == pytest.approx(1.0)
        assert r.max_step == pytest.approx(5.0)

    def test_closed_loop_zero_displacement(self, spark):
        from geo_epic_spark.operators.trajectory import trajectory_stats

        sq = [(1, 0, 0.0, 0.0), (1, 1, 1.0, 0.0), (1, 2, 1.0, 1.0),
              (1, 3, 0.0, 1.0), (1, 4, 0.0, 0.0)]
        df = spark.createDataFrame(sq, "track_id long, seq long, lon double, lat double")
        r = trajectory_stats(df).collect()[0]
        assert r.path_len == pytest.approx(4.0)
        assert r.displacement == pytest.approx(0.0)
        assert r.straightness == pytest.approx(0.0)

    def test_synth_tracks_shape(self, spark):
        from geo_epic_spark import synth
        from geo_epic_spark.operators.trajectory import trajectory_stats

        out = trajectory_stats(synth.tracks_df(spark, 50, 20)).collect()
        assert len(out) == 50
        for r in out:
            assert r.n_points == 20
            assert r.path_len >= r.displacement - 1e-12
            assert r.straightness is None or 0.0 <= r.straightness <= 1.0 + 1e-12

    def test_track_encounters_planted(self, spark):
        from geo_epic_spark.operators.trajectory import track_encounters

        rows = [
            # track 1 heads east, track 2 heads north; they pass near
            # (1, 1) at seq 2 (distance 0.05); track 3 is far away
            (1, 0, 0.0, 1.0), (1, 1, 0.5, 1.0), (1, 2, 1.0, 1.0),
            (2, 0, 1.05, 0.0), (2, 1, 1.05, 0.5), (2, 2, 1.05, 1.0),
            (3, 0, 50.0, 50.0), (3, 1, 50.5, 50.0), (3, 2, 51.0, 50.0),
        ]
        df = spark.createDataFrame(rows, "track_id long, seq long, lon double, lat double")
        got = {(r.ta, r.tb): (r.n_contacts, r.min_d2)
               for r in track_encounters(df, radius=0.2, seq_tol=0).collect()}
        assert set(got) == {(1, 2)}
        n, d2 = got[(1, 2)]
        assert n == 1  # only the seq-2 positions are within 0.2 at equal seq
        assert d2 == pytest.approx(0.05 ** 2, rel=1e-12)

    def test_track_encounters_pair_counted_once(self, spark):
        from geo_epic_spark.operators.trajectory import track_encounters

        # identical positions straddling a cell boundary: the ring explode
        # must not double-count the (a, b) point pair
        rows = [(1, 0, 0.0999, 0.0), (2, 0, 0.1001, 0.0)]
        df = spark.createDataFrame(rows, "track_id long, seq long, lon double, lat double")
        got = track_encounters(df, radius=0.1, seq_tol=0).collect()
        assert len(got) == 1 and got[0].n_contacts == 1

    def test_track_encounters_res_below_radius_still_complete(self, spark):
        from geo_epic_spark.operators.trajectory import track_encounters

        # r5 ADVICE regression: with res < radius the pair sits several
        # cells apart; the ring must widen to ceil(radius/res) instead of
        # silently dropping the encounter.
        rows = [(1, 0, 0.0, 0.0), (2, 0, 0.09, 0.0)]
        df = spark.createDataFrame(
            rows, "track_id long, seq long, lon double, lat double")
        for res in (0.02, 0.03, 0.1):  # 0.09 apart spans up to 5 res-0.02 cells
            got = track_encounters(df, radius=0.1, seq_tol=0, res=res).collect()
            assert len(got) == 1 and got[0].n_contacts == 1, res
