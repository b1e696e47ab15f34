"""Distributed validators mirroring the reference's DLY/SOL/SIT/OPC checks."""

from __future__ import annotations

import datetime as dt

import pandas as pd

from geo_epic_spark.functions.validators import (
    dly_violations, opc_violations, range_violations, sit_violations,
    sol_violations, DLY_RANGES,
)


def _daily_pdf(site="s1", year=2020, bad_rh_on=None, drop_day=None):
    rows = []
    d = dt.date(year, 1, 1)
    while d.year == year:
        if drop_day != d:
            rows.append({
                "site": site, "date": d, "month": d.month, "day": d.day,
                "srad": 15.0, "tmax": 20.0, "tmin": 5.0, "prcp": 1.0,
                "rh": 5.0 if d == bad_rh_on else 0.6, "ws": 3.5,
            })
        d += dt.timedelta(days=1)
    return pd.DataFrame(rows)


def test_dly_valid_table_has_no_violations(spark):
    df = spark.createDataFrame(_daily_pdf())
    v = dly_violations(df, ["site"], 2020, 2020)
    assert v.count() == 0


def test_dly_detects_missing_date_and_range(spark):
    bad = _daily_pdf(bad_rh_on=dt.date(2020, 6, 1), drop_day=dt.date(2020, 3, 2))
    v = dly_violations(spark.createDataFrame(bad), ["site"], 2020, 2020).toPandas()
    kinds = dict(zip(v["column"], v["n_bad"]))
    assert kinds.get("__missing_date") == 1
    assert kinds.get("rh") == 1


def test_dly_detects_duplicates(spark):
    pdf = _daily_pdf()
    dup = pd.concat([pdf, pdf.iloc[[10]]], ignore_index=True)
    v = dly_violations(spark.createDataFrame(dup), ["site"], 2020, 2020).toPandas()
    assert dict(zip(v["column"], v["n_bad"])).get("__duplicate_date") == 1


def test_sol_sit_ranges(spark):
    layers = spark.createDataFrame(pd.DataFrame({
        "mukey": [1, 1, 2],
        "Layer_depth": [0.2, 0.5, 99.0],          # 99 out of range
        "Bulk_Density": [1.2, 1.3, 1.1],
        "Wilting_capacity": [0.0, 0.2, 0.2],      # 0 allowed
        "pH": [6.5, 7.0, 7.2],
        "psp": [0.4, 0.4, 0.4],
    }))
    v = sol_violations(layers, ["mukey"]).toPandas()
    assert len(v) == 1
    assert v.iloc[0]["column"] == "Layer_depth" and v.iloc[0]["mukey"] == 2

    sites = spark.createDataFrame(pd.DataFrame({
        "site": ["a", "b"], "lat": [40.0, 95.0], "lon": [-100.0, -100.0],
        "elevation": [300.0, 300.0], "slope_steep": [0.1, 0.1],
        "slope_length": [10.0, 10.0],
    }))
    sv = sit_violations(sites, ["site"]).toPandas()
    assert sv["column"].tolist() == ["lat"] and sv["site"].tolist() == ["b"]


def test_opc_checks(spark):
    rows = []
    # group g1: valid — years 1..2, monotonic, crop 5 has plant(2)+harvest(650)
    for (yid, mn, dy, code, crp) in [
        (1, 4, 1, 2, 5), (1, 9, 1, 650, 5), (2, 4, 1, 2, 5), (2, 9, 1, 650, 5),
    ]:
        rows.append({"sched": "g1", "Yid": yid, "Mn": mn, "Dy": dy,
                     "CODE": code, "CRP": crp,
                     "date": dt.date(2000 + yid, mn, dy)})
    # group g2: missing year 2 (years 1,3), crop 7 has no harvest
    for (yid, mn, dy, code, crp) in [(1, 4, 1, 2, 7), (3, 5, 1, 2, 7)]:
        rows.append({"sched": "g2", "Yid": yid, "Mn": mn, "Dy": dy,
                     "CODE": code, "CRP": crp,
                     "date": dt.date(2000 + yid, mn, dy)})
    df = spark.createDataFrame(pd.DataFrame(rows))
    v = opc_violations(df, ["sched"]).toPandas()
    g1 = v[v["sched"] == "g1"]
    assert len(g1) == 0
    g2 = dict(zip(v[v["sched"] == "g2"]["column"], v[v["sched"] == "g2"]["n_bad"]))
    assert g2.get("__missing_year") == 1
    assert g2.get("__crop_without_harvest") == 1


def test_range_violations_ungrouped(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "month": [1, 13], "day": [1, 1], "srad": [10.0, 10.0],
        "tmax": [20.0, 20.0], "tmin": [5.0, 5.0], "prcp": [0.0, 0.0],
        "rh": [0.5, 0.5], "ws": [3.0, 3.0],
    }))
    v = range_violations(df, DLY_RANGES).toPandas()
    assert v["column"].tolist() == ["month"]
