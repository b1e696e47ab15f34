"""Table profiling + key-skew report (operators/diagnostics.py)."""

from __future__ import annotations

import duckdb
import pytest

from geo_epic_spark.operators.diagnostics import (
    key_skew_report,
    profile_table,
    sql_key_skew_report,
    sql_profile_table,
)


@pytest.fixture()
def mixed(spark):
    rows = [
        (1, "a", 1.5),
        (2, "b", None),
        (3, None, 3.5),
        (3, "b", 4.0),
    ]
    return spark.createDataFrame(rows, "id long, s string, v double")


def test_profile_values(spark, mixed):
    got = {r["col_name"]: r for r in profile_table(mixed).collect()}
    assert set(got) == {"id", "s", "v"}
    assert all(r["n_rows"] == 4 for r in got.values())
    assert (got["id"]["n_null"], got["id"]["n_distinct"]) == (0, 3)
    assert (got["id"]["min_val"], got["id"]["max_val"]) == ("1", "3")
    assert got["id"]["mean"] == pytest.approx(2.25)
    assert (got["s"]["n_null"], got["s"]["n_distinct"]) == (1, 2)
    assert got["s"]["mean"] is None
    assert got["v"]["n_null"] == 1
    assert got["v"]["mean"] == pytest.approx(3.0)


def test_profile_duckdb_parity(spark, mixed):
    got = sorted(tuple(r) for r in profile_table(mixed).collect())
    con = duckdb.connect()
    con.register("t", mixed.toPandas())
    want = sorted(
        tuple(r)
        for r in con.execute(
            sql_profile_table("t", [("id", True), ("s", False), ("v", True)])
        ).fetchall()
    )
    assert got == want


def test_profile_single_scan_plan(spark, mixed):
    """All metrics for all columns must come from one aggregation over one
    scan — no per-column jobs."""
    import re

    from geo_epic_spark.plans.checks import formatted_plan

    plan = formatted_plan(profile_table(mixed))
    assert len(re.findall(r"\(\d+\) Scan", plan)) == 1, plan


def test_skew_report(spark):
    rows = [("hot",)] * 80 + [("warm",)] * 15 + [(f"cold{i}",) for i in range(5)]
    df = spark.createDataFrame(rows, "k string")
    got = key_skew_report(df, "k", top=3).orderBy("rank").collect()
    assert [(r["rank"], r["key_val"], r["n_rows"]) for r in got] == [
        (1, "hot", 80), (2, "warm", 15), (3, "cold0", 1),
    ]
    assert got[0]["share"] == pytest.approx(0.8)
    # 7 groups, mean size 100/7 — hot is 80/(100/7) = 5.6x the mean
    assert got[0]["hot_factor"] == pytest.approx(5.6)


def test_skew_report_duckdb_parity(spark):
    rows = [(i % 7, i) for i in range(200)] + [(0, 1000 + i) for i in range(60)]
    df = spark.createDataFrame(rows, "k long, x long")
    got = sorted(tuple(r) for r in key_skew_report(df, "k", top=5).collect())
    con = duckdb.connect()
    con.register("t", df.toPandas())
    want = sorted(tuple(r) for r in
                  con.execute(sql_key_skew_report("t", "k", top=5)).fetchall())
    assert got == want


def test_skew_topk_is_take_ordered(spark):
    """The top-k must compile to TakeOrderedAndProject (distributed heap),
    never a single-partition global window over all distinct keys."""
    from geo_epic_spark.plans.checks import formatted_plan

    df = spark.createDataFrame([(i % 7,) for i in range(100)], "k long")
    plan = formatted_plan(key_skew_report(df, "k", top=3))
    assert "TakeOrderedAndProject" in plan, plan
