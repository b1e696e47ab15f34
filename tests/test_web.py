"""URL canonicalization + URL-level dedup (operators/web.py)."""

from __future__ import annotations

import duckdb
import pytest

from geo_epic_spark.operators.web import (
    canonicalize_urls,
    sql_canon_url_expr,
    url_dedup,
)

CASES = [
    # (raw, expected canonical)
    ("https://www.Example.COM/Path/?utm_source=x&b=2&a=1#frag",
     "https://example.com/Path?a=1&b=2"),
    ("HTTPS://EXAMPLE.com:443/Path/",
     "https://example.com/Path"),
    ("http://example.com:80/a//",
     "http://example.com/a"),
    ("http://example.com:8080/a",          # non-default port kept
     "http://example.com:8080/a"),
    ("https://example.com/Path?b=2&a=1&fbclid=zzz&gclid=q",
     "https://example.com/Path?a=1&b=2"),
    ("https://example.com/?UTM_CAMPAIGN=x",  # case-insensitive tracking param
     "https://example.com"),
    ("https://example.com",
     "https://example.com"),
    ("  https://example.com/x  ",          # trim
     "https://example.com/x"),
    ("ftp://Files.example.com/pub/",       # other scheme: no port strip
     "ftp://files.example.com/pub"),
    ("not a url at all",                   # passthrough
     "not a url at all"),
    ("https://example.com/a?x=1&&y=2",     # empty param dropped
     "https://example.com/a?x=1&y=2"),
]


def test_canonicalize_cases(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(CASES)], "doc_id long, url string"
    )
    got = {r["doc_id"]: r["canon_url"] for r in canonicalize_urls(df).collect()}
    for i, (raw, want) in enumerate(CASES):
        assert got[i] == want, (raw, got[i], want)


def test_duckdb_mirror_parity(spark):
    """The generated DuckDB expression produces the identical canonical
    string for every case — the oracle-parity guarantee."""
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(CASES)], "doc_id long, url string"
    )
    got = {r["doc_id"]: r["canon_url"] for r in canonicalize_urls(df).collect()}
    con = duckdb.connect()
    for i, (raw, _) in enumerate(CASES):
        lit = "'" + raw.replace("'", "''") + "'"
        want = con.execute("SELECT " + sql_canon_url_expr(lit)).fetchone()[0]
        assert got[i] == want, (raw, got[i], want)


def test_canonical_is_idempotent(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(CASES)], "doc_id long, url string"
    )
    once = canonicalize_urls(df)
    twice = canonicalize_urls(once, url="canon_url")
    a = sorted(r["canon_url"] for r in once.collect())
    b = sorted(r["canon_url"] for r in twice.collect())
    assert a == b


def test_url_dedup_survivor_and_counts(spark):
    rows = [
        (1, "https://www.site.com/a?utm_source=x"),
        (2, "https://site.com/a/"),
        (3, "HTTPS://SITE.COM:443/a"),
        (4, "https://site.com/b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {r["canon_url"]: (r["keep_id"], r["n_urls"])
           for r in url_dedup(df).collect()}
    assert got == {
        "https://site.com/a": (1, 3),
        "https://site.com/b": (4, 1),
    }


def test_dedup_plan_is_single_hash_agg(spark):
    """Canonicalization must not introduce a shuffle of its own: the whole
    job is scan → project → partial agg → ONE exchange → final agg."""
    from geo_epic_spark.plans.checks import formatted_plan

    df = spark.createDataFrame(
        [(1, "https://x.com/a")], "doc_id long, url string"
    )
    import re

    plan = formatted_plan(url_dedup(df))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan


class TestPageRank:
    def test_cycle_stays_uniform(self, spark):
        from geo_epic_spark.operators.web import pagerank

        nodes = spark.createDataFrame([(i,) for i in range(3)], "node long")
        edges = spark.createDataFrame([(0, 1), (1, 2), (2, 0)], "src long, dst long")
        got = {r.node: r.rank for r in pagerank(nodes, edges, iterations=5).collect()}
        for v in got.values():
            assert v == pytest.approx(1.0 / 3.0, rel=1e-12)

    def test_hub_and_dangling_hand_computed(self, spark):
        from geo_epic_spark.operators.web import pagerank

        # 0 -> 2, 1 -> 2; 2 dangles. One iteration from uniform 1/3:
        # contrib(2) = 1/3 + 1/3; dangling mass = 1/3 redistributed /3
        nodes = spark.createDataFrame([(i,) for i in range(3)], "node long")
        edges = spark.createDataFrame([(0, 2), (1, 2)], "src long, dst long")
        d, n = 0.85, 3
        got = {r.node: r.rank for r in
               pagerank(nodes, edges, iterations=1, damping=d).collect()}
        base = (1 - d) / n
        dshare = (1 / 3) / n
        assert got[0] == pytest.approx(base + d * dshare, rel=1e-12)
        assert got[1] == pytest.approx(base + d * dshare, rel=1e-12)
        assert got[2] == pytest.approx(base + d * (2 / 3 + dshare), rel=1e-12)
        # total mass conserved
        assert sum(got.values()) == pytest.approx(1.0, rel=1e-12)
