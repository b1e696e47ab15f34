"""BM25 top-k retrieval (operators/search.py)."""

from __future__ import annotations

import math

import duckdb
import pytest

from geo_epic_spark.operators.search import bm25_topk, sql_bm25_topk


@pytest.fixture()
def corpus(spark):
    rows = [
        (1, "spark window agg join spark spark"),
        (2, "hash join merge sort"),
        (3, "window window window scan"),
        (4, "the quick brown fox"),
        (5, "spark"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _py_bm25(rows, qtext, k1=1.2, b=0.75):
    """Independent plain-Python oracle."""
    import re

    toks = {i: [t for t in re.split("[^a-z0-9]+", s.lower()) if t] for i, s in rows}
    n = len([v for v in toks.values() if v])
    avgdl = sum(len(v) for v in toks.values()) / n
    qs = [t for t in re.split("[^a-z0-9]+", qtext.lower()) if t]
    qs = list(dict.fromkeys(qs))
    out = {}
    for i, ts in toks.items():
        s = 0.0
        for t in qs:
            tf = ts.count(t)
            if not tf:
                continue
            df = sum(1 for v in toks.values() if t in v)
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(ts) / avgdl))
        if s:
            out[i] = round(s, 6)
    return out


def test_bm25_matches_python_oracle(spark, corpus):
    rows = [(r["doc_id"], r["text"]) for r in corpus.collect()]
    q = spark.createDataFrame([("q1", "spark window")], "q_id string, q_text string")
    got = {r["doc_id"]: r["score"] for r in bm25_topk(corpus, q, k=10).collect()}
    want = _py_bm25(rows, "spark window")
    assert got == pytest.approx(want)


def test_bm25_rank_and_k(spark, corpus):
    q = spark.createDataFrame([("q1", "spark window")], "q_id string, q_text string")
    top2 = bm25_topk(corpus, q, k=2).orderBy("rank").collect()
    assert [r["rank"] for r in top2] == [1, 2]
    assert top2[0]["score"] >= top2[1]["score"]
    # doc 1 has both terms with high tf — must rank first
    assert top2[0]["doc_id"] == 1


def test_bm25_duckdb_mirror_parity(spark, corpus):
    queries = [("q1", "spark window"), ("q2", "merge sort quick")]
    qdf = spark.createDataFrame(queries, "q_id string, q_text string")
    got = sorted(
        (r["q_id"], r["doc_id"], r["score"], r["rank"])
        for r in bm25_topk(corpus, qdf, k=3).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in
                    [(r["doc_id"], r["text"]) for r in corpus.collect()])
        + ") AS t(doc_id, text)"
    )
    want = sorted(tuple(r) for r in
                  con.execute(sql_bm25_topk(queries, k=3)).fetchall())
    assert got == want


def test_bm25_plan_broadcast_prune(spark, corpus):
    """The corpus token stream must be pruned by a BROADCAST join (no
    shuffle of non-query tokens) — the property that makes this viable
    at 100 TB."""
    from geo_epic_spark.plans.checks import formatted_plan

    q = spark.createDataFrame([("q1", "spark window")], "q_id string, q_text string")
    plan = formatted_plan(bm25_topk(corpus, q, k=3))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
