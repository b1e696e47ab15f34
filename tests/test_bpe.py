"""Distributed BPE training (operators/bpe.py)."""

from __future__ import annotations

import re
from collections import Counter

import duckdb
import pytest

from geo_epic_spark.operators.bpe import END, bpe_train, sql_bpe_merges


def _py_bpe(texts: list[str], n_merges: int) -> list[tuple]:
    """Independent reference trainer (the Sennrich pseudocode, verbatim)."""
    vocab = Counter()
    for t in texts:
        for w in re.split("[^a-z0-9]+", t.lower()):
            if w:
                vocab[w] += 1
    syms = {w: list(w) + [END] for w in vocab}
    out = []
    for r in range(1, n_merges + 1):
        counts = Counter()
        for w, f in vocab.items():
            s = syms[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += f
        if not counts:
            break
        # count DESC, then (a, b) ASC
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((r, a, b, a + b, cnt))
        for w in syms:
            s, new = syms[w], []
            for tok in s:
                if new and new[-1] == a and tok == b:
                    new[-1] = a + b
                else:
                    new.append(tok)
            syms[w] = new
    return out


TEXTS = [
    "low lower lowest low low",
    "new newer newest new new new",
    "wide wider widest",
    "low and newer and low",
]


def test_bpe_matches_reference_trainer(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    got = [tuple(r) for r in bpe_train(docs, 8).orderBy("merge_rank").collect()]
    assert got == _py_bpe(TEXTS, 8)


def test_bpe_merge_is_greedy_nonoverlapping(spark):
    # "aaab": after merging (a, a) the merged token must not re-merge with
    # the following single 'a' within the same round
    docs = spark.createDataFrame([(1, "aaab aaab")], "doc_id long, text string")
    got = [tuple(r) for r in bpe_train(docs, 1).collect()]
    assert got == _py_bpe(["aaab aaab"], 1)
    assert got[0][1:4] == ("a", "a", "aa")


def test_bpe_early_stop(spark):
    # single-char words exhaust after merging with END
    docs = spark.createDataFrame([(1, "a b a b a")], "doc_id long, text string")
    got = bpe_train(docs, 50).collect()
    assert 0 < len(got) < 50
    ref = _py_bpe(["a b a b a"], 50)
    assert [tuple(r) for r in sorted(got, key=lambda r: r[0])] == ref


def test_bpe_duckdb_mirror_full_run(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    got = sorted(tuple(r) for r in bpe_train(docs, 6).collect())
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in enumerate(TEXTS))
        + ") AS t(doc_id, text)"
    )
    want = sorted(tuple(r) for r in
                  con.execute(sql_bpe_merges("documents", 6)).fetchall())
    assert got == want
