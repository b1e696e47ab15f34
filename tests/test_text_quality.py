"""Round-3 second-wave text/embedding ops: semantic dedup (SemDeDup),
Gopher repetition signals, PII redaction."""

from __future__ import annotations

import numpy as np
from pyspark.sql import Row
from pyspark.sql import functions as F

from geo_epic_spark.operators.dedup import semantic_dedup
from geo_epic_spark.operators.text import redact_pii, repetition_report


def _vec_rows(spark):
    """12 vectors in 2 well-separated blobs + a planted near-dup per blob."""
    rng = np.random.Generator(np.random.PCG64(3))
    rows = []
    for i in range(12):
        base = np.zeros(8)
        base[0 if i % 2 == 0 else 4] = 10.0  # two orthogonal blobs
        v = base + rng.normal(0, 0.5, 8)
        rows.append(Row(vec_id=i, embedding=[float(x) for x in v]))
    # near-dup copies of vec 0 and vec 1 (tiny jitter)
    for j, src in ((100, 0), (101, 1)):
        v = np.array(rows[src].embedding) + 1e-3
        rows.append(Row(vec_id=j, embedding=[float(x) for x in v]))
    return rows


def test_semantic_dedup_marks_planted_copies(spark):
    rows = _vec_rows(spark)
    df = spark.createDataFrame(rows)
    cents = [rows[0].embedding, rows[1].embedding]
    out = semantic_dedup(df, cents, threshold=0.999).collect()
    by_id = {r["vec_id"]: r for r in out}
    assert len(out) == len(rows)
    # planted copies are dups of a lower id in the same cluster
    assert not by_id[100]["keep"] and not by_id[101]["keep"]
    # every base vector survives (no natural pair reaches 0.999)
    assert all(by_id[i]["keep"] for i in range(12))
    # cluster ids are the two centroid indices
    assert {r["cluster_id"] for r in out} == {0, 1}


def test_semantic_dedup_centroid_far_keeps_one_per_group(spark):
    rows = _vec_rows(spark)
    df = spark.createDataFrame(rows)
    cents = [rows[0].embedding, rows[1].embedding]
    out = semantic_dedup(df, cents, threshold=0.999, priority="centroid_far").collect()
    # same dup-group structure: exactly 2 dropped, one per planted pair
    dropped = sorted(r["vec_id"] for r in out if not r["keep"])
    assert len(dropped) == 2
    # with centroid_far priority the member FARTHER from the centroid wins;
    # each dup group is {src, copy} so exactly one of each pair survives
    groups = [{0, 100}, {1, 101}]
    for g in groups:
        kept = [r for r in out if r["vec_id"] in g and r["keep"]]
        assert len(kept) == 1


def test_repetition_report_known_values(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=0, text="a a a b"),          # top uni 3/4, bigram "a a" 2/3
            Row(doc_id=1, text="x y z"),            # no repeats
            Row(doc_id=2, text="solo"),             # 1 token: no bigrams
        ]
    )
    out = {r["doc_id"]: r for r in repetition_report(df).collect()}
    r0 = out[0]
    assert r0["n_tokens"] == 4
    assert abs(r0["top_unigram_share"] - 0.75) < 1e-9
    assert abs(r0["top_bigram_share"] - 2 / 3) < 1e-6
    assert abs(r0["dup_token_frac"] - 0.75) < 1e-9
    r1 = out[1]
    assert abs(r1["top_unigram_share"] - 1 / 3) < 1e-6 and r1["dup_token_frac"] == 0.0
    r2 = out[2]
    assert r2["n_tokens"] == 1 and r2["top_bigram_share"] == 0.0


def test_redact_pii_patterns(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=0, text="mail bob@x.org and sue@y.co.uk now"),
            Row(doc_id=1, text="call (555) 123-4567 or 555-123-4567"),
            Row(doc_id=2, text="ssn 123-45-6789 plain 12345"),
            Row(doc_id=3, text="clean text no pii"),
        ]
    )
    out = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert out[0]["n_emails"] == 2 and "<EMAIL>" in out[0]["clean_text"]
    assert "bob@x.org" not in out[0]["clean_text"]
    assert out[1]["n_phones"] == 2 and out[1]["clean_text"].count("<PHONE>") == 2
    assert out[2]["n_ssns"] == 1 and "<SSN>" in out[2]["clean_text"]
    assert out[3]["clean_text"] == "clean text no pii"
    assert out[3]["n_emails"] == out[3]["n_phones"] == out[3]["n_ssns"] == 0


def test_sessionize_gap_boundary(spark):
    """Gap strictly greater than the threshold starts a new session; an
    exact-threshold gap does not (mirrors the oracle SQL's `gap > N`)."""
    import datetime as dt

    import __spark_entry__ as entry

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    gap = entry.SESSION_GAP_S
    rows = [
        Row(event_id=1, ts=base, user_id=7, event_type="a", value=1.0, props="{}"),
        # exactly the threshold: same session
        Row(event_id=2, ts=base + dt.timedelta(seconds=gap), user_id=7,
            event_type="a", value=2.0, props="{}"),
        # threshold + 1: new session
        Row(event_id=3, ts=base + dt.timedelta(seconds=2 * gap + 1), user_id=7,
            event_type="a", value=4.0, props="{}"),
    ]
    df = spark.createDataFrame(rows)
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "events.parquet"))
        out = entry.q_sessionize(spark, d).orderBy("session_no").collect()
    assert [r["n_events"] for r in out] == [2, 1]
    assert abs(out[0]["sum_value"] - 3.0) < 1e-9 and abs(out[1]["sum_value"] - 4.0) < 1e-9


def test_cli_text_and_semantic_groups(spark, tmp_path, capsys):
    """CLI parity for the text/semantic-dedup groups (in-process main)."""
    import json

    from geo_epic_spark.__main__ import main

    docs_p = str(tmp_path / "docs")
    spark.createDataFrame(
        [Row(doc_id=i, text=f"the quick doc {i} of the corpus") for i in range(30)]
    ).write.parquet(docs_p)
    out1 = str(tmp_path / "sig")
    assert main(["text", "signals", "--docs", docs_p, "--out", out1]) == 0
    assert json.loads(capsys.readouterr().out.strip().splitlines()[-1])["rows"] == 30
    cols = set(spark.read.parquet(out1).columns)
    assert {"doc_id", "quality", "lang_pred", "top_unigram_share"} <= cols

    out2 = str(tmp_path / "red")
    assert main(["text", "redact", "--docs", docs_p, "--out", out2]) == 0
    assert json.loads(capsys.readouterr().out.strip().splitlines()[-1])["rows"] == 30

    vec_p = str(tmp_path / "vecs")
    rows = _vec_rows(spark)
    spark.createDataFrame(rows).write.parquet(vec_p)
    out3 = str(tmp_path / "sem")
    assert main(["dedup", "semantic", "--vectors", vec_p, "--out", out3,
                 "--threshold", "0.999", "--clusters", "2"]) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["rows"] == len(rows) and res["kept"] == len(rows) - 2


def test_repetition_report_matches_pandas_oracle(spark):
    """Property-style check vs a pure-pandas recomputation on a seeded
    random corpus (small vocab forces real repetition)."""
    import collections

    import numpy as np

    rng = np.random.Generator(np.random.PCG64(17))
    vocab = ["a", "bb", "ccc", "dd", "e"]
    docs = [
        (i, " ".join(rng.choice(vocab, size=rng.integers(1, 12))))
        for i in range(40)
    ]
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in docs])
    got = {r["doc_id"]: r for r in repetition_report(df).collect()}
    for i, t in docs:
        toks = t.lower().strip().split()
        uni = collections.Counter(toks)
        bis = collections.Counter(
            f"{a} {b}" for a, b in zip(toks, toks[1:])
        )
        r = got[i]
        assert r["n_tokens"] == len(toks)
        assert abs(r["top_unigram_share"] - max(uni.values()) / len(toks)) < 1e-6
        exp_bi = (max(bis.values()) / sum(bis.values())) if bis else 0.0
        assert abs(r["top_bigram_share"] - exp_bi) < 1e-6
        dup = sum(c for c in uni.values() if c >= 2) / len(toks)
        assert abs(r["dup_token_frac"] - dup) < 1e-6


def test_semantic_dedup_matches_greedy_oracle(spark):
    """semantic_dedup(priority='key') vs a brute-force numpy greedy pass on
    a seeded corpus with real near-dup structure."""
    import numpy as np

    rng = np.random.Generator(np.random.PCG64(23))
    base = rng.normal(0, 1, (30, 6))
    # plant near-dups: rows 30..39 are jittered copies of rows 0..9
    vecs = np.vstack([base, base[:10] + rng.normal(0, 0.01, (10, 6))])
    rows = [Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in enumerate(vecs)]
    cents = [rows[i].embedding for i in range(3)]
    thr = 0.98
    out = {r["vec_id"]: r for r in
           semantic_dedup(spark.createDataFrame(rows), cents, threshold=thr).collect()}

    c = np.array(cents)
    assign = ((vecs[:, None, :] - c[None, :, :]) ** 2).sum(-1).argmin(1)
    norms = np.linalg.norm(vecs, axis=1)
    cos = (vecs @ vecs.T) / (norms[:, None] * norms[None, :])
    for i in range(len(vecs)):
        dup = any(
            assign[j] == assign[i] and cos[i, j] >= thr for j in range(i)
        )
        assert out[i]["keep"] == (not dup), i
        assert out[i]["cluster_id"] == assign[i], i


def test_semantic_dedup_zero_norm_vectors_kept(spark):
    """Zero embeddings must never be marked duplicates (NaN-cosine guard):
    Spark orders NaN above every threshold, so an unguarded normalize would
    silently drop all-but-one zero vector per cluster."""
    rows = [
        Row(vec_id=0, embedding=[0.0, 0.0, 0.0, 0.0]),
        Row(vec_id=1, embedding=[0.0, 0.0, 0.0, 0.0]),
        Row(vec_id=2, embedding=[1.0, 0.0, 0.0, 0.0]),
    ]
    out = semantic_dedup(
        spark.createDataFrame(rows), cents=[[0.0, 0.0, 0.0, 0.0]], threshold=0.9
    ).collect()
    assert all(r["keep"] for r in out), out


def test_top_ngrams_counts_and_tiebreak(spark):
    docs = spark.createDataFrame(
        [(0, "The cat sat. The cat ran!"), (1, "a cat, the CAT")],
        ["doc_id", "text"],
    )
    from geo_epic_spark.operators.text import top_ngrams

    uni = top_ngrams(docs, n=1, k=3).collect()
    # counts: the=3, cat=4, sat=1, ran=1, a=1 -> top3 with (cnt desc, gram asc)
    assert [(r["gram"], r["cnt"]) for r in uni] == [("cat", 4), ("the", 3), ("a", 1)]

    bi = top_ngrams(docs, n=2, k=2).collect()
    assert [(r["gram"], r["cnt"]) for r in bi] == [("the cat", 3), ("a cat", 1)]


def test_top_ngrams_short_docs_empty_safe(spark):
    docs = spark.createDataFrame([(0, "one"), (1, "  "), (2, "!!!")], ["doc_id", "text"])
    from geo_epic_spark.operators.text import top_ngrams

    assert top_ngrams(docs, n=2, k=5).count() == 0
    assert [(r["gram"], r["cnt"]) for r in top_ngrams(docs, n=1, k=5).collect()] == [("one", 1)]


# ---------------------------------------------------------------------------
# remove_boilerplate_lines (CCNet-style line-level dedup)
# ---------------------------------------------------------------------------

def test_boilerplate_lines_removed_and_order_kept(spark):
    from geo_epic_spark.operators.text import remove_boilerplate_lines

    rows = [
        (i, "MENU\n" + f"body {i}" + ("\nCOOKIE NOTICE" if i % 2 == 0 else f"\ntail {i}"))
        for i in range(8)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["text_clean"]
           for r in remove_boilerplate_lines(df, max_docs=2).collect()}
    # MENU in 8 docs and COOKIE NOTICE in 4 -> removed; unique lines kept in order
    assert got[0] == "body 0"
    assert got[1] == "body 1\ntail 1"
    assert len(got) == 8


def test_boilerplate_all_removed_doc_survives_empty(spark):
    from geo_epic_spark.operators.text import remove_boilerplate_lines

    rows = [(1, "SAME\nSAME2"), (2, "SAME\nSAME2"), (3, "SAME\nSAME2\nunique")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["text_clean"]
           for r in remove_boilerplate_lines(df, max_docs=2).collect()}
    assert got == {1: "", 2: "", 3: "unique"}


def test_boilerplate_threshold_boundary(spark):
    """A line in exactly max_docs docs is NOT boilerplate (strict >)."""
    from geo_epic_spark.operators.text import remove_boilerplate_lines

    rows = [(1, "pair"), (2, "pair"), (3, "solo")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["text_clean"]
           for r in remove_boilerplate_lines(df, max_docs=2).collect()}
    assert got == {1: "pair", 2: "pair", 3: "solo"}


# ---------------------------------------------------------------------------
# chunk_documents (overlapping token windows)
# ---------------------------------------------------------------------------

def test_chunk_boundaries_and_overlap(spark):
    from geo_epic_spark.operators.text import chunk_documents

    words = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame([(1, words)], "doc_id long, text string")
    got = {r["chunk_id"]: (r["chunk_text"], r["n_tokens"])
           for r in chunk_documents(df, chunk_tokens=4, overlap=1).collect()}
    # step=3: starts 0,3,6 valid (start+1 < 10); start 9 would add only w9...
    # 9*? k=3 -> start 9, start+overlap=10 not < 10 -> excluded
    assert got == {
        0: ("w0 w1 w2 w3", 4),
        1: ("w3 w4 w5 w6", 4),
        2: ("w6 w7 w8 w9", 4),
    }


def test_chunk_short_doc_single_chunk(spark):
    from geo_epic_spark.operators.text import chunk_documents

    df = spark.createDataFrame([(1, "a b"), (2, "only")], "doc_id long, text string")
    out = chunk_documents(df, chunk_tokens=8, overlap=2).collect()
    got = {(r["doc_id"], r["chunk_id"]): r["n_tokens"] for r in out}
    assert got == {(1, 0): 2, (2, 0): 1}


def test_chunk_no_overlap_only_tail(spark):
    """A tail that would contain only re-read tokens is not emitted."""
    from geo_epic_spark.operators.text import chunk_documents

    words = " ".join(f"w{i}" for i in range(6))
    df = spark.createDataFrame([(1, words)], "doc_id long, text string")
    got = sorted(r["chunk_id"] for r in
                 chunk_documents(df, chunk_tokens=4, overlap=2).collect())
    # step=2: starts 0,2 (2+2<6); start 4 -> 4+2=6 not < 6 -> excluded
    assert got == [0, 1]


def test_chunk_validation(spark):
    import pytest as _pt
    from geo_epic_spark.operators.text import chunk_documents

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with _pt.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, overlap=4)


def test_bigram_lm_score_matches_hand_model(spark):
    """Tiny corpus where the add-alpha bigram model is computable by hand:
    every score re-derived in pure python from the same counts."""
    import math

    from geo_epic_spark.operators.text import bigram_lm_score

    docs = [
        (0, "a b a b"),   # bigrams: (a b) x2, (b a) x1
        (1, "a b c"),     # (a b), (b c)
        (2, "c"),         # < 2 tokens -> NULL score
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in bigram_lm_score(df, alpha=0.5).collect()}

    # corpus bigrams: ab=3, ba=1, bc=1; contexts: a=3, b=2; vocab = {a,b,c}
    c12 = {("a", "b"): 3, ("b", "a"): 1, ("b", "c"): 1}
    c1 = {"a": 3, "b": 2}
    v = 3

    def p(w1, w2):
        return (c12[(w1, w2)] + 0.5) / (c1[w1] + 0.5 * v)

    nll0 = -(math.log(p("a", "b")) * 2 + math.log(p("b", "a"))) / 3
    nll1 = -(math.log(p("a", "b")) + math.log(p("b", "c"))) / 2
    assert out[0]["n_bigrams"] == 3
    assert out[1]["n_bigrams"] == 2
    assert abs(out[0]["avg_nll"] - round(nll0, 6)) < 1e-9
    assert abs(out[1]["avg_nll"] - round(nll1, 6)) < 1e-9
    # repeated high-probability bigram scores LOWER nll than the rarer mix
    assert out[0]["avg_nll"] < out[1]["avg_nll"]
    # 1-token doc: present, zero bigrams, NULL score
    assert out[2]["n_bigrams"] == 0 and out[2]["avg_nll"] is None


def test_bigram_lm_pretrained_model_reuse(spark):
    """CCNet setup: model trained on one corpus, applied to another —
    scoring must use the PASSED model's counts, not retrain."""
    from geo_epic_spark.operators.text import bigram_lm_score, bigram_lm_train

    train = spark.createDataFrame([(0, "x y x y x y")], ["doc_id", "text"])
    score = spark.createDataFrame([(7, "x y")], ["doc_id", "text"])
    model = bigram_lm_train(train)
    out = bigram_lm_score(score, model=model).collect()[0]
    import math

    # from TRAIN corpus: c(x y)=3, c(x)=3, vocab={x,y} -> p=(3.5)/(3+1)
    assert out["n_bigrams"] == 1
    assert abs(out["avg_nll"] - round(-math.log(3.5 / 4.0), 6)) < 1e-9


def test_bigram_lm_unseen_grams_get_smoothed_floor(spark):
    """A doc whose bigrams the pretrained model never saw must score the
    add-alpha floor, not be silently dropped (left-join semantics)."""
    import math

    from geo_epic_spark.operators.text import bigram_lm_score, bigram_lm_train

    train = spark.createDataFrame([(0, "x y x y")], ["doc_id", "text"])
    score = spark.createDataFrame([(7, "q r")], ["doc_id", "text"])
    out = bigram_lm_score(score, model=bigram_lm_train(train)).collect()[0]
    # unseen bigram AND unseen context: p = alpha / (0 + alpha*V), V=2
    assert out["n_bigrams"] == 1
    assert abs(out["avg_nll"] - round(-math.log(0.5 / 1.0), 6)) < 1e-9


# ---------------------------------------------------------------------------
# remove_duplicate_spans (passage-level exact dedup, Lee et al. 2021)
# ---------------------------------------------------------------------------

def test_duplicate_spans_cut_and_reassembled(spark):
    from geo_epic_spark.operators.text import remove_duplicate_spans

    rows = [
        (1, "a b c X Y Z W d e"),   # shares 4-token span with doc 2
        (2, "p q X Y Z W r s t"),
        (3, "m n o"),               # exactly k tokens, unique -> untouched
        (4, "SAME SAME2 SAME3"),    # full duplicate of doc 5 -> emptied
        (5, "SAME SAME2 SAME3"),
        (6, "u v"),                 # shorter than k -> no grams, untouched
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_removed"])
           for r in remove_duplicate_spans(df, key="doc_id", k=3).collect()}
    assert got[1] == ("a b c d e", 9, 4)
    assert got[2] == ("p q r s t", 9, 4)
    assert got[3] == ("m n o", 3, 0)
    assert got[4] == ("", 3, 3)
    assert got[5] == ("", 3, 3)
    assert got[6] == ("u v", 2, 0)
    assert len(got) == 6


def test_duplicate_spans_within_one_doc(spark):
    """min_count counts ALL occurrences, including repeats inside one doc."""
    from geo_epic_spark.operators.text import remove_duplicate_spans

    df = spark.createDataFrame([(1, "R S T x R S T")], "doc_id long, text string")
    got = remove_duplicate_spans(df, key="doc_id", k=3).collect()[0]
    assert (got["clean_text"], got["n_tokens"], got["n_removed"]) == ("x", 7, 6)


def test_duplicate_spans_md5_hash_parity(spark):
    from geo_epic_spark.operators.text import remove_duplicate_spans

    rows = [(i, f"alpha beta gamma delta tail{i % 3} end{i}") for i in range(9)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(remove_duplicate_spans(df, key="doc_id", k=4).collect())
    b = sorted(remove_duplicate_spans(df, key="doc_id", k=4, gram_hash="md5_60").collect())
    assert a == b
    assert all(r["n_removed"] > 0 for r in a)  # the 4-token prefix repeats 9x


# ---------------------------------------------------------------------------
# normalize_text (mojibake repair + unicode cleanup)
# ---------------------------------------------------------------------------

def test_normalize_text_repairs_and_flags(spark):
    from geo_epic_spark.operators.text import normalize_text

    rows = [
        (1, "Itâ€™s a â€œtestâ€"
            " â€” fineâ€¦"
            " naÃ¯ve cafÃ©"),
        (2, "curly ‘quotes’ “both” – dash…"
            " nb sp"),
        (3, "zero​width﻿ and \x07control\x1fchars"),
        (4, "  lots   of\t\twhitespace \n\n here  "),
        (5, "already clean text"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["norm_text"], r["changed"])
           for r in normalize_text(df).collect()}
    assert got[1] == ("It's a \"test\" - fine... naïve café", 1)
    assert got[2] == ("curly 'quotes' \"both\" - dash... nb sp", 1)
    assert got[3] == ("zerowidth and controlchars", 1)
    assert got[4] == ("lots of whitespace here", 1)
    assert got[5] == ("already clean text", 0)


def test_normalize_text_idempotent_and_duckdb_parity(spark):
    """Second pass is a no-op, and the generated DuckDB mirror produces the
    identical string for every fixture row (the oracle-parity guarantee)."""
    import duckdb
    from geo_epic_spark.operators.text import normalize_text, sql_norm_expr

    rows = [
        (1, "aâ€™b “c” – d…"),
        (2, "  x   y​ z  "),
        (3, "plain"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    once = normalize_text(df)
    twice = normalize_text(once, text="norm_text")
    a = {r["doc_id"]: r["norm_text"] for r in once.collect()}
    b = {r["doc_id"]: (r["norm_text"], r["changed"]) for r in twice.collect()}
    for i in a:
        assert b[i] == (a[i], 0)

    con = duckdb.connect()
    for i, t in rows:
        want = con.execute("SELECT " + sql_norm_expr("?"), [t]).fetchone()[0]
        assert a[i] == want, (i, a[i], want)


def test_normalize_text_lowercase_option(spark):
    from geo_epic_spark.operators.text import normalize_text

    df = spark.createDataFrame(
        [(1, "MiXeD “Case”")], "doc_id long, text string"
    )
    got = normalize_text(df, lowercase=True).collect()[0]
    assert got["norm_text"] == 'mixed "case"'
