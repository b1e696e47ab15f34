"""Distributed BPE tokenizer training (Sennrich et al. 2016, public
methodology) — learn merge rules from a corpus with Spark doing the heavy
counting and the driver doing only the K argmax decisions.

Classic BPE trains on the WORD-FREQUENCY dictionary, not the raw corpus:
after one corpus-wide (word, freq) aggregation, every merge round operates
on distinct words only — bounded (~millions at web scale) and
freq-weighted, so 100 TB of text costs one shuffle up front and the rounds
touch a frame that fits comfortably in the cluster. Per round the driver
receives exactly ONE row (the argmax pair — a global decision every BPE
trainer makes serially); everything else is Column expressions:

  * pair generation = map-side `transform(sequence…)` + explode,
  * weighted pair counts = one hash aggregate with map-side partials,
  * argmax = orderBy().limit(1) (TakeOrdered, distributed heap),
  * merge application = a pure-Column `aggregate` fold over the symbol
    arrays (greedy left-to-right, non-overlapping — the merged token
    cannot re-merge with the next symbol within the same round, matching
    the reference algorithm).

The vocab frame is localCheckpoint'ed every few rounds so K rounds of
nested higher-order functions never hand Catalyst an unbounded lineage
(the cluster_pairs lesson, r3 ADVICE).

The DuckDB oracle (`sql_bpe_merges`) re-derives the ENTIRE training run —
all K rounds of counts, argmaxes and folds — as chained CTEs generated
from the same constants, so the merge table is verified end-to-end, not
just replayed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geo_epic_spark.operators.search import TOKEN_SPLIT_RE

END = "</w>"  # end-of-word marker, per the original BPE formulation


def _word_vocab(docs: DataFrame, text: str) -> DataFrame:
    words = docs.select(
        F.explode(
            F.filter(F.split(F.lower(F.col(text)), TOKEN_SPLIT_RE),
                     lambda t: t != "")
        ).alias("word")
    )
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(
            "word",
            "freq",
            F.concat(F.split("word", ""), F.array(F.lit(END))).alias("syms"),
        )
    )


def _apply_merge(syms, a: str, b: str):
    """Greedy left-to-right merge of adjacent (a, b) → a+b as a pure
    Column fold (no UDF)."""
    merged = F.lit(a + b)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int,
    text: str = "text",
    checkpoint_every: int = 4,
) -> DataFrame:
    """Learn ``n_merges`` BPE merge rules from ``docs[text]``.

    Returns the merge table (merge_rank, left_sym, right_sym, merged,
    pair_count) with rank in training order. Ties in pair counts break
    deterministically by (count DESC, left ASC, right ASC). Stops early
    if the vocabulary runs out of pairs (single-symbol words only).
    """
    spark = docs.sparkSession
    vocab = _word_vocab(docs, text).localCheckpoint(eager=False)
    rows: list[tuple] = []
    for r in range(1, n_merges + 1):
        # guard: fully-merged single-symbol words generate NO pairs —
        # F.sequence(1, 0) would DESCEND under ANSI and index out of bounds
        pair_arr = F.when(
            F.size("syms") >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size("syms") - 1),
                lambda i: F.struct(
                    F.element_at("syms", i).alias("a"),
                    F.element_at("syms", i + 1).alias("b"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
        pairs = vocab.select("freq", F.explode(pair_arr).alias("p"))
        best = (
            pairs.groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), "a", "b")
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, cnt = best[0]["a"], best[0]["b"], best[0]["cnt"]
        rows.append((r, a, b, a + b, cnt))
        vocab = vocab.withColumn("syms", _apply_merge(F.col("syms"), a, b))
        if r % checkpoint_every == 0:
            vocab = vocab.localCheckpoint(eager=False)
    return spark.createDataFrame(
        rows,
        "merge_rank int, left_sym string, right_sym string, "
        "merged string, pair_count long",
    )


def sql_bpe_merges(
    docs_table: str,
    n_merges: int,
    text: str = "text",
) -> str:
    """DuckDB mirror: regenerate the full K-round training as chained CTEs
    (same tokenizer, same char+END init, same weighted counts, same
    deterministic argmax, same greedy fold — `list_reduce` over
    singleton-wrapped symbols reproduces Spark's empty-init fold exactly,
    and DuckDB's inclusive negative slice means drop-last is ``[:-2]``).
    Assumes the corpus yields at least ``n_merges`` merges (the Spark side
    stops early; the generated SQL cannot)."""
    parts = [
        f"""toks AS (
      SELECT t.term AS word
      FROM {docs_table},
           unnest(string_split_regex(lower({text}), '{TOKEN_SPLIT_RE}')) AS t(term)
      WHERE t.term <> ''
    )""",
        f"""v0 AS (
      SELECT word, COUNT(*) AS freq,
             list_concat(string_split(word, ''), ['{END}']) AS syms
      FROM toks GROUP BY word
    )""",
    ]
    for r in range(1, n_merges + 1):
        parts.append(f"""p{r} AS (
      SELECT t.p.a AS a, t.p.b AS b, CAST(SUM(freq) AS BIGINT) AS cnt
      FROM v{r - 1},
           unnest(list_transform(range(1, len(syms)),
                                 i -> {{'a': syms[i], 'b': syms[i + 1]}})) AS t(p)
      GROUP BY 1, 2
    )""")
        parts.append(f"""b{r} AS (
      SELECT a, b, cnt FROM p{r} ORDER BY cnt DESC, a, b LIMIT 1
    )""")
        parts.append(f"""v{r} AS (
      SELECT v.word, v.freq,
             list_reduce(list_transform(v.syms, s -> [s]),
               (acc, x) -> CASE WHEN acc[-1] = b{r}.a AND x[1] = b{r}.b
                                THEN list_concat(acc[:-2], [b{r}.a || b{r}.b])
                                ELSE list_concat(acc, x) END) AS syms
      FROM v{r - 1} v CROSS JOIN b{r}
    )""")
    union = "\n      UNION ALL\n      ".join(
        f"SELECT CAST({r} AS INTEGER) AS merge_rank, a AS left_sym, "
        f"b AS right_sym, a || b AS merged, cnt AS pair_count FROM b{r}"
        for r in range(1, n_merges + 1)
    )
    return "WITH " + ",\n    ".join(parts) + f"\n    {union}"
