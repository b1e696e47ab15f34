"""Text-analysis operators for training-data pipelines — built-ins only.

Language-ID (stopword-hit heuristic), quality scoring (length/punctuation/
stopword ratios), token counting (whitespace + BPE-ish subword estimate),
rolling-hash document fingerprinting. Every expression is a Column — the hot
path never leaves the JVM, and each is SQL-expressible for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword lists (heuristic language ID; deliberately small
# and deterministic — a real pipeline swaps in fastText, same plumbing)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "por"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit", "nicht"],
    "fr": ["le", "la", "et", "les", "des", "est", "pour", "dans"],
}


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(F.split(F.trim(text), r"\s+"))


def subword_count(text: Column) -> Column:
    """BPE-ish token estimate: word-piece splits on 4-char boundaries —
    ceil(len(word)/4) summed, a deterministic stand-in for a real tokenizer."""
    words = F.split(F.trim(text), r"\s+")
    return F.aggregate(
        words, F.lit(0), lambda acc, w: acc + F.ceil(F.length(w) / F.lit(4.0)).cast("int")
    )


def _lang_hits(text: Column, lang: str) -> Column:
    words = F.split(F.lower(text), r"\s+")
    sw = F.array(*[F.lit(s) for s in STOPWORDS[lang]])
    return F.size(F.array_intersect(words, sw))


def lang_id(text: Column) -> Column:
    """Pick the language whose stopword list hits most distinct words;
    'und' (undetermined) when nothing hits."""
    langs = list(STOPWORDS)
    hits = F.array(
        *[F.struct(_lang_hits(text, lg).alias("h"), F.lit(lg).alias("lg")) for lg in langs]
    )
    best = F.array_max(hits)
    return F.when(best["h"] > 0, best["lg"]).otherwise(F.lit("und"))


def quality_score(text: Column) -> Column:
    """Quality heuristic in [0,1]: mean of three sub-scores — length band
    (50..5000 chars), alpha ratio (letters+spaces / chars), mean word length
    band (3..12)."""
    n = F.length(text).cast("double")
    len_score = F.when((n >= 50) & (n <= 5000), 1.0).when(n < 50, n / 50.0).otherwise(
        F.greatest(F.lit(0.0), 1.0 - (n - 5000) / 5000.0)
    )
    alpha = F.length(F.regexp_replace(text, r"[^A-Za-z ]", "")).cast("double") / F.greatest(
        n, F.lit(1.0)
    )
    words = F.split(F.trim(text), r"\s+")
    mwl = n / F.greatest(F.size(words).cast("double"), F.lit(1.0))
    mwl_score = F.when((mwl >= 3) & (mwl <= 12), 1.0).otherwise(0.5)
    return (len_score + alpha + mwl_score) / F.lit(3.0)


def fingerprint64(text: Column) -> Column:
    """Deterministic 64-bit content fingerprint (xxhash64 of normalized
    text: lowercased, whitespace collapsed) — the identity key for
    skip-existing/dedup manifests."""
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.xxhash64(norm)


def text_features(df: DataFrame, text: str = "text") -> DataFrame:
    t = F.col(text)
    return df.withColumns(
        {
            "n_tokens": token_count(t),
            "n_subwords": subword_count(t),
            "lang_pred": lang_id(t),
            "quality": quality_score(t),
            "fingerprint": fingerprint64(t),
        }
    )


def winnow_fingerprints(
    df: DataFrame,
    k: int = 5,
    w: int = 4,
    text: str = "text",
    key: str = "doc_id",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    scheme): hash every character k-gram of the normalized text, slide a
    window of ``w`` consecutive gram hashes, keep each window's minimum,
    dedup. Guarantee: any shared substring of length >= w + k - 1 between
    two documents yields at least one shared fingerprint, while only
    ~2/(w+1) of gram hashes are retained.

    All pure Column expressions (sequence/transform/slice/array_min — JVM
    whole-stage codegen); output one row per (key, fingerprint). The gram
    hash is the portable md5-60 (identical in DuckDB), so the driver oracle
    recomputes the fingerprint set exactly. The classic O(1) Karp-Rabin
    rolling *computation* of gram hashes is a scalar-loop optimization with
    no vectorized analog — the fingerprint SET this produces is the same.
    """
    out = (
        df.select(key, F.col(text).alias("__t"))
        .withColumn("__norm", F.regexp_replace(F.lower(F.trim("__t")), r"\s+", " "))
        .withColumn(
            "__gh",
            F.expr(
                f"transform(sequence(1, greatest(length(__norm) - {k} + 1, 1)),"
                f" i -> cast(conv(substring(md5(substring(__norm, i, {k})), 1, 15), 16, 10) as bigint))"
            ),
        )
        .withColumn(
            "fingerprint",
            F.explode(
                F.array_distinct(
                    F.expr(
                        f"transform(sequence(0, greatest(size(__gh) - {w}, 0)),"
                        f" j -> array_min(slice(__gh, j + 1, {w})))"
                    )
                )
            ),
        )
        .select(key, "fingerprint")
    )
    return out


def repetition_report(df: DataFrame, text: str = "text", key: str = "doc_id") -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021, public
    paper; the reference's nearest analog is the runtime range validators,
    `io/inputs.py:224-265`): per document —

    - ``n_tokens``: whitespace token count,
    - ``top_unigram_share``: count of the most frequent token / n_tokens,
    - ``top_bigram_share``: count of the most frequent word bigram / #bigrams,
    - ``dup_token_frac``: fraction of tokens whose token occurs >= 2 times.

    Shape: explode tokens/bigrams -> two-phase hash aggregate keyed by
    (doc, gram) -> per-doc max/sum. The shuffle key is (doc_id, 64-bit gram
    hash) — never the text — and partial aggregation collapses each doc's
    grams map-side, so at 10^12 docs the shuffled bytes are ~|distinct grams|
    not |tokens|. Ties on gram counts don't matter (shares use the max).
    """
    toks = (
        df.select(key, F.split(F.lower(F.trim(F.col(text))), r"\s+").alias("__toks"))
        .localCheckpoint(eager=False)
    )
    uni = (
        toks.select(key, F.explode("__toks").alias("__w"))
        .groupBy(key, "__w")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(key)
        .agg(
            F.sum("c").alias("n_tokens"),
            F.max("c").alias("top_uni"),
            F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(F.lit(0))).alias("dup_toks"),
        )
    )
    bi = (
        toks.select(
            key,
            F.explode(
                # sequence(1, 0) DESCENDS in Spark — guard the 1-token case
                # with an explicit empty array instead of greatest()
                F.expr(
                    "if(size(__toks) < 2, array(),"
                    " transform(sequence(1, size(__toks) - 1),"
                    " i -> concat(element_at(__toks, i), ' ', element_at(__toks, i + 1))))"
                )
            ).alias("__b"),
        )
        .groupBy(key, "__b")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(key)
        .agg(F.sum("c").alias("n_bigrams"), F.max("c").alias("top_bi"))
    )
    return (
        uni.join(bi, on=key, how="left")
        .select(
            key,
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.round(F.col("top_uni") / F.col("n_tokens"), 6).alias("top_unigram_share"),
            F.round(
                F.coalesce(F.col("top_bi") / F.col("n_bigrams"), F.lit(0.0)), 6
            ).alias("top_bigram_share"),
            F.round(F.col("dup_toks") / F.col("n_tokens"), 6).alias("dup_token_frac"),
        )
    )


# PII patterns kept to a portable regex subset (no lookaround, no \b) so the
# identical pattern strings run in Spark (Java regex) and DuckDB (RE2).
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}"
PII_SSN = r"[0-9]{3}-[0-9]{2}-[0-9]{4}"


def redact_pii(
    df: DataFrame, text: str = "text", key: str = "doc_id"
) -> DataFrame:
    """Training-data PII scrub: replace email / phone / SSN-shaped spans
    with typed placeholder tags and report per-doc hit counts. Pure
    ``regexp_replace`` / ``regexp_count`` Column expressions — JVM-side,
    codegen'd, no UDF; at scale this is a map-only stage (zero shuffle).

    Order matters: SSN before phone (a phone regex may swallow an SSN's
    tail), email first (emails can contain digit runs).
    """
    t = F.col(text)
    n_email = F.regexp_count(t, F.lit(PII_EMAIL))
    n_ssn = F.regexp_count(t, F.lit(PII_SSN))
    clean = F.regexp_replace(t, PII_EMAIL, "<EMAIL>")
    clean = F.regexp_replace(clean, PII_SSN, "<SSN>")
    n_phone = F.regexp_count(clean, F.lit(PII_PHONE))
    clean = F.regexp_replace(clean, PII_PHONE, "<PHONE>")
    return df.select(
        key,
        clean.alias("clean_text"),
        n_email.cast("int").alias("n_emails"),
        n_phone.cast("int").alias("n_phones"),
        n_ssn.cast("int").alias("n_ssns"),
    )


def top_ngrams(
    df: DataFrame,
    n: int = 2,
    k: int = 20,
    text: str = "text",
) -> DataFrame:
    """Corpus vocabulary builder: global top-``k`` word ``n``-grams by count
    (the first step of building a tokenizer vocab / boilerplate blocklist
    over a training corpus). Normalization: lowercase, strip non-alnum to
    spaces, split on whitespace, drop empties — identical on the DuckDB
    oracle side.

    Shape: map-only gram expansion (transform/slice/array_join — pure
    Column, codegen'd) -> explode -> two-phase hash aggregate on the gram
    string -> top-k. At 10^12 docs the groupBy key is the gram text; partial
    aggregation collapses per-partition duplicates map-side so the shuffle
    carries ~|distinct grams| rows, and the final top-k is a TakeOrdered —
    no global sort materialization. Deterministic tie-break: (count DESC,
    gram ASC).
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    words = F.filter(
        F.split(F.lower(F.regexp_replace(F.col(text), "[^A-Za-z0-9]+", " ")), " "),
        lambda w: w != "",
    )
    grams = F.expr(
        f"if(size(__ws) < {n}, array(),"
        f" transform(sequence(1, size(__ws) - {n} + 1),"
        f" i -> array_join(slice(__ws, i, {n}), ' ')))"
    )
    return (
        df.select(words.alias("__ws"))
        .select(F.explode(grams).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("gram"))
        .limit(int(k))
    )


def contamination_report(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    text: str = "text",
    key: str = "doc_id",
    bench_text: str = "text",
) -> DataFrame:
    """Benchmark decontamination: per-document count of word ``n``-grams
    that also appear in an evaluation set — the standard training-corpus
    hygiene pass (n=13 following GPT-3/PaLM's 13-gram overlap rule; public
    methodology, Brown et al. 2020 §C).

    Output: ``(key, n_grams, n_contaminated, contaminated)`` for EVERY input
    doc — zero-hit docs included (left join + fill), because the consumer
    filters on the flag and must see clean docs.

    Scale shape: the benchmark gram set is small by construction (eval sets
    are ~10^5-10^7 grams even when the corpus is 10^12 docs), so it
    BROADCASTS: the corpus side explodes to grams map-side, semi-joins
    against the broadcast hash set with no corpus shuffle, and the only
    exchange is the per-doc count aggregation (partial map-side combine on
    the doc key). Gram identity is the 64-bit xxhash of the shingle string
    (8-byte broadcast entries; ~2^-64 false-hit rate per gram pair).
    """
    from geo_epic_spark.operators.dedup import shingles

    bench_grams = (
        shingles(benchmark.select(bench_text), bench_text, n)
        .select(F.xxhash64("shingle").alias("__g"))
        .distinct()
    )
    doc_grams = shingles(docs.select(key, text), text, n).select(
        key, F.xxhash64("shingle").alias("__g")
    )
    totals = doc_grams.groupBy(key).agg(F.count(F.lit(1)).alias("n_grams"))
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "__g", "left_semi")
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    return (
        totals.join(hits, key, "left")
        .na.fill(0, ["n_contaminated"])
        .withColumn(
            "contaminated", (F.col("n_contaminated") > 0).cast("int")
        )
    )


def remove_boilerplate_lines(
    df: DataFrame,
    text: str = "text",
    key: str = "doc_id",
    max_docs: int = 1,
    out: str = "text_clean",
) -> DataFrame:
    """CCNet-style line-level boilerplate removal: drop every line that
    occurs (verbatim) in more than ``max_docs`` distinct documents —
    navigation chrome, cookie banners, shared headers/footers — and
    reassemble each document from its surviving lines in original order
    (public methodology: Wenzek et al. 2020, CCNet §4.1, applied at line
    rather than paragraph granularity).

    Output: ``(key, out)`` with one row per INPUT document; a document whose
    every line is boilerplate survives with ``out = ''`` (the consumer
    decides whether to drop empties — that is a quality-floor policy, not a
    dedup decision).

    Scale shape (100 TB lens): three exchanges, all on bounded keys —
    (1) the line-frequency aggregate shuffles exploded lines on the line
    value with map-side partial distinct-doc counting; at web scale the
    group key would be a 128-bit line fingerprint instead of the string
    (identical plan, 16-byte shuffle rows) — kept as the raw line here so
    the oracle is exact. (2) The common-line set (count > max_docs) is the
    SMALL side by construction — boilerplate is, definitionally, the few
    lines shared by many docs — so the anti-join BROADCASTS it; the
    exploded corpus never shuffles for the filter. (3) Reassembly groups
    surviving lines on the doc key (partial map-side collect). No window,
    no global sort; per-doc line counts bound the collected arrays.
    """
    lines = df.select(
        F.col(key),
        F.posexplode(F.split(F.col(text), "\n")).alias("__pos", "__line"),
    )
    common = (
        lines.groupBy("__line")
        .agg(F.countDistinct(key).alias("__nd"))
        .filter(F.col("__nd") > int(max_docs))
        .select("__line")
    )
    kept = lines.join(F.broadcast(common), "__line", "left_anti")
    rebuilt = kept.groupBy(key).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__line"))),
                lambda s: s["__line"],
            ),
            "\n",
        ).alias(out)
    )
    return (
        df.select(key)
        .join(rebuilt, key, "left")
        .withColumn(out, F.coalesce(F.col(out), F.lit("")))
    )


def chunk_documents(
    df: DataFrame,
    text: str = "text",
    key: str = "doc_id",
    chunk_tokens: int = 256,
    overlap: int = 32,
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the layout
    step between curation and sequence packing when docs exceed the model
    context (each chunk re-reads ``overlap`` tokens of its predecessor so
    no span is ever cut without context).

    Chunk k covers tokens ``[k*step, k*step + chunk_tokens)`` with
    ``step = chunk_tokens - overlap``; chunk 0 always exists, and a later
    chunk exists iff it contributes at least one NEW token
    (``k*step + overlap < n_tokens``), so the tail is never an
    overlap-only duplicate. All boundary arithmetic is integer (floor
    division), identical across engines.

    Output: ``(key, chunk_id, chunk_text, n_tokens)``, one row per chunk.

    Scale shape: pure Column expressions — split, sequence, explode, slice —
    map-only with zero shuffle at any corpus size; the explode fan-out is
    bounded by doc length / step. Whitespace tokenization here; a real BPE
    swaps in an Arrow-batched mapInPandas with the same boundary contract.
    """
    if overlap < 0 or chunk_tokens <= overlap:
        raise ValueError(
            f"need 0 <= overlap < chunk_tokens, got {overlap}/{chunk_tokens}"
        )
    step = chunk_tokens - overlap
    toks = F.split(F.trim(F.col(text)), r"\s+")
    n = F.size(toks)
    n_chunks = F.lit(1) + F.greatest(
        F.lit(0),
        F.floor((n - F.lit(overlap) - F.lit(1)) / F.lit(step)).cast("int"),
    )
    start = F.col("__k") * F.lit(step)  # 0-based; slice() is 1-based
    return (
        df.select(
            F.col(key),
            toks.alias("__t"),
            n.alias("__n"),
            F.explode(F.sequence(F.lit(0), n_chunks - F.lit(1))).alias("__k"),
        )
        .select(
            F.col(key),
            F.col("__k").cast("int").alias("chunk_id"),
            F.array_join(
                F.slice(F.col("__t"), start + F.lit(1), F.lit(chunk_tokens)), " "
            ).alias("chunk_text"),
            F.least(F.lit(chunk_tokens), F.col("__n") - start)
            .cast("int")
            .alias("n_tokens"),
        )
    )


def bigram_lm_score(
    df: DataFrame,
    text: str = "text",
    key: str = "doc_id",
    alpha: float = 0.5,
    model: tuple[DataFrame, DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """LM-perplexity quality scoring (CCNet methodology, Wenzek et al. 2020
    — public paper; they train a KenLM 5-gram and bucket the corpus by
    perplexity, this op is the same plumbing with a self-trained add-alpha
    bigram model so it stays library-free and SQL-oracle-able).

    Train: bigram counts C(w1,w2) and outgoing-context counts C(w1) over
    the (lowercased, whitespace-split) corpus; vocabulary V = distinct
    tokens. Score: per document, mean negative log-likelihood over its
    bigrams with P(w2|w1) = (C(w1,w2) + alpha) / (C(w1) + alpha*V). Lower
    ``avg_nll`` = more language-model-typical text (CCNet keeps the "head"
    bucket). Docs with < 2 tokens score NULL with n_bigrams = 0.

    Scale shape: the model is two hash aggregates over exploded bigrams —
    the shuffle key is the 64-bit xxhash of the gram, never the text, and
    partial aggregation collapses repeats map-side so the shuffled rows are
    ~|distinct bigrams|, not |tokens| (same layout as repetition_report).
    Scoring is two equi-joins on those 8-byte hash keys; frequent grams
    ("of the") make the join many-to-one with a hot build key — AQE
    skew-split handles the probe side, and at 10^12 docs the model table
    (|distinct bigrams| rows of 16 bytes) is usually broadcastable after
    a min-count floor. Pass ``model=`` (the triple returned by
    ``bigram_lm_train``) to reuse one trained model across many scoring
    runs instead of re-aggregating per call.
    """
    toks = df.select(
        key, F.split(F.lower(F.trim(F.col(text))), r"\s+").alias("__t")
    )
    big = toks.select(
        key,
        F.explode(
            # sequence(1, 0) DESCENDS in Spark — guard the 1-token case
            F.expr(
                "if(size(__t) < 2, array(),"
                " transform(sequence(1, size(__t) - 1),"
                " i -> struct(element_at(__t, i) AS w1,"
                "             concat(element_at(__t, i), ' ',"
                "                    element_at(__t, i + 1)) AS g)))"
            )
        ).alias("__b"),
    ).select(key, F.xxhash64("__b.w1").alias("__ch"), F.xxhash64("__b.g").alias("__gh"))
    if model is None:
        model = bigram_lm_train(df, text=text)
    bg_counts, ctx_counts, vocab = model
    scored = (
        # LEFT joins: with a pretrained ``model`` an unseen bigram/context
        # must get the smoothed floor alpha / (C(w1) + alpha*V) — an inner
        # join would silently drop it and overrate out-of-domain docs.
        # (Self-trained, every scored gram is in the model; same result.)
        big.join(bg_counts, "__gh", "left")
        .join(ctx_counts, "__ch", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            key,
            (
                -F.log(
                    (F.coalesce("__c12", F.lit(0)) + F.lit(alpha))
                    / (F.coalesce("__c1", F.lit(0)) + F.lit(alpha) * F.col("__v"))
                )
            ).alias("__nll"),
        )
        .groupBy(key)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg("__nll"), 6).alias("avg_nll"),
        )
    )
    return (
        df.select(key)
        .join(scored, key, "left")
        .na.fill(0, ["n_bigrams"])
        .select(key, F.col("n_bigrams").cast("long").alias("n_bigrams"), "avg_nll")
    )


def bigram_lm_train(
    df: DataFrame, text: str = "text"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Train the add-alpha bigram model used by ``bigram_lm_score``:
    returns ``(bigram_counts(__gh, __c12), context_counts(__ch, __c1),
    vocab(__v))`` keyed by 64-bit gram hashes. Persist these as parquet to
    score many corpora against one reference model (the actual CCNet
    setup: model trained on Wikipedia, applied to Common Crawl)."""
    toks = df.select(F.split(F.lower(F.trim(F.col(text))), r"\s+").alias("__t"))
    big = toks.select(
        F.explode(
            F.expr(
                "if(size(__t) < 2, array(),"
                " transform(sequence(1, size(__t) - 1),"
                " i -> struct(element_at(__t, i) AS w1,"
                "             concat(element_at(__t, i), ' ',"
                "                    element_at(__t, i + 1)) AS g)))"
            )
        ).alias("__b")
    )
    bg_counts = (
        big.groupBy(F.xxhash64("__b.g").alias("__gh"))
        .agg(F.count(F.lit(1)).alias("__c12"))
    )
    ctx_counts = (
        big.groupBy(F.xxhash64("__b.w1").alias("__ch"))
        .agg(F.count(F.lit(1)).alias("__c1"))
    )
    vocab = (
        toks.select(F.explode("__t").alias("__w"))
        .agg(F.count_distinct("__w").alias("__v"))
    )
    return bg_counts, ctx_counts, vocab


def remove_duplicate_spans(
    df: DataFrame,
    text: str = "text",
    key: str = "doc_id",
    k: int = 50,
    min_count: int = 2,
    gram_hash: str = "xxhash64",
) -> DataFrame:
    """Passage-level exact dedup (Lee et al. 2021, "Deduplicating Training
    Data Makes Language Models Better" — public paper): any ``k``-token
    span occurring >= ``min_count`` times in the corpus is cut from EVERY
    document carrying it, and the survivors are reassembled in order.
    Catches the boilerplate/quote/license passages that document-level
    dedup can't (the docs differ, the passage repeats).

    Shape (the suffix-array-free Spark formulation): rolling k-gram hashes
    with positions (map-only HOF expansion) -> global gram-count hash
    aggregate keyed by the 64-bit gram hash (partial map-side combine, so
    the shuffle carries ~|distinct grams| rows of 8 bytes, never token
    text) -> left-semi back onto the positions -> covered-token expansion
    (explode of k-long ranges) -> left-anti against the token positions ->
    ordered per-doc reassembly (one doc-key aggregate). Token-granular
    explosion is the honest cost of this operator at any scale; the
    alternative (distributed suffix arrays) buys a log factor at far worse
    constants.

    ``gram_hash``: 'xxhash64' (default) or 'md5_60' (first 15 hex chars of
    md5 — computable identically in any engine with md5, for oracle
    checks; ~2^-60/pair collision odds, and a collision only ever REMOVES
    an extra span, never corrupts token order).

    Output: ``(key, clean_text, n_tokens, n_removed)`` for every input doc
    (a fully-deduplicated doc survives with clean_text = '').
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    toks = df.select(
        key, F.split(F.trim(F.col(text)), r"\s+").alias("__t")
    ).localCheckpoint(eager=False)

    gram_str = f"array_join(slice(__t, i, {k}), ' ')"
    gh = (
        f"CAST(conv(substring(md5({gram_str}), 1, 15), 16, 10) AS BIGINT)"
        if gram_hash == "md5_60"
        else f"xxhash64({gram_str})"
    )
    if gram_hash not in ("xxhash64", "md5_60"):
        raise ValueError(f"unknown gram_hash {gram_hash!r}")
    grams = toks.select(
        key,
        F.posexplode(
            F.expr(
                f"if(size(__t) < {k}, array(),"
                f" transform(sequence(1, size(__t) - {k} + 1), i -> {gh}))"
            )
        ).alias("__p", "__gh"),
    )
    dup = (
        grams.groupBy("__gh")
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") >= int(min_count))
        .select("__gh")
    )
    covered = (
        grams.join(dup, "__gh", "left_semi")
        .select(key, F.explode(F.sequence("__p", F.col("__p") + F.lit(k - 1))).alias("__tp"))
        .distinct()
    )
    tokens = toks.select(key, F.posexplode("__t").alias("__tp", "__w"))
    kept = tokens.join(covered, [key, "__tp"], "left_anti")
    rebuilt = kept.groupBy(key).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__tp", "__w"))),
                lambda x: x["__w"],
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("__n_kept"),
    )
    totals = toks.select(key, F.size("__t").cast("long").alias("n_tokens"))
    return (
        totals.join(rebuilt, key, "left")
        .select(
            key,
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            "n_tokens",
            (F.col("n_tokens") - F.coalesce("__n_kept", F.lit(0))).alias("n_removed"),
        )
    )


# ---------------------------------------------------------------------------
# Text normalization / mojibake repair (C4 / CCNet-style cleanup)
# ---------------------------------------------------------------------------

# (pattern, replacement, is_regex) applied IN ORDER. This ONE table drives
# both the Spark Column chain (`norm_expr`) and the DuckDB SQL mirror
# (`sql_norm_expr`) — engine/oracle parity holds by construction, the same
# pattern as cells.sql_zorder_key. Order matters: multi-char mojibake
# sequences first (they contain 'â'/'Ã' lead bytes), then
# single-char unicode punctuation, then zero-width/control strips,
# whitespace last. Regex steps use only syntax with identical semantics in
# Java regex (Spark) and RE2 (DuckDB): literal chars inside classes and
# \xHH ranges. NOTE: \s differs between the engines on \x0B — safe here
# only because the control-strip step removes \x0B/\x0C first (keep that
# ordering).
NORMALIZE_STEPS: list[tuple[str, str, bool]] = [
    # mojibake: UTF-8 bytes mis-decoded as cp1252/latin-1
    # ("’" -> b"\xe2\x80\x99" -> "â€™", etc.)
    ("â€™", "'", False),    # ’
    ("â€˜", "'", False),    # ‘
    ("â€œ", '"', False),    # “
    ("â€", '"', False),    # ” (0x9D unmapped in cp1252)
    ("â€“", "-", False),    # –
    ("â€”", "-", False),    # —
    ("â€¦", "...", False),  # …
    ("Ã©", "é", False),     # é
    ("Ã¨", "è", False),     # è
    ("Ã¡", "á", False),     # á
    ("Ã³", "ó", False),     # ó
    ("Ã±", "ñ", False),     # ñ
    ("Ã¼", "ü", False),     # ü
    ("Ã¶", "ö", False),     # ö
    ("Ã¤", "ä", False),     # ä
    ("Ã§", "ç", False),     # ç
    ("Ã¯", "ï", False),     # ï
    ("Â ", " ", False),          # Â + NBSP artifact
    ("Â°", "°", False),     # Â° -> °
    # unicode punctuation -> ASCII
    ("’", "'", False),
    ("‘", "'", False),
    ("“", '"', False),
    ("”", '"', False),
    ("–", "-", False),
    ("—", "-", False),
    ("…", "...", False),
    (" ", " ", False),
    # zero-width + BOM (literal chars in the class: identical in both engines)
    ("[​‌‍﻿]", "", True),
    # C0/C1 control chars; keeps \t \n \r for the whitespace collapse
    (r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", "", True),
    # whitespace collapse (post-control-strip: only space/\t/\n/\r remain,
    # on which Java and RE2 \s agree)
    (r"\s+", " ", True),
]


def norm_expr(text: Column, lowercase: bool = False) -> Column:
    """Normalization chain as a pure Column expression (map-only, zero
    shuffle, whole-stage codegen — replace/regexp_replace are JVM
    built-ins)."""
    c = text
    for pat, rep, is_re in NORMALIZE_STEPS:
        c = F.regexp_replace(c, pat, rep) if is_re else F.replace(c, F.lit(pat), F.lit(rep))
    c = F.trim(c)
    return F.lower(c) if lowercase else c


def sql_norm_expr(expr: str, lowercase: bool = False) -> str:
    """DuckDB mirror of `norm_expr`, generated from the SAME step table."""

    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    e = expr
    for pat, rep, is_re in NORMALIZE_STEPS:
        if is_re:
            e = f"regexp_replace({e}, {q(pat)}, {q(rep)}, 'g')"
        else:
            e = f"replace({e}, {q(pat)}, {q(rep)})"
    e = f"trim({e})"
    return f"lower({e})" if lowercase else e


def normalize_text(
    df: DataFrame,
    text: str = "text",
    key: str = "doc_id",
    lowercase: bool = False,
) -> DataFrame:
    """C4/CCNet-style text cleanup (public methodology; ftfy-lite): repair
    the common UTF-8-as-cp1252 mojibake sequences, fold curly quotes /
    dashes / ellipses to ASCII, drop zero-width and control characters,
    collapse whitespace. Map-only — at 100 TB this runs inside the scan
    stage with zero shuffle. Output: (key, norm_text, changed:int)."""
    c = F.col(text)
    n = norm_expr(c, lowercase=lowercase)
    return df.select(
        key,
        n.alias("norm_text"),
        (c != n).cast("int").alias("changed"),
    )
