"""Sampling / sharding / packing operators for training-data pipelines.

The reference selects work subsets by explicit id lists and fractional row
ranges (`geoEpic/core/workspace.py` select/filter semantics, already covered
by P3/P5/W10); a 100 TB curation pipeline additionally needs *reproducible*
subsetting and shard layout:

- ``deterministic_sample`` / ``stratified_sample`` — hash-based Bernoulli
  sampling keyed on a stable id. Unlike ``DataFrame.sample`` (whose output
  depends on partition layout and seed-per-partition), the keep/drop decision
  is a pure function of the key, so re-runs, retries, resumed jobs, and
  different cluster sizes all select the SAME rows — the property a resumable
  ingest (S9/P3) needs. Pure Column expressions, exactly mirrorable in SQL.
- ``shard_by_token_budget`` — contiguous token-budget sharding: walk docs in
  a deterministic order and cut a new shard every ``budget`` tokens (the
  standard layout step before sequence packing in LLM training pipelines).
  ``method='window'`` is one running-sum window per group;
  ``method='ranged'`` is the scale path: repartitionByRange on the order key,
  per-partition prefix sums via mapInPandas, plus a tiny driver-side merge of
  per-partition totals (c = #partitions rows) broadcast back — the classic
  distributed prefix-scan, bit-identical to the window path.
- ``pack_greedy`` — next-fit sequence packing inside each shard/group:
  inherently sequential per group (bin boundary depends on the running
  bin-local sum), so it runs as one applyInPandas pass per group; groups are
  the parallelism unit. Oracled against a DuckDB recursive CTE.

All integer hash arithmetic stays within signed-64 range (ANSI mode safe) and
is reproduced digit-for-digit by the DuckDB oracles.
"""

from __future__ import annotations

from functools import reduce

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "hash_unit",
    "deterministic_sample",
    "stratified_sample",
    "sample_to_mix",
    "shard_by_token_budget",
    "pack_greedy",
    "shuffle_rows",
    "split_assign",
]

# two-round Lehmer mix; every intermediate fits signed 64-bit:
# max h = 2**31 - 2, times 2654435761 ~ 5.7e18 < 2**63 - 1.
_M0 = 1_000_003          # first fold of the raw key
_A1 = 2_654_435_761      # Knuth multiplicative constant
_A2 = 48_271             # Lehmer / MINSTD multiplier
_M1 = 2_147_483_647      # 2**31 - 1 (Mersenne prime)


def hash_unit(key: Column, salt: int = 0) -> Column:
    """Deterministic uniform-ish value in [0, 1) from a bigint key.

    A pure function of (key, salt): independent of partitioning, task
    retries, and cluster size. NOT a cryptographic hash — a reproducible
    decision function for sampling."""
    h = F.pmod(key.cast("long"), F.lit(_M0)) + F.lit(int(salt) % _M1)
    h = F.pmod(h * F.lit(_A1), F.lit(_M1))
    h = F.pmod(h * F.lit(_A2), F.lit(_M1))
    return h.cast("double") / F.lit(float(_M1))


def deterministic_sample(
    df: DataFrame, key: str, rate: float, salt: int = 0
) -> DataFrame:
    """Keep each row iff hash_unit(key, salt) < rate. Reproducible Bernoulli
    sampling ~``rate`` of rows; the same (key, salt) always makes the same
    decision, so downstream joins on the sample are stable across runs."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return df.filter(hash_unit(F.col(key), salt) < F.lit(float(rate)))


def stratified_sample(
    df: DataFrame,
    key: str,
    group: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: int = 0,
) -> DataFrame:
    """Per-group keep rates (e.g. downsample boilerplate sources, keep all of
    a rare high-quality source). ``rates`` maps group value -> rate; groups
    not listed get ``default_rate``. One map-only filter stage — no shuffle,
    no per-group pass."""
    for g, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for group {g!r} must be in [0, 1], got {r}")
    rate = reduce(
        lambda acc, kv: acc.when(F.col(group) == F.lit(kv[0]), F.lit(float(kv[1]))),
        rates.items(),
        F.when(F.lit(False), F.lit(0.0)),
    ).otherwise(F.lit(float(default_rate)))
    return df.filter(hash_unit(F.col(key), salt) < rate)


def shard_by_token_budget(
    df: DataFrame,
    order_key: str,
    tokens: str,
    budget: int,
    group: str | None = None,
    method: str = "window",
    out: str = "shard_id",
) -> DataFrame:
    """Assign each row a 0-based ``shard_id`` so consecutive rows (ordered by
    ``order_key`` within ``group``) accumulate ~``budget`` tokens per shard:
    shard_id = floor(exclusive_prefix_sum(tokens) / budget).

    method='window': running-sum window per group. Right when ``group`` is a
    real partition key (source, date bucket); a single global group funnels
    the sort into one task.

    method='ranged' (group must be None): the 100 TB path for one global
    ordering — repartitionByRange(order_key) keeps the order across
    partitions, each partition computes its local prefix sums in one
    mapInPandas pass, and the per-partition token totals (one tiny row per
    partition) are merged driver-side into broadcast offsets. Bit-identical
    to the window path (equivalence-tested)."""
    if method == "window":
        keys = [group] if group else []
        w = (
            Window.partitionBy(*keys)
            .orderBy(order_key)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        cum_before = F.coalesce(F.sum(F.col(tokens).cast("long")).over(w), F.lit(0))
        return df.withColumn(out, F.floor(cum_before / F.lit(int(budget))))
    if method != "ranged":
        raise ValueError(f"unknown method {method!r}")
    if group is not None:
        raise ValueError("method='ranged' implements the single global ordering; "
                         "use method='window' with a group")

    budget_i = int(budget)
    # sortWithinPartitions: a LOCAL sort (no exchange) so the partition's
    # Arrow batches stream into local_scan already globally ordered — the
    # scan then just carries a running total across batches. Sorting inside
    # the pandas function instead would be wrong the moment one partition
    # spans multiple Arrow batches (each batch would be sorted and prefix-
    # summed in isolation — caught by the window≡ranged equivalence test
    # when the batch default dropped to 2048), and Spark's sort spills while
    # a whole-partition pandas sort would not.
    ranged = df.repartitionByRange(F.col(order_key)).sortWithinPartitions(order_key)
    # pin the range partitioning: the offsets collect and the mapInPandas
    # scan are two separate actions over this frame, and the range bounds
    # come from a sampling pass — materialize once so both actions see the
    # SAME row->partition assignment
    part = ranged.withColumn("__pid", F.spark_partition_id()).localCheckpoint(
        eager=False
    )
    # tiny: one row per partition (c = #partitions), the only driver-side data
    totals = {
        r["__pid"]: (r["tok"], r["lo"], r["cnt"])
        for r in part.groupBy("__pid")
        .agg(
            F.sum(F.col(tokens).cast("long")).alias("tok"),
            F.min(order_key).alias("lo"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .collect()
    }
    # range partitions are ordered by their key range; empty partitions carry
    # no rows and need no offset
    order = sorted(totals, key=lambda p: (totals[p][1], p))
    offsets, acc = {}, 0
    for p in order:
        offsets[p] = acc
        acc += int(totals[p][0])

    spark = df.sparkSession
    boff = spark.sparkContext.broadcast(offsets)
    fields = part.schema.fields
    out_schema = T.StructType(
        [f for f in fields if f.name != "__pid"] + [T.StructField(out, T.LongType())]
    )
    cols = [f.name for f in fields if f.name != "__pid"]

    def local_scan(pdfs):
        run = None  # running token total, carried ACROSS this partition's batches
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            if run is None:
                run = boff.value[int(pdf["__pid"].iloc[0])]
            t = pdf[tokens].astype("int64")
            csum = t.cumsum().shift(fill_value=0) + run
            run += int(t.sum())
            res = pdf[cols].copy()
            res[out] = (csum // budget_i).astype("int64").to_numpy()
            yield res

    return part.mapInPandas(local_scan, schema=out_schema)


def pack_greedy(
    df: DataFrame,
    group: str,
    order_key: str,
    tokens: str,
    budget: int,
    out: str = "bin_id",
) -> DataFrame:
    """Next-fit greedy packing: walk each group's rows in ``order_key`` order
    and start a new 0-based ``bin_id`` whenever adding the row would push the
    current bin past ``budget`` tokens (a row alone larger than the budget
    gets its own bin). The per-bin boundary depends on the running bin-local
    sum, so the scan is inherently sequential per group — one applyInPandas
    pass; parallelism comes from the number of groups (shard first with
    shard_by_token_budget when groups are too few/fat)."""
    budget_i = int(budget)
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out, T.LongType())]
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_key, kind="mergesort").reset_index(drop=True)
        bins = []
        cur, cur_sum = 0, 0
        for t in pdf[tokens].astype("int64").to_numpy():
            t = int(t)
            if cur_sum > 0 and cur_sum + t > budget_i:
                cur += 1
                cur_sum = 0
            bins.append(cur)
            cur_sum += t
        pdf[out] = pd.Series(bins, dtype="int64")
        return pdf

    return df.groupBy(group).applyInPandas(_pack, schema=out_schema)


def sample_to_mix(
    df: DataFrame,
    key: str,
    group: str,
    weights: dict[str, int],
    salt: int = 0,
    buckets: int = 1024,
) -> DataFrame:
    """Downsample to an EXACT target domain mix (training-corpus source
    balancing): ``weights`` gives integer mix parts per group value, e.g.
    ``{'web': 5, 'code': 3, 'wiki': 2}`` for a 50/30/20 blend. The largest
    feasible blend is ``n_units = min_g(count_g // w_g)`` and group ``g``
    keeps exactly ``w_g * n_units`` rows — the ``w_g * n_units`` SMALLEST
    rows under the reproducible ``(hash_unit(key, salt), key)`` order, so
    the selection is a pure function of the data (independent of
    partitioning, retries, and cluster size). Groups not in ``weights`` are
    dropped. All blend arithmetic is integer — no float-boundary ambiguity.

    Unlike ``stratified_sample`` (map-only, EXPECTED proportions), this
    guarantees the realized mix, which matters when the blend ratio is the
    training contract.

    Scale shape (100 TB lens): exact per-group top-k WITHOUT a per-group
    global sort. Phase 1 histograms rows into ``buckets`` hash ranges per
    group — one partial-aggregated exchange of at most G x ``buckets`` tiny
    rows, collected to the driver (bounded by the argument, not the data).
    The driver picks, per group, the bucket prefix that fits under the take
    and how many rows the boundary bucket still owes. Phase 2 is a map-only
    filter for the prefix buckets, plus a row_number window over ONLY the
    boundary-bucket rows (~take/buckets rows per group, not count_g) for the
    remainder. Equal-hash rows always share a bucket (the bucket is a floor
    of the hash), so prefix + ranked-boundary reproduces the global
    (hash, key) order exactly.
    """
    for g, w in weights.items():
        if int(w) <= 0:
            raise ValueError(f"weight for group {g!r} must be positive, got {w}")
    in_mix = df.filter(F.col(group).isin(*weights.keys()))
    hcol = hash_unit(F.col(key), salt)
    bcol = F.floor(hcol * F.lit(int(buckets))).cast("int")
    hist = (
        in_mix.groupBy(group, bcol.alias("__b"))
        .agg(F.count(F.lit(1)).alias("__n"))
        .collect()  # bounded: at most len(weights) * buckets rows
    )
    counts: dict[str, int] = {}
    per_bucket: dict[str, dict[int, int]] = {}
    for r in hist:
        counts[r[group]] = counts.get(r[group], 0) + r["__n"]
        per_bucket.setdefault(r[group], {})[r["__b"]] = r["__n"]
    if set(weights) - set(counts):
        # a requested group is absent: the only exact blend is empty
        return in_mix.filter(F.lit(False)).select(df.columns)
    n_units = min(counts[g] // int(w) for g, w in weights.items())
    cutoff: dict[str, int] = {}     # first bucket NOT fully kept
    owe: dict[str, int] = {}        # rows still owed from that bucket
    for g, w in weights.items():
        take = int(w) * n_units
        acc = 0
        cut = int(buckets)
        for b in sorted(per_bucket[g]):
            if acc + per_bucket[g][b] > take:
                cut = b
                break
            acc += per_bucket[g][b]
        cutoff[g], owe[g] = cut, take - acc
    cut_expr = reduce(
        lambda acc, kv: acc.when(F.col(group) == F.lit(kv[0]), F.lit(kv[1])),
        cutoff.items(),
        F.when(F.lit(False), F.lit(0)),
    ).otherwise(F.lit(-1))
    owe_expr = reduce(
        lambda acc, kv: acc.when(F.col(group) == F.lit(kv[0]), F.lit(kv[1])),
        owe.items(),
        F.when(F.lit(False), F.lit(0)),
    ).otherwise(F.lit(0))
    prefix = in_mix.filter(bcol < cut_expr)
    boundary = (
        in_mix.filter(bcol == cut_expr)
        .withColumn(
            "__rk",
            F.row_number().over(
                Window.partitionBy(group).orderBy(hcol.asc(), F.col(key).asc())
            ),
        )
        .filter(F.col("__rk") <= owe_expr)
        .drop("__rk")
    )
    return prefix.unionByName(boundary)


def shuffle_rows(
    df: DataFrame,
    key: str,
    salt: int = 0,
    method: str = "ranged",
    out: str = "shuffle_pos",
) -> DataFrame:
    """Deterministic global shuffle — the training-order randomization step
    of an LLM data pipeline. Every row gets a 0-based ``shuffle_pos``: its
    rank under the reproducible ``(hash_unit(key, salt), key)`` order, so
    the permutation is a pure function of (data, salt) — re-runs, retries
    and different cluster sizes produce the SAME order, and a new epoch is
    just a new ``salt``. (``DataFrame.orderBy(rand())`` gives neither.)

    method='ranged' (default, the 100 TB path): repartitionByRange on the
    hash spreads the permutation across partitions (one range Exchange —
    the shuffle you are buying on purpose), each partition ranks locally in
    one mapInPandas pass, and per-partition row counts (one tiny row per
    partition) become broadcast rank offsets — the same distributed
    prefix-scan as ``shard_by_token_budget(method='ranged')``. No global
    single-task sort anywhere.

    method='window': one global row_number window — a single-task sort;
    correctness baseline and small-table path only.

    Hash ties are broken by ``key`` (which must be unique), so the rank is
    total even when the 31-bit hash collides — at 10^9 rows collisions are
    certain, silent nondeterminism without the tiebreak.
    """
    u = hash_unit(F.col(key), salt)
    if method == "window":
        w = Window.orderBy(u.asc(), F.col(key).asc())
        return df.withColumn(out, F.row_number().over(w).cast("long") - 1)
    if method != "ranged":
        raise ValueError(f"unknown method {method!r}")

    hashed = df.withColumn("__u", u)
    ranged = hashed.repartitionByRange(F.col("__u"), F.col(key)).sortWithinPartitions(
        "__u", key
    )
    # pin the (sampled) range assignment: counts and the ranking scan are
    # two actions and must see the same row->partition mapping
    part = ranged.withColumn("__pid", F.spark_partition_id()).localCheckpoint(
        eager=False
    )
    stats = {
        r["__pid"]: (r["cnt"], r["lo_u"], r["lo_k"])
        for r in part.groupBy("__pid")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("__u").alias("lo_u"),
            F.min(key).alias("lo_k"),
        )
        .collect()
    }
    order = sorted(stats, key=lambda p: (stats[p][1], stats[p][2], p))
    offsets, acc = {}, 0
    for p in order:
        offsets[p] = acc
        acc += int(stats[p][0])

    boff = df.sparkSession.sparkContext.broadcast(offsets)
    fields = [f for f in part.schema.fields if f.name not in ("__u", "__pid")]
    out_schema = T.StructType(fields + [T.StructField(out, T.LongType())])
    cols = [f.name for f in fields]

    def local_rank(pdfs):
        run = None  # running rank, carried ACROSS this partition's batches
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            if run is None:
                run = boff.value[int(pdf["__pid"].iloc[0])]
            res = pdf[cols].copy()
            res[out] = range(run, run + len(pdf))
            res[out] = res[out].astype("int64")
            run += len(pdf)
            yield res

    return part.mapInPandas(local_rank, schema=out_schema)


def split_assign(
    df: DataFrame,
    key: str,
    fractions: dict[str, float],
    salt: int = 0,
    out: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: partition [0, 1) into
    half-open bands in ``fractions`` insertion order and label each row by
    where ``hash_unit(key, salt)`` falls. A pure function of (key, salt) —
    the SAME row lands in the same split across re-runs, retries, cluster
    sizes and growing corpora (a new row never flips an old row's split,
    which `randomSplit` cannot promise). Fractions must sum to 1 (±1e-9)
    so every row is labeled. Map-only — zero shuffle at any scale."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    if any(f < 0 for f in fractions.values()):
        raise ValueError("fractions must be non-negative")
    u = hash_unit(F.col(key), salt)
    expr, acc = None, 0.0
    items = list(fractions.items())
    for name, frac in items[:-1]:
        acc += frac
        cond = u < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(items[-1][0])
    label = last if expr is None else expr.otherwise(last)
    return df.withColumn(out, label)
