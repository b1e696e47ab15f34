"""URL canonicalization + URL-level dedup for web-crawl training data.

CCNet/RefinedWeb-style pipelines dedup at the URL level before any content
pass — a canonical URL key collapses the scheme/host-case, `www.` prefix,
default-port, fragment, tracking-parameter and trailing-slash variants that
crawlers record for the same page. Everything here is a pure Column
expression over JVM regexp built-ins (map-only, zero shuffle for the
canonicalization; one count-distinct-shaped shuffle on the canonical key for
the dedup), and every step has a DuckDB mirror generated from the SAME
constants so engine/oracle parity holds by construction (the
`text.NORMALIZE_STEPS` pattern).

Reference analog: geo-epic fetches remote resources by URL but never
canonicalizes (`geoEpic/weather/download_daily.py` passes URLs through
verbatim); this operator is part of the LLM-data-pipeline axis of the brief,
methodology per CCNet (Wenzek et al. 2020) and RefinedWeb (Penedo et al.
2023), public papers.

Scope limits (documented, not silent): no userinfo (`user:pass@host`)
handling, no IDN/punycode folding, no percent-encoding normalization —
each would need a real URL parser UDF; the regex subset below covers the
variant classes that dominate crawl duplicates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tracking parameters dropped from query strings (lowercase; matched
# case-insensitively). ONE list drives both engines.
TRACKING_PARAMS = ["utm_[a-z0-9_]*", "fbclid", "gclid", "msclkid",
                   "mc_cid", "mc_eid", "ref", "igshid"]

_SCHEME_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://"
# one regex per part, applied to the URL with the fragment already stripped
_HOST_RE = _SCHEME_RE + r"([^/?#]*)"
_PATH_RE = _SCHEME_RE + r"[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"
_TRACK_RE = "^(?i)(" + "|".join(TRACKING_PARAMS) + ")="


def canon_url_expr(url: Column) -> Column:
    """Canonical form of ``url`` as a pure Column expression.

    Steps: drop fragment; lowercase scheme and host; strip one leading
    ``www.``; strip the scheme's default port (:80 http, :443 https);
    strip trailing ``/`` from the path; drop tracking params, drop empty
    params, sort the rest lexicographically. Rows that don't look like
    ``scheme://…`` pass through trimmed (a later filter can drop them).
    """
    u = F.regexp_replace(F.trim(url), r"#.*$", "")  # fragment first
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    host = F.lower(F.regexp_extract(u, _HOST_RE, 2))
    host = F.regexp_replace(host, r"^www\.", "")
    host = F.when(scheme == "http", F.regexp_replace(host, ":80$", "")) \
            .when(scheme == "https", F.regexp_replace(host, ":443$", "")) \
            .otherwise(host)
    path = F.regexp_replace(F.regexp_extract(u, _PATH_RE, 2), r"/+$", "")
    params = F.split(F.regexp_extract(u, _QUERY_RE, 1), "&")
    params = F.array_sort(
        F.filter(params, lambda p: (p != "") & ~p.rlike(_TRACK_RE))
    )
    query = F.array_join(params, "&")
    canon = F.concat(
        scheme, F.lit("://"), host, path,
        F.when(query != "", F.concat(F.lit("?"), query)).otherwise(F.lit("")),
    )
    return F.when(scheme == "", F.trim(url)).otherwise(canon)


def sql_canon_url_expr(expr: str) -> str:
    """DuckDB mirror of ``canon_url_expr`` — generated from the SAME
    regex constants. DuckDB caveats honored: ``regexp_extract(s, pat, n)``
    has identical group semantics; list lambdas use ``x -> …``;
    ``list_sort`` default is lexicographic ASC like ``array_sort``."""
    u = f"regexp_replace(trim({expr}), '#.*$', '', 'g')"
    scheme = f"lower(regexp_extract({u}, '{_SCHEME_RE}', 1))"
    host0 = f"regexp_replace(lower(regexp_extract({u}, '{_HOST_RE}', 2)), '^www\\.', '')"
    host = (
        f"CASE WHEN {scheme} = 'http' THEN regexp_replace({host0}, ':80$', '') "
        f"WHEN {scheme} = 'https' THEN regexp_replace({host0}, ':443$', '') "
        f"ELSE {host0} END"
    )
    path = f"regexp_replace(regexp_extract({u}, '{_PATH_RE}', 2), '/+$', '')"
    track = _TRACK_RE.replace("'", "''")
    params = (
        f"list_sort(list_filter(string_split(regexp_extract({u}, '{_QUERY_RE}', 1), '&'), "
        f"p -> p <> '' AND NOT regexp_matches(p, '{track}')))"
    )
    query = f"array_to_string({params}, '&')"
    canon = (
        f"({scheme} || '://' || {host} || {path} || "
        f"CASE WHEN {query} <> '' THEN '?' || {query} ELSE '' END)"
    )
    return f"CASE WHEN {scheme} = '' THEN trim({expr}) ELSE {canon} END"


def canonicalize_urls(
    df: DataFrame, url: str = "url", key: str = "doc_id"
) -> DataFrame:
    """(key, url) → (key, canon_url). Map-only; at 100 TB this fuses into
    the scan stage with zero shuffle."""
    return df.select(key, canon_url_expr(F.col(url)).alias("canon_url"))


def url_dedup(
    df: DataFrame, url: str = "url", key: str = "doc_id"
) -> DataFrame:
    """URL-level dedup: canonicalize, then keep the smallest ``key`` per
    canonical URL (deterministic survivor, the exact-dedup convention).

    Output: (canon_url, keep_id, n_urls). One hash-aggregate shuffle on
    the canonical-URL key — partial aggregation halves the shuffle volume
    map-side, and the key is a near-uniform string hash, so no skew
    handling is needed (a pathological single hot URL still fits one
    reducer: the payload per group is two longs).
    """
    return (
        canonicalize_urls(df, url=url, key=key)
        .groupBy("canon_url")
        .agg(
            F.min(key).alias("keep_id"),
            F.count(F.lit(1)).alias("n_urls"),
        )
    )


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    node: str = "node",
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Power-iteration PageRank over a link graph — the page/domain quality
    prior CCNet/RefinedWeb-style curation uses to weight web text.

    Per iteration: one (src-keyed) join of ranks onto edges, one dst-keyed
    contribution aggregate, and a 1-row dangling-mass aggregate (nodes
    with no out-links redistribute uniformly) — the textbook MapReduce
    shape. Rank frames are localCheckpoint'ed each round so K iterations
    never hand Catalyst a K-join lineage (the bpe/cluster_pairs lesson).
    Fixed iteration count by design: a convergence test is a driver-side
    scalar check the caller can add, and the correctness gate needs a
    deterministic plan.

    Output: (node, rank) after ``iterations`` rounds from a uniform start.
    """
    n = nodes.count()
    base = (1.0 - damping) / n
    outdeg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("__deg"))
    ranks = nodes.select(F.col(node), F.lit(1.0 / n).alias("rank"))
    e = edges.join(outdeg, src).localCheckpoint(eager=False)
    for _ in range(iterations):
        contrib = (
            e.join(ranks.withColumnRenamed(node, src), src)
            .groupBy(F.col(dst).alias(node))
            .agg(F.sum(F.col("rank") / F.col("__deg")).alias("__in"))
        )
        dangling = (
            ranks.join(outdeg.withColumnRenamed(src, node), node, "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__m"))
        )
        # dangling mass rides as a broadcast 1-row cross join — no driver
        # action per iteration, the whole K-round plan stays lazy
        ranks = (
            nodes.select(node)
            .join(contrib, node, "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                node,
                (F.lit(base)
                 + F.lit(damping)
                 * (F.coalesce(F.col("__in"), F.lit(0.0))
                    + F.col("__m") / F.lit(float(n)))
                 ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks


def sql_pagerank(
    nodes_cte: str,
    edges_cte: str,
    iterations: int = 3,
    damping: float = 0.85,
    node: str = "node",
    src: str = "src",
    dst: str = "dst",
) -> str:
    """DuckDB mirror: the same power iteration as chained CTEs — per round
    a contribution aggregate, a dangling-mass scalar, and the identical
    base + damping arithmetic (same operation order)."""
    d = repr(float(damping))
    parts = [f"nodes AS ({nodes_cte})",
             f"edges AS ({edges_cte})",
             f"outdeg AS (SELECT {src} AS s, COUNT(*) AS deg FROM edges GROUP BY 1)",
             "nn AS (SELECT COUNT(*) AS n FROM nodes)",
             f"r0 AS (SELECT {node} AS node, 1.0 / nn.n AS rank FROM nodes, nn)"]
    for i in range(iterations):
        prev, cur = f"r{i}", f"r{i + 1}"
        parts.append(f"""c{i} AS (
          SELECT e.{dst} AS node, SUM(r.rank / o.deg) AS cin
          FROM edges e
          JOIN outdeg o ON o.s = e.{src}
          JOIN {prev} r ON r.node = e.{src}
          GROUP BY 1
        )""")
        parts.append(f"""m{i} AS (
          SELECT COALESCE(SUM(r.rank), 0.0) AS m
          FROM {prev} r LEFT JOIN outdeg o ON o.s = r.node
          WHERE o.s IS NULL
        )""")
        parts.append(f"""{cur} AS (
          SELECT n.node,
                 (1.0 - {d}) / nn.n
                 + {d} * (COALESCE(c.cin, 0.0) + m{i}.m / nn.n) AS rank
          FROM (SELECT node FROM r0) n
          CROSS JOIN nn CROSS JOIN m{i}
          LEFT JOIN c{i} c ON c.node = n.node
        )""")
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT node, rank FROM r{iterations}")
