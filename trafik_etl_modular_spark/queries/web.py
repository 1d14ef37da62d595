"""Web-crawl curation operators: URL canonicalization dedup and
host-level quality policy.

A crawled pretraining corpus is keyed by URL, and the same page
arrives under many spellings — scheme/host case, default ports,
trailing slashes, tracking parameters, fragments.  Canonicalizing
BEFORE content dedup removes the cheapest duplicate class without
touching document bodies (the key is a short string; the shuffle
carries canonical keys, never text).  Host-level aggregation is the
other standard crawl-curation axis: quality decisions are made per
site (keep / review / drop), not per page, because spam and boiler-
plate cluster by host (Penedo et al., FineWeb 2024; Raffel et al.,
C4 2020 — both public).

The fixture corpus has no URL column, so both queries DERIVE a
deterministic URL per document from (doc_id, a group key) with the
same arithmetic on both engines — five spelling variants per group
of five consecutive doc_ids, four of which canonicalize to the same
key while the fifth carries a REAL (non-tracking) query parameter
and must stay distinct.  The derivation is part of the query text on
BOTH sides, so the oracle exercises the full canonicalization chain,
not a frozen result.

Regex subset restricted to classes with identical Java-regex / RE2
semantics; no backreferences (replacement syntax differs between the
engines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from trafik_etl_modular_spark.functions.scalars import davg, fquant, oracle_davg, oracle_fquant
from trafik_etl_modular_spark.llmdata.text import quality_score
from trafik_etl_modular_spark.queries.common import t
from trafik_etl_modular_spark.registry import query

# --------------------------------------------------------------------------
# Derived URL fixture: 5 spelling variants per group of 5 doc_ids.
#   v0  https://src{s}.example.org/docs/{g}              (base)
#   v1  HTTPS://SRC{s}.EXAMPLE.ORG/docs/{g}              (case)       -> base
#   v2  https://src{s}.example.org/docs/{g}?page=2&utm_medium=rss
#                                    (real param survives)           -> base?page=2
#   v3  https://src{s}.example.org/docs/{g}/             (slash)      -> base
#   v4  https://src{s}.example.org/docs/{g}?utm_source=feed&utm_campaign=x#frag
#                                    (tracking only)                  -> base
# with g = doc_id // 5 and s = g % 20 (group members share a host).
# --------------------------------------------------------------------------


def derive_url(doc_id: Column) -> Column:
    """The deterministic raw-URL fixture column (see module doc)."""
    # exact integer division via decimal — floor(doc_id / 5.0) would
    # pass through a rounded double and can diverge from the oracle's
    # integer `//` for ids beyond 2^52; the numerator is divisible by
    # 5, so the decimal quotient is the exact integer
    g_i = ((doc_id - doc_id % 5).cast("decimal(38,0)") / F.lit(5)).cast("bigint")
    g = g_i.cast("string")
    s = (g_i % 20).cast("string")
    v = doc_id % 5
    base = F.concat(F.lit("https://src"), s, F.lit(".example.org/docs/"), g)
    upper = F.concat(F.lit("HTTPS://SRC"), s, F.lit(".EXAMPLE.ORG/docs/"), g)
    return (
        F.when(v == 0, base)
        .when(v == 1, upper)
        .when(v == 2, F.concat(base, F.lit("?page=2&utm_medium=rss")))
        .when(v == 3, F.concat(base, F.lit("/")))
        .otherwise(F.concat(base, F.lit("?utm_source=feed&utm_campaign=x#frag")))
    )


_URL_SQL = """
CASE doc_id % 5
  WHEN 0 THEN 'https://src' || CAST((doc_id // 5) % 20 AS VARCHAR)
              || '.example.org/docs/' || CAST(doc_id // 5 AS VARCHAR)
  WHEN 1 THEN 'HTTPS://SRC' || CAST((doc_id // 5) % 20 AS VARCHAR)
              || '.EXAMPLE.ORG/docs/' || CAST(doc_id // 5 AS VARCHAR)
  WHEN 2 THEN 'https://src' || CAST((doc_id // 5) % 20 AS VARCHAR)
              || '.example.org/docs/' || CAST(doc_id // 5 AS VARCHAR)
              || '?page=2&utm_medium=rss'
  WHEN 3 THEN 'https://src' || CAST((doc_id // 5) % 20 AS VARCHAR)
              || '.example.org/docs/' || CAST(doc_id // 5 AS VARCHAR) || '/'
  ELSE        'https://src' || CAST((doc_id // 5) % 20 AS VARCHAR)
              || '.example.org/docs/' || CAST(doc_id // 5 AS VARCHAR)
              || '?utm_source=feed&utm_campaign=x#frag'
END
"""

# Regex pieces shared by both engines (no backrefs, basic classes only).
_PREFIX_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"
_UTM_RE = "[?&]utm_[A-Za-z_]*=[^&#]*"
_HOST_RE = "^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)"


def _canonical_url_steps(url: Column) -> Column:
    """Canonicalize a URL: drop the fragment, strip ``utm_*`` tracking
    parameters (repairing a dangling ``&`` left where the ``?`` was
    removed), lowercase the scheme+host+port prefix, remove the
    SCHEME-SPECIFIC default port (``:443`` for https, ``:80`` for
    http — never across schemes, where it would merge two origins),
    and strip a non-root trailing slash.  Pure Catalyst string
    expressions — whole-stage codegen, no UDF."""
    u = F.regexp_replace(url, "#.*", "")
    u = F.regexp_replace(u, _UTM_RE, "")
    first = F.substring_index(u, "&", 1)
    tail = F.substring(u, F.length(first) + F.lit(2), F.length(u))
    u = F.when(u.contains("&") & ~u.contains("?"), F.concat(first, F.lit("?"), tail)).otherwise(u)
    u = F.regexp_replace(u, "\\?$", "")            # dangling '?'
    prefix = F.regexp_extract(u, _PREFIX_RE, 0)
    rest = F.substring(u, F.length(prefix) + F.lit(1), F.length(u))
    low = F.lower(prefix)
    # default ports are scheme-specific: :443 is default ONLY for
    # https, :80 only for http — stripping :443 from an http URL
    # would merge two different origins
    prefix = (
        F.when(low.startswith("https://"), F.regexp_replace(low, ":443$", ""))
        .when(low.startswith("http://"), F.regexp_replace(low, ":80$", ""))
        .otherwise(low)
    )
    u = F.concat(prefix, rest)
    # non-root trailing slash (root form is exactly prefix + '/')
    return F.when(
        u.endswith("/") & (u != F.concat(prefix, F.lit("/"))),
        F.regexp_replace(u, "/$", ""),
    ).otherwise(u)


def _canon_sql(expr: str) -> str:
    """DuckDB mirror of :func:`_canonical_url_steps` (same regexes,
    same step order; DuckDB needs the explicit 'g' flag where Spark
    replaces globally by default)."""
    u = f"regexp_replace({expr}, '#.*', '')"
    u = f"regexp_replace({u}, '{_UTM_RE}', '', 'g')"
    first = f"split_part({u}, '&', 1)"
    tail = f"substr({u}, len({first}) + 2)"
    u = (
        f"CASE WHEN contains({u}, '&') AND NOT contains({u}, '?') "
        f"THEN {first} || '?' || {tail} ELSE {u} END"
    )
    u = f"regexp_replace({u}, '\\?$', '')"
    low = f"lower(regexp_extract({u}, '{_PREFIX_RE}', 0))"
    prefix = (
        f"CASE WHEN starts_with({low}, 'https://')"
        f" THEN regexp_replace({low}, ':443$', '')"
        f" WHEN starts_with({low}, 'http://')"
        f" THEN regexp_replace({low}, ':80$', '')"
        f" ELSE {low} END"
    )
    rest = f"substr({u}, len(regexp_extract({u}, '{_PREFIX_RE}', 0)) + 1)"
    u = f"({prefix} || {rest})"
    return (
        f"CASE WHEN {u} LIKE '%/' AND {u} <> ({prefix} || '/') "
        f"THEN regexp_replace({u}, '/$', '') ELSE {u} END"
    )


_URL_DEDUP_SQL = f"""
WITH raw AS (
  SELECT doc_id, ({_URL_SQL}) AS url FROM documents
),
canon AS (
  SELECT doc_id, url, {_canon_sql('url')} AS canonical_url FROM raw
)
SELECT canonical_url,
       CAST(COUNT(*) AS BIGINT) AS n_variants,
       MIN(doc_id) AS kept_doc_id,
       CAST(COUNT(DISTINCT url) AS BIGINT) AS n_distinct_spellings
FROM canon
GROUP BY canonical_url
ORDER BY canonical_url
"""


@query("dedup_url_canonical", sql=_URL_DEDUP_SQL, tags=("web", "dedup"))
def dedup_url_canonical(spark, sf_dir) -> DataFrame:
    """URL-canonicalization dedup: canonicalize each document's URL
    (fragment, utm_* tracking params, scheme/host case, :443 default
    port, trailing slash — :func:`_canonical_url_steps`) and keep the
    smallest doc_id per canonical key.  The fixture derivation plants
    five spelling variants per group: four collapse to one canonical
    key, the fifth carries a real ``page=2`` parameter that MUST
    survive canonicalization as its own key — the oracle runs the
    identical chain in DuckDB, so a canonicalization bug on either
    side breaks the hash.

    Scale: the canonical key is computed in a map-only projection
    (whole-stage codegen, no UDF) and the dedup is one hash groupBy
    on a short-string key — the shuffle carries (key, id) pairs,
    never document text.  At 100 TB this is the cheapest dedup tier
    and runs before any content hashing (FineWeb/C4 ordering)."""
    docs = t(spark, sf_dir, "documents")
    raw = docs.select("doc_id", derive_url(F.col("doc_id")).alias("url"))
    canon = raw.select(
        "doc_id", "url", _canonical_url_steps(F.col("url")).alias("canonical_url")
    )
    return (
        canon.groupBy("canonical_url")
        .agg(
            F.count("*").cast("bigint").alias("n_variants"),
            F.min("doc_id").alias("kept_doc_id"),
            F.countDistinct("url").cast("bigint").alias("n_distinct_spellings"),
        )
        .orderBy("canonical_url")
    )


# --------------------------------------------------------------------------
# Host-level curation policy
# --------------------------------------------------------------------------

_QUALITY_SQL_EXPR = """
(0.7 * (least(CAST(len(string_split(text, ' ')) AS DOUBLE), 200.0) / 200.0)
 + 0.3 * least(
     (CAST(len(list_filter(string_split(text, ' '),
           x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE)
      / CAST(len(string_split(text, ' ')) AS DOUBLE)) * 5,
     1.0))
"""

_HOST_POLICY_SQL = f"""
WITH raw AS (
  SELECT doc_id, text, ({_URL_SQL}) AS url FROM documents
),
hosted AS (
  SELECT doc_id,
         lower(regexp_extract(url, '{_HOST_RE}', 1)) AS host,
         {oracle_fquant(_QUALITY_SQL_EXPR)} AS q
  FROM raw
),
agg AS (
  SELECT host,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         {oracle_davg('q', 9)} AS mean_quality,
         CAST(SUM(CASE WHEN q < 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_low_quality
  FROM hosted GROUP BY host
)
SELECT host, n_docs, mean_quality, n_low_quality,
       CASE WHEN mean_quality >= CAST(0.6 AS DOUBLE) THEN 'keep'
            WHEN mean_quality >= CAST(0.4 AS DOUBLE) THEN 'review'
            ELSE 'drop' END AS policy
FROM agg
ORDER BY host
"""


@query("text_host_quality_policy", sql=_HOST_POLICY_SQL, tags=("web", "text"))
def text_host_quality_policy(spark, sf_dir) -> DataFrame:
    """Host-level crawl-curation report: extract the host from each
    document's (derived) URL, aggregate per-host document count, mean
    quality (fquant-snapped per-doc scores through davg — the
    boundary-proof decimal recipe, see sim_centroids_by_label), and
    the count of low-quality pages, then issue the keep / review /
    drop policy verdict per host.

    Scale: quality scoring is a map-only codegen projection; the
    host rollup is ONE hash aggregation whose key cardinality is the
    number of hosts (~10⁶ at web scale, trivially shuffleable) — the
    standard shape of FineWeb/C4 site-level filtering.  Policy
    thresholds compare a 1e-9-grid value against coarse constants, so
    the branch can never sit on an engine-dependent boundary."""
    docs = t(spark, sf_dir, "documents")
    hosted = docs.select(
        "doc_id",
        F.lower(F.regexp_extract(derive_url(F.col("doc_id")), _HOST_RE, 1)).alias("host"),
        fquant(quality_score("text")).alias("q"),
    )
    agg = hosted.groupBy("host").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        davg("q", 9).alias("mean_quality"),
        F.sum(F.when(F.col("q") < 0.5, 1).otherwise(0)).cast("bigint").alias("n_low_quality"),
    )
    return agg.select(
        "host",
        "n_docs",
        "mean_quality",
        "n_low_quality",
        F.when(F.col("mean_quality") >= 0.6, "keep")
        .when(F.col("mean_quality") >= 0.4, "review")
        .otherwise(F.lit("drop"))
        .alias("policy"),
    ).orderBy("host")
