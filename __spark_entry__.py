"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship "one crawl round" spine on sf0.001.
``queries()`` exposes one DataFrame query per implemented operator from
SURVEY.md §2; ``oracle_sql()`` gives the DuckDB-equivalent ANSI SQL.

Oracle strategy: crawl-shaped inputs (URLs, statuses, link graphs) are
derived DETERMINISTICALLY from the driver's TPC-H-ish tables with pure
integer/string arithmetic expressible in both engines, so every operator
is checkable end-to-end with no engine-private randomness. The derivation
constants live in ``_D`` below and are mirrored verbatim in the SQL
strings.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from webcrawler_go_spark.functions.classify import (
    BOT_INDICATORS,
    error_taxonomy,
    fetch_disposition,
    has_skipped_extension,
    is_crawlable_href,
    status_class,
)
from webcrawler_go_spark.functions.urls import (
    canonicalize_cols,
    canonicalize_sql,
    sanitize_filename_cols,
    sanitize_headline_filename_cols,
)

SF_DEFAULT = "/root/testdata/sf0.001"

# derivation constants (mirrored in every oracle SQL string)
_D = {
    "n_hosts": 41,
    "n_pages": 997,
}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# URL corpus: raw (messy) URLs derived from orders — exercises C1 edge rules
# (missing scheme, uppercase scheme/host, empty path, query, fragment).
# ---------------------------------------------------------------------------


def url_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    host = F.concat(
        F.lit("host-"),
        F.lpad((F.col("o_custkey") % _D["n_hosts"]).cast("string"), 4, "0"),
        F.lit(".test"),
    )
    host = F.when(k % 13 == 0, F.upper(host)).otherwise(host)
    scheme = (
        F.when(k % 17 == 0, F.lit(""))
        .when(k % 17 == 1, F.lit("HTTP://"))
        .otherwise(F.lit("https://"))
    )
    path = F.when(k % 5 == 0, F.lit("")).otherwise(
        F.concat(F.lit("/page/"), (k % _D["n_pages"]).cast("string"))
    )
    query = F.when(
        k % 7 == 0, F.concat(F.lit("?session="), (k % 100).cast("string"))
    ).otherwise(F.lit(""))
    frag = F.when(
        k % 11 == 0, F.concat(F.lit("#sec-"), (k % 10).cast("string"))
    ).otherwise(F.lit(""))
    return o.select(
        k.alias("k"),
        F.concat(scheme, host, path, query, frag).alias("url"),
    )


URL_CORPUS_SQL = """
SELECT o_orderkey AS k,
       (CASE WHEN o_orderkey % 17 = 0 THEN ''
             WHEN o_orderkey % 17 = 1 THEN 'HTTP://'
             ELSE 'https://' END)
       || (CASE WHEN o_orderkey % 13 = 0
                THEN upper('host-' || lpad(CAST(o_custkey % 41 AS VARCHAR), 4, '0') || '.test')
                ELSE 'host-' || lpad(CAST(o_custkey % 41 AS VARCHAR), 4, '0') || '.test' END)
       || (CASE WHEN o_orderkey % 5 = 0 THEN ''
                ELSE '/page/' || CAST(o_orderkey % 997 AS VARCHAR) END)
       || (CASE WHEN o_orderkey % 7 = 0 THEN '?session=' || CAST(o_orderkey % 100 AS VARCHAR) ELSE '' END)
       || (CASE WHEN o_orderkey % 11 = 0 THEN '#sec-' || CAST(o_orderkey % 10 AS VARCHAR) ELSE '' END)
       AS url
FROM orders
"""

# canonical corpus = canonicalized URL parts (shared CTE for oracles)
_C = canonicalize_sql("url")
CANON_SQL = f"""
WITH corpus AS ({URL_CORPUS_SQL}),
canon AS (
  SELECT k, url,
         {_C['url_norm']} AS url_norm,
         {_C['host']} AS host,
         {_C['path']} AS path
  FROM corpus
)
"""


def canon_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = url_corpus(spark, sf_dir)
    parts = canonicalize_cols(F.col("url"))
    return c.select(
        "k",
        "url",
        parts["url_norm"].alias("url_norm"),
        parts["host"].alias("host"),
        parts["path"].alias("path"),
    )


# synthetic fetch-log fields — pure integer arithmetic on k (FIXTURES §7 mix)
def _status_col(k):
    r = k % 100
    return (
        F.when(r < 88, 200)
        .when(r < 92, 404)
        .when(r < 95, 403)
        .when(r < 97, 503)
        .when(r < 98, 429)
        .otherwise(301)
    )


_STATUS_SQL = """(CASE WHEN k % 100 < 88 THEN 200
      WHEN k % 100 < 92 THEN 404
      WHEN k % 100 < 95 THEN 403
      WHEN k % 100 < 97 THEN 503
      WHEN k % 100 < 98 THEN 429
      ELSE 301 END)"""


def _ctype_col(k):
    r = k % 10
    return (
        F.when(r < 7, "text/html")
        .when(r == 7, "application/pdf")
        .when(r == 8, "image/jpeg")
        .otherwise(
            "application/vnd.openxmlformats-officedocument.wordprocessingml.document"
        )
    )


_CTYPE_SQL = """(CASE WHEN k % 10 < 7 THEN 'text/html'
      WHEN k % 10 = 7 THEN 'application/pdf'
      WHEN k % 10 = 8 THEN 'image/jpeg'
      ELSE 'application/vnd.openxmlformats-officedocument.wordprocessingml.document' END)"""

_BYTES_SQL = "((k * 131 + 7919) % 500000)"


def _bytes_col(k):
    return (k * 131 + 7919) % 500000


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def q_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1: canonicalize messy URLs (strip fragment, default scheme,
    lowercase scheme+host, empty path → '/')."""
    return canon_corpus(spark, sf_dir).select("k", "url", "url_norm", "host", "path")


def q_visited_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: candidates (lineitem-derived, with natural dups) anti-joined
    against the seen set (orders where k%3=0) → distinct new URLs."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k")
    )
    cand = li.join(canon_corpus(spark, sf_dir), "k").select("url_norm")
    seen = canon_corpus(spark, sf_dir).filter(F.col("k") % 3 == 0).select(
        F.col("url_norm").alias("seen_norm")
    )
    return (
        cand.join(seen, cand["url_norm"] == seen["seen_norm"], "left_anti")
        .select("url_norm")
        .distinct()
    )


def q_frontier_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: union of two discovery sources + dedup, counted per host."""
    a = canon_corpus(spark, sf_dir).filter(F.col("k") % 2 == 0)
    b = canon_corpus(spark, sf_dir).filter(F.col("k") % 3 == 0)
    return (
        a.select("url_norm", "host")
        .unionByName(b.select("url_norm", "host"))
        .distinct()
        .groupBy("host")
        .agg(F.count("*").alias("n_urls"))
    )


def _frontier(spark, sf_dir):
    """Frontier rows with crawl-order keys derived from lineitem."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k"),
        (F.col("l_orderkey") % 4).cast("int").alias("round"),
        (F.col("l_suppkey") % 50).cast("long").alias("parent_seq"),
        F.col("l_linenumber").cast("int").alias("link_pos"),
    )
    return li.join(canon_corpus(spark, sf_dir), "k").select(
        "url_norm", "host", "round", "parent_seq", "link_pos"
    ).distinct()


_FRONTIER_SQL = (
    CANON_SQL
    + """, frontier AS (
  SELECT DISTINCT c.url_norm, c.host,
         CAST(l.l_orderkey % 4 AS INT) AS round,
         CAST(l.l_suppkey % 50 AS BIGINT) AS parent_seq,
         CAST(l.l_linenumber AS INT) AS link_pos
  FROM lineitem l JOIN canon c ON c.k = l.l_orderkey
)
"""
)


def q_per_host_fetch_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: deterministic per-host fetch order — row_number over
    (round, parent_seq, link_pos, url_norm)."""
    w = Window.partitionBy("host").orderBy("round", "parent_seq", "link_pos", "url_norm")
    return _frontier(spark, sf_dir).select(
        "host",
        "url_norm",
        F.row_number().over(w).cast("int").alias("host_rank"),
    )


def q_politeness_budget_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: per-host budget top-k. Budget dim derived from the host id
    (10 + host_id % 11) — broadcast-joined; keep rank ≤ budget."""
    ranked = q_per_host_fetch_order(spark, sf_dir)
    budget = (
        F.lit(10)
        + F.substring(F.col("host"), 6, 4).cast("int") % 11
    )
    return (
        ranked.withColumn("budget", budget.cast("int"))
        .filter(F.col("host_rank") <= F.col("budget"))
        .groupBy("host")
        .agg(
            F.count("*").alias("n_scheduled"),
            F.max("host_rank").cast("int").alias("max_rank"),
        )
    )


def q_retry_backoff_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: data-encoded retry schedule — ready rows at round 3 are those
    with not_before_round ≤ 3; others wait."""
    fr = canon_corpus(spark, sf_dir).select(
        "url_norm",
        (F.col("k") % 5).cast("int").alias("attempts"),
        ((F.col("k") % 5) + (F.col("k") % 3)).cast("int").alias("not_before_round"),
    )
    return fr.filter(F.col("not_before_round") <= 3).select(
        "url_norm", "attempts", "not_before_round"
    )


def q_status_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: counts by status class 2xx/3xx/4xx/5xx (crawler.go:654-663)."""
    log = canon_corpus(spark, sf_dir).select(
        "k", _status_col(F.col("k")).alias("status")
    )
    return (
        log.groupBy(status_class(F.col("status")).alias("status_class"))
        .agg(F.count("*").alias("n"))
    )


def q_status_class_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6: disposition classify — blocked (403/503/429) > error(≥400) >
    redirect(3xx) > ok."""
    log = canon_corpus(spark, sf_dir).select(
        "k", "url_norm", _status_col(F.col("k")).alias("status")
    )
    return log.select(
        "url_norm",
        "status",
        fetch_disposition(F.col("status")).alias("disposition"),
    )


def q_error_taxonomy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: network-error taxonomy by substring (crawler.go:1030-1042)."""
    errs = canon_corpus(spark, sf_dir).select(
        "k",
        F.when(F.col("k") % 5 == 0, "dial tcp: i/o timeout")
        .when(F.col("k") % 5 == 1, "connect: connection refused")
        .when(F.col("k") % 5 == 2, "lookup example: no such host")
        .when(F.col("k") % 5 == 3, "x509: certificate has expired")
        .otherwise("EOF")
        .alias("err"),
    )
    return errs.groupBy(error_taxonomy(F.col("err")).alias("error_kind")).agg(
        F.count("*").alias("n")
    )


def q_global_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: the reference's stats panel as ONE global aggregate: pages,
    bytes, per-class counts, blocked count."""
    log = canon_corpus(spark, sf_dir).select(
        "k",
        _status_col(F.col("k")).alias("status"),
        _bytes_col(F.col("k")).alias("bytes"),
    )
    return log.agg(
        F.count("*").alias("pages_checked"),
        F.sum("bytes").alias("bytes_downloaded"),
        F.sum(F.when((F.col("status") >= 200) & (F.col("status") < 300), 1).otherwise(0)).alias("status_2xx"),
        F.sum(F.when((F.col("status") >= 300) & (F.col("status") < 400), 1).otherwise(0)).alias("status_3xx"),
        F.sum(F.when((F.col("status") >= 400) & (F.col("status") < 500), 1).otherwise(0)).alias("status_4xx"),
        F.sum(F.when(F.col("status") >= 500, 1).otherwise(0)).alias("status_5xx"),
        F.sum(F.when(F.col("status").isin(403, 503, 429), 1).otherwise(0)).alias("blocked_count"),
    )


def q_derived_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: avg page size (bytes/page) over OK pages — integer math then a
    single final division."""
    log = canon_corpus(spark, sf_dir).select(
        "k",
        _status_col(F.col("k")).alias("status"),
        _bytes_col(F.col("k")).alias("bytes"),
    ).filter(F.col("status") == 200)
    return log.agg(
        F.count("*").alias("pages"),
        F.sum("bytes").alias("bytes_total"),
        F.round(F.sum("bytes") / F.count("*"), 2).alias("avg_page_bytes"),
    )


def q_same_host_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: keep only links whose host equals the discovering page's host
    (crawler.go:984-987); count kept + skipped-external per host."""
    li = _t(spark, sf_dir, "lineitem")
    pairs = li.select(
        F.concat(
            F.lit("host-"),
            F.lpad((F.col("l_suppkey") % 7).cast("string"), 4, "0"),
            F.lit(".test"),
        ).alias("page_host"),
        F.concat(
            F.lit("host-"),
            F.lpad((F.col("l_partkey") % 7).cast("string"), 4, "0"),
            F.lit(".test"),
        ).alias("link_host"),
    )
    return pairs.groupBy("page_host").agg(
        F.sum(F.when(F.col("link_host") == F.col("page_host"), 1).otherwise(0)).alias("internal_links"),
        F.sum(F.when(F.col("link_host") != F.col("page_host"), 1).otherwise(0)).alias("skipped_external"),
    )


def q_scheme_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3+F11: drop empty/pseudo hrefs (#, mailto:, tel:, javascript:,
    data:) and non-http(s) schemes (sitemap.go:346-364)."""
    hrefs = canon_corpus(spark, sf_dir).select(
        "k",
        F.when(F.col("k") % 9 == 0, F.lit("#top"))
        .when(F.col("k") % 9 == 1, F.lit("mailto:x@example.com"))
        .when(F.col("k") % 9 == 2, F.lit("tel:+1555"))
        .when(F.col("k") % 9 == 3, F.lit("javascript:void(0)"))
        .when(F.col("k") % 9 == 4, F.lit("ftp://files.example.com/a"))
        .when(F.col("k") % 9 == 5, F.lit(""))
        .otherwise(F.col("url"))
        .alias("href"),
    )
    return hrefs.filter(is_crawlable_href(F.col("href"))).select("k", "href")


def q_extension_skip_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: skip the 27 non-page extensions (sitemap.go:375-390)."""
    p = _t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("pk"),
        F.concat(
            F.lit("/files/item-"),
            F.col("p_partkey").cast("string"),
            F.when(F.col("p_partkey") % 8 == 0, ".pdf")
            .when(F.col("p_partkey") % 8 == 1, ".jpg")
            .when(F.col("p_partkey") % 8 == 2, ".css")
            .when(F.col("p_partkey") % 8 == 3, ".docx")
            .when(F.col("p_partkey") % 8 == 4, ".html")
            .when(F.col("p_partkey") % 8 == 5, ".GZ")
            .otherwise(""),
        ).alias("path"),
    )
    return p.filter(~has_skipped_extension(F.col("path"))).select("pk", "path")


def q_path_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: PathFilter — only URLs under /page/1 (prefix semantics,
    sitemap.go:158-174)."""
    return (
        canon_corpus(spark, sf_dir)
        .filter(F.col("path").startswith("/page/1"))
        .select("url_norm", "path")
        .distinct()
    )


def q_html_only_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5: only text/html responses survive (sitemap.go:239-245)."""
    log = canon_corpus(spark, sf_dir).select(
        "k", "url_norm", _ctype_col(F.col("k")).alias("content_type")
    )
    return log.filter(F.col("content_type").contains("text/html")).select(
        "url_norm", "content_type"
    )


def q_content_type_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7: route by Content-Type substring → pdf/docx/html/other counts
    (crawler.go:806-828)."""
    from webcrawler_go_spark.functions.classify import content_kind

    log = canon_corpus(spark, sf_dir).select(
        "k", _ctype_col(F.col("k")).alias("content_type")
    )
    return log.groupBy(content_kind(F.col("content_type")).alias("kind")).agg(
        F.count("*").alias("n")
    )


def q_image_size_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10: oversized images — image/* responses with bytes > 100 KB
    (crawler.go:947-954, threshold*1024 main.go:498)."""
    log = canon_corpus(spark, sf_dir).select(
        "k",
        "url_norm",
        _ctype_col(F.col("k")).alias("content_type"),
        _bytes_col(F.col("k")).alias("bytes"),
    )
    return (
        log.filter(F.col("content_type").startswith("image/"))
        .filter(F.col("bytes") > 100 * 1024)
        .select(
            "url_norm",
            "bytes",
            F.round(F.col("bytes") / 1024.0, 2).alias("size_kb"),
        )
    )


def q_bot_protection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7: disjunctive bot-protection detection — any of the 16 indicator
    substrings in the lowercased body (crawler.go:1001-1028)."""
    d = _t(spark, sf_dir, "documents")
    body = F.when(
        F.col("doc_id") % 10 == 0,
        F.concat(
            F.lit("One moment... "),
            F.lit(BOT_INDICATORS[0]),
            F.lit(" "),
            F.col("text"),
        ),
    ).when(
        F.col("doc_id") % 10 == 1,
        F.concat(F.lit("Attention Required! | Cloudflare — "), F.col("text")),
    ).otherwise(F.col("text"))
    from webcrawler_go_spark.functions.classify import bot_protection

    return d.select(F.col("doc_id"), body.alias("body")).select(
        "doc_id", bot_protection(F.col("body")).alias("is_blocked")
    )


def q_substring_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6: case-sensitive substring search over document text
    (crawler.go:822-827) — search mode's match predicate."""
    d = _t(spark, sf_dir, "documents")
    return d.filter(F.col("text").contains("spark")).select("doc_id", "n_chars")


def q_pagination_synthesis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4/X7: generate ?page=2..10 candidates for listing pages
    (sitemap.go:508-541: listing = path ends '/' or extension-less)."""
    base = (
        canon_corpus(spark, sf_dir)
        .filter(~F.col("path").rlike(r"\.[a-z0-9]+$"))
        .filter(F.col("k") % 50 == 0)
        .select("host", "path")
        .distinct()
    )
    return base.select(
        "host",
        "path",
        F.explode(F.sequence(F.lit(2), F.lit(10))).alias("page_n"),
    ).select(
        F.concat(
            F.lit("https://"),
            F.col("host"),
            F.col("path"),
            F.lit("?page="),
            F.col("page_n").cast("string"),
        ).alias("candidate_url")
    )


def q_archive_url_generation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4: month-archive URL synthesis for news-like year paths
    (sitemap.go:423-505): /news/<year>/ → 12 month URLs."""
    months = [
        "january", "february", "march", "april", "may", "june",
        "july", "august", "september", "october", "november", "december",
    ]
    n = _t(spark, sf_dir, "nation").select(
        F.concat(
            F.lit("https://host-"),
            F.lpad((F.col("n_nationkey") % 5).cast("string"), 4, "0"),
            F.lit(".test/news/"),
            (F.lit(2020) + F.col("n_nationkey") % 6).cast("string"),
        ).alias("base")
    ).distinct()
    return n.select(
        "base", F.explode(F.array(*[F.lit(m) for m in months])).alias("month")
    ).select(
        F.concat(F.col("base"), F.lit("/"), F.col("month"), F.lit("/")).alias(
            "archive_url"
        )
    )


def q_sitemap_output(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1+S8: sitemap rows — reachable ∧ HTML ∧ 2xx ∧ path-included URLs,
    lexicographically sorted, with lastmod (sitemap.go:543-600).
    Output set ⊂ traversal set (SURVEY §3.2)."""
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"), F.col("o_orderdate")
    )
    c = canon_corpus(spark, sf_dir).join(o, "k")
    rows = (
        c.select(
            "k",
            "url_norm",
            _status_col(F.col("k")).alias("status"),
            _ctype_col(F.col("k")).alias("content_type"),
            F.to_date("o_orderdate").alias("lastmod"),
        )
        .filter((F.col("status") == 200) & (F.col("content_type") == "text/html"))
        .select(F.col("url_norm").alias("loc"), "lastmod")
        .groupBy("loc")
        .agg(F.max("lastmod").alias("lastmod"))
        .orderBy("loc")
    )
    return rows


def q_truncate_ellipsis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C12: s[:n-3]+'...' display truncation (crawler.go:499-504), n=40."""
    d = _t(spark, sf_dir, "documents")
    n = 40
    return d.select(
        "doc_id",
        F.when(
            F.length("text") > n,
            F.concat(F.substring("text", 1, n - 3), F.lit("...")),
        )
        .otherwise(F.col("text"))
        .alias("display_text"),
    )


def q_filename_sanitize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4: URL path → safe filename (pdfcapture.go:514-554), no-query fast
    path (query-hash branch exercised in tests via the Go-parity UDF)."""
    return (
        canon_corpus(spark, sf_dir)
        .select(
            "url_norm",
            sanitize_filename_cols(F.col("url_norm")).alias("filename"),
        )
        .distinct()
    )


def q_headline_filename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5: headline+datecode → filename (jsonfeed.go:305-343)."""
    c = _t(spark, sf_dir, "customer")
    headline = F.concat(
        F.lit("Breaking: "), F.col("c_name"), F.lit(" wins (again)!")
    )
    datecode = F.when(
        F.col("c_custkey") % 2 == 0,
        F.concat(F.lit("2026"), F.lpad((F.col("c_custkey") % 12 + 1).cast("string"), 2, "0"), F.lit("15")),
    ).otherwise(F.lit(None).cast("string"))
    return c.select(
        F.col("c_custkey").alias("ck"),
        sanitize_headline_filename_cols(headline, datecode).alias("filename"),
    )


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "url_canonicalize": q_url_canonicalize,
        "visited_dedup": q_visited_dedup,
        "frontier_union": q_frontier_union,
        "per_host_fetch_order": q_per_host_fetch_order,
        "politeness_budget_topk": q_politeness_budget_topk,
        "retry_backoff_filter": q_retry_backoff_filter,
        "status_histogram": q_status_histogram,
        "status_class_predicate": q_status_class_predicate,
        "error_taxonomy": q_error_taxonomy,
        "global_counters": q_global_counters,
        "derived_rates": q_derived_rates,
        "same_host_filter": q_same_host_filter,
        "scheme_filter": q_scheme_filter,
        "extension_skip_filter": q_extension_skip_filter,
        "path_prefix_filter": q_path_prefix_filter,
        "html_only_filter": q_html_only_filter,
        "content_type_dispatch": q_content_type_dispatch,
        "image_size_threshold": q_image_size_threshold,
        "bot_protection": q_bot_protection,
        "substring_search": q_substring_search,
        "pagination_synthesis": q_pagination_synthesis,
        "archive_url_generation": q_archive_url_generation,
        "sitemap_output": q_sitemap_output,
        "truncate_ellipsis": q_truncate_ellipsis,
        "filename_sanitize": q_filename_sanitize,
        "headline_filename": q_headline_filename,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "url_canonicalize": CANON_SQL + "SELECT k, url, url_norm, host, path FROM canon",
        "visited_dedup": CANON_SQL + """
            SELECT DISTINCT c.url_norm
            FROM lineitem l JOIN canon c ON c.k = l.l_orderkey
            WHERE NOT EXISTS (
                SELECT 1 FROM canon s WHERE s.k % 3 = 0 AND s.url_norm = c.url_norm
            )""",
        "frontier_union": CANON_SQL + """
            SELECT host, COUNT(*) AS n_urls FROM (
              SELECT DISTINCT url_norm, host FROM (
                SELECT url_norm, host FROM canon WHERE k % 2 = 0
                UNION ALL
                SELECT url_norm, host FROM canon WHERE k % 3 = 0
              )
            ) GROUP BY host""",
        "per_host_fetch_order": _FRONTIER_SQL + """
            SELECT host, url_norm,
                   CAST(ROW_NUMBER() OVER (PARTITION BY host
                        ORDER BY round, parent_seq, link_pos, url_norm) AS INT) AS host_rank
            FROM frontier""",
        "politeness_budget_topk": _FRONTIER_SQL + """
            , ranked AS (
              SELECT host, url_norm,
                     ROW_NUMBER() OVER (PARTITION BY host
                          ORDER BY round, parent_seq, link_pos, url_norm) AS host_rank,
                     10 + CAST(substr(host, 6, 4) AS INT) % 11 AS budget
              FROM frontier
            )
            SELECT host, COUNT(*) AS n_scheduled, CAST(MAX(host_rank) AS INT) AS max_rank
            FROM ranked WHERE host_rank <= budget GROUP BY host""",
        "retry_backoff_filter": CANON_SQL + """
            SELECT url_norm,
                   CAST(k % 5 AS INT) AS attempts,
                   CAST((k % 5) + (k % 3) AS INT) AS not_before_round
            FROM canon
            WHERE (k % 5) + (k % 3) <= 3""",
        "status_histogram": CANON_SQL + f"""
            SELECT CAST({_STATUS_SQL} // 100 AS VARCHAR) || 'xx' AS status_class,
                   COUNT(*) AS n
            FROM canon GROUP BY 1""",
        "status_class_predicate": CANON_SQL + f"""
            SELECT url_norm, {_STATUS_SQL} AS status,
                   (CASE WHEN {_STATUS_SQL} IN (403,503,429) THEN 'blocked'
                         WHEN {_STATUS_SQL} >= 400 THEN 'error'
                         WHEN {_STATUS_SQL} >= 300 AND {_STATUS_SQL} < 400 THEN 'redirect'
                         ELSE 'ok' END) AS disposition
            FROM canon""",
        "error_taxonomy": CANON_SQL + """
            SELECT (CASE WHEN err LIKE '%timeout%' THEN 'timeout'
                         WHEN err LIKE '%connection refused%' THEN 'refused'
                         WHEN err LIKE '%no such host%' THEN 'dns'
                         WHEN err LIKE '%certificate%' THEN 'ssl'
                         ELSE 'other' END) AS error_kind,
                   COUNT(*) AS n
            FROM (
              SELECT (CASE WHEN k % 5 = 0 THEN 'dial tcp: i/o timeout'
                           WHEN k % 5 = 1 THEN 'connect: connection refused'
                           WHEN k % 5 = 2 THEN 'lookup example: no such host'
                           WHEN k % 5 = 3 THEN 'x509: certificate has expired'
                           ELSE 'EOF' END) AS err
              FROM canon
            ) GROUP BY 1""",
        "global_counters": CANON_SQL + f"""
            SELECT COUNT(*) AS pages_checked,
                   SUM({_BYTES_SQL}) AS bytes_downloaded,
                   SUM(CASE WHEN {_STATUS_SQL} >= 200 AND {_STATUS_SQL} < 300 THEN 1 ELSE 0 END) AS status_2xx,
                   SUM(CASE WHEN {_STATUS_SQL} >= 300 AND {_STATUS_SQL} < 400 THEN 1 ELSE 0 END) AS status_3xx,
                   SUM(CASE WHEN {_STATUS_SQL} >= 400 AND {_STATUS_SQL} < 500 THEN 1 ELSE 0 END) AS status_4xx,
                   SUM(CASE WHEN {_STATUS_SQL} >= 500 THEN 1 ELSE 0 END) AS status_5xx,
                   SUM(CASE WHEN {_STATUS_SQL} IN (403,503,429) THEN 1 ELSE 0 END) AS blocked_count
            FROM canon""",
        "derived_rates": CANON_SQL + f"""
            SELECT COUNT(*) AS pages,
                   SUM({_BYTES_SQL}) AS bytes_total,
                   ROUND(SUM({_BYTES_SQL}) / COUNT(*), 2) AS avg_page_bytes
            FROM canon WHERE {_STATUS_SQL} = 200""",
        "same_host_filter": """
            SELECT 'host-' || lpad(CAST(l_suppkey % 7 AS VARCHAR), 4, '0') || '.test' AS page_host,
                   SUM(CASE WHEN l_partkey % 7 = l_suppkey % 7 THEN 1 ELSE 0 END) AS internal_links,
                   SUM(CASE WHEN l_partkey % 7 <> l_suppkey % 7 THEN 1 ELSE 0 END) AS skipped_external
            FROM lineitem GROUP BY 1""",
        "scheme_filter": CANON_SQL + """
            SELECT k, href FROM (
              SELECT k,
                     (CASE WHEN k % 9 = 0 THEN '#top'
                           WHEN k % 9 = 1 THEN 'mailto:x@example.com'
                           WHEN k % 9 = 2 THEN 'tel:+1555'
                           WHEN k % 9 = 3 THEN 'javascript:void(0)'
                           WHEN k % 9 = 4 THEN 'ftp://files.example.com/a'
                           WHEN k % 9 = 5 THEN ''
                           ELSE url END) AS href
              FROM canon
            )
            WHERE href IS NOT NULL AND trim(href) <> ''
              AND NOT regexp_matches(trim(href), '^(#|mailto:|tel:|javascript:|data:)')
              AND lower(regexp_extract(href, '^([a-zA-Z][a-zA-Z0-9+.-]*):', 1)) IN ('', 'http', 'https')""",
        "extension_skip_filter": """
            SELECT pk, path FROM (
              SELECT p_partkey AS pk,
                     '/files/item-' || CAST(p_partkey AS VARCHAR) ||
                     (CASE WHEN p_partkey % 8 = 0 THEN '.pdf'
                           WHEN p_partkey % 8 = 1 THEN '.jpg'
                           WHEN p_partkey % 8 = 2 THEN '.css'
                           WHEN p_partkey % 8 = 3 THEN '.docx'
                           WHEN p_partkey % 8 = 4 THEN '.html'
                           WHEN p_partkey % 8 = 5 THEN '.GZ'
                           ELSE '' END) AS path
              FROM part
            )
            WHERE NOT regexp_matches(lower(path),
              '\\.(pdf|docx?|xlsx?|pptx?|zip|rar|tar|gz|7z|jpe?g|png|gif|webp|svg|ico|mp3|mp4|avi|mov|wmv|flv|css|js|json|xml|rss|atom)$')""",
        "path_prefix_filter": CANON_SQL + """
            SELECT DISTINCT url_norm, path FROM canon
            WHERE starts_with(path, '/page/1')""",
        "html_only_filter": CANON_SQL + f"""
            SELECT url_norm, {_CTYPE_SQL} AS content_type FROM canon
            WHERE contains({_CTYPE_SQL}, 'text/html')""",
        "content_type_dispatch": CANON_SQL + f"""
            SELECT (CASE WHEN contains({_CTYPE_SQL}, 'application/pdf') THEN 'pdf'
                         WHEN contains({_CTYPE_SQL}, 'application/vnd.openxmlformats-officedocument.wordprocessingml.document') THEN 'docx'
                         WHEN contains({_CTYPE_SQL}, 'text/html') THEN 'html'
                         ELSE 'other' END) AS kind,
                   COUNT(*) AS n
            FROM canon GROUP BY 1""",
        "image_size_threshold": CANON_SQL + f"""
            SELECT url_norm, {_BYTES_SQL} AS bytes,
                   ROUND({_BYTES_SQL} / 1024.0, 2) AS size_kb
            FROM canon
            WHERE starts_with({_CTYPE_SQL}, 'image/') AND {_BYTES_SQL} > 102400""",
        "bot_protection": """
            SELECT doc_id,
                   regexp_matches(lower(body),
                     'checking your browser|ddos protection|please enable javascript|access denied|security check|verify you are human|captcha|incapsula|perimeterx|sucuri|cloudflare|please wait while we verify|just a moment|ray id|attention required|sorry, you have been blocked'
                   ) AS is_blocked
            FROM (
              SELECT doc_id,
                     (CASE WHEN doc_id % 10 = 0 THEN 'One moment... checking your browser ' || text
                           WHEN doc_id % 10 = 1 THEN 'Attention Required! | Cloudflare — ' || text
                           ELSE text END) AS body
              FROM documents
            )""",
        "substring_search": """
            SELECT doc_id, n_chars FROM documents WHERE contains(text, 'spark')""",
        "pagination_synthesis": CANON_SQL + """
            SELECT 'https://' || host || path || '?page=' || CAST(g AS VARCHAR) AS candidate_url
            FROM (
              SELECT DISTINCT host, path FROM canon
              WHERE NOT regexp_matches(path, '\\.[a-z0-9]+$') AND k % 50 = 0
            ), generate_series(2, 10) AS t(g)""",
        "archive_url_generation": """
            SELECT base || '/' || month || '/' AS archive_url
            FROM (
              SELECT DISTINCT 'https://host-' || lpad(CAST(n_nationkey % 5 AS VARCHAR), 4, '0')
                     || '.test/news/' || CAST(2020 + n_nationkey % 6 AS VARCHAR) AS base
              FROM nation
            ),
            (SELECT unnest(['january','february','march','april','may','june',
                            'july','august','september','october','november','december']) AS month)""",
        "sitemap_output": CANON_SQL + f"""
            SELECT url_norm AS loc, MAX(CAST(o.o_orderdate AS DATE)) AS lastmod
            FROM canon JOIN orders o ON o.o_orderkey = canon.k
            WHERE {_STATUS_SQL} = 200 AND {_CTYPE_SQL} = 'text/html'
            GROUP BY url_norm
            ORDER BY loc""",
        "truncate_ellipsis": """
            SELECT doc_id,
                   (CASE WHEN length(text) > 40 THEN substr(text, 1, 37) || '...'
                         ELSE text END) AS display_text
            FROM documents""",
        "filename_sanitize": CANON_SQL + """
            SELECT DISTINCT url_norm,
              (CASE WHEN n2 = '' THEN 'page' ELSE n2 END) AS filename
            FROM (
              SELECT url_norm,
                regexp_replace(
                  substr(
                    regexp_replace(
                      regexp_replace(
                        regexp_replace(
                          (CASE WHEN path = '' OR path = '/' THEN 'index' ELSE path END),
                          '^/', ''),
                        '/', '_', 'g'),
                      '[<>:"\\\\|?*]', '_', 'g'),
                    1, 200),
                  '[. ]+$', '') AS n2
              FROM canon
            )""",
        "headline_filename": """
            SELECT ck, (CASE WHEN name = '' THEN 'article' ELSE name END) AS filename
            FROM (
              SELECT ck, substr(prefix || trim(regexp_replace(h4, '-{2,}', '-', 'g'), '-'), 1, 200) AS name
              FROM (
                SELECT c_custkey AS ck,
                  (CASE WHEN c_custkey % 2 = 0
                        THEN '2026' || lpad(CAST(c_custkey % 12 + 1 AS VARCHAR), 2, '0') || '15'
                        ELSE NULL END) AS dc,
                  (CASE WHEN c_custkey % 2 = 0
                        THEN '2026-' || lpad(CAST(c_custkey % 12 + 1 AS VARCHAR), 2, '0') || '-15_'
                        ELSE '' END) AS prefix,
                  regexp_replace(
                    replace(lower('Breaking: ' || c_name || ' wins (again)!'), ' ', '-'),
                    '[<>:"/\\\\|?*'',.;!()\\[\\]{}]', '', 'g') AS h4
                FROM customer
              )
            )""",
    }


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: ONE crawl round end-to-end on sf0.001 (SURVEY §7.2) —
    canonicalize → in-round dedup → anti-join seen → per-host Window rank →
    budget top-k → vectorized synthetic fetch → per-host report."""
    from webcrawler_go_spark.operators.fetch import fetch_frontier

    sf = SF_DEFAULT
    fr = _frontier(spark, sf).withColumn(
        "url_hash", F.xxhash64("url_norm")
    )
    seen = (
        canon_corpus(spark, sf)
        .filter(F.col("k") % 3 == 0)
        .select(F.xxhash64("url_norm").alias("url_hash"))
        .distinct()
    )
    from webcrawler_go_spark.operators.dedup import dedup_against_seen

    new = dedup_against_seen(fr.dropDuplicates(["url_hash"]), seen)
    w = Window.partitionBy("host").orderBy(
        "round", "parent_seq", "link_pos", "url_hash"
    )
    scheduled = (
        new.withColumn("host_rank", F.row_number().over(w))
        .filter(F.col("host_rank") <= 20)
        .withColumn("seq", F.col("host_rank").cast("long"))
        .withColumn("round", F.lit(0))
    )
    fetched = fetch_frontier(scheduled)
    return fetched.groupBy("host").agg(
        F.count("*").alias("fetched"),
        F.sum(F.when((F.col("status") == 200) & (~F.col("blocked")), 1).otherwise(0)).alias("ok"),
        F.sum(F.size("outlinks")).alias("links_discovered"),
        F.sum("bytes").alias("bytes"),
    )
