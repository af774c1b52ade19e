"""Sitemap-generation mode (SURVEY.md §3.2; reference sitemap.go).

Same frontier loop, two semantic twists faithfully carried over:

1. **traversal ⊇ output** — path-filtered pages are still crawled for
   links but excluded from the output (sitemap.go:158-179): the engine
   crawls with NO path filter and applies it only at emission.
2. **delete-on-failure** — any error/block/non-HTML removes the URL from
   the output set (sitemap.go:200-245): re-expressed as the sink's
   filter over the fetch log (a join, not mutation — SURVEY §3.2).

Plus the sitemap frontier's extension skip-list (F4) and archive /
pagination URL synthesis (W4/X7) on the candidate stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from webcrawler_go_spark.config import CrawlConfig
from webcrawler_go_spark.plans.frontier_loop import CrawlEngine
from webcrawler_go_spark.sinks.xml_sitemap import sitemap_rows, write_sitemap_xml
from webcrawler_go_spark.worldgen import World

MONTHS = [
    "january", "february", "march", "april", "may", "june",
    "july", "august", "september", "october", "november", "december",
]


def synthesize_pagination(urls: DataFrame, url_col: str = "url") -> DataFrame:
    """?page=2..10 and /page/N candidates for listing pages
    (sitemap.go:508-541)."""
    u = F.col(url_col)
    path = F.regexp_extract(u, r"^[a-z]+://[^/]*(/[^?#]*)", 1)
    base = F.regexp_extract(u, r"^([a-z]+://[^/]*)", 1)
    is_listing = path.endswith("/") | (
        ~F.element_at(F.split(path, "/"), -1).contains(".")
    )
    listing = urls.filter(is_listing).select(
        base.alias("base"), F.regexp_replace(path, "/$", "").alias("p")
    )
    pages = listing.select(
        "base", "p", F.explode(F.sequence(F.lit(2), F.lit(10))).alias("n")
    )
    q = pages.select(
        F.concat("base", "p", F.lit("/?page="), F.col("n").cast("string")).alias(
            "candidate"
        )
    )
    seg = pages.select(
        F.concat(
            "base", "p", F.lit("/page/"), F.col("n").cast("string"), F.lit("/")
        ).alias("candidate")
    )
    return q.unionByName(seg)


def synthesize_archives(urls: DataFrame, url_col: str = "url") -> DataFrame:
    """Month-archive URLs for news-like year paths (sitemap.go:423-505,
    year-suffix branch: /news/<yyyy>/ → 12 month URLs)."""
    u = F.col(url_col)
    path = F.regexp_extract(u, r"^[a-z]+://[^/]*(/[^?#]*)", 1)
    base = F.regexp_extract(u, r"^([a-z]+://[^/]*)", 1)
    newsy = F.lower(path).rlike("news|press|release|archive|blog|article")
    year = F.regexp_extract(path, r"/(\d{4})/?$", 1)
    rows = urls.filter(newsy & (year != "")).select(
        base.alias("base"), F.regexp_replace(path, "/$", "").alias("p")
    )
    return rows.select(
        "base", "p", F.explode(F.array(*[F.lit(m) for m in MONTHS])).alias("m")
    ).select(F.concat("base", "p", F.lit("/"), F.col("m"), F.lit("/")).alias("candidate"))


def generate_sitemap(
    spark: SparkSession,
    start_url: str,
    state_dir: str,
    out_path: str,
    world: World | None = None,
    path_filter: str = "",
    max_rounds: int = 5,
) -> int:
    """End-to-end sitemap mode: crawl (traversal unfiltered) → emission
    filter → XML file. Returns entry count."""
    cfg = CrawlConfig(
        start_url=start_url, mode="sitemap", path_filter="", max_rounds=max_rounds
    )
    eng = CrawlEngine(spark, cfg, state_dir, world=world)
    seeds = spark.createDataFrame(
        [(start_url, 1.0, 0)], "url string, priority double, seq int"
    )
    eng.run(seeds, max_rounds=max_rounds)
    rows = sitemap_rows(eng.fetch_log(), path_filter=path_filter)
    return write_sitemap_xml(rows, out_path)
