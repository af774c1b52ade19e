"""JSON-feed capture mode (SURVEY.md §3.3 mode 7; reference jsonfeed.go).

A one-round, non-recursive frontier: read a JSON feed (schema-flexible
field fallbacks, jsonfeed.go:230-269), tag-filter, resolve links, fetch
each item's page once, pair feed metadata with the generated filename
(jsonfeed.go:166-186)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from webcrawler_go_spark.functions.classify import coalesce_feed_fields
from webcrawler_go_spark.functions.urls import (
    canonicalize_cols,
    sanitize_headline_filename_cols,
)


def read_feed(spark: SparkSession, path: str) -> DataFrame:
    """spark.read.json + flexible field coalescing (S5 + C8).

    The reference GETs the endpoint; file/DBFS paths are the Spark
    equivalent surface (http ingestion would go through the fetch
    kernel)."""
    raw = spark.read.option("multiLine", True).json(path)
    return raw.select(*coalesce_feed_fields(raw.columns))


def filter_feed_items(feed: DataFrame, tag_filter: str = "") -> DataFrame:
    """F9 + link-empty skip (jsonfeed.go:119-131): drop items with no
    link; when a tag filter is configured, keep only items whose tags
    contain it."""
    rows = feed.filter(F.col("link").isNotNull() & (F.col("link") != ""))
    if tag_filter:
        rows = rows.filter(F.col("tags").contains(tag_filter))
    return rows


def feed_capture_frontier(
    feed: DataFrame,
    base_url: str,
    tag_filter: str = "",
) -> DataFrame:
    """Tag filter (F9, jsonfeed.go:119-131) → link resolve (C2) → one
    fetch row per item with the headline-derived artifact filename (C5)."""
    rows = filter_feed_items(feed, tag_filter)
    resolved = F.when(
        F.col("link").rlike("^https?://"), F.col("link")
    ).otherwise(F.concat(F.lit(base_url.rstrip("/") + "/"), F.regexp_replace("link", "^/", "")))
    parts = canonicalize_cols(resolved)
    return rows.select(
        "headline",
        resolved.alias("url"),
        parts["url_norm"].alias("url_norm"),
        F.xxhash64(parts["url_norm"]).alias("url_hash"),
        parts["host"].alias("host"),
        parts["path"].alias("path"),
        "date",
        "brief",
        "tags",
        sanitize_headline_filename_cols(
            F.col("headline"), F.col("datecode")
        ).alias("captured_file"),
    )
