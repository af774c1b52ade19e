"""Truth-table tests for classifiers (crawler.go:654-677, 1001-1042;
sitemap.go:290-329, 375-390)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webcrawler_go_spark.functions.classify import (
    bot_protection,
    error_taxonomy,
    fetch_disposition,
    has_skipped_extension,
    is_crawlable_href,
    sitemap_bot_protection,
    status_class,
)

STATUS_CASES = [
    (200, "2xx", "ok"),
    (204, "2xx", "ok"),
    (301, "3xx", "redirect"),
    (404, "4xx", "error"),
    (403, "4xx", "blocked"),
    (429, "4xx", "blocked"),
    (500, "5xx", "error"),
    (503, "5xx", "blocked"),
]


@pytest.mark.parametrize("status,cls,disp", STATUS_CASES)
def test_status_classification(spark, status, cls, disp):
    df = spark.createDataFrame([(status,)], "status int")
    row = df.select(
        status_class(F.col("status")).alias("c"),
        fetch_disposition(F.col("status")).alias("d"),
    ).collect()[0]
    assert (row.c, row.d) == (cls, disp)


BOT_CASES = [
    ("Please wait — Checking your BROWSER before accessing", True),
    ("protected by Cloudflare", True),  # disjunctive: CDN name alone fires
    ("A normal page about clouds and flares", False),
    ("Ray ID: 12345", True),
    ("", False),
]


@pytest.mark.parametrize("body,expected", BOT_CASES)
def test_bot_protection_disjunctive(spark, body, expected):
    df = spark.createDataFrame([(body,)], "body string")
    assert df.select(bot_protection(F.col("body")).alias("b")).collect()[0].b is expected


SITEMAP_BOT_CASES = [
    # conjunctive: CDN name alone does NOT fire (sitemap.go:291-292)
    ("protected by Cloudflare", False),
    ("Attention Required! ... cloudflare", True),
    ("checking your browser ... please wait", True),
    ("checking your browser only", True),  # short page heuristic (<2000)
    ("x" * 2500 + " checking your browser only", False),
    ("access denied: you don't have permission", True),
]


@pytest.mark.parametrize("body,expected", SITEMAP_BOT_CASES)
def test_bot_protection_conjunctive(spark, body, expected):
    df = spark.createDataFrame([(body,)], "body string")
    got = df.select(sitemap_bot_protection(F.col("body")).alias("b")).collect()[0].b
    assert got is expected


ERR_CASES = [
    ("dial tcp: i/o timeout", "timeout"),
    ("connect: connection refused", "refused"),
    ("lookup nohost.test: no such host", "dns"),
    ("x509: certificate signed by unknown authority", "ssl"),
    ("EOF", "other"),
]


@pytest.mark.parametrize("err,kind", ERR_CASES)
def test_error_taxonomy(spark, err, kind):
    df = spark.createDataFrame([(err,)], "err string")
    assert df.select(error_taxonomy(F.col("err")).alias("k")).collect()[0].k == kind


HREF_CASES = [
    ("https://e.com/x", True),
    ("/relative/path", True),
    ("#anchor", False),
    ("mailto:a@b.c", False),
    ("tel:+1555", False),
    ("javascript:void(0)", False),
    ("data:text/plain;base64,xx", False),
    ("ftp://e.com/f", False),
    ("", False),
    ("   ", False),
]


@pytest.mark.parametrize("href,expected", HREF_CASES)
def test_is_crawlable_href(spark, href, expected):
    df = spark.createDataFrame([(href,)], "href string")
    assert df.select(is_crawlable_href(F.col("href")).alias("k")).collect()[0].k is expected


EXT_CASES = [
    ("/a/file.pdf", True),
    ("/a/file.PDF", True),
    ("/a/file.jpeg", True),
    ("/a/page.html", False),
    ("/a/archive.tar.gz", True),
    ("/a/listing/", False),
    ("/a/data.atom", True),
]


@pytest.mark.parametrize("path,expected", EXT_CASES)
def test_extension_skip(spark, path, expected):
    df = spark.createDataFrame([(path,)], "path string")
    got = df.select(has_skipped_extension(F.col("path")).alias("s")).collect()[0].s
    assert got is expected
