"""Unit tests for URL canonicalization / filename kernels (SURVEY §5.2.1).

Table-driven cases mirror the reference semantics:
getVisitedKey (crawler.go:1047-1062), normalizeURL (pdfcapture.go:564-584),
sanitizeFilename (pdfcapture.go:514-554), hashString (pdfcapture.go:556-562),
sanitizeHeadlineFilename (jsonfeed.go:305-343).
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from webcrawler_go_spark.functions.urls import (
    _canon_one,
    canonicalize_cols,
    sanitize_filename_cols,
    sanitize_headline_filename_cols,
)
from webcrawler_go_spark.hashing import hash31_hex8

CANON_CASES = [
    # (raw, norm, host, path)
    ("https://Example.COM/a/b#frag", "https://example.com/a/b", "example.com", "/a/b"),
    ("https://example.com", "https://example.com/", "example.com", "/"),
    ("example.com/x", "https://example.com/x", "example.com", "/x"),
    ("HTTP://example.com/x?q=1#z", "http://example.com/x?q=1", "example.com", "/x"),
    ("https://example.com/?q=1", "https://example.com/?q=1", "example.com", "/"),
    (" https://example.com/pad ", "https://example.com/pad", "example.com", "/pad"),
]


@pytest.mark.parametrize("raw,norm,host,path", CANON_CASES)
def test_canonicalize_cols(spark, raw, norm, host, path):
    df = spark.createDataFrame([(raw,)], "url string")
    parts = canonicalize_cols(F.col("url"))
    row = df.select(
        parts["url_norm"].alias("n"), parts["host"].alias("h"), parts["path"].alias("p")
    ).collect()[0]
    assert (row.n, row.h, row.p) == (norm, host, path)


def test_canonicalize_ignore_query(spark):
    df = spark.createDataFrame([("https://e.com/x?q=1#f",)], "url string")
    parts = canonicalize_cols(F.col("url"), ignore_query=True)
    assert df.select(parts["url_norm"]).collect()[0][0] == "https://e.com/x"


@pytest.mark.parametrize("raw,norm,host,path", CANON_CASES)
def test_canon_udf_matches_cols(raw, norm, host, path):
    # urllib parity kernel agrees with the Catalyst expressions on the
    # engine grammar
    assert _canon_one(raw, False) == norm


@given(st.from_regex(r"https?://[a-z]{1,8}\.[a-z]{2,3}(/[a-z0-9]{0,6}){0,3}(\?[a-z]=[0-9])?(#[a-z0-9]{0,4})?", fullmatch=True))
@settings(max_examples=200, deadline=None)
def test_canonicalize_idempotent(url):
    once = _canon_one(url, False)
    assert _canon_one(once, False) == once


def test_hash31_golden():
    # golden values verified by hand against the Go algorithm
    # (h = h*31 + rune, %08x)
    assert hash31_hex8("abc") == "00017862"
    assert hash31_hex8("") == "00000000"
    assert hash31_hex8("q=1&b=2") == "c47d02d6"
    assert hash31_hex8("søk") == "0001ce26"  # rune (not byte) semantics


SANITIZE_CASES = [
    ("https://e.com/", "index"),
    ("https://e.com/a/b/c", "a_b_c"),
    ("https://e.com/a<b>|c", "a_b__c"),
    ("https://e.com/trail. ", "trail"),
]


@pytest.mark.parametrize("url,expected", SANITIZE_CASES)
def test_sanitize_filename(spark, url, expected):
    df = spark.createDataFrame([(url,)], "url string")
    got = df.select(sanitize_filename_cols(F.col("url")).alias("f")).collect()[0].f
    assert got == expected


HEADLINE_CASES = [
    ("Big News: Spark 4!", "202601151200", "2026-01-15_big-news-spark-4"),
    ("Hello,   World!!", None, "hello-world"),
    ("(((", None, "article"),
]


@pytest.mark.parametrize("headline,datecode,expected", HEADLINE_CASES)
def test_sanitize_headline(spark, headline, datecode, expected):
    df = spark.createDataFrame([(headline, datecode)], "h string, d string")
    got = (
        df.select(
            sanitize_headline_filename_cols(F.col("h"), F.col("d")).alias("f")
        ).collect()[0].f
    )
    assert got == expected
