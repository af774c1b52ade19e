"""Predicates & classifiers (SURVEY.md §2.2, §2.6 C6-C10).

All pure Catalyst expressions — single regex alternations / CASE chains
that stay inside whole-stage codegen; zero Python in the hot path.
Behavior constants lifted from the reference (citations inline).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- status classification (crawler.go:654-677) ---------------------------

BLOCKED_STATUSES = (403, 503, 429)


def status_class(status: Column) -> Column:
    """2xx/3xx/4xx/5xx bucket label (crawler.go:654-663)."""
    return F.concat((F.floor(status / 100)).cast("int").cast("string"), F.lit("xx"))


def fetch_disposition(status: Column) -> Column:
    """blocked (403/503/429) > error (>=400) > redirect (3xx) > ok
    (crawler.go:665-677)."""
    return (
        F.when(status.isin(*BLOCKED_STATUSES), F.lit("blocked"))
        .when(status >= 400, F.lit("error"))
        .when((status >= 300) & (status < 400), F.lit("redirect"))
        .otherwise(F.lit("ok"))
    )


# --- bot-protection detection ---------------------------------------------

# crawler.go:1001-1028 — ANY of 16 lowercase substrings
BOT_INDICATORS = [
    "checking your browser",
    "ddos protection",
    "please enable javascript",
    "access denied",
    "security check",
    "verify you are human",
    "captcha",
    "incapsula",
    "perimeterx",
    "sucuri",
    "cloudflare",
    "please wait while we verify",
    "just a moment",
    "ray id",
    "attention required",
    "sorry, you have been blocked",
]

# sitemap.go:290-329 — conjunctive challenge patterns (ALL substrings match)
SITEMAP_CHALLENGE_PATTERNS = [
    ["checking your browser", "please wait"],
    ["just a moment", "enable javascript"],
    ["ddos protection", "please wait"],
    ["attention required", "cloudflare"],
    ["sorry, you have been blocked"],
    ["access denied", "you don't have permission"],
    ["verify you are human", "captcha"],
    ["security check", "please complete"],
]
SITEMAP_SHORT_PAGE_INDICATORS = [
    "checking your browser",
    "please enable javascript and cookies",
]


def bot_protection(body: Column) -> Column:
    """Disjunctive detector (crawler.go:1001-1028): one regex alternation
    over the lowercased body — a single JVM-side scan instead of 16."""
    import re

    pattern = "|".join(re.escape(s) for s in BOT_INDICATORS)
    return F.lower(body).rlike(pattern)


def sitemap_bot_protection(body: Column) -> Column:
    """Conjunctive detector (sitemap.go:290-329): every substring of a
    pattern must appear; plus the short-page heuristic (<2000 chars)."""
    lower = F.lower(body)
    pattern_hits = [
        F.reduce(
            F.array(*[F.lit(s) for s in pat]),
            F.lit(True),
            lambda acc, s: acc & F.contains(lower, s),
        )
        for pat in SITEMAP_CHALLENGE_PATTERNS
    ]
    conjunctive = pattern_hits[0]
    for h in pattern_hits[1:]:
        conjunctive = conjunctive | h
    import re

    short_pat = "|".join(re.escape(s) for s in SITEMAP_SHORT_PAGE_INDICATORS)
    short_page = (F.length(body) < 2000) & lower.rlike(short_pat)
    return conjunctive | short_page


# --- network-error taxonomy (crawler.go:1030-1042) -------------------------


def error_taxonomy(err: Column) -> Column:
    """timeout / refused / dns / ssl / other from the error string."""
    return (
        F.when(err.contains("timeout"), F.lit("timeout"))
        .when(err.contains("connection refused"), F.lit("refused"))
        .when(err.contains("no such host"), F.lit("dns"))
        .when(err.contains("certificate"), F.lit("ssl"))
        .otherwise(F.lit("other"))
    )


# --- content-type dispatch (crawler.go:806-828) ----------------------------

DOCX_MIME = (
    "application/vnd.openxmlformats-officedocument.wordprocessingml.document"
)


def content_kind(content_type: Column) -> Column:
    return (
        F.when(content_type.contains("application/pdf"), F.lit("pdf"))
        .when(content_type.contains(DOCX_MIME), F.lit("docx"))
        .when(content_type.contains("text/html"), F.lit("html"))
        .otherwise(F.lit("other"))
    )


# --- link filters (SURVEY §2.2 F3, F4) --------------------------------------

# sitemap.go:346-364 + crawler.go:841-845: empty / '#...' / pseudo schemes
PSEUDO_LINK_RE = "^(#|mailto:|tel:|javascript:|data:)"

# sitemap.go:375-390 — 27 skipped extensions
SKIP_EXTENSIONS = [
    ".pdf", ".doc", ".docx", ".xls", ".xlsx", ".ppt", ".pptx",
    ".zip", ".rar", ".tar", ".gz", ".7z",
    ".jpg", ".jpeg", ".png", ".gif", ".webp", ".svg", ".ico",
    ".mp3", ".mp4", ".avi", ".mov", ".wmv", ".flv",
    ".css", ".js", ".json", ".xml", ".rss", ".atom",
]
SKIP_EXT_RE = (
    r"\.(pdf|docx?|xlsx?|pptx?|zip|rar|tar|gz|7z|jpe?g|png|gif|webp|svg|ico"
    r"|mp3|mp4|avi|mov|wmv|flv|css|js|json|xml|rss|atom)$"
)


def is_crawlable_href(href: Column) -> Column:
    """F3 + F11: non-empty, not a pseudo link, scheme http(s) or relative."""
    scheme = F.regexp_extract(href, r"^([a-zA-Z][a-zA-Z0-9+.-]*):", 1)
    return (
        href.isNotNull()
        & (F.trim(href) != "")
        & ~F.trim(href).rlike(PSEUDO_LINK_RE)
        & F.lower(scheme).isin("", "http", "https")
    )


def has_skipped_extension(path: Column) -> Column:
    """F4: extension skip-list on the lowercased path (sitemap.go:375-390)."""
    return F.lower(path).rlike(SKIP_EXT_RE)


# --- flexible JSON field coalescing (jsonfeed.go:230-269) -------------------

FEED_FIELD_CANDIDATES = {
    "headline": ["headline", "title", "name"],
    "link": ["link", "url", "href", "permalink"],
    "date": ["date", "published", "pubDate", "created"],
    "datecode": ["datecode", "dateCode", "date_code"],
    "brief": ["brief", "summary", "description", "excerpt"],
    "tags": ["tags", "categories", "keywords"],
}


def coalesce_feed_fields(df_columns: list[str]) -> list[Column]:
    """Projection list realizing C8: for each logical field, coalesce over
    candidate physical columns that actually exist, cast to string
    (jsonfeed.go:271-284 toString)."""
    out = []
    for logical, candidates in FEED_FIELD_CANDIDATES.items():
        present = [F.col(c).cast("string") for c in candidates if c in df_columns]
        col = F.coalesce(*present, F.lit(None).cast("string")) if present else F.lit(None).cast("string")
        out.append(col.alias(logical))
    return out
