"""WET-style HTML → visible-text extraction, pure codegen.

Common Crawl ships WET files — the visible text of every WARC response
— and every training-data pipeline runs exactly this strip as its first
text stage. The repo already extracts STRUCTURE (links/media spans) with
the Python HTMLParser kernel (`operators/html_extract.py`, the X1/X2
span contract); this module is the complementary BULK path: when all
you want is the text, a chain of JVM-side `regexp_replace` built-ins
stays inside whole-stage codegen — no Python worker, no Arrow hop —
which at 100 TB of HTML is the difference between a scan-rate stage
and a kernel stage.

Engine-portability contract (the repo convention): every pattern is
written in the RE2 ∩ java.util.regex common subset — inline ``(?is)``
flags, lazy quantifiers, character classes only (no backrefs, no
lookaround) — so the DuckDB oracle applies the IDENTICAL chain with
``'g'``-flag `regexp_replace` and must produce byte-identical text.

Stage order matters and is part of the contract:

1. drop ``<script>…</script>`` / ``<style>…</style>`` blocks (their
   CONTENT is not text; a tag-only strip would leak JS/CSS bodies);
2. drop ``<!-- … -->`` comments;
3. strip every remaining tag to a space (block boundaries become
   whitespace, so ``</p><p>`` doesn't glue words);
4. decode the five predefined XML entities + ``&nbsp;`` — ``&amp;``
   LAST so ``&amp;lt;`` decodes to the literal ``&lt;`` (one level,
   the HTML spec's non-recursive reference rule);
5. collapse whitespace runs and trim.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (pattern, replacement) chain — applied in order by both engines.
HTML_TEXT_STEPS: list[tuple[str, str]] = [
    (r"(?is)<script\b[^>]*>.*?</script>", " "),
    (r"(?is)<style\b[^>]*>.*?</style>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"<[^>]+>", " "),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;", "\""),
    (r"&#39;", "'"),
    (r"&nbsp;", " "),
    (r"&amp;", "&"),
    (r"\s+", " "),
]


def html_to_text(html: Column) -> Column:
    """Visible text of an HTML document — the WET extraction."""
    out = html
    for pat, rep in HTML_TEXT_STEPS:
        out = F.regexp_replace(out, pat, rep)
    return F.trim(out)


def html_to_text_sql(expr: str) -> str:
    """The identical chain as a DuckDB expression over ``expr`` —
    generated from HTML_TEXT_STEPS so Spark and oracle can never
    drift."""
    out = expr
    for pat, rep in HTML_TEXT_STEPS:
        p = pat.replace("'", "''")
        r = rep.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '{r}', 'g')"
    return f"trim({out})"
