"""WET-style HTML → text chain (functions/html_text.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from webcrawler_go_spark.functions.html_text import html_to_text


def _clean(spark, html: str) -> str:
    df = spark.createDataFrame([(html,)], "h string")
    return df.select(html_to_text(F.col("h")).alias("t")).first()["t"]


def test_script_style_content_dropped(spark):
    assert (
        _clean(
            spark,
            "<p>a</p><script>var x = 1 < 2 && y;</script>"
            "<style>p { color: red }</style><p>b</p>",
        )
        == "a b"
    )


def test_comments_and_tags_become_spaces(spark):
    # block boundaries must not glue words together
    assert _clean(spark, "<p>one</p><!-- no --><p>two</p>") == "one two"


def test_entities_decode_one_level_amp_last(spark):
    # &amp;lt; is the LITERAL text "&lt;" after one decode level —
    # the HTML non-recursive reference rule
    assert _clean(spark, "A &amp; B &lt;x&gt; &quot;q&quot; &#39;s&#39; &amp;lt;") \
        == 'A & B <x> "q" \'s\' &lt;'


def test_nbsp_and_whitespace_collapse(spark):
    assert _clean(spark, "  a \n\t b&nbsp;&nbsp;c  ") == "a b c"


def test_case_insensitive_script_block(spark):
    assert _clean(spark, "x<SCRIPT a=b>hidden</ScRiPt>y") == "x y"


CHARREF_CASES = [
    # (html fragment, expected) — named / decimal / hex / leading-zero /
    # uppercase-X and uppercase-hex-letter spellings
    ("&ndash;", "–"),
    ("&#8211;", "–"),
    ("&#x2013;", "–"),
    ("&#X2013;", "–"),
    ("&#08211;", "–"),
    ("&#x02013;", "–"),
    ("&rsquo;", "’"),
    ("&#8217;", "’"),
    ("&#x2019;", "’"),
    ("&ldquo;a&rdquo;", "“a”"),
    ("&#8220;a&#8221;", "“a”"),
    ("&hellip;", "…"),
    ("&#x2026;", "…"),
    ("&copy; &reg; &trade;", "© ® ™"),
    ("&#169; &#174; &#8482;", "© ® ™"),
    ("&#xA9; &#xae; &#x2122;", "© ® ™"),
    ("&laquo;x&raquo;", "«x»"),
    ("&euro;9 &pound;9 &yen;9 &cent;9", "€9 £9 ¥9 ¢9"),
    ("&deg; &plusmn; &times; &divide;", "° ± × ÷"),
    ("&sect; &para; &middot; &bull;", "§ ¶ · •"),
    ("&iexcl;Si! &iquest;No?", "¡Si! ¿No?"),
    ("&apos;s &#x27;s", "'s 's"),
    ("&#160;a&#xA0;b", "a b"),                 # nbsp forms → plain space
    ("&#60;b&#62; &#x3C;i&#x3E;", "<b> <i>"),  # decoded AFTER tag strip
    ("&amp;#8211; &amp;ndash;", "&#8211; &ndash;"),  # one-level rule
    ("&#38;mdash;", "&mdash;"),                # numeric amp: same rule
    ("&ndashx; &#x2G13; &# 60;", "&ndashx; &#x2G13; &# 60;"),  # non-refs survive
]


def test_charref_table(spark):
    """Directive r6#6: numeric character references and the common
    named set — every spelling, plus the non-recursive decode rule."""
    html = " | ".join(frag for frag, _ in CHARREF_CASES)
    want = " | ".join(exp for _, exp in CHARREF_CASES)
    assert _clean(spark, html) == want


def test_charref_table_duckdb_twin():
    import duckdb

    from webcrawler_go_spark.functions.html_text import html_to_text_sql

    html = " | ".join(frag for frag, _ in CHARREF_CASES).replace("'", "''")
    want = " | ".join(exp for _, exp in CHARREF_CASES)
    got = duckdb.sql(f"SELECT {html_to_text_sql(chr(39) + html + chr(39))} AS t").fetchone()[0]
    assert got == want


def test_vertical_tab_whitespace_parity(spark):
    """ADVICE r6: java \\s matches U+000B but RE2 \\s does not — the
    collapse class is written out explicitly so both engines agree."""
    import duckdb

    from webcrawler_go_spark.functions.html_text import html_to_text_sql

    html = "a\x0bb \x0b c"
    spark_got = _clean(spark, html)
    duck_got = duckdb.sql(
        f"SELECT {html_to_text_sql(chr(39) + html + chr(39))} AS t"
    ).fetchone()[0]
    assert spark_got == duck_got == "a b c"


def test_sql_twin_generated_from_same_table():
    """html_to_text_sql is generated from HTML_TEXT_STEPS — a drifted
    hand-written copy is impossible; sanity-check with duckdb."""
    import duckdb

    from webcrawler_go_spark.functions.html_text import html_to_text_sql

    expr = html_to_text_sql("'<p>a</p><script>1<2</script>&amp; b'")
    got = duckdb.sql(f"SELECT {expr} AS t").fetchone()[0]
    assert got == "a & b"
