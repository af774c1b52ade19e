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


def test_sql_twin_generated_from_same_table():
    """html_to_text_sql is generated from HTML_TEXT_STEPS — a drifted
    hand-written copy is impossible; sanity-check with duckdb."""
    import duckdb

    from webcrawler_go_spark.functions.html_text import html_to_text_sql

    expr = html_to_text_sql("'<p>a</p><script>1<2</script>&amp; b'")
    got = duckdb.sql(f"SELECT {expr} AS t").fetchone()[0]
    assert got == "a & b"
