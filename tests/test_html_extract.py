"""Real-HTML span extraction: document order, filters, span invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from webcrawler_go_spark.operators.html_extract import (
    extract_documents,
    extract_spans_from_html,
)

HTML = """
<html><head><title>T</title><style>p {color: red}</style></head>
<body>
  <h1>Welcome here</h1>
  <p>Intro text <a href="/first">one</a> middle
     <img src="/logo.png"> tail
     <a href="https://ext.test/second?q=1#f">two</a></p>
  <script>var x = "<a href='/not-a-link'>";</script>
  <img src="data:image/png;base64,xyz">
  <p>Closing words</p>
</body></html>
"""


def test_document_order_and_kinds():
    spans = extract_spans_from_html(HTML)
    kinds = [(s["kind"], s["media_ref"]) for s in spans]
    # offsets dense ascending
    assert [s["offset"] for s in spans] == list(range(len(spans)))
    # link/media document order preserved
    refs = [m for k, m in kinds if k != "text"]
    assert refs == ["/first", "/logo.png", "https://ext.test/second?q=1#f"]
    # script content and data: URIs never become spans
    assert all("not-a-link" not in s["media_ref"] for s in spans)
    assert all(not s["media_ref"].startswith("data:") for s in spans)
    # style/script text excluded, real text kept
    texts = " ".join(s["text"] for s in spans if s["kind"] == "text")
    assert "Welcome here" in texts and "Closing words" in texts
    assert "color: red" not in texts and "var x" not in texts


def test_extract_documents_df(spark):
    df = spark.createDataFrame(
        [("https://h.test/p", HTML), ("https://h.test/empty", "")],
        "url string, body string",
    )
    docs = extract_documents(df)
    got = {r.doc_id: r.spans for r in docs.collect()}
    assert len(got["https://h.test/p"]) == len(extract_spans_from_html(HTML))
    assert got["https://h.test/empty"] == []
    # downstream explode works on the schema
    n_links = (
        docs.select(F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "link")
        .count()
    )
    assert n_links == 2
