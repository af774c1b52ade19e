"""Real HTML → span-sequence extraction (SURVEY §2.7 X1/X2).

The reference walks the parsed DOM recursively in document order,
emitting every ``<a href>`` (crawler.go:957-999, 830-854) and every
non-data ``<img src>`` (crawler.go:890-910). This kernel reproduces that
walk with the stdlib ``html.parser`` (no external deps) inside a
``mapInPandas`` iterator — Arrow-batched, one parser instance reused per
row, emitting the canonical interleaved span sequence:

* ``text`` spans: coalesced visible text runs (script/style skipped),
* ``link`` spans: <a href> in document order (media_ref = href),
* ``media`` spans: <img src> in document order,
* ``offset``: dense document-order position.

This is the production path for pre-fetched corpora (WARC-style bodies)
and the real-HTTP backend; the synthetic worldgen path exists only so
tests/bench need no network.
"""

from __future__ import annotations

from collections.abc import Iterator
from html.parser import HTMLParser

import pandas as pd

from pyspark.sql import DataFrame

from webcrawler_go_spark.schemas import DOCUMENTS


class _SpanWalker(HTMLParser):
    """Document-order walk: text runs + <a href> + <img src> as spans."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.spans: list[tuple[str, str, str, int]] = []
        self._text_buf: list[str] = []
        self._skip_depth = 0  # inside <script>/<style>

    def _flush_text(self) -> None:
        text = " ".join("".join(self._text_buf).split())
        self._text_buf.clear()
        if text:
            self.spans.append(("text", text, "", len(self.spans)))

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in ("script", "style"):
            self._skip_depth += 1
            return
        a = dict(attrs)
        if tag == "a" and a.get("href", "").strip():
            href = a["href"].strip()
            self._flush_text()
            self.spans.append(("link", "", href, len(self.spans)))
        elif tag == "img":
            src = (a.get("src") or "").strip()
            # data: URIs skipped (crawler.go:900)
            if src and not src.startswith("data:"):
                self._flush_text()
                self.spans.append(("media", "", src, len(self.spans)))

    def handle_endtag(self, tag: str) -> None:
        if tag in ("script", "style") and self._skip_depth:
            self._skip_depth -= 1

    def handle_data(self, data: str) -> None:
        if not self._skip_depth:
            self._text_buf.append(data)

    def close(self) -> None:  # noqa: D102 — flush trailing text
        super().close()
        self._flush_text()


def extract_spans_from_html(html: str) -> list[dict]:
    """body → span dicts (kind, text, media_ref, offset), document order."""
    w = _SpanWalker()
    w.feed(html or "")
    w.close()
    return [
        {"kind": k, "text": t, "media_ref": m, "offset": o}
        for k, t, m, o in w.spans
    ]


def extract_documents(bodies: DataFrame, url_col: str = "url", body_col: str = "body") -> DataFrame:
    """(url, body html) → documents(doc_id, spans) via mapInPandas."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield pd.DataFrame(
                {
                    "doc_id": b[url_col],
                    "spans": [extract_spans_from_html(h) for h in b[body_col]],
                }
            )

    return bodies.mapInPandas(kernel, schema=DOCUMENTS)
