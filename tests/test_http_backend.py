"""HTTP fetch backend (S3) with a mock transport: X1/X2-parity span
extraction, outlink discovery, header/cookie/Referer/UA parity with the
reference request builder (crawler.go:627-645), and bot-block handling."""

from __future__ import annotations

import pandas as pd
import pytest

from webcrawler_go_spark.operators.fetch import (
    BASE_HEADERS,
    USER_AGENTS,
    _http_kernel,
)
from webcrawler_go_spark.operators.html_extract import extract_spans_from_html
from webcrawler_go_spark.schemas import FETCH_RESULT

PAGE_A = """<html><body>
<p>Welcome to page A</p>
<a href="https://h.test/b">to B</a>
<img src="/logo.png">
<script>ignore me</script>
<a href="/rel">relative</a>
</body></html>"""

PAGE_BLOCKED = "<html><body>Checking your browser before accessing.</body></html>"


class FakeResp:
    def __init__(self, status, ctype, body):
        self.status_code = status
        self.headers = {"Content-Type": ctype}
        self.text = body
        self.content = body.encode()


def make_transport(pages, seen_headers):
    def transport(session, method, url, headers):
        seen_headers.append((url, dict(headers)))
        if url not in pages:
            raise ConnectionError(f"lookup {url}: no such host")
        return pages[url]
    return transport


def _batch(rows):
    cols = ["url_norm", "url_hash", "host", "seq", "round", "attempts"]
    return pd.DataFrame(rows, columns=cols)


def run_kernel(rows, pages, referer_url="https://start.test/"):
    seen = []
    gen = _http_kernel(
        method="GET", timeout_s=5, max_redirects=10,
        referer_url=referer_url, transport=make_transport(pages, seen),
    )
    out = pd.concat(list(gen(iter([_batch(rows)]))), ignore_index=True)
    return out, seen


def test_http_backend_extracts_spans_and_outlinks():
    pages = {"https://h.test/a": FakeResp(200, "text/html; charset=utf-8", PAGE_A)}
    out, _ = run_kernel([("https://h.test/a", 1, "h.test", 1, 0, 0)], pages)
    row = out.iloc[0]
    assert row["status"] == 200 and not row["blocked"]
    # span parity with the X1/X2 walker on the same body
    want = extract_spans_from_html(PAGE_A)
    assert list(row["spans"]) == want
    kinds = [s["kind"] for s in row["spans"]]
    assert kinds == ["text", "link", "text", "media", "link", "text"]
    # relative hrefs resolve against the PAGE URL (C2) — unresolved they
    # would canonicalize hostless and the same-host filter would drop them
    assert list(row["outlinks"]) == ["https://h.test/b", "https://h.test/rel"]
    # spans keep the RAW href (span parity); resolution applies to outlinks
    assert [s["media_ref"] for s in row["spans"] if s["kind"] == "link"] == [
        "https://h.test/b", "/rel"
    ]


def test_http_backend_headers_ua_by_attempt_and_referer():
    pages = {
        "https://h.test/a": FakeResp(200, "text/html", PAGE_A),
        "https://h.test/b": FakeResp(200, "text/html", "<p>b</p>"),
    }
    rows = [
        ("https://h.test/a", 1, "h.test", 1, 0, 0),
        ("https://h.test/b", 2, "h.test", 2, 0, 2),  # attempt 2
    ]
    out, seen = run_kernel(rows, pages)
    (u1, h1), (u2, h2) = seen
    # all 11 fixed headers present (crawler.go:628-639)
    for k, v in BASE_HEADERS.items():
        assert h1[k] == v and h2[k] == v
    # UA rotates by ATTEMPT, not url hash (crawler.go:627)
    assert h1["User-Agent"] == USER_AGENTS[0]
    assert h2["User-Agent"] == USER_AGENTS[2 % len(USER_AGENTS)]
    # Referer only after the first success (crawler.go:640-645)
    assert "Referer" not in h1
    assert h2["Referer"] == "https://start.test/"


def test_http_backend_bot_protection_blocks():
    pages = {"https://h.test/x": FakeResp(200, "text/html", PAGE_BLOCKED)}
    out, seen = run_kernel([("https://h.test/x", 1, "h.test", 1, 0, 0)], pages)
    row = out.iloc[0]
    assert bool(row["blocked"]) is True
    assert list(row["spans"]) == []       # blocked pages contribute no content
    assert list(row["outlinks"]) == []
    # a blocked "200" is not a success → no Referer on later requests
    pages2 = {
        "https://h.test/x": FakeResp(200, "text/html", PAGE_BLOCKED),
        "https://h.test/y": FakeResp(200, "text/html", "<p>y</p>"),
    }
    _, seen2 = run_kernel(
        [("https://h.test/x", 1, "h.test", 1, 0, 0),
         ("https://h.test/y", 2, "h.test", 2, 0, 0)], pages2)
    assert "Referer" not in seen2[1][1]


def test_http_backend_redirect_chain_followed_and_capped():
    """L2 (crawler.go:189-199): the kernel's OWN redirect walk — 3xx +
    Location hops are followed with the first request's headers, and Go's
    CheckRedirect cap semantics apply: error once max_redirects requests
    were made (at most max_redirects−1 redirects followed)."""
    def redirect_world(n):
        pages = {}
        for i in range(1, n + 1):
            pages[f"https://h.test/r/{i}"] = FakeResp(301, "", "")
            pages[f"https://h.test/r/{i}"].headers = {
                "Location": f"https://h.test/r/{i - 1}" if i > 1 else "https://h.test/final"
            }
        pages["https://h.test/final"] = FakeResp(200, "text/plain", "made it")
        return pages

    # 9 redirects (10 requests): allowed
    out, seen = run_kernel(
        [("https://h.test/r/9", 1, "h.test", 1, 0, 0)], redirect_world(9)
    )
    row = out.iloc[0]
    assert row["status"] == 200 and row["error_class"] is None
    assert [s["text"] for s in row["spans"]] == ["made it"]
    assert len(seen) == 10  # 1 initial + 9 redirect hops
    # headers identical on every hop (via[0].Header copy)
    assert all(h == seen[0][1] for _, h in seen)
    # relative Location resolves against the current URL
    pages = redirect_world(1)
    pages["https://h.test/r/1"].headers = {"Location": "/final"}
    out2, _ = run_kernel([("https://h.test/r/1", 1, "h.test", 1, 0, 0)], pages)
    assert out2.iloc[0]["status"] == 200
    # 10 redirects needed: stopped with the Go client's error string
    out3, seen3 = run_kernel(
        [("https://h.test/r/10", 1, "h.test", 1, 0, 0)], redirect_world(10)
    )
    row3 = out3.iloc[0]
    assert row3["status"] == 0
    assert "stopped after 10 redirects" in row3["error_class"]
    assert len(seen3) == 10  # the 11th request is never made


def test_http_backend_error_taxonomy_row():
    out, _ = run_kernel([("https://gone.test/", 1, "gone.test", 1, 0, 0)], {})
    row = out.iloc[0]
    assert row["status"] == 0 and "no such host" in row["error_class"]
    assert list(row["spans"]) == [] and not row["blocked"]


def test_http_backend_through_spark(spark):
    """Same kernel through mapInPandas: Arrow schema conformance +
    outlinks usable for the next round's frontier."""
    body = PAGE_A

    # defined inline (not module-level) so cloudpickle ships it by VALUE —
    # Spark workers cannot import the test module
    def transport(session, method, url, headers):
        from types import SimpleNamespace

        return SimpleNamespace(
            status_code=200,
            headers={"Content-Type": "text/html"},
            text=body,
            content=body.encode(),
        )

    gen = _http_kernel(
        method="GET", timeout_s=5, max_redirects=10,
        referer_url=None, transport=transport,
    )
    sched = spark.createDataFrame(
        [("https://h.test/a", 1, "h.test", 1, 0, 0, "/a", 0, 0, 0)],
        "url_norm string, url_hash long, host string, seq long, round int, "
        "attempts int, path string, disc_round int, parent_seq long, link_pos int",
    )
    got = sched.mapInPandas(gen, schema=FETCH_RESULT).collect()
    assert len(got) == 1
    r = got[0]
    assert [s["kind"] for s in r.spans] == [
        "text", "link", "text", "media", "link", "text"
    ]
    assert r.outlinks == ["https://h.test/b", "https://h.test/rel"]


def test_http_backend_dispatches_pdf_and_docx():
    """C7 → X4/X5: PDF and DOCX responses route through the real binary
    extractors; corrupt documents extract nothing (not an error row)."""
    from webcrawler_go_spark.operators.doc_extract import make_docx, make_pdf

    pdf_bytes = make_pdf(["pdf page text"])
    docx_bytes = make_docx(["docx paragraph"])

    class BinResp:
        def __init__(self, ctype, content):
            self.status_code = 200
            self.headers = {"Content-Type": ctype}
            self.content = content
            self.text = content.decode("latin-1", errors="replace")

    pages = {
        "https://h.test/a.pdf": BinResp("application/pdf", pdf_bytes),
        "https://h.test/a.docx": BinResp(
            "application/vnd.openxmlformats-officedocument."
            "wordprocessingml.document",
            docx_bytes,
        ),
        "https://h.test/bad.pdf": BinResp("application/pdf", b"garbage"),
    }
    seen = []

    def transport(session, method, url, headers):
        seen.append(url)
        return pages[url]

    gen = _http_kernel(
        method="GET", timeout_s=5, max_redirects=10,
        referer_url=None, transport=transport,
    )
    rows = [
        ("https://h.test/a.pdf", 1, "h.test", 1, 0, 0),
        ("https://h.test/a.docx", 2, "h.test", 2, 0, 0),
        ("https://h.test/bad.pdf", 3, "h.test", 3, 0, 0),
    ]
    out = pd.concat(list(gen(iter([_batch(rows)]))), ignore_index=True)
    by_url = {r["url"]: r for _, r in out.iterrows()}
    assert [s["text"] for s in by_url["https://h.test/a.pdf"]["spans"]] == ["pdf page text"]
    assert [s["text"] for s in by_url["https://h.test/a.docx"]["spans"]] == ["docx paragraph"]
    bad = by_url["https://h.test/bad.pdf"]
    assert list(bad["spans"]) == [] and bad["status"] == 200 and bad["error_class"] is None


def test_http_backend_binary_types_produce_no_garbage_spans():
    """Non-text non-document types (e.g. image/png) must not decode the
    binary body into a garbage text span."""
    pages = {
        "https://h.test/pic.png": FakeResp(200, "image/png", "\x89PNG\x00binary"),
        "https://h.test/data.json": FakeResp(200, "application/json", '{"a": 1}'),
    }
    out, _ = run_kernel(
        [("https://h.test/pic.png", 1, "h.test", 1, 0, 0),
         ("https://h.test/data.json", 2, "h.test", 2, 0, 0)], pages)
    by_url = {r["url"]: r for _, r in out.iterrows()}
    assert list(by_url["https://h.test/pic.png"]["spans"]) == []
    assert [s["text"] for s in by_url["https://h.test/data.json"]["spans"]] == ['{"a": 1}']
