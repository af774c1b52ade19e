"""S6/X3 rendered-DOM source + rendered-link extraction
(operators/render.py; reference pdfcapture.go:226-305, 440-467)."""

from __future__ import annotations

from pyspark.sql import functions as F

from webcrawler_go_spark.operators.render import (
    extract_links_rendered,
    render_frontier,
)
from webcrawler_go_spark.worldgen import (
    World,
    rendered_dom_hrefs,
    rendered_links_raw,
)


def _urls_df(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], "url_norm string").select(
        "url_norm",
        F.regexp_extract("url_norm", r"https://([^/]*)", 1).alias("host"),
    )


def test_fake_renderer_contract():
    """The JS-eval contract: javascript:/mailto:/tel: filtered
    browser-side, newline-joined, deterministic; non-HTML pages render
    no links."""
    w = World()
    url = "https://host-0001.test/page/3"
    raw1, raw2 = rendered_links_raw(w, url), rendered_links_raw(w, url)
    assert raw1 == raw2
    for junk in ("javascript:", "mailto:", "tel:"):
        assert not any(
            line.startswith(junk) for line in raw1.split("\n")
        )
    # the raw DOM DOES contain junk hrefs for some urls — the filter is real
    some_junk = any(
        h.startswith(("javascript:", "mailto:", "tel:"))
        for u in (f"https://host-0000.test/page/{p}" for p in range(20))
        for h in rendered_dom_hrefs(w, u)
    )
    assert some_junk
    # a 404/media URL renders nothing
    nohtml = [
        u
        for u in (f"https://host-0002.test/page/{p}" for p in range(60))
        if rendered_links_raw(w, u) == ""
    ]
    assert nohtml


def test_render_frontier_and_extract(spark):
    """End to end: kernel payload matches the scalar renderer; the
    extraction applies trim/empty/same-host in document order with
    pre-filter link_pos (posexplode parity)."""
    w = World()
    urls = [f"https://host-{h:04d}.test/page/{p}" for h in range(4) for p in range(4)]
    rendered = render_frontier(_urls_df(spark, urls), w)
    rows = {r.url_norm: r for r in rendered.collect()}
    assert len(rows) == len(urls)
    for u in urls:
        assert rows[u].links_raw == rendered_links_raw(w, u)
        assert rows[u].render_error is None

    got = sorted(
        (r.found_on, r.link, r.link_pos)
        for r in extract_links_rendered(rendered).collect()
    )
    expected = []
    for u in urls:
        host = u.split("/")[2]
        for pos, raw in enumerate(rendered_links_raw(w, u).split("\n")):
            link = raw.strip()
            if link and "://" in link and link.split("/")[2] == host:
                expected.append((u, link, pos))
    assert got == sorted(expected)
    # cross-host links existed and were dropped (SkippedExternal parity)
    all_links = [
        raw.strip()
        for u in urls
        for raw in rendered_links_raw(w, u).split("\n")
        if raw.strip()
    ]
    assert any(l.split("/")[2] != u.split("/")[2] for u in urls for l in all_links)


def test_extract_links_rendered_path_filter(spark):
    """pdfcapture.go:461-464: the path-prefix filter on rendered links —
    only /js/ links survive with path_filter='/js'."""
    w = World()
    urls = [f"https://host-0003.test/page/{p}" for p in range(8)]
    rendered = render_frontier(_urls_df(spark, urls), w)
    links = [r.link for r in extract_links_rendered(rendered, "/js").collect()]
    assert links and all("/js/" in l for l in links)


def test_chromium_renderer_emits_error_rows(spark):
    """The real-path boundary is honest AND per-row isolated: every row
    gets a render_error row (no browser in this container); the job
    never raises."""
    urls = ["https://host-0000.test/page/0", "https://host-0001.test/page/1"]
    rows = render_frontier(_urls_df(spark, urls), World(), renderer="chromium").collect()
    assert len(rows) == 2
    for r in rows:
        assert r.links_raw is None
        assert "Chrome" in r.render_error or "browser" in r.render_error

    import pytest

    with pytest.raises(ValueError):
        render_frontier(_urls_df(spark, urls), World(), renderer="nope")
