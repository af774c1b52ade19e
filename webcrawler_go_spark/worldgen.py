"""Deterministic synthetic web world (FIXTURES.md §1-§7, determinism rules).

Every observable of a "fetch" is a pure function of the canonical URL and
the world seed — no network, no wall clock. The SAME functions back:

* the Spark fetch kernel (operators/fetch.py, mapInPandas) — numeric parts
  vectorized in numpy, span assembly per row (unavoidable for ragged
  arrays; still Arrow-batched end-to-end);
* the sequential parity oracle (oracle/sequential.py) — scalar calls;
* fixture datagen (datagen.py).

So Spark run, re-run, resumed run and the plain-Python BFS oracle all see
byte-identical "responses", which is what makes the north rule's
crawl-order / URL-seen-set / span-sequence parity checkable.

World shape:
* hosts ``host-%04d.test``; host popularity is quadratically skewed so a
  hot host exists at every scale (skew/salting tests, SURVEY §4.1);
* pages ``/page/<n>`` with n bounded per host so BFS closes;
* per page: 1-20 text spans, 0-8 media spans, 0-30 outlinks interleaved in
  deterministic document order (mirrors the reference's DOM-order walks,
  crawler.go:957-999, 890-910);
* status mix: 88% 200, 4% 404, 3% 403, 2% 503, 1% 429, 2% 301
  (FIXTURES.md §7); ~1% of 200-pages carry a bot-protection phrase.
"""

from __future__ import annotations

from dataclasses import dataclass

from webcrawler_go_spark.hashing import splitmix64, str_hash64

_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
    "lima mike november oscar papa quebec romeo sierra tango uniform victor "
    "whiskey xray yankee zulu crawl frontier spider index fetch parse"
).split()

SEARCH_NEEDLE = "needle-in-haystack"
BOT_PHRASE = "checking your browser"  # crawler.go:1003 indicator

_STATUS_TABLE = (
    [200] * 88 + [404] * 4 + [403] * 3 + [503] * 2 + [429] * 1 + [301] * 2
)

_MEDIA_EXT = ["jpg", "png", "pdf", "docx", "gif"]


@dataclass(frozen=True)
class World:
    seed: int = 42
    n_hosts: int = 64
    pages_per_host: int = 200
    same_host_pct: int = 85  # FIXTURES.md rule 3
    max_links: int = 30
    max_text_spans: int = 20
    max_media_spans: int = 8


def _h(world: World, url: str, salt: int = 0) -> int:
    return splitmix64(str_hash64(url) ^ (world.seed * 0x9E3779B97F4A7C15 + salt) & ((1 << 64) - 1))


def host_name(i: int) -> str:
    return f"host-{i:04d}.test"


def page_url(host_i: int, page_i: int) -> str:
    return f"https://{host_name(host_i)}/page/{page_i}"


def skewed_host(world: World, r: int) -> int:
    """Quadratic skew: host 0 is the hot host (Zipf-like, FIXTURES rule 3)."""
    u = (r % 10_000) / 10_000.0
    return int(world.n_hosts * u * u) % world.n_hosts


def seeds(world: World, n: int = 8) -> list[dict]:
    """Fixed seed list across distinct hosts (FIXTURES.md §2)."""
    out = []
    for s in range(n):
        hi = (s * max(1, world.n_hosts // n)) % world.n_hosts
        out.append(
            {
                "url": page_url(hi, 0),
                "priority": round((splitmix64(world.seed + s) % 1000) / 1000.0, 3),
                "seq": s,
            }
        )
    return out


def status_of(world: World, url: str) -> int:
    return _STATUS_TABLE[_h(world, url, 1) % 100]


def bytes_of(world: World, url: str) -> int:
    """Log-normal-ish body size from hash bits (drives oversized checks)."""
    h = _h(world, url, 2)
    base = 500 + (h % 8000)
    burst = 1 << ((h >> 13) % 8)  # 1..128 multiplier
    return base * burst


def content_type_of(world: World, url: str) -> str:
    r = _h(world, url, 3) % 100
    if r < 88:
        return "text/html"
    if r < 92:
        return "application/pdf"
    if r < 95:
        return (
            "application/vnd.openxmlformats-officedocument."
            "wordprocessingml.document"
        )
    return "image/jpeg"


def error_class_of(world: World, url: str) -> str | None:
    """~3% of fetches fail at the network layer (crawler.go:1030-1042)."""
    r = _h(world, url, 4) % 1000
    if r < 970:
        return None
    return ["timeout", "connection refused", "no such host", "certificate"][r % 4]


def lastmod_days_of(world: World, url: str) -> int | None:
    """Days since 2026-01-01 for ~50% of HTML pages (sitemap.go:248-257)."""
    h = _h(world, url, 5)
    if h % 2:
        return None
    return h % 365


def _words(h: int, n: int) -> str:
    out = []
    for i in range(n):
        out.append(_WORDS[splitmix64(h + i) % len(_WORDS)])
    return " ".join(out)


def _host_page_of(url: str) -> tuple[int, int]:
    """Parse (host_id, page_id) from the world's URL grammar
    ``https://host-%04d.test/page/%d``; arbitrary URLs (the engine also
    fetches corpus-derived URLs in oracle queries) fall back to
    hash-derived ids so every URL has a stable identity."""
    import re

    m = re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://host-(\d+)\.test(?:/page/(\d+))?/?$", url)
    if m:
        return int(m.group(1)), int(m.group(2) or 0)
    h = str_hash64(url)
    return h % 10_000, (h >> 16) % 10_000


def outlinks_of(world: World, url: str) -> list[str]:
    """Outlink URLs in document order. ~same_host_pct% same-host (F1 tests
    the rest), targets bounded to pages_per_host so the graph closes."""
    if status_of(world, url) != 200 or content_type_of(world, url) != "text/html":
        return []
    hi, _ = _host_page_of(url)
    h = _h(world, url, 6)
    n = h % (world.max_links + 1)
    links = []
    for i in range(n):
        hh = splitmix64(h ^ (i * 0x5851F42D4C957F2D + 0x14057B7EF767814F))
        if hh % 100 < world.same_host_pct:
            th = hi
        else:
            th = skewed_host(world, hh >> 7)
        tp = (hh >> 17) % world.pages_per_host
        links.append(page_url(th, tp))
    return links


def text_spans_of(world: World, url: str) -> list[str]:
    h = _h(world, url, 7)
    n = 1 + h % world.max_text_spans
    spans = []
    for i in range(n):
        sh = splitmix64(h + 101 * i)
        words = 4 + sh % 12
        text = _words(sh, words)
        if sh % 97 == 0:
            text = f"{text} {SEARCH_NEEDLE}"
        spans.append(text)
    # ~1% of pages look bot-challenged (disjunctive detector fodder)
    if h % 100 == 0:
        spans[0] = f"{BOT_PHRASE} {spans[0]}"
    return spans


def media_refs_of(world: World, url: str) -> list[str]:
    hi, _ = _host_page_of(url)
    h = _h(world, url, 8)
    n = h % (world.max_media_spans + 1)
    refs = []
    for i in range(n):
        mh = splitmix64(h + 977 * i)
        ext = _MEDIA_EXT[mh % len(_MEDIA_EXT)]
        refs.append(f"https://{host_name(hi)}/media/{mh % 100_000}.{ext}")
    return refs


def spans_of(world: World, url: str) -> list[tuple[str, str, str, int]]:
    """Interleaved (kind, text, media_ref, offset) — the input_hint payload.

    Interleaving order: deterministic round-robin of text / media / link
    spans driven by hash bits, offsets dense ascending — mirrors DOM
    document order in the reference walks.
    """
    texts = text_spans_of(world, url)
    medias = media_refs_of(world, url)
    links = outlinks_of(world, url)
    h = _h(world, url, 9)
    queue = (
        [("text", t, "") for t in texts]
        + [("media", "", m) for m in medias]
        + [("link", "", l) for l in links]
    )
    # deterministic shuffle: sort by per-item hash, stable within kind order
    keyed = [
        (splitmix64(h + 31 * i), i, item) for i, item in enumerate(queue)
    ]
    keyed.sort(key=lambda kv: (kv[0], kv[1]))
    return [
        (kind, text, media, off)
        for off, (_, _, (kind, text, media)) in enumerate(keyed)
    ]


def doc_outlinks(world: World, url: str) -> list[str]:
    """Outlinks in *document order* (their order within the span sequence).

    This — not the raw ``outlinks_of`` list — defines link_pos for the
    crawl-order parity key (round, parent_seq, link_pos), mirroring the
    reference's DOM-document-order link discovery (crawler.go:957-999).
    """
    return [m for kind, _t, m, _o in spans_of(world, url) if kind == "link"]


def body_text_of(world: World, url: str) -> str:
    """Flat page text (joined text spans) for substring-search parity."""
    return " ".join(text_spans_of(world, url))
