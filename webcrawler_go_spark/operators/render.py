"""Rendered-DOM source + rendered-link extraction (SURVEY §2 S6 / X3).

The reference renders each page in headless Chrome and extracts links
from the POST-JS DOM via a JS eval that returns absolute hrefs,
``javascript:``/``mailto:``/``tel:`` filtered browser-side and joined
with '\\n' (pdfcapture.go:226-305); the Go side then splits on newlines,
trims, drops empties, parses, keeps same-domain links and applies the
path-prefix filter (pdfcapture.go:440-467).

Spark-first split of that pipeline:

* ``render_frontier`` — the SOURCE: a ``mapInPandas`` kernel producing
  one row per URL with the renderer's newline-joined link payload
  (``links_raw``) — the exact JS-eval output contract. The
  ``synthetic`` renderer is the deterministic fake (worldgen.
  rendered_links_raw, shared byte-for-byte with the golden oracle);
  ``chromium`` is the honest real-path boundary: headless Chrome is not
  present in this container, so each row emits a ``render_error`` row
  (per-row isolation, same policy as decode_media/sample_frames — one
  unrenderable page never aborts the job).
* ``extract_links_rendered`` — pure Catalyst: ``split('\\n')`` +
  ``posexplode`` (document order preserved as link_pos) + trim + drop
  empties + same-host + optional path-prefix, the Go-side filter chain
  re-expressed as columnar expressions (whole-stage codegen, no UDF).

At 100 TB the render kernel is the textbook mapInPandas fan-out: pure
per-row work, no shuffle; the extraction explode feeds the same
collapse→canonicalize→dedup frontier spine as static links.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from webcrawler_go_spark.functions.urls import url_host, url_path
from webcrawler_go_spark.worldgen import World

RENDERED = StructType(
    [
        StructField("url_norm", StringType(), False),
        StructField("host", StringType(), False),
        StructField("links_raw", StringType(), True),
        StructField("render_error", StringType(), True),
    ]
)


def render_frontier(
    urls: DataFrame,
    world: World | None = None,
    renderer: str = "synthetic",
    url_col: str = "url_norm",
    host_col: str = "host",
) -> DataFrame:
    """S6 rendered-dom-source: (url_norm, host) → rendered link payload.

    ``renderer='synthetic'`` → deterministic fake DOM (worldgen);
    ``renderer='chromium'`` → per-row ``render_error`` rows (honest
    boundary: no browser in this container). Unknown renderer names
    raise at plan time — a typo should fail fast, not produce a job
    full of error rows."""
    if renderer not in ("synthetic", "chromium"):
        raise ValueError(f"unknown renderer {renderer!r}")
    world = world or World()

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from webcrawler_go_spark.worldgen import rendered_links_raw

        for b in batches:
            raws: list = []
            errs: list = []
            for u in b[url_col]:
                try:
                    if renderer == "chromium":
                        raise NotImplementedError(
                            "headless-Chrome rendering requires a browser "
                            "not present in this container; use "
                            "renderer='synthetic'"
                        )
                    raws.append(rendered_links_raw(world, u))
                    errs.append(None)
                except Exception as exc:  # noqa: BLE001 — per-row isolation
                    raws.append(None)
                    errs.append(f"{type(exc).__name__}: {exc}")
            yield pd.DataFrame(
                {
                    "url_norm": b[url_col],
                    "host": b[host_col],
                    "links_raw": pd.Series(raws, dtype="object"),
                    "render_error": pd.Series(errs, dtype="object"),
                }
            )

    return urls.select(url_col, host_col).mapInPandas(kernel, RENDERED)


def extract_links_rendered(
    rendered: DataFrame, path_filter: str = ""
) -> DataFrame:
    """X3 extract-links-rendered (pdfcapture.go:440-467): split the
    newline-joined payload, trim, drop empties, keep same-domain links,
    apply the optional path-prefix filter. Returns
    (found_on, link, link_pos) in document order."""
    ex = (
        rendered.filter(F.col("links_raw").isNotNull())
        .select(
            F.col("url_norm").alias("found_on"),
            "host",
            F.posexplode(F.split("links_raw", "\n")).alias("link_pos", "link"),
        )
        .withColumn("link", F.trim("link"))
        .filter(F.col("link") != "")
        .filter(url_host(F.col("link")) == F.col("host"))
    )
    if path_filter:
        ex = ex.filter(url_path(F.col("link")).startswith(path_filter))
    return ex.select("found_on", "link", "link_pos")


from webcrawler_go_spark.worldgen import RENDER_LINK_POS_BASE  # noqa: E402


def rendered_frontier_candidates(
    fetched: DataFrame,
    world: World,
    path_filter: str = "",
    ignore_query: bool = False,
) -> DataFrame:
    """Capture-mode frontier extension (pdfcapture.go:440-467 as a crawl
    step): render the round's successful pages and turn their rendered
    links into frontier candidate rows, schema-identical to
    ``extract.next_frontier_candidates`` output so the engine simply
    unions them in.

    Semantics mirrored from the reference's rendered crawl: links are
    same-DOMAIN unconditionally (pdfcapture.go:455-458 — even when the
    static crawl is configured cross-host), path-prefix honored, and
    crawl order places rendered links AFTER the page's static links via
    link_pos = RENDER_LINK_POS_BASE + document-order index. The
    renderer returns '' for non-HTML pages, so no content-type
    pre-filter is needed."""
    from webcrawler_go_spark.functions.urls import canonicalize_cols

    pages = fetched.filter(
        (F.col("status") == 200)
        & F.col("error_class").isNull()
        & (~F.col("blocked"))
    ).select(F.col("url").alias("url_norm"), "host", "seq", "round")
    links = extract_links_rendered(render_frontier(pages, world))
    links = links.join(
        pages.select(
            F.col("url_norm").alias("found_on"),
            F.col("host").alias("parent_host"),
            F.col("seq").alias("parent_seq"),
            F.col("round").alias("parent_round"),
        ),
        "found_on",
    ).select(
        F.col("link").alias("href"),
        "parent_host",
        "parent_round",
        "parent_seq",
        (F.lit(RENDER_LINK_POS_BASE) + F.col("link_pos")).alias("link_pos"),
    )
    # same raw-pair collapse as the static path: min crawl-order key per
    # (href, parent_host) before canonicalization
    links = (
        links.groupBy("href", "parent_host")
        .agg(
            F.min(F.struct("parent_round", "parent_seq", "link_pos")).alias("_k")
        )
        .select(
            "href",
            "parent_host",
            F.col("_k.parent_round").alias("parent_round"),
            F.col("_k.parent_seq").alias("parent_seq"),
            F.col("_k.link_pos").alias("link_pos"),
        )
    )
    parts = canonicalize_cols(F.col("href"), ignore_query=ignore_query)
    links = links.select(
        "*",
        parts["url_norm"].alias("url_norm"),
        parts["host"].alias("host"),
        parts["path"].alias("path"),
    )
    if path_filter:
        links = links.filter(F.col("path").startswith(path_filter))
    return links.select(
        F.col("href").alias("url"),
        "url_norm",
        F.xxhash64("url_norm").alias("url_hash"),
        "host",
        "path",
        (F.col("parent_round") + 1).alias("round"),
        "parent_seq",
        "link_pos",
        F.lit(0).alias("attempts"),
        (F.col("parent_round") + 1).alias("not_before_round"),
    )
