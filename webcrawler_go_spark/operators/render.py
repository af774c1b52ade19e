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
