"""XML sitemap sink (SURVEY.md §2.1 S8; reference sitemap.go:543-600).

The reference collects URLs into a map, sorts lexicographically, and
marshals a ``<urlset>`` document. The result set is tiny by construction
(one row per included page of one site), so the Spark plan does the
heavy part — filter to {reachable ∧ HTML ∧ 2xx ∧ path-included}, dedup,
ORDER BY loc — and only the final serialization collects to the driver,
exactly like the reference's single-file write."""

from __future__ import annotations

import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

XMLNS = "http://www.sitemaps.org/schemas/sitemap/0.9"


def sitemap_rows(fetch_log: DataFrame, path_filter: str = "") -> DataFrame:
    """Output set = inner filter of successful HTML fetches (the
    reference's delete-on-failure mutation re-expressed as a filter,
    SURVEY §3.2): loc + latest lastmod, sorted."""
    rows = fetch_log.filter(
        (F.col("status") == 200)
        & F.col("content_type").contains("text/html")
        & (~F.col("blocked"))
        & F.col("error_class").isNull()
    )
    if path_filter:
        rows = rows.filter(
            F.regexp_extract(F.col("url"), r"^[a-z]+://[^/]*(/.*)$", 1).startswith(
                path_filter
            )
        )
    return (
        rows.groupBy(F.col("url").alias("loc"))
        .agg(F.max("lastmod").alias("lastmod"))
        .orderBy("loc")
    )


def write_sitemap_xml(rows: DataFrame, path: str) -> int:
    """Serialize <urlset> (driver-side; result is small by construction).
    Returns the number of <url> entries written."""
    ET.register_namespace("", XMLNS)
    urlset = ET.Element(f"{{{XMLNS}}}urlset")
    n = 0
    for r in rows.collect():  # pre-sorted by the plan
        url_el = ET.SubElement(urlset, f"{{{XMLNS}}}url")
        ET.SubElement(url_el, f"{{{XMLNS}}}loc").text = r["loc"]
        if r["lastmod"] is not None:
            ET.SubElement(url_el, f"{{{XMLNS}}}lastmod").text = r[
                "lastmod"
            ].isoformat()
        n += 1
    tree = ET.ElementTree(urlset)
    ET.indent(tree)
    tree.write(path, encoding="utf-8", xml_declaration=True)
    return n
