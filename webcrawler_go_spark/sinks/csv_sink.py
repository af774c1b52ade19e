"""CSV result sinks — the Spark form of the reference's mutex-guarded
CSV appenders (crawler.go:506-560, jsonfeed.go:166-186).

Mode-specific schemas mirror the reference's header rows; writes are
distributed ``df.write.csv`` appends (each partition writes its own part
file — the "mutex" disappears because files never share writers). A
``single_file`` option coalesces to one part for small, human-read
results (the reference's actual use case)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# mode → ordered CSV columns (reference crawler.go:513-520)
MODE_COLUMNS = {
    "search": ["url", "status", "content_type", "bytes"],
    "broken-links": ["found_on", "broken_url", "status", "error_class"],
    "oversized-images": ["url", "size_kb", "found_on"],
    "feed": ["headline", "link", "date", "brief", "tags", "captured_file"],
}


def write_csv(
    df: DataFrame,
    path: str,
    mode_name: str | None = None,
    single_file: bool = False,
    overwrite: bool = True,
) -> None:
    cols = MODE_COLUMNS.get(mode_name)
    if cols:
        present = [c for c in cols if c in df.columns]
        df = df.select(*present)
    if single_file:
        df = df.coalesce(1)
    (
        df.write.mode("overwrite" if overwrite else "append")
        .option("header", True)
        .csv(path)
    )


def timestamped_filename(mode_name: str) -> "F.Column":
    """Reference names files crawl_<mode>_<timestamp>.csv
    (crawler.go:220-242). Deterministic variant: caller supplies the
    round/snapshot id instead of wall clock (determinism rule 2)."""
    return F.concat_ws(
        "_", F.lit("crawl"), F.lit(mode_name), F.lit("snapshot")
    )
