"""Sinks (CSV, XML sitemap) + Structured Streaming twins + sitemap/feed
plans."""

from __future__ import annotations

import glob
import os
import xml.etree.ElementTree as ET

from pyspark.sql import functions as F

from webcrawler_go_spark.operators.events import tumbling_window_agg
from webcrawler_go_spark.plans.sitemap import (
    generate_sitemap,
    synthesize_archives,
    synthesize_pagination,
)
from webcrawler_go_spark.sinks.csv_sink import write_csv
from webcrawler_go_spark.streaming.frontier_stream import stream_window_counts
from webcrawler_go_spark.worldgen import World

SF = "/root/testdata/sf0.001"


def test_csv_sink_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [("https://a.test/x", 200, "text/html", 123)],
        "url string, status int, content_type string, bytes long",
    )
    out = str(tmp_path / "csv")
    write_csv(df, out, mode_name="search", single_file=True)
    files = glob.glob(os.path.join(out, "part-*.csv"))
    assert len(files) == 1
    back = spark.read.option("header", True).csv(out)
    assert back.count() == 1
    assert back.columns == ["url", "status", "content_type", "bytes"]


def test_sitemap_end_to_end(spark, state_dir, tmp_path):
    """Full sitemap mode: crawl synthetic world → XML file; entries are
    sorted, deduped, and only successful HTML pages appear (the
    delete-on-failure semantics as a filter)."""
    world = World(n_hosts=4, pages_per_host=30)
    out = str(tmp_path / "sitemap.xml")
    n = generate_sitemap(
        spark,
        "https://host-0000.test/page/0",
        state_dir,
        out,
        world=world,
        max_rounds=3,
    )
    assert n > 0
    tree = ET.parse(out)
    ns = {"sm": "http://www.sitemaps.org/schemas/sitemap/0.9"}
    locs = [el.text for el in tree.findall(".//sm:loc", ns)]
    assert locs == sorted(locs)
    assert len(locs) == len(set(locs))
    assert n == len(locs)


def test_pagination_synthesis_shapes(spark):
    urls = spark.createDataFrame(
        [("https://h.test/blog/",), ("https://h.test/file.pdf",)], "url string"
    )
    cands = [r.candidate for r in synthesize_pagination(urls).collect()]
    assert "https://h.test/blog/?page=2" in cands
    assert "https://h.test/blog/page/10/" in cands
    assert not any("file.pdf" in c for c in cands)  # not a listing page


def test_archive_synthesis_months(spark):
    urls = spark.createDataFrame(
        [("https://h.test/news/2025/",), ("https://h.test/about/",)], "url string"
    )
    cands = [r.candidate for r in synthesize_archives(urls).collect()]
    assert "https://h.test/news/2025/january/" in cands
    assert len(cands) == 12  # /about/ is not newsy


def test_streaming_window_agg_matches_batch(spark, tmp_path):
    """File-source stream + availableNow must produce the same windowed
    counts as the batch twin (complete-mode aggregation)."""
    import shutil

    events = spark.read.parquet(f"{SF}/events.parquet")
    src = tmp_path / "stream-src"
    src.mkdir()
    shutil.copy(f"{SF}/events.parquet", src / "events.parquet")
    stream = spark.readStream.schema(events.schema).parquet(str(src))
    agg = stream_window_counts(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.win_start, r.event_type): (r.n_events, r.value_sum)
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    expected = {
        (r.win_start, r.event_type): (r.n_events, r.value_sum)
        for r in tumbling_window_agg(events, minutes=60).collect()
    }
    assert got == expected


def test_feed_capture_frontier(spark, tmp_path):
    import json

    feed_path = tmp_path / "feed.json"
    feed_path.write_text(
        json.dumps(
            [
                {"title": "Big News: Spark!", "url": "/posts/1", "tags": "tech,spark"},
                {"headline": "Other", "link": "https://x.test/p", "categories": "misc"},
                {"name": "NoLink"},
            ]
        )
    )
    from webcrawler_go_spark.plans.feed import feed_capture_frontier, read_feed

    feed = read_feed(spark, str(feed_path))
    rows = feed_capture_frontier(feed, "https://base.test", tag_filter="tech").collect()
    assert len(rows) == 1
    assert rows[0]["url"] == "https://base.test/posts/1"
    assert rows[0]["captured_file"] == "big-news-spark"


def test_frontier_foreach_batch_folds_every_seed_batch(spark, state_dir, tmp_path):
    """Two seed micro-batches: the second (and every later) batch must be
    folded into the live frontier, not silently discarded — each batch's
    seed URL ends up fetched/seen."""
    from webcrawler_go_spark.config import CrawlConfig
    from webcrawler_go_spark.plans.frontier_loop import CrawlEngine
    from webcrawler_go_spark.streaming.frontier_stream import (
        run_frontier_foreach_batch,
    )

    world = World(n_hosts=4, pages_per_host=30)
    eng = CrawlEngine(
        spark, CrawlConfig(max_rounds=8, default_host_budget=10), state_dir,
        world=world,
    )
    seeds_dir = tmp_path / "seeds"
    seeds_dir.mkdir()
    s1 = "https://host-0000.test/page/0"
    s2 = "https://host-0002.test/page/5"
    schema = "url string, priority double, seq int"
    spark.createDataFrame([(s1, 1.0, 0)], schema).write.parquet(
        str(seeds_dir / "b1")
    )
    spark.createDataFrame([(s2, 1.0, 0)], schema).write.parquet(
        str(seeds_dir / "b2")
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(seeds_dir) + "/*")
    )
    q = run_frontier_foreach_batch(
        eng, stream, str(tmp_path / "ckpt"), max_rounds_per_batch=1
    )
    q.awaitTermination(120)
    seen = {r.url_norm for r in eng.url_seen().collect()}
    assert any(s1.replace("https://", "") in u or s1 in u for u in seen) or s1 in seen
    assert any(s2.replace("https://", "") in u or s2 in u for u in seen) or s2 in seen


def test_search_modes_end_to_end(spark, tmp_path):
    """§3.1 modes 1-4 end to end: crawl a synthetic world, run each mode's
    result query over the committed tables, write the mode CSV."""
    import glob
    import os

    from webcrawler_go_spark.plans.search import run_search_mode
    from webcrawler_go_spark.worldgen import SEARCH_NEEDLE, seeds as gen_seeds

    world = World(n_hosts=6, pages_per_host=40)
    seeds = spark.createDataFrame(
        gen_seeds(world, 3), "url string, priority double, seq int"
    )

    def run(mode, sub, **kw):
        out = str(tmp_path / sub)
        n = run_search_mode(
            spark, seeds, str(tmp_path / (sub + "-state")), mode, out,
            max_rounds=3, budget=15, world=world, **kw,
        )
        files = glob.glob(os.path.join(out, "part-*.csv"))
        assert len(files) == 1
        header = open(files[0]).readline().strip()
        return n, header

    n, header = run("search", "s", target=SEARCH_NEEDLE)
    assert n > 0 and header == "url,status,content_type,bytes"

    n, header = run("broken-links", "b")
    assert n > 0 and header == "found_on,broken_url,status,error_class"

    n, header = run("oversized-images", "o", threshold_kb=1)
    assert header == "url,size_kb,found_on"
