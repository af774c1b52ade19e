"""Hot-archive evidence for the WARC split path (round 6, directive #6).

One archive holding ALL records pins a single task under the
file-per-task reader regardless of cores; `warc_records_split` spreads
it across (file, offset-range) tasks. This tool builds one hot
`.warc.gz` with ``--records`` response records (deterministic payloads),
then times:

* file-per-task read (`warc_records`) — 1 task by construction;
* split read (`warc_records_split`, ``--splits`` buckets, offsets from
  a prior pass, pinned partitions) — N tasks over the same bytes;

and asserts record-set equality between the two before printing one
JSON line. Payload size is the knob that makes the difference visible:
parse cost scales with inflated bytes, and a hot Common Crawl archive
is ~1 GB per file.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--records", type=int, default=20_000)
    p.add_argument("--payload-bytes", type=int, default=4096)
    p.add_argument("--splits", type=int, default=8)
    p.add_argument("--cpus", type=int, default=32)
    args = p.parse_args()

    from webcrawler_go_spark.session import get_spark
    from webcrawler_go_spark.sources.warc import (
        make_warc_gz,
        make_warc_record,
        warc_records,
        warc_records_split,
    )

    t0 = time.perf_counter()
    recs = []
    for i in range(args.records):
        payload = (f"record {i} " * (args.payload_bytes // 10 + 1))[
            : args.payload_bytes
        ].encode()
        recs.append(
            make_warc_record(
                f"https://hot.example.org/doc/{i}",
                f"2024-03-15T10:{(i // 60) % 60:02d}:{i % 60:02d}Z",
                payload,
                status=404 if i % 13 == 0 else 200,
            )
        )
    blob = make_warc_gz(recs)
    build_secs = time.perf_counter() - t0

    spark = get_spark(
        app_name="warc-split-bench",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    import pandas as pd

    files = spark.createDataFrame(
        pd.DataFrame({"filename": ["hot.warc.gz"], "content": [blob]})
    ).localCheckpoint(eager=True)

    whole = warc_records(files)
    # offsets sidecar (in production: the CDX index)
    offsets = whole.select(
        "filename", "member_offset", "member_length"
    ).localCheckpoint(eager=True)

    def timed(df):
        df.write.format("noop").mode("overwrite").save()  # warm
        t = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t, 2)

    t_whole = timed(whole)
    split_df = warc_records_split(
        files, offsets, n_splits=args.splits, num_partitions=args.splits
    )
    t_split = timed(split_df)

    n_whole = whole.count()
    n_split = split_df.count()
    assert n_whole == n_split == args.records, (n_whole, n_split)
    # record-set equality on the identifying triple
    key = ["filename", "member_offset", "member_length"]
    diff = (
        whole.select(*key).exceptAll(split_df.select(*key)).count()
        + split_df.select(*key).exceptAll(whole.select(*key)).count()
    )
    assert diff == 0, f"record sets differ by {diff}"

    print(
        json.dumps(
            {
                "records": args.records,
                "archive_mb": round(len(blob) / 1e6, 1),
                "build_secs": round(build_secs, 1),
                "file_per_task_secs": t_whole,
                "split_secs": t_split,
                "splits": args.splits,
                "speedup": round(t_whole / t_split, 2),
                "record_set_equal": True,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
