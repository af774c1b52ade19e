"""Build the spark-submit artifact (north rule: `spark-submit --py-files`
on a multi-executor cluster).

    python tools/package.py
    spark-submit --py-files dist/webcrawler_go_spark.zip submit_crawl.py \
        --seeds seeds.parquet --state s3://example-bucket/crawl-state --rounds 20

Produces dist/webcrawler_go_spark.zip (the package, no tests/fixtures).
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build() -> str:
    dist = os.path.join(ROOT, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "webcrawler_go_spark.zip")
    pkg = os.path.join(ROOT, "webcrawler_go_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirs, files in os.walk(pkg):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, ROOT))
    return out


if __name__ == "__main__":
    print(build())
