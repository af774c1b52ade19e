"""Dump .explain('formatted') plans for round-8 before/after evidence.

Usage: python tools/plan_r08.py <suffix> <query> [<query> ...]
Writes plans/r08/<query>_<suffix>.txt. SF dir via $PLAN_SF_DIR
(default sf0.1). Build-time eager work (checkpoints) runs as usual.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf = os.environ.get("PLAN_SF_DIR", "/root/testdata/sf0.1")

    from webcrawler_go_spark.session import get_spark

    spark = get_spark(app_name="plans-r08", master="local[8]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    qs = entry.queries()
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r08")
    os.makedirs(out_dir, exist_ok=True)
    for n in names:
        df = qs[n](spark, sf)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(out_dir, f"{n}_{suffix}.txt"), "w") as f:
            f.write(buf.getvalue())
        print("dumped", n, suffix)
    spark.stop()


if __name__ == "__main__":
    main()
