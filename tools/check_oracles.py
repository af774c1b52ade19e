"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at sf0.01,
compare row count, column-name set, and an order-insensitive value hash.

Usage: python tools/check_oracles.py [name ...]
"""

from __future__ import annotations

import datetime as dt
import hashlib
import math
import sys

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return "T" if v else "F"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, (dt.datetime,)):
        return v.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, list):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted(
        "|".join(_norm(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in canon:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main(names: list[str]) -> int:
    from webcrawler_go_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    targets = names or list(qs)
    failures = 0
    for name in targets:
        try:
            sdf = qs[name](spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            if name not in oracles:
                print(f"  {name:28s} rows-only: {len(srows)} rows (no oracle)")
                continue
            rel = con.sql(oracles[name])
            ocols = rel.columns
            orows = rel.fetchall()
            problems = []
            if len(srows) != len(orows):
                problems.append(f"rows {len(srows)} vs {len(orows)}")
            if sorted(scols) != sorted(ocols):
                problems.append(f"cols {sorted(scols)} vs {sorted(ocols)}")
            else:
                sh, oh = value_hash(scols, srows), value_hash(ocols, orows)
                if sh != oh:
                    problems.append(f"hash {sh} vs {oh}")
            if problems:
                failures += 1
                print(f"✗ {name:28s} {'; '.join(problems)}")
                # show a few diffs
                order = sorted(range(len(scols)), key=lambda i: scols[i])
                oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
                sset = {"|".join(_norm(r[i]) for i in order) for r in srows}
                oset = {"|".join(_norm(r[i]) for i in oorder) for r in orows}
                for x in list(sset - oset)[:3]:
                    print(f"    spark-only : {x[:160]}")
                for x in list(oset - sset)[:3]:
                    print(f"    oracle-only: {x[:160]}")
            else:
                print(f"✓ {name:28s} {len(srows)} rows")
        except Exception as e:  # noqa: BLE001
            failures += 1
            msg = str(e).split("\n")[0][:220]
            print(f"✗ {name:28s} EXCEPTION {type(e).__name__}: {msg}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
