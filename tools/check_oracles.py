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
import numpy as np

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    """Normalize a pandas-materialized value for hashing.

    Deliberately dtype-STRICT on int-vs-float (repr(3.0) != str(3)): the
    driver compares pandas frames, where e.g. DuckDB SUM(int) -> HUGEINT
    -> float64 while Spark gives int64 — that mismatch must FAIL here too
    (it caused the round-2 events_sessionize / events_error_rate FAILs).
    """
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "∅" if v is None else "nan"
    if isinstance(v, (bool, np.bool_)):
        return "T" if v else "F"
    if isinstance(v, (float, np.floating)):
        return repr(float(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, dt.datetime):
        # Driver-observed behavior: Spark DATE (-> datetime.date) hashes equal
        # to DuckDB DATE (-> midnight datetime64). Collapse exact midnights.
        if v.time() == dt.time(0, 0) and v.tzinfo is None:
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, np.ndarray)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
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
            spdf = sdf.toPandas()
            scols = list(spdf.columns)
            if name not in oracles:
                print(f"  {name:28s} rows-only: {len(spdf)} rows (no oracle)")
                continue
            opdf = con.sql(oracles[name]).df()
            # pandas NaT -> None so both engines' nulls normalize alike
            opdf = opdf.astype(object).where(opdf.notna(), None)
            spdf2 = spdf.astype(object).where(spdf.notna(), None)
            srows = [tuple(r) for r in spdf2.itertuples(index=False, name=None)]
            ocols = list(opdf.columns)
            orows = [tuple(r) for r in opdf.itertuples(index=False, name=None)]
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
