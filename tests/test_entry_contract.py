"""Driver-contract conformance: entry() smoke + every queries() entry
matches its oracle_sql() on DuckDB at sf0.001 (the driver runs sf0.01 —
same derivations, smaller here for test speed)."""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as entry_mod
from tools.check_oracles import TABLES, value_hash

SF_DIR = "/root/testdata/sf0.001"
# golden-VALUES oracles (embedding_ivf_topk) recompute expectations from
# the input tables — point them at the same sf the queries read here
os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = SF_DIR


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"host", "fetched", "ok", "links_discovered", "bytes"}


def test_every_query_has_callable():
    qs = entry_mod.queries()
    assert len(qs) >= 20
    for name, fn in qs.items():
        assert callable(fn), name


def test_oracle_keys_subset_and_parseable(con):
    """Every oracle key must name a registered query, and every oracle
    SQL must at least parse in DuckDB (EXPLAIN, no execution)."""
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(qs), set(oracles) - set(qs)
    for name, sql in oracles.items():
        con.sql("EXPLAIN " + sql)  # raises on parse/bind errors


@pytest.mark.parametrize("name", sorted(entry_mod.queries()))
def test_query_matches_oracle(spark, con, name):
    fn = entry_mod.queries()[name]
    sdf = fn(spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    oracle = entry_mod.oracle_sql().get(name)
    if oracle is None:
        assert len(srows) >= 0  # rows-only contract
        return
    rel = con.sql(oracle)
    orows = rel.fetchall()
    assert sorted(sdf.columns) == sorted(rel.columns), name
    assert len(srows) == len(orows), name
    assert value_hash(sdf.columns, srows) == value_hash(rel.columns, orows), name
