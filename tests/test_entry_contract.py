"""Driver-contract smoke: every queries() entry must run at sf0.001
and agree with its oracle on row count (full value-hash parity is the
driver's job at sf0.01; tools/check_oracle.py replicates it)."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as e

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", sorted(e.queries()))
def test_query_runs_and_rowcount_matches_oracle(spark, duck, name):
    df = e.queries()[name](spark, SF)
    n = df.count()
    assert n >= 0
    sql = e.oracle_sql().get(name)
    if sql is not None:
        expected = duck.execute(f"SELECT count(*) FROM ({sql})").fetchone()[0]
        assert n == expected, f"{name}: spark {n} vs oracle {expected}"


def test_entry_returns_rows(spark):
    assert len(e.entry(spark).collect()) > 0
