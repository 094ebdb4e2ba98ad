"""Run every registered query against its DuckDB oracle — the same check the
driver performs at sf0.01. Parametrized per query so failures are attributable."""

from __future__ import annotations

import os

import pytest

from duckdb_nats_jetstream_spark.queries import full_registry
from tests.oracle_harness import compare, duckdb_conn

ORACLE_SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")

REGISTRY = full_registry()


@pytest.fixture(scope="module")
def con():
    c = duckdb_conn(ORACLE_SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, con, name):
    fn, sql = REGISTRY[name]
    df = fn(spark, ORACLE_SF_DIR)
    if sql is None:
        assert df.count() >= 0  # rows-only check, like the driver
        return
    problems = compare(df, con, sql, name)
    assert not problems, "\n".join(problems)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and df.columns
