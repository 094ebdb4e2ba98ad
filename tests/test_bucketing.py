"""Bucketed tables: pre-shuffled co-located joins — the technique that turns
a repeated fact-fact shuffle join into a shuffle-free merge at 100 TB."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from duckdb_nats_jetstream_spark.tables import read_table


@pytest.fixture(scope="module")
def warehouse(spark, sf_dir):
    # warehouse.dir is a static conf — managed tables land in the session's
    # default warehouse; DROP TABLE purges the files afterwards
    for name, key in [("orders", "o_orderkey"), ("lineitem", "l_orderkey")]:
        (
            read_table(spark, sf_dir, name)
            .write.mode("overwrite")
            .bucketBy(8, key)
            .sortBy(key)
            .saveAsTable(f"b_{name}")
        )
    yield
    for t in ["b_orders", "b_lineitem"]:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_is_shuffle_free(spark, warehouse):
    joined = spark.table("b_lineitem").join(
        spark.table("b_orders"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    # with both sides bucketed on the join key, the sort-merge join needs no
    # Exchange on either side
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan, plan


def test_bucketed_join_matches_plain_join(spark, sf_dir, warehouse):
    bucketed = (
        spark.table("b_lineitem")
        .join(spark.table("b_orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .count()
    )
    plain = (
        read_table(spark, sf_dir, "lineitem")
        .join(
            read_table(spark, sf_dir, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .count()
    )
    assert bucketed == plain
