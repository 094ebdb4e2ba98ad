"""connected_components: hash-min label propagation fixpoint."""

from pyspark.sql import functions as F

from duckdb_nats_jetstream_spark.operators.components import connected_components


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    rows = connected_components(df).collect()
    return {r.doc_id: r.component for r in rows}


def test_two_components(spark):
    got = _cc(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_chain_needs_multiple_rounds(spark):
    # path graph 1-2-3-4-5-6: diameter 5, exercises the iteration loop
    got = _cc(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)])
    assert got == {i: 1 for i in range(1, 7)}


def test_multi_edges_and_order_invariance(spark):
    got = _cc(spark, [(5, 9), (9, 5), (5, 9), (2, 9)])
    assert got == {2: 2, 5: 2, 9: 2}


def test_min_id_not_on_every_edge(spark):
    # canonical id 0 enters via one leaf edge only; must still reach 7
    got = _cc(spark, [(3, 7), (7, 12), (0, 12)])
    assert got == {0: 0, 3: 0, 7: 0, 12: 0}
