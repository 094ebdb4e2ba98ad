"""chunked_lag / sequence_gaps: the distributed global-lag decomposition."""

import pytest
from pyspark.sql import Window as W, functions as F

from duckdb_nats_jetstream_spark.operators.ordered import chunked_lag, sequence_gaps

from conftest import SF_DIR


def _global_lag(df, col):
    return df.withColumn("prev_value", F.lag(col).over(W.orderBy(col)))


@pytest.mark.parametrize("chunk_size", [4, 7, 1 << 20])
def test_chunked_lag_matches_global_lag(spark, chunk_size):
    # Gaps inside chunks, gaps spanning chunks, an entirely-missing chunk
    # (8..11 absent when chunk_size=4), and duplicates (17 twice).
    seqs = [0, 1, 2, 5, 6, 7, 12, 14, 17, 17, 21, 22, 30]
    df = spark.createDataFrame([(s,) for s in seqs], "seq long")
    got = (
        chunked_lag(df, "seq", chunk_size=chunk_size)
        .orderBy("seq", "prev_value")
        .collect()
    )
    want = _global_lag(df, "seq").orderBy("seq", "prev_value").collect()
    # Tied rows may swap which one gets the tied predecessor; any aggregate
    # over (seq - prev) is unaffected. Compare as multisets.
    assert sorted((r.seq, r.prev_value) for r in got) == sorted(
        (r.seq, r.prev_value) for r in want
    )


def test_sequence_gaps_counts(spark):
    df = spark.createDataFrame([(s,) for s in [1, 2, 3, 7, 8, 20]], "seq long")
    row = sequence_gaps(df, "seq", chunk_size=4).collect()[0]
    assert (row.n_msgs, row.n_gaps, row.span) == (6, 2, 20)


def test_sequence_gaps_single_row(spark):
    df = spark.createDataFrame([(42,)], "seq long")
    row = sequence_gaps(df, "seq").collect()[0]
    assert (row.n_msgs, row.n_gaps, row.span) == (1, 0, 1)


def test_gap_detection_plan_has_no_unpartitioned_window(spark):
    """The scale guarantee itself: every WindowExec in the gap-detection plan
    partitions on something (the big one by chunk; the boundary one runs over
    the per-chunk aggregate, whose input is already a tiny Aggregate)."""
    from duckdb_nats_jetstream_spark.queries.stream import scan_gap_detection

    plan = scan_gap_detection(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    windows = [ln for ln in plan.splitlines() if "Window" in ln and "Sort" not in ln]
    big = [ln for ln in windows if "__ord_chunk#" in ln]
    assert big, f"expected chunk-partitioned window in plan:\n{plan}"
