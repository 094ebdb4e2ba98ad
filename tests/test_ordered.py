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


def test_ranged_running_sum_equals_global_window(spark):
    """The range-chunked two-level prefix sum must equal the plain global
    window for ANY chunk count (long addition is associative and the
    order is total, so chunk boundaries cannot change an answer)."""
    from pyspark.sql import Window as W, functions as F

    from duckdb_nats_jetstream_spark.operators.ordered import (
        ranged_running_sum,
    )

    rows = [(i, (i * 13) % 7, (i * 3) % 11) for i in range(800)]
    df = spark.createDataFrame(rows, "id long, score long, v long")
    order = [F.col("score").desc(), F.col("id").asc_nulls_last()]
    gw = (
        W.orderBy(*order).rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    want = {
        r.id: r.cum
        for r in df.withColumn("cum", F.sum("v").over(gw)).collect()
    }
    for nc in (1, 3, 64):
        got = {
            r.id: r.running_sum
            for r in ranged_running_sum(df, order, "v", num_chunks=nc).collect()
        }
        assert got == want, f"num_chunks={nc} diverged"


def test_ranged_running_sum_branches_share_one_range_exchange(spark):
    """Correctness of the offset fix-up depends on the offsets branch and
    the main join branch observing the SAME range carve-up (the same
    ``spark_partition_id`` labeling of ``r``): range-boundary sampling is
    deterministic AND the physical plan must reuse one range exchange for
    both branches. Value-equality tests can't see that invariant — a
    cache/AQE/plan change that re-executes the exchange with divergent
    sampling would mis-join offsets to chunks. Pin it at the plan level
    (r12 ADVICE): exactly one rangepartitioning Exchange, and the second
    consumer reads it through ReusedExchange/TableCacheQueryStage."""
    from duckdb_nats_jetstream_spark.operators.ordered import (
        ranged_running_sum,
    )

    df = spark.range(0, 2000).select(
        F.col("id"), (F.col("id") % 7).alias("v")
    )
    out = ranged_running_sum(df, [F.col("id")], "v", num_chunks=8)
    out.collect()  # finalize THIS QueryExecution's adaptive stages
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan, plan
    final = plan.split("== Initial Plan ==")[0]
    materialized = [
        ln
        for ln in final.splitlines()
        if "Exchange rangepartitioning" in ln and "ReusedExchange" not in ln
    ]
    reused = [
        ln
        for ln in final.splitlines()
        if "ReusedExchange" in ln and "rangepartitioning" in ln
    ]
    assert len(materialized) == 1, (
        f"expected exactly ONE materialized range exchange shared by both "
        f"branches, found {len(materialized)}:\n{final}"
    )
    assert reused, f"no ReusedExchange of the range exchange in:\n{final}"


def test_ranged_running_sum_guards(spark):
    import pytest
    from pyspark.sql import functions as F

    from duckdb_nats_jetstream_spark.operators.ordered import (
        ranged_running_sum,
    )

    df = spark.createDataFrame([(1, 2.0)], "id long, v double")
    with pytest.raises(ValueError, match="integral"):
        ranged_running_sum(df, [F.col("id")], "v")
    df2 = spark.createDataFrame([(1, 2)], "id long, __rs_off long")
    with pytest.raises(ValueError, match="collide"):
        ranged_running_sum(df2, [F.col("id")], "id", out_col="x")


def test_select_token_budget_is_maximal_quality_prefix(spark):
    """Kept set = the maximal quality-ordered prefix whose inclusive token
    sum fits the budget; the first overflowing document is dropped whole."""
    from duckdb_nats_jetstream_spark.operators.sampling import (
        select_token_budget,
    )

    rows = [(1, 100, 40), (2, 90, 50), (3, 80, 20), (4, 70, 5), (5, 100, 15)]
    df = spark.createDataFrame(rows, "doc_id long, score long, toks long")
    out = sorted(
        (r.doc_id, r.cum_tokens)
        for r in select_token_budget(df, "score", "toks", budget=105).collect()
    )
    # order: (100,1)=40 ->55 incl doc5? order by score desc, id: doc1(40),
    # doc5(+15=55), doc2(+50=105), doc3 would be 125 > 105 -> cut
    assert out == [(1, 40), (2, 105), (5, 55)]


def test_ranged_running_sum_grouped_equals_per_group_window(spark):
    """partition_cols restarts the sum per group and must equal the plain
    PARTITION BY window for any chunk count — including when a chunk
    boundary splits a group, and for a NULL group (the struct-wrapped key
    survives the offset join null-safely)."""
    from pyspark.sql import Window as W, functions as F

    from duckdb_nats_jetstream_spark.operators.ordered import (
        ranged_running_sum,
    )

    rows = [
        (i, None if i % 11 == 0 else "g" + str(i % 3), (i * 13) % 7, (i * 3) % 11)
        for i in range(700)
    ]
    df = spark.createDataFrame(rows, "id long, g string, score long, v long")
    order = [F.col("score").desc(), F.col("id").asc_nulls_last()]
    gw = (
        W.partitionBy("g")
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    want = {
        r.id: r.cum
        for r in df.withColumn("cum", F.sum("v").over(gw)).collect()
    }
    for nc in (1, 5, 64):
        got = {
            r.id: r.running_sum
            for r in ranged_running_sum(
                df, order, "v", num_chunks=nc, partition_cols=["g"]
            ).collect()
        }
        assert got == want, f"num_chunks={nc} diverged"
    assert any(r[1] is None for r in rows)  # the NULL stratum was exercised


def test_select_token_budget_by_group_budgets_and_default(spark):
    from duckdb_nats_jetstream_spark.operators.sampling import (
        select_token_budget_by_group,
    )

    rows = [
        (1, "a", 100, 30), (2, "a", 90, 30), (3, "a", 80, 30),
        (4, "b", 100, 50), (5, "b", 90, 50),
        (6, None, 100, 10), (7, None, 90, 10),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, score long, toks long"
    )
    out = sorted(
        (r.doc_id, r.cum_tokens)
        for r in select_token_budget_by_group(
            df, "lang", "score", "toks",
            budgets={"a": 60, "b": 50}, default_budget=15,
        ).collect()
    )
    # a: 30, 60 kept, 90 cut; b: 50 kept, 100 cut; NULL: 10 kept, 20 cut
    assert out == [(1, 30), (2, 60), (4, 50), (6, 10)]
