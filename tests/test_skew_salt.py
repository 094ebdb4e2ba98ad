"""salted_agg: two-phase result equals the direct aggregate on both salt
paths, and the default salt is a deterministic function of row content
(no monotonically_increasing_id feeding a shuffle key — the SPARK-23207
retry hazard; r10 review sweep)."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from duckdb_nats_jetstream_spark.operators.skew import salted_agg


def _df(spark):
    rows = [Row(k="hot" if i % 10 else "cold", v=i, u=f"u{i}") for i in range(1000)]
    return spark.createDataFrame(rows)


def _salted(df, salt_source=None):
    return salted_agg(
        df,
        keys=["k"],
        partial_aggs=[F.count("*").alias("pn"), F.sum("v").alias("ps")],
        final_aggs=[F.sum("pn").alias("n"), F.sum("ps").alias("s")],
        n_salts=16,
        salt_source=salt_source,
    )


def test_salted_equals_direct_both_paths(spark):
    df = _df(spark)
    direct = {
        r.k: (r.n, r.s)
        for r in df.groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    assert {r.k: (r.n, r.s) for r in _salted(df).collect()} == direct
    assert {r.k: (r.n, r.s) for r in _salted(df, "u").collect()} == direct


def test_default_salt_is_content_deterministic(spark):
    df = _df(spark)
    plan = _salted(df)._jdf.queryExecution().executedPlan().toString()
    assert "monotonically_increasing_id" not in plan
    assert "xxhash64" in plan
    # deterministic: two independent evaluations agree row-for-row
    a = sorted(map(tuple, _salted(df).collect()))
    b = sorted(map(tuple, _salted(df).collect()))
    assert a == b


def test_default_salt_actually_shards_hot_key(spark):
    df = _df(spark)
    partial = (
        df.withColumn(
            "__salt",
            F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(16)),
        )
        .groupBy("k", "__salt")
        .count()
    )
    shards = {r.k: 0 for r in partial.collect()}
    for r in partial.collect():
        shards[r.k] += 1
    assert shards["hot"] > 8  # the 900-row key spreads over most shards
