"""tools/plan_hash.py — the optimized-plan hasher behind the ledger's
plan-neutral-edit evidence (docs/R08_PLAN.md item 2). Soundness rests on
three properties pinned here: determinism across separately-built
DataFrames (exprId renumbering), sensitivity to real plan differences,
and refusal to vouch for plans whose behavior lives outside the plan
string (Python-eval nodes, RDD-backed leaves)."""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_nats_jetstream_spark.tables import read_table
from tools.plan_hash import _identity_checkpoints, plan_hash


def _q(spark, sf_dir):
    return (
        read_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("sum_qty"))
    )


def test_hash_deterministic_across_builds(spark, sf_dir):
    """Two independent builds allocate different exprIds; the
    first-appearance renumbering must erase that and nothing else."""
    a, b = plan_hash(_q(spark, sf_dir)), plan_hash(_q(spark, sf_dir))
    assert a["hash"] == b["hash"]
    assert a["clearable"] and b["clearable"]


def test_hash_sensitive_to_plan_changes(spark, sf_dir):
    base = plan_hash(_q(spark, sf_dir))["hash"]
    changed = plan_hash(
        _q(spark, sf_dir).filter(F.col("sum_qty") > 0)
    )["hash"]
    assert base != changed


def test_hash_sensitive_to_scan_location(spark, sf_dir, tmp_path):
    """Logical plan strings don't render the parquet path — the hash
    appends the sorted leaf file list so same-shaped scans of different
    tables cannot collide."""
    path = str(tmp_path / "copy.parquet")
    read_table(spark, sf_dir, "lineitem").write.parquet(path)
    a = (
        spark.read.parquet(path)
        .groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("sum_qty"))
    )
    b = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("sum_qty"))
    )
    assert plan_hash(a)["hash"] != plan_hash(b)["hash"]


def test_hash_insensitive_to_lambda_name_counter(spark, sf_dir):
    """pyspark names higher-order-function variables with a
    session-global counter (``x_1`` … ``x_32``) — burning names between
    two builds of the same HOF plan must not change the hash (r08
    review: 40 spurious mismatches before the suffix normalization)."""
    def hof(df):
        return df.select(
            F.filter(F.split("text", " "), lambda w: F.length(w) > 3).alias("ws")
        )

    base = read_table(spark, sf_dir, "documents")
    h1 = plan_hash(hof(base))["hash"]
    for _ in range(7):  # advance the fresh-name counter
        spark.range(1).select(
            F.transform(F.array(F.lit(1)), lambda x: x + 1)
        ).collect()
    h2 = plan_hash(hof(base))["hash"]
    assert h1 == h2


def test_python_udf_not_clearable(spark, sf_dir):
    """A Python UDF's plan names the function but not its body — a body
    edit is invisible to the hash, so such plans must refuse clearing."""
    from pyspark.sql.types import LongType

    fn = F.udf(lambda x: x, LongType())
    df = read_table(spark, sf_dir, "lineitem").select(fn("l_orderkey").alias("k"))
    r = plan_hash(df)
    assert not r["python_free"] and not r["clearable"]


def test_rdd_leaf_not_clearable(spark, sf_dir):
    """A materialized (LogicalRDD) leaf hides the upstream plan."""
    df = _q(spark, sf_dir).localCheckpoint(eager=True)
    r = plan_hash(df)
    assert not r["rdd_free"] and not r["clearable"]


def test_local_relation_not_clearable(spark):
    """An all-LocalRelation plan (empty inputFiles) renders only output
    ATTRIBUTES — an edit changing the embedded createDataFrame data would
    hash identically, so equality is not evidence (r08 ADVICE, fixed r09)."""
    df = spark.createDataFrame([(1, "a")], "id long, s string").select("id")
    assert df.inputFiles() == []
    r = plan_hash(df)
    assert not r["clearable"] and not r["rdd_free"]


def test_identity_checkpoints_restore(spark, sf_dir):
    """Inside the context, localCheckpoint is identity (the full plan
    stays hashable); outside, real checkpointing is restored."""
    df = _q(spark, sf_dir)
    with _identity_checkpoints():
        assert df.localCheckpoint(eager=True) is df
        assert plan_hash(df.localCheckpoint())["clearable"]
    out = df.localCheckpoint(eager=True)
    assert out is not df
