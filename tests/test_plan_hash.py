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


def test_python_udf_not_clearable_without_capture(spark, sf_dir):
    """A Python UDF's plan names the function but not its body — without
    a matching captured UDF object (scheme 6), a body edit is invisible
    to the hash, so such plans must refuse clearing."""
    from pyspark.sql.types import LongType

    fn = F.udf(lambda x: x, LongType())
    df = read_table(spark, sf_dir, "lineitem").select(fn("l_orderkey").alias("k"))
    r = plan_hash(df)
    assert not r["python_free"] and not r["clearable"]
    assert any(s.startswith("python_udf_unmatched") for s in r["reasons"])


def _hash_mapinpandas(spark, sf_dir, k):
    """Build a mapInPandas query whose UDF body depends on ``k`` ONLY
    through a closure cell — the logical plan is identical for any k."""
    from tools.plan_hash import _capture_udfs

    base = read_table(spark, sf_dir, "lineitem").select("l_quantity")

    def shift_batches(it):
        for pdf in it:
            pdf["l_quantity"] = pdf["l_quantity"] + k
            yield pdf

    cap: list = []
    with _capture_udfs(cap):
        df = base.mapInPandas(shift_batches, base.schema)
    return plan_hash(df, cap)


def test_pandas_udf_clearable_with_matched_capture(spark, sf_dir):
    """Scheme 6 (r09 verdict ask #3): an Arrow-stage plan whose named
    Python expressions are all matched by captured UDFs IS clearable,
    the closure digest folds into the hash, and two identical builds
    hash identically."""
    a = _hash_mapinpandas(spark, sf_dir, 1)
    b = _hash_mapinpandas(spark, sf_dir, 1)
    assert a["clearable"] and a["closure"]
    assert a["hash"] == b["hash"] and a["closure"] == b["closure"]


def test_pandas_udf_hash_sensitive_to_closure_constant(spark, sf_dir):
    """The pinned negative (r09 verdict ask #3): a changed constant
    reachable from the UDF — here a closure cell; the logical PLAN is
    byte-identical — must change the hash, so the edit does NOT clear."""
    a = _hash_mapinpandas(spark, sf_dir, 1)
    c = _hash_mapinpandas(spark, sf_dir, 2)
    assert a["clearable"] and c["clearable"]
    assert a["hash"] != c["hash"]


def _exec_udf(body_src, glb_extra):
    """A function compiled outside site-packages (user code) with a
    controlled global namespace."""
    ns = {"__name__": "tests_closure_fixture"}
    ns.update(glb_extra)
    exec(compile(body_src, "/root/repo/tests/<closure-fixture>", "exec"), ns)
    return ns["f"]


def test_closure_fingerprint_global_constant_and_line_shift():
    """Referenced-global VALUES are in the fingerprint (a threshold edit
    in a dependency module must void it); pure line shifts are not (a
    dependency edit that only moves the UDF down its file must clear)."""
    from tools.plan_hash import closure_fingerprint

    src = "def f(batches):\n    for b in batches:\n        yield b * K\n"
    h1, r1 = closure_fingerprint([("f", _exec_udf(src, {"K": 3}))])
    h2, _ = closure_fingerprint([("f", _exec_udf(src, {"K": 4}))])
    h3, _ = closure_fingerprint([("f", _exec_udf("\n\n\n" + src, {"K": 3}))])
    assert r1 == [] and h1 is not None
    assert h1 != h2, "changed referenced-global constant must change the fp"
    assert h1 == h3, "a pure line shift must not change the fp"


def test_set_element_fingerprints_are_isolated():
    """Set elements hash against isolated seen-state copies: with a
    SHARED state, iteration order decides which of two elements
    referencing a common object hashes its full content vs a <revisit>
    marker — the sorted sub-digests would differ between processes whose
    string-hash seeds order the set differently."""
    import hashlib

    from tools.plan_hash import _fp_value, _FpState

    class Box:
        pass

    shared = Box()
    shared.v = 7
    s = {("k1", shared), ("k2", shared)}
    st = _FpState()
    _fp_value(s, hashlib.sha256(), st, 0)
    # the shared object was visited only inside per-element sub-states;
    # a leak into the parent seen-set is exactly the order-dependence bug
    assert id(shared) not in st.seen
    # and both elements produced full (non-revisit) content: hashing the
    # set twice with fresh states is stable
    h1, h2 = hashlib.sha256(), hashlib.sha256()
    _fp_value(s, h1, _FpState(), 0)
    _fp_value(s, h2, _FpState(), 0)
    assert h1.hexdigest() == h2.hexdigest()


def test_closure_fingerprint_refuses_opaque_globals():
    """A reachable value whose content can't be pinned deterministically
    (default object repr carries a memory address) must surface a reason
    — the caller then refuses clearing instead of hashing garbage."""
    from tools.plan_hash import closure_fingerprint

    class Opaque:  # test-module class → user code, but instance state
        __module__ = "some_external_lib"  # forced external → repr path

        pass

    src = "def f(x):\n    return OBJ\n"
    h, reasons = closure_fingerprint([("f", _exec_udf(src, {"OBJ": Opaque()}))])
    assert h is None and any(r.startswith("fp_opaque") for r in reasons)


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


def test_hash_sensitive_to_eval_mode(spark, sf_dir):
    """Scheme 8: try_divide renders IDENTICALLY to `/` in the plan string
    AND its JSON (evalContext null), so a LEGACY->TRY semantics change was
    hash-invisible — the modes must come off the live Catalyst tree."""
    li = read_table(spark, sf_dir, "lineitem")
    plain = li.select(
        (F.col("l_quantity") / F.col("l_linenumber")).alias("r")
    )
    tried = li.select(F.try_divide("l_quantity", "l_linenumber").alias("r"))
    hp, ht = plan_hash(plain), plan_hash(tried)
    # precondition of the scheme: the strings really are identical
    from tools.plan_hash import normalized_plan

    assert normalized_plan(plain) == normalized_plan(tried)
    assert hp["hash"] != ht["hash"]
    assert hp["clearable"] and ht["clearable"]


def test_eval_mode_walk_reaches_subqueries(spark, sf_dir):
    """A TRY-mode division hidden inside a scalar subquery must still
    change the hash (the walk recurses through SubqueryExpression.plan)."""
    li = read_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("li_emode")
    q1 = spark.sql(
        "SELECT l_orderkey FROM li_emode "
        "WHERE l_quantity > (SELECT avg(l_quantity / l_linenumber) FROM li_emode)"
    )
    q2 = spark.sql(
        "SELECT l_orderkey FROM li_emode "
        "WHERE l_quantity > (SELECT avg(try_divide(l_quantity, l_linenumber)) FROM li_emode)"
    )
    assert plan_hash(q1)["hash"] != plan_hash(q2)["hash"]
