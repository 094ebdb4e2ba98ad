"""Physical-plan discipline: these fail when a change degrades pushdown,
pruning, broadcast choice, or codegen — the properties that decide whether a
query survives a 100× scale-up."""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_nats_jetstream_spark.plans.explain import (
    assert_broadcast_join,
    assert_no_cartesian,
    assert_pushed_filter,
    assert_read_schema_pruned,
    assert_wholestage_codegen,
    physical_plan,
)
from duckdb_nats_jetstream_spark.queries.relational import (
    nation_revenue,
    pricing_summary,
    top_revenue_orders,
)
from duckdb_nats_jetstream_spark.queries.stream import scan_json_cast_agg
from duckdb_nats_jetstream_spark.sources import message_scan


def test_seq_range_pushed_to_parquet(spark, sf_dir):
    df = message_scan(spark, sf_dir, start_seq=100, end_seq=200)
    assert_pushed_filter(df, "event_id")


def test_time_range_pushed_to_parquet(spark, sf_dir):
    df = message_scan(spark, sf_dir, start_time="2024-01-05", end_time="2024-01-10")
    assert_pushed_filter(df, "ts")


def test_scan_projection_prunes_columns(spark, sf_dir):
    df = message_scan(spark, sf_dir).select("seq", "subject")
    # value and props are never needed for this projection
    assert_read_schema_pruned(df, ["value", "props"])


def test_dimension_joins_broadcast(spark, sf_dir):
    assert_broadcast_join(top_revenue_orders(spark, sf_dir))
    assert_broadcast_join(nation_revenue(spark, sf_dir))


def test_no_cartesian_in_joins(spark, sf_dir):
    assert_no_cartesian(top_revenue_orders(spark, sf_dir))
    assert_no_cartesian(nation_revenue(spark, sf_dir))


def test_codegen_on_hot_paths(spark, sf_dir):
    assert_wholestage_codegen(lambda: pricing_summary(spark, sf_dir), spark)
    assert_wholestage_codegen(lambda: scan_json_cast_agg(spark, sf_dir), spark)


def test_registry_wide_no_cartesian_sweep(spark, sf_dir):
    """EVERY registry query's physical plan is cartesian-free — a blanket
    regression net over the whole capability surface (a lost join condition
    or broadcast hint anywhere becomes a test failure, not a 100 TB
    incident). Plans build at sf0.001 so the sweep stays cheap."""
    from duckdb_nats_jetstream_spark.queries import full_registry

    offenders = []
    leakers = []
    cache_mgr = spark._jsparkSession.sharedState().cacheManager()
    for name, (fn, _sql) in full_registry().items():
        plan = physical_plan(fn(spark, sf_dir))
        if "CartesianProduct" in plan:
            offenders.append(name)
        # operators that persist() intermediates must unpersist the SAME
        # handle before returning — a leaked cache entry pins executor
        # storage memory for the rest of the application AND silently
        # swaps later equivalent plans to InMemoryTableScan (found live:
        # winnow_pairs df_cap branch rebound fps before unpersist)
        if not cache_mgr.isEmpty():
            leakers.append(name)
            cache_mgr.clearCache()
    assert not offenders, f"cartesian products in: {offenders}"
    assert not leakers, f"queries leaking cache entries: {leakers}"


def test_winnow_and_mixture_are_pure_jvm(spark, sf_dir):
    """Winnowing fingerprints and weighted mixture sampling are advertised
    as zero-Python column pipelines — pin that in the physical plan."""
    from duckdb_nats_jetstream_spark.operators.dedup import winnow_fingerprints
    from duckdb_nats_jetstream_spark.operators.sampling import (
        weighted_mixture_sample,
    )
    from duckdb_nats_jetstream_spark.tables import read_table

    docs = read_table(spark, sf_dir, "documents")
    for df in (
        winnow_fingerprints(docs, arrow=False),
        weighted_mixture_sample(docs, {"src0": 1.0, "src1": 0.5}, default_rate=0.1),
    ):
        plan = physical_plan(df)
        for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert marker not in plan
    # the DEFAULT winnow path is Arrow-vectorized (the transform-lambda md5s
    # run interpreted on the column path — measured 3× slower): exactly one
    # MapInPandas stage, never row-at-a-time Python
    plan = physical_plan(winnow_fingerprints(docs))
    assert plan.count("MapInPandas") == 1
    assert "BatchEvalPython" not in plan


def test_mixture_sample_no_shuffle(spark, sf_dir):
    """The mixture filter must ride the scan: no Exchange in the plan."""
    from duckdb_nats_jetstream_spark.operators.sampling import (
        weighted_mixture_sample,
    )
    from duckdb_nats_jetstream_spark.tables import read_table

    docs = read_table(spark, sf_dir, "documents")
    out = weighted_mixture_sample(docs, {"src0": 0.5}, default_rate=0.1)
    assert "Exchange" not in physical_plan(out)


def test_typed_extract_scan_is_pure_jvm(spark, sf_dir):
    """The default typed-payload scan plan must keep every row JVM-side:
    no Python UDF eval, no mapInPandas stage, and whole-stage codegen on
    the aggregation — this is what makes it the 100 TB hot path (the
    Python wire codec is the compatibility path, not the default)."""
    from duckdb_nats_jetstream_spark.queries.stream import scan_typed_extract

    df = scan_typed_extract(spark, sf_dir)
    plan = physical_plan(df)
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas"):
        assert marker not in plan, f"Python stage {marker} leaked into the typed scan"
    assert_wholestage_codegen(lambda: scan_typed_extract(spark, sf_dir), spark)


def test_topk_plans_take_ordered(spark, sf_dir):
    from duckdb_nats_jetstream_spark.plans.explain import physical_plan
    from duckdb_nats_jetstream_spark.queries.relational import top_parts

    plan = physical_plan(top_parts(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan  # no global sort for ORDER BY+LIMIT


def test_filter_on_extracted_json_stays_codegen(spark, sf_dir):
    assert_wholestage_codegen(
        lambda: message_scan(spark, sf_dir, json_fields=["k"]).filter(
            F.col("k").cast("int") > 50
        ),
        spark,
    )


def test_asof_join_single_shuffle(spark, sf_dir):
    """The as-of join's cost model: exactly one exchange (by join key) for
    the union'd stream — not one per side, and no range-explosion join."""
    from duckdb_nats_jetstream_spark.plans.explain import physical_plan
    from duckdb_nats_jetstream_spark.queries.stream import scan_asof_join

    plan = physical_plan(scan_asof_join(spark, sf_dir))
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    exchanges = plan.count("Exchange hashpartitioning")
    assert exchanges == 1, f"expected 1 shuffle, saw {exchanges}:\n{plan}"


def test_interval_join_is_hash_join(spark, sf_dir):
    """Time-binning must buy a hash equi-join on (key, bin); a
    BroadcastNestedLoopJoin/CartesianProduct here means the range predicate
    fell through to a nested loop — fatal at scale."""
    from duckdb_nats_jetstream_spark.plans.explain import physical_plan
    from duckdb_nats_jetstream_spark.queries.stream import scan_interval_join

    plan = physical_plan(scan_interval_join(spark, sf_dir))
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan, plan


def test_trailing_spend_window_is_partitioned(spark, sf_dir):
    from duckdb_nats_jetstream_spark.plans.explain import physical_plan
    from duckdb_nats_jetstream_spark.queries.relational import (
        trailing_window_spend,
    )

    plan = physical_plan(trailing_window_spend(spark, sf_dir))
    windows = [ln for ln in plan.splitlines() if "Window" in ln and "Sort" not in ln]
    assert windows and all("o_custkey#" in ln for ln in windows), plan


def test_approx_aggs_has_no_expand(spark, sf_dir):
    # COUNT(DISTINCT) + percentile in ONE agg makes Catalyst Expand every
    # row per distinct-group; the dedup-then-count shape must stay Expand-free
    from duckdb_nats_jetstream_spark.queries.relational import approx_aggregates

    plan = physical_plan(approx_aggregates(spark, sf_dir))
    assert "Expand" not in plan, f"Expand crept back into rel_approx_aggs:\n{plan}"


def test_tfidf_corpus_count_broadcasts(spark, sf_dir):
    from duckdb_nats_jetstream_spark.queries.pipeline import text_tfidf_top_terms

    df = text_tfidf_top_terms(spark, sf_dir)
    assert_broadcast_join(df)
    assert_no_cartesian(df)


def test_histogram_prunes_to_one_column(spark, sf_dir):
    from duckdb_nats_jetstream_spark.queries.relational import price_histogram

    # only o_totalprice should reach the orders scan
    assert_read_schema_pruned(
        price_histogram(spark, sf_dir), ["o_comment", "o_clerk", "o_orderdate"]
    )


def test_market_share_join_discipline(spark, sf_dir):
    from duckdb_nats_jetstream_spark.queries.relational import market_share

    df = market_share(spark, sf_dir)
    assert_broadcast_join(df)   # nation/region dimensions broadcast
    assert_no_cartesian(df)     # 8-table tree stays equi-joined throughout


def test_q13_histogram_aggregates_before_join(spark, sf_dir):
    from duckdb_nats_jetstream_spark.queries.relational import (
        customer_order_histogram,
    )

    # orders must aggregate to per-custkey counts BEFORE joining customer:
    # exactly one join in the plan, fed by an aggregate, and the priority
    # filter reaches the orders parquet scan
    df = customer_order_histogram(spark, sf_dir)
    plan = physical_plan(df)
    assert_pushed_filter(df, "1-URGENT")
    assert plan.count("Join") >= 1
    assert "HashAggregate" in plan


def test_q17_broadcasts_both_small_sides(spark, sf_dir):
    from duckdb_nats_jetstream_spark.queries.relational import (
        small_quantity_revenue,
    )

    df = small_quantity_revenue(spark, sf_dir)
    assert_broadcast_join(df)
    assert_pushed_filter(df, "Brand#12")  # brand filter reaches the part scan
    assert_no_cartesian(df)


def test_q18_having_set_broadcasts(spark, sf_dir):
    from duckdb_nats_jetstream_spark.queries.relational import large_orders

    df = large_orders(spark, sf_dir)
    plan = physical_plan(df)
    assert "BroadcastHashJoin" in plan  # HAVING key-set joins via broadcast
    assert "TakeOrderedAndProject" in plan  # top-100 without a global sort
    assert_no_cartesian(df)


def test_q22_scalar_subquery_is_single_row_broadcast(spark, sf_dir):
    from duckdb_nats_jetstream_spark.queries.relational import (
        dormant_rich_customers,
    )

    df = dormant_rich_customers(spark, sf_dir)
    plan = physical_plan(df)
    # the 1-row threshold enters via broadcast nested loop (the scalar-
    # subquery idiom), never a shuffled cartesian
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_zorder_prunes_to_two_columns(spark, sf_dir):
    from duckdb_nats_jetstream_spark.queries.pipeline3 import rel_zorder_layout

    # only the two bucketed keys are ever read from lineitem
    assert_read_schema_pruned(
        rel_zorder_layout(spark, sf_dir), ["l_extendedprice", "l_comment", "l_shipdate"]
    )


def test_prefix_containment_is_hash_join_on_block_key(spark, sf_dir):
    from duckdb_nats_jetstream_spark.queries.pipeline3 import (
        dedup_prefix_containment,
    )

    df = dedup_prefix_containment(spark, sf_dir)
    plan = physical_plan(df)
    assert_no_cartesian(df)
    assert "NestedLoop" not in plan  # the prefix predicate must NOT be the join key


def test_knn_join_no_cartesian_and_bounded_shape(spark, sf_dir):
    from duckdb_nats_jetstream_spark.queries.pipeline3 import sim_knn_join

    df = sim_knn_join(spark, sf_dir)
    assert_no_cartesian(df)
    # the merge is a window rank over the partial top-k stream, not a join
    assert "FlatMapGroupsInPandas" in physical_plan(df)


def test_snapshot_diff_single_join(spark, sf_dir):
    from duckdb_nats_jetstream_spark.queries.pipeline3 import docs_snapshot_diff

    plan = physical_plan(docs_snapshot_diff(spark, sf_dir))
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") == 1


def test_bloom_probe_is_broadcast(spark, sf_dir):
    """The Bloom cell set must broadcast (it's constant-size by design); a
    shuffle join on the cell key would defeat the sketch's whole point."""
    from duckdb_nats_jetstream_spark.plans.explain import physical_plan
    from duckdb_nats_jetstream_spark.queries.pipeline4 import decon_bloom

    plan = physical_plan(decon_bloom(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan


def test_countmin_probe_is_broadcast_and_sketch_not_cartesian(spark, sf_dir):
    from duckdb_nats_jetstream_spark.plans.explain import physical_plan
    from duckdb_nats_jetstream_spark.queries.pipeline4 import text_countmin_topk

    plan = physical_plan(text_countmin_topk(spark, sf_dir))
    assert "CartesianProduct" not in plan


def test_semantic_dedup_is_bucket_equi_join(spark, sf_dir):
    """SemDeDup's pair search must be blocked on the bucket key — one
    bucket-keyed shuffle into the Arrow pair kernel (no pair relation, no
    join at all), and never a nested loop over all pairs."""
    from duckdb_nats_jetstream_spark.plans.explain import physical_plan
    from duckdb_nats_jetstream_spark.queries.pipeline4 import dedup_semantic

    plan = physical_plan(dedup_semantic(spark, sf_dir))
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "FlatMapGroupsInPandas" in plan, plan


def test_incremental_dedup_band_equi_join(spark, sf_dir):
    from duckdb_nats_jetstream_spark.plans.explain import physical_plan
    from duckdb_nats_jetstream_spark.queries.pipeline4 import dedup_incremental

    plan = physical_plan(dedup_incremental(spark, sf_dir))
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_chunk_dedup_shuffles_on_natural_keys_only(spark, sf_dir):
    """Chunk dedup = frequency agg (chunk hash) + join-back + reassembly
    agg (doc_id): hash joins/aggs only, no pair joins."""
    from duckdb_nats_jetstream_spark.plans.explain import physical_plan
    from duckdb_nats_jetstream_spark.queries.pipeline4 import docs_chunk_dedup

    plan = physical_plan(docs_chunk_dedup(spark, sf_dir))
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_hll_build_is_one_partial_agg(spark, sf_dir):
    """The HLL register build must be a hash aggregation with map-side
    partial max (shuffle moves <= m rows per partition, never the input)."""
    from duckdb_nats_jetstream_spark.operators.hll import hll_registers
    from duckdb_nats_jetstream_spark.plans.explain import physical_plan
    from duckdb_nats_jetstream_spark.tables import read_table

    plan = physical_plan(
        hll_registers(read_table(spark, sf_dir, "orders"), "o_custkey")
    )
    assert "HashAggregate" in plan and "partial_max" in plan, plan


def test_funnel_fold_is_single_user_shuffle(spark, sf_dir):
    """The fold variant must scan events ONCE: exactly one shuffle exchange
    below the final single-row aggregation, no joins (the oracle's 3-CTE
    cascade would show three)."""
    from duckdb_nats_jetstream_spark.operators.funnel import funnel_user_stages
    from duckdb_nats_jetstream_spark.plans.explain import physical_plan
    from duckdb_nats_jetstream_spark.tables import read_table

    plan = physical_plan(
        funnel_user_stages(
            read_table(spark, sf_dir, "events"),
            ["view", "click", "purchase"],
            algorithm="fold",
        )
    )
    assert "Join" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_funnel_cascade_is_skew_safe(spark, sf_dir):
    """The default (cascade) funnel must be built ENTIRELY from skew-safe
    operators: every aggregation a partial min/first (map-side combine — a
    hot user reduces to one row per map partition before the shuffle), no
    collect_list anywhere, no cartesian, and the event⋈stage joins
    shuffle-based (AQE skew splitting applies) — the plan shape that
    flattened the measured 34× straggler (SCALING.md batch 4)."""
    from duckdb_nats_jetstream_spark.operators.funnel import funnel_user_stages
    from duckdb_nats_jetstream_spark.plans.explain import physical_plan
    from duckdb_nats_jetstream_spark.tables import read_table

    plan = physical_plan(
        funnel_user_stages(
            read_table(spark, sf_dir, "events"), ["view", "click", "purchase"]
        )
    )
    assert "collect_list" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "partial_min" in plan, plan


def test_funnel_cascade_matches_fold(spark, sf_dir):
    """Both funnel algorithms are bit-identical on the same log — with and
    without the conversion window."""
    from duckdb_nats_jetstream_spark.operators.funnel import funnel_user_stages
    from duckdb_nats_jetstream_spark.tables import read_table

    ev = read_table(spark, sf_dir, "events")
    # salt_col="event_id": the deterministic tie-spreader (r07 review —
    # a row-position salt in a shuffle join key is retry-unsafe)
    for gap, salts, salt_col in (
        (None, None, None),
        ("2 hours", None, None),
        (None, 4, None),
        (None, 4, "event_id"),
    ):
        a = funnel_user_stages(
            ev,
            ["view", "click", "purchase"],
            max_gap=gap,
            algorithm="cascade",
            n_salts=salts,
            salt_col=salt_col,
        )
        b = funnel_user_stages(
            ev, ["view", "click", "purchase"], max_gap=gap, algorithm="fold"
        )
        # None-safe sort key (r05 ADVICE): if events ever gains NULL
        # user_id rows, mixing None with ints in a plain sort raises
        # TypeError instead of reporting a parity diff.
        none_safe = lambda t: tuple((v is None, v) for v in t)  # noqa: E731
        assert sorted(map(tuple, a.collect()), key=none_safe) == sorted(
            map(tuple, b.collect()), key=none_safe
        ), f"cascade != fold (max_gap={gap}, n_salts={salts}, salt_col={salt_col})"


def test_skew_join_ready_presents_bare_shuffle(spark, sf_dir):
    """`skew_join_ready` must remove every aggregate from the join child's
    plan (the structural precondition for AQE's OptimizeSkewedJoin —
    measured in SCALING.md Round-6 batch 5: an aggregate left under the
    child keeps a 90%-hot-key straggler at 11.3× despite skewJoin=on)."""
    from duckdb_nats_jetstream_spark.operators.skew import skew_join_ready
    from duckdb_nats_jetstream_spark.tables import read_table

    ev = read_table(spark, sf_dir, "events").select("user_id", "value")
    users = ev.select("user_id").distinct()

    raw = physical_plan(ev.join(users, "user_id"))
    assert "HashAggregate" in raw  # the defeating shape, for contrast

    ready = physical_plan(ev.join(skew_join_ready(users), "user_id"))
    assert "SortMergeJoin" in ready or "BroadcastHashJoin" in ready
    assert "HashAggregate" not in ready  # bare shuffle child: rule can match
    assert "Scan ExistingRDD" in ready  # the materialization boundary


def test_audit_capture_hooks_all_materializations(spark):
    """The build-plan audit hook must see EVERY driver-side
    materialization path (r05 ADVICE — previously only
    localCheckpoint/collect), capture once per chain (``take`` calls
    ``collect`` internally), and refuse nested use of the process-global
    monkeypatch."""
    import pytest as _pytest

    from duckdb_nats_jetstream_spark.plans.audit import (
        capture_checkpoint_plans,
    )

    df = spark.range(3)
    with capture_checkpoint_plans() as plans:
        df.toPandas()
        df.take(2)
        with _pytest.raises(RuntimeError, match="re-entrant"):
            with capture_checkpoint_plans():
                pass
    assert len(plans) == 2, plans
    # patch removed cleanly: a post-context materialization captures nothing
    df.collect()
    assert len(plans) == 2


def test_unigram_bits_scalar_total_is_broadcast(spark, sf_dir):
    """The corpus-total scalar must join by broadcast (1 row), the
    vocabulary join must be a hash join on the token key — never
    cartesian — and the r13 token-keyed window (a stopword-skew hazard;
    reverted r14) must stay gone. The query is now eager († lifecycle),
    so assert on the captured pre-checkpoint build plan."""
    from duckdb_nats_jetstream_spark.plans.audit import capture_checkpoint_plans
    from duckdb_nats_jetstream_spark.queries.pipeline5 import text_unigram_bits

    with capture_checkpoint_plans() as plans:
        text_unigram_bits(spark, sf_dir)
    assert plans, "expected the † lifecycle to checkpoint a build plan"
    plan = "\n".join(plans)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    assert "Window" not in plan, "token-keyed window shuffle is back"


def test_runtime_bloom_filter_prunes_fact_side(spark, sf_dir):
    """Catalyst's runtime bloom-filter join (Spark 3.3+): when a selective
    dimension side feeds a shuffle join, the optimizer builds a bloom
    filter from the dim keys at runtime and applies it to the fact scan —
    rows that cannot join never enter the shuffle. This is the engine-level
    answer to 'minimize shuffles' for selective fact⋈dim joins at 100 TB;
    pin that the plan actually contains the bloom_filter_agg build and the
    might_contain probe when the feature is on and broadcast is off
    (broadcast joins, the default for our dims, don't need it — this
    covers the big-dim regime where broadcast is impossible)."""
    old_bf = spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_scan = spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "10GB",
    )
    try:
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        from pyspark.sql import functions as F

        from duckdb_nats_jetstream_spark.tables import read_table

        li = read_table(spark, sf_dir, "lineitem")
        orders = read_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan, plan
        assert "might_contain" in plan, plan
    finally:
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", old_bf)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            old_scan,
        )


def test_profile_is_single_scan_both_variants(spark, sf_dir):
    """r03 verdict ask #4: the profiler must read the table ONCE however
    many columns it profiles. Exact variant: Catalyst plans the three
    COUNT(DISTINCT) via one Expand over a single scan (rows expand
    k+1-way but carry only pruned columns); approx variant: HLL++
    sketches, no Expand at all, one ordinary two-phase agg — the 100 TB
    default."""
    from duckdb_nats_jetstream_spark.operators.profile import profile
    from duckdb_nats_jetstream_spark.tables import read_table

    ev = read_table(spark, sf_dir, "events")
    cols = ["event_id", "user_id", "event_type"]

    exact = profile(ev, cols)._jdf.queryExecution().executedPlan().toString()
    assert exact.count("Scan parquet") == 1, exact
    assert exact.count("Expand") == 1, exact

    approx = (
        profile(ev, cols, approx=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert approx.count("Scan parquet") == 1, approx
    assert "Expand" not in approx, approx
    assert "approx_count_distinct" in approx, approx


def test_excess_volume_materializes_per_supp_once(spark, sf_dir):
    """r06 verdict ask #1, pinned: the per-supplier aggregate feeds both
    the threshold scalar and the qualifying filter — left lazy, Catalyst
    planned the lineitem⋈part aggregate TWICE (5 parquet scans; a double
    scan of the largest fact table at 100 TB). The sized_broadcast route
    must keep the total at ≤3 scans across the build plan (one lineitem +
    one part) and the final plan (supplier + the checkpointed relation)."""
    from duckdb_nats_jetstream_spark.plans.audit import (
        audit_row,
        capture_checkpoint_plans,
    )
    from duckdb_nats_jetstream_spark.queries.relational2 import (
        excess_volume_suppliers,
    )

    with capture_checkpoint_plans() as plans:
        df = excess_volume_suppliers(spark, sf_dir)
    scans = sum(audit_row(p)["scans"] for p in plans) + audit_row(
        physical_plan(df)
    )["scans"]
    assert scans <= 3, f"per_supp recomputation is back: {scans} parquet scans"
    # the guarded side joins supplier via broadcast at test scale
    assert "BroadcastHashJoin" in physical_plan(df)
    assert_no_cartesian(df)


#: Queries whose plans contain an UNPARTITIONED Window node — legal ONLY
#: because each window provably runs over a bounded relation, never the
#: corpus (r12 verdict nit → r13: the runtime WindowExec warning is
#: logger-suppressed in bench.py, so this pinned allowlist + the audit's
#: `uw` column now carry the lint value the warning used to provide).
#: name → why the window input is bounded.
UNPARTITIONED_WINDOW_ALLOWLIST = {
    # rank over the ≤topk survivors of TakeOrderedAndProject
    "text_bm25_topk": "window over top-100 BM25 survivors",
    "text_bm25_rm3": "window over top-k survivors (both passes)",
    "sim_hybrid_rrf": "window over top-100 lexical survivors",
    "sim_hybrid_rrf3": "windows over top-100 lexical + phrase survivors",
    "sim_hybrid_rrf_ann": "window over top-100 lexical survivors",
    # per-chunk offset fix-up: one row per range chunk (~2x parallelism)
    "docs_token_budget": "ranged_running_sum offset chain (1 row/chunk)",
    # per-chunk boundary fix-up: one row per non-empty 2^20-wide chunk
    "scan_gap_detection": "chunked_lag boundary table (1 row/chunk)",
    # day-grain cumulative: one row per observed day
    "scan_cumulative_uniques": "exact-cumulative window over day grain",
    # source-grain share/rate: one row per source
    "docs_mixture_plan": "aggregate window over #sources rows",
}


def test_unpartitioned_windows_match_allowlist():
    """Every PLAN_AUDIT row with uw > 0 must be allowlisted above with a
    boundedness argument, and every allowlist entry must still have one
    (drop stale entries). A NEW unpartitioned window anywhere in the
    registry fails here until its boundedness is argued in the allowlist."""
    import os
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    offenders: set[str] = set()
    for line in open(os.path.join(repo, "PLAN_AUDIT.md")):
        m = re.match(r"\| ([A-Za-z0-9_]+)(?: †\(\d+\))? \|(.*)\|", line)
        if not m or m.group(1) == "query":
            continue
        cells = [c.strip() for c in m.group(2).split("|")]
        if len(cells) >= 10 and cells[-1].isdigit() and int(cells[-1]) > 0:
            offenders.add(m.group(1))
    allow = set(UNPARTITIONED_WINDOW_ALLOWLIST)
    assert offenders - allow == set(), (
        f"NEW unpartitioned windows (argue boundedness in the allowlist "
        f"or partition the window): {sorted(offenders - allow)}"
    )
    assert allow - offenders == set(), (
        f"stale allowlist entries (window gone — drop them): "
        f"{sorted(allow - offenders)}"
    )
