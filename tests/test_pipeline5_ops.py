"""Operator-level invariants for the batch-5 ops (HLL sketch, funnel,
unigram-bits surprisal, MAD outliers)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from duckdb_nats_jetstream_spark.operators import hll as HLL
from duckdb_nats_jetstream_spark.queries import pipeline5 as P5
from duckdb_nats_jetstream_spark.tables import read_table


# --- HLL ---------------------------------------------------------------------


def test_hll_merge_equals_global_build(spark, sf_dir):
    """Sharded build + register merge must equal the one-shot global build
    bit-for-bit — the property that makes the sketch usable incrementally
    (daily shards, per-executor partials)."""
    orders = read_table(spark, sf_dir, "orders")
    full = HLL.hll_registers(orders, "o_custkey")
    s0 = HLL.hll_registers(orders.filter(F.col("o_orderkey") % 2 == 0), "o_custkey")
    s1 = HLL.hll_registers(orders.filter(F.col("o_orderkey") % 2 == 1), "o_custkey")
    merged = HLL.merge_registers(s0, s1)
    a = {(r.register, r.max_rank) for r in full.collect()}
    b = {(r.register, r.max_rank) for r in merged.collect()}
    assert a == b
    # estimates therefore identical too
    ea = HLL.hll_estimate(full).collect()[0]
    eb = HLL.hll_estimate(merged).collect()[0]
    assert ea == eb


def test_hll_estimate_within_expected_error(spark):
    """Raw HLL with m=256 has ~1.04/sqrt(m) ≈ 6.5% standard error IN THE
    DENSE REGIME (n ≫ 2.5·m — below that, raw HLL overestimates and real
    deployments switch to linear counting, which we deliberately don't mirror
    because it needs ``ln``; the query exposes ``n_zero`` for that). Assert a
    4-sigma band on a dense deterministic input (md5 → fixed property, not a
    flaky statistical test)."""
    n = 50_000
    df = spark.range(n).select(F.col("id").alias("v"))
    est = HLL.hll_estimate(HLL.hll_registers(df, "v")).collect()[0]
    assert est.n_zero == 0
    assert abs(est.raw_estimate - n) / n < 4 * 1.04 / (256 ** 0.5)


def test_hll_duplicates_do_not_change_sketch(spark, sf_dir):
    """Cardinality sketch must be insensitive to multiplicity: unioning the
    input with itself leaves every register untouched."""
    orders = read_table(spark, sf_dir, "orders")
    once = HLL.hll_registers(orders, "o_custkey")
    twice = HLL.hll_registers(orders.unionByName(orders), "o_custkey")
    assert {tuple(r) for r in once.collect()} == {tuple(r) for r in twice.collect()}


# --- funnel ------------------------------------------------------------------


def test_funnel_stages_are_ordered_and_monotone(spark, sf_dir):
    row = P5.scan_funnel(spark, sf_dir).collect()[0]
    assert row.u_view >= row.u_click >= row.u_purchase > 0
    assert 0.0 < row.conv_click <= 1.0 and 0.0 < row.conv_purchase <= 1.0


def test_funnel_strict_order_semantics(spark):
    """A purchase BEFORE the first view-click chain must not count; one in
    order must. Hand-built log, exact expectations."""
    import datetime as dt

    t = lambda s: dt.datetime(2026, 1, 1, 0, 0, s)
    rows = [
        # user 1: full ordered funnel
        (1, t(1), "view"), (1, t(2), "click"), (1, t(3), "purchase"),
        # user 2: purchase precedes click — stage 3 not reached
        (2, t(1), "view"), (2, t(3), "click"), (2, t(2), "purchase"),
        # user 3: click before any view — stage 2 not reached
        (3, t(2), "view"), (3, t(1), "click"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    from duckdb_nats_jetstream_spark.operators.funnel import (
        funnel_summary,
        funnel_user_stages,
    )

    per_user = funnel_user_stages(df, ["view", "click", "purchase"])
    by_user = {r.user_id: r for r in per_user.collect()}
    assert by_user[1].t1 and by_user[1].t2 and by_user[1].t3
    assert by_user[2].t2 is not None and by_user[2].t3 is None
    assert by_user[3].t1 is not None and by_user[3].t2 is None
    out = funnel_summary(per_user, 3).collect()[0]
    assert (out.n_stage1, out.n_stage2, out.n_stage3) == (3, 2, 1)

    # dead stage: nobody past stage 1 → 0.0/0.0 rate, which default-ANSI
    # division THROWS on — the rate must be NULL instead (r10 review)
    dead = funnel_user_stages(
        df, ["view", "signup", "purchase"]
    )
    s = funnel_summary(dead, 3).collect()[0]
    assert (s.n_stage1, s.n_stage2, s.n_stage3) == (3, 0, 0)
    assert s.conv_2 == 0.0 and s.conv_3 is None


def test_funnel_adversarial_log_all_algorithms_match_reference(spark):
    """Adversarial log — NULL user, timestamp ties at a stage boundary
    (strict ``>``), an exact max_gap-boundary hit (``<=``), a user whose
    only events are late stages, duplicate events — checked against an
    independent pure-Python reference, for cascade (unsalted AND salted)
    and fold, with and without the conversion window."""
    import datetime as dt

    t = lambda s: dt.datetime(2026, 1, 1, 0, 0, s)  # noqa: E731
    rows = [
        # user 1: click ties the view timestamp — strict > must reject it,
        # but a second, later click continues the chain
        (1, t(1), "view"), (1, t(1), "click"), (1, t(2), "click"),
        (1, t(3), "purchase"),
        # NULL user: full funnel (groups like any other key)
        (None, t(1), "view"), (None, t(2), "click"), (None, t(3), "purchase"),
        # user 2: purchase lands EXACTLY max_gap after the click (<= passes)
        (2, t(1), "view"), (2, t(2), "click"), (2, t(12), "purchase"),
        # user 3: only late stages — never converts stage 1
        (3, t(1), "click"), (3, t(2), "purchase"),
        # user 4: duplicates of every event
        (4, t(1), "view"), (4, t(1), "view"), (4, t(2), "click"),
        (4, t(2), "click"),
    ]
    stages = ["view", "click", "purchase"]

    def reference(max_gap_s):
        out = {}
        users = {u for u, _, _ in rows}
        for u in users:
            ev = sorted(
                ((ts, e) for uu, ts, e in rows if uu == u),
                key=lambda p: p[0],
            )
            prev = None
            res = []
            for k, stage in enumerate(stages):
                hit = None
                if k == 0 or prev is not None:  # chain unbroken so far
                    for ts, e in ev:
                        if e != stage:
                            continue
                        if k > 0 and not (
                            ts > prev
                            and (
                                max_gap_s is None
                                or ts <= prev + dt.timedelta(seconds=max_gap_s)
                            )
                        ):
                            continue
                        hit = ts
                        break
                res.append(hit)
                prev = hit
            out[u] = tuple(res)
        return out

    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    from duckdb_nats_jetstream_spark.operators.funnel import funnel_user_stages

    for gap_str, gap_s in ((None, None), ("10 seconds", 10)):
        ref = reference(gap_s)
        for algo, salts in (
            ("cascade", None),
            ("cascade", 3),
            ("fold", None),
        ):
            got = {
                r.user_id: (r.t1, r.t2, r.t3)
                for r in funnel_user_stages(
                    df, stages, max_gap=gap_str, algorithm=algo, n_salts=salts
                ).collect()
            }
            assert got == ref, (algo, salts, gap_str)


# --- unigram bits ------------------------------------------------------------


def test_unigram_bits_rarest_token_scores_highest(spark, sf_dir):
    """A document's mean surprisal must be ≥ 0, and the corpus-wide doc
    count must be preserved (every document has ≥ 1 token here)."""
    out = P5.text_unigram_bits(spark, sf_dir).collect()
    docs_n = read_table(spark, sf_dir, "documents").count()
    assert len(out) == docs_n
    assert all(r.bits_total >= 0 and r.mean_bits >= 0.0 for r in out)
    # surprisal floor-log2 identity: a token with frequency n out of total N
    # contributes length(bin(N div n)) - 1 bits — spot-check on a tiny corpus
    tiny = spark.createDataFrame(
        [(1, "a a a b"), (2, "a b")], "doc_id long, text string"
    )
    tiny.createOrReplaceTempView("__tiny")
    # a: n=4, b: n=2, N=6 → bits(a)=floor(log2(6//4))=0, bits(b)=floor(log2(3))=1
    from duckdb_nats_jetstream_spark.functions import text as TX

    tok = tiny.select("doc_id", F.explode(TX.tokens(F.col("text"))).alias("token"))
    dtc = tok.groupBy("doc_id", "token").agg(F.count("*").alias("c"))
    vocab = dtc.groupBy("token").agg(F.sum("c").alias("n"))
    total = vocab.agg(F.sum("n").alias("total"))
    bits = F.length(F.bin(F.expr("total div n"))) - 1
    got = {
        r.token: r.b
        for r in vocab.crossJoin(total).select("token", bits.alias("b")).collect()
    }
    assert got == {"a": 0, "b": 1}


# --- MAD outliers ------------------------------------------------------------


def test_mad_outliers_bounds(spark, sf_dir):
    out = P5.rel_mad_outliers(spark, sf_dir).collect()
    assert len(out) == 5  # five event types in the fixture
    for r in out:
        assert 0 <= r.n_outliers <= r.n
        assert r.mad >= 0.0


# --- histogram sketch --------------------------------------------------------


def test_hist_merge_equals_global_build(spark, sf_dir):
    """Shard sketches merge bin-wise to exactly the one-shot build — the
    count-min/HLL mergeability contract, histogram edition."""
    from duckdb_nats_jetstream_spark.operators import histsketch as HS

    ev = read_table(spark, sf_dir, "events")
    full = HS.hist_bins(ev, "value", 0.0, 640.0, 128)
    s0 = HS.hist_bins(ev.filter(F.col("event_id") % 2 == 0), "value", 0.0, 640.0, 128)
    s1 = HS.hist_bins(ev.filter(F.col("event_id") % 2 == 1), "value", 0.0, 640.0, 128)
    merged = HS.merge_hist(s0, s1)
    assert {tuple(r) for r in full.collect()} == {tuple(r) for r in merged.collect()}


def test_hist_quantile_within_bin_width_of_exact(spark, sf_dir):
    """The equi-width estimator's error bound: each estimate must fall
    within one bin width of the exact interpolated percentile (values
    inside [lo, hi), which holds for this column at every SF ≤ 0.1)."""
    from duckdb_nats_jetstream_spark.queries.pipeline5 import (
        _HBINS,
        _HHI,
        _HLO,
        rel_hist_quantiles,
    )

    row = rel_hist_quantiles(spark, sf_dir).collect()[0]
    width = (_HHI - _HLO) / _HBINS
    for est, exact in ((row.q_0_25, row.x25), (row.q_0_5, row.x50), (row.q_0_9, row.x90)):
        assert abs(est - exact) <= width, (est, exact)


# --- PMI ---------------------------------------------------------------------


def test_pmi_lift_identity(spark, sf_dir):
    """lift must equal (cxy/nb) / ((cx/nu)(cy/nu)) recomputed from the
    emitted counts — and every returned pair clears the count floor."""
    from duckdb_nats_jetstream_spark.functions import text as TX
    from duckdb_nats_jetstream_spark.queries.pipeline5 import text_pmi_topk

    rows = text_pmi_topk(spark, sf_dir).collect()
    assert rows and all(r.cxy >= 5 for r in rows)
    docs = read_table(spark, sf_dir, "documents")
    toked = docs.select(TX.tokens(F.col("text")).alias("toks"))
    nu = toked.select(F.explode("toks").alias("t")).count()
    nb = toked.select(
        (F.greatest(F.size("toks") - 1, F.lit(0))).alias("k")
    ).agg(F.sum("k")).collect()[0][0]
    for r in rows:
        expect = (r.cxy / nb) / ((r.cx / nu) * (r.cy / nu))
        assert abs(expect - r.lift) < 1e-9 * abs(expect)
    # ranking is by lift descending
    lifts = [r.lift for r in rows]
    assert lifts == sorted(lifts, reverse=True)


# --- product quantization ------------------------------------------------------


def test_pq_codes_are_bounded_and_complete(spark, sf_dir):
    from duckdb_nats_jetstream_spark.operators import pq as PQ

    emb = read_table(spark, sf_dir, "embeddings")
    cbs = PQ.fit_pq_codebooks(emb, m=8, n_codes=16)
    assert len(cbs) == 8 and all(len(c) == 16 for c in cbs)
    codes = PQ.pq_encode(emb, cbs).collect()
    assert len(codes) == emb.count()
    for r in codes:
        assert len(r.codes) == 8 and all(0 <= c < 16 for c in r.codes)


def test_pq_recall_against_exact(spark, sf_dir):
    """ADC ranking is approximate; assert it beats the SRP test's bar on
    the same corpus (deterministic training → a fixed property of the
    dataset, not flaky). The synthetic embeddings are near-random — top-5
    cosine sits barely above background, so 8×16-code quantization noise
    reorders much of the tail (measured 0.18 here, 0.30 at 64 codes; the
    SRP recall test uses the same ≥ 0.1 bar for the same reason). On a
    corpus with real neighbor structure the margin, not the noise,
    dominates and recall climbs accordingly."""
    from duckdb_nats_jetstream_spark.operators import pq as PQ
    from duckdb_nats_jetstream_spark.operators import similarity as S

    emb = read_table(spark, sf_dir, "embeddings")
    approx = PQ.pq_topk(emb, query_max_id=10, k=5).collect()
    exact = S.cosine_topk(emb, query_max_id=10, k=5).collect()
    a = {(r.query_id, r.neighbor_id) for r in approx}
    e = {(r.query_id, r.neighbor_id) for r in exact}
    assert len(a & e) / len(e) > 0.1, f"PQ recall {len(a & e) / len(e):.2f}"


def test_pq_guards(spark, sf_dir):
    """r09 review edges: m must divide dim (silent tail-dimension drop
    otherwise); an empty query set returns an empty frame instead of
    crashing _l2norm; a zero embedding normalizes to zeros, not NaN (a
    NaN in the fit sample poisons centroids AND renders an invalid
    'nane0' oracle literal)."""
    import numpy as np
    import pytest

    from duckdb_nats_jetstream_spark.errors import BindError
    from duckdb_nats_jetstream_spark.operators import pq as PQ
    from duckdb_nats_jetstream_spark.operators.pq import _l2norm

    emb = read_table(spark, sf_dir, "embeddings")
    with pytest.raises(BindError, match="divide dim"):
        PQ.pq_topk(emb, query_max_id=5, m=6, dim=64)
    assert PQ.pq_topk(emb, query_max_id=0, k=3).count() == 0

    X = np.array([[0.0, 0.0], [3.0, 4.0]])
    N = _l2norm(X)
    assert not np.isnan(N).any() and (N[0] == 0).all()
    assert np.isclose(np.linalg.norm(N[1]), 1.0)


def test_semantic_prune_zero_norm_vectors_never_dup(spark):
    """Zero-norm vectors have undefined cosine; the contract (matching
    DuckDB, where 0.0/0.0 → NULL and the threshold excludes it) is that
    such pairs are NEVER near-dups — and neither engine path may crash
    on them (r09 review: the JVM path's raw division died with
    DIVIDE_BY_ZERO under ANSI, Spark 4's default)."""
    from duckdb_nats_jetstream_spark.operators.semantic import (
        _prune_within_block,
    )

    rows = [
        (1, 0, [0.0, 0.0]),  # zero-norm pair: cos undefined → no dup
        (2, 0, [0.0, 0.0]),
        (3, 1, [1.0, 0.0]),  # orthogonal pair: cos = 0 < threshold
        (4, 1, [0.0, 1.0]),
        (5, 2, [1.0, 0.0]),  # identical pair: cos = 1 → id 6 condemned
        (6, 2, [1.0, 0.0]),
    ]
    b = spark.createDataFrame(rows, "vec_id long, bucket long, v array<double>")
    got_arrow = {
        (r.vec_id, r.n_dups)
        for r in _prune_within_block(b, "bucket", "vec_id", 2, 0.4).collect()
    }
    got_jvm = {
        (r.vec_id, r.n_dups)
        for r in _prune_within_block(
            b, "bucket", "vec_id", 2, 0.4, arrow=False
        ).collect()
    }
    assert got_arrow == got_jvm == {(6, 1)}


def test_knn_join_excludes_nan_neighbors(spark):
    """A zero-norm corpus vector has undefined similarity to everything;
    it must never appear as a NEIGHBOR (r09 review: a NaN partial that
    survived a small block ranked FIRST in the merge window because
    Spark sorts NaN as largest under desc)."""
    from duckdb_nats_jetstream_spark.operators.similarity import knn_join

    rows = [
        (0, [1.0, 0.0]),
        (1, [0.9, 0.1]),
        (2, [0.0, 0.0]),  # zero-norm: NaN cosine vs everyone
        (3, [0.5, 0.5]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = knn_join(df, k=2, n_blocks=2, dim=2).collect()
    assert got, "expected neighbors for the non-degenerate vectors"
    assert all(r.neighbor_id != 2 for r in got)
    assert all(not (r.cos_r != r.cos_r) for r in got)  # no NaN cos survives


def test_funnel_conversion_window(spark):
    """max_gap bounds each stage-to-stage gap: a click 3h after the view
    misses a 2h window; a later in-window click still converts."""
    import datetime as dt

    t = lambda h, mi=0: dt.datetime(2026, 1, 1, h, mi)
    rows = [
        (1, t(0), "view"), (1, t(3), "click"),            # gap 3h: out
        (2, t(0), "view"), (2, t(1), "click"),            # gap 1h: in
        (3, t(0), "view"), (3, t(3), "click"), (3, t(1, 30), "click"),  # late + in-window
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    from duckdb_nats_jetstream_spark.operators.funnel import funnel_user_stages

    by_user = {
        r.user_id: r
        for r in funnel_user_stages(df, ["view", "click"], max_gap="2 hours").collect()
    }
    assert by_user[1].t2 is None
    assert by_user[2].t2 == t(1)
    assert by_user[3].t2 == t(1, 30)


def test_funnel_salt_col_without_salting_rejected(spark):
    """salt_col only acts on the salted cascade path — passing it with
    n_salts unset or the fold algorithm must raise, not silently skip the
    tie-spreading skew protection the caller asked for (r07 ADVICE)."""
    import pytest

    from duckdb_nats_jetstream_spark.operators.funnel import funnel_user_stages

    df = spark.createDataFrame(
        [(1, None, "view")], "user_id long, ts timestamp, event_type string"
    )
    with pytest.raises(ValueError, match="salt_col requires"):
        funnel_user_stages(df, ["view", "click"], salt_col="event_id")
    with pytest.raises(ValueError, match="salt_col requires|cascade-only"):
        funnel_user_stages(
            df, ["view", "click"], algorithm="fold", n_salts=4, salt_col="event_id"
        )
    # n_salts alone on the fold path is the same silent-no-op class
    with pytest.raises(ValueError, match="cascade-only"):
        funnel_user_stages(df, ["view", "click"], algorithm="fold", n_salts=4)


def test_sketches_ignore_nulls(spark):
    """NULL values must not add a bogus register/bin row (COUNT(DISTINCT)
    and quantile aggregates both ignore NULLs — the sketches must too)."""
    from duckdb_nats_jetstream_spark.operators import histsketch as HS

    df = spark.createDataFrame(
        [(1,), (2,), (None,)], "v long"
    )
    regs = HLL.hll_registers(df, "v").collect()
    assert len(regs) == 2 and all(r.register is not None for r in regs)
    vals = spark.createDataFrame([(1.0,), (None,)], "value double")
    bins = HS.hist_bins(vals, "value", 0.0, 10.0, 4).collect()
    assert len(bins) == 1 and bins[0].bin is not None and bins[0].cnt == 1


def test_cumulative_uniques_monotone_and_audited(spark, sf_dir):
    """Register-algebra cumulative estimates must be non-decreasing (sketch
    union only grows) and the exact audit strictly tracks the data."""
    rows = P5.scan_cumulative_uniques(spark, sf_dir).collect()
    assert len(rows) >= 2
    ests = [r.raw_estimate for r in rows]
    exacts = [r.exact_cum for r in rows]
    assert all(b >= a for a, b in zip(ests, ests[1:]))
    assert all(b >= a for a, b in zip(exacts, exacts[1:]))
    # final day covers every user
    total = read_table(spark, sf_dir, "events").select("user_id").distinct().count()
    assert exacts[-1] == total


def test_triangles_consistency(spark, sf_dir):
    row = P5.dedup_graph_triangles(spark, sf_dir).collect()[0]
    assert row.n_edges >= 0 and row.n_wedges >= 0 and row.n_triangles >= 0
    assert row.n_triangles <= row.n_wedges
    if row.n_wedges:
        assert 0.0 <= row.closure <= 1.0


# --- KMV sketch --------------------------------------------------------------


def test_kmv_union_is_mergeable(spark, sf_dir):
    """Union of shard sketches == sketch of the union, bit-for-bit (the
    k smallest of A∪B are among the k smallest of A plus the k smallest
    of B)."""
    from duckdb_nats_jetstream_spark.operators import kmv as KMV

    orders = read_table(spark, sf_dir, "orders")
    s0 = KMV.kmv_sketch(orders.filter(F.col("o_orderkey") % 2 == 0), "o_custkey")
    s1 = KMV.kmv_sketch(orders.filter(F.col("o_orderkey") % 2 == 1), "o_custkey")
    merged = {r.h for r in KMV.kmv_union(s0, s1).collect()}
    direct = {r.h for r in KMV.kmv_sketch(orders, "o_custkey").collect()}
    assert merged == direct


def test_kmv_estimate_accuracy_dense(spark):
    """(k−1)/U_k with k=256 has ~6.3% std error; 4-sigma band on a dense
    deterministic input (md5 → fixed, not flaky)."""
    from duckdb_nats_jetstream_spark.operators import kmv as KMV

    n = 50_000
    df = spark.range(n).select(F.col("id").alias("v"))
    est = KMV.kmv_estimate(KMV.kmv_sketch(df, "v")).collect()[0]
    assert est.n_sketch == KMV.K
    assert abs(est.estimate - n) / n < 4 / ((KMV.K - 2) ** 0.5)


def test_kmv_small_set_is_exact(spark):
    from duckdb_nats_jetstream_spark.operators import kmv as KMV

    df = spark.range(40).select(F.col("id").alias("v"))
    est = KMV.kmv_estimate(KMV.kmv_sketch(df, "v")).collect()[0]
    assert est.n_sketch == 40 and est.estimate == 40.0


def test_kmv_intersection_sane(spark, sf_dir):
    row = P5.rel_kmv_intersection(spark, sf_dir).collect()[0]
    assert 0 <= row.n_match <= row.n_union
    assert 0.0 <= row.jaccard_est <= 1.0
    assert row.inter_est >= 0.0
    # when the overlap is large enough for the sketch to see it, the
    # estimate lands within a loose 50% band (deterministic md5 → fixed)
    if row.exact_inter >= 100:
        assert abs(row.inter_est - row.exact_inter) / row.exact_inter < 0.5


def test_span_scrub_consistent_with_span_stats(spark, sf_dir):
    """The scrubber must remove tokens exactly where the stats operator
    sees duplicated spans: docs with dup_frac == 0 lose nothing; every doc
    with dup_frac > 0 loses at least n tokens (one full span); removal
    never exceeds the token count; and a clean doc's text survives
    verbatim modulo whitespace normalization."""
    from duckdb_nats_jetstream_spark.operators import dedup as D

    docs = read_table(spark, sf_dir, "documents")
    scrub = {r.doc_id: r for r in D.span_scrub(docs, n=13).collect()}
    stats = {r.doc_id: r for r in D.dup_span_stats(docs, n=13).collect()}
    assert scrub
    for doc_id, s in scrub.items():
        assert 0 <= s.n_removed <= s.n_tokens
        st = stats.get(doc_id)
        if st is None:  # fewer than n tokens → no grams → untouched
            assert s.n_removed == 0
            continue
        if st.n_dup_spans == 0:
            assert s.n_removed == 0
        else:
            assert s.n_removed >= 13


def test_merge_preserves_group_columns(spark):
    """r03 ADVICE: merging GROUPED sketches must key on the group columns,
    not silently sum/max across groups."""
    from pyspark.sql import functions as F

    from duckdb_nats_jetstream_spark.operators import histsketch as HS
    from duckdb_nats_jetstream_spark.operators import hll as HLL

    df = spark.createDataFrame(
        [("a", float(v)) for v in range(20)]
        + [("b", float(v)) for v in range(40)],
        "grp string, value double",
    )
    half1 = df.filter(F.col("value") < 10)
    half2 = df.filter(F.col("value") >= 10)

    s1 = HS.hist_bins(half1, "value", 0.0, 40.0, 8, "grp")
    s2 = HS.hist_bins(half2, "value", 0.0, 40.0, 8, "grp")
    merged = HS.merge_hist(s1, s2)
    direct = HS.hist_bins(df, "value", 0.0, 40.0, 8, "grp")
    assert set(merged.columns) == {"grp", "bin", "cnt"}
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )

    def grouped_regs(d):
        reg, rank = HLL.register_rank_cols("value")
        return (
            d.filter(F.col("value").isNotNull())
            .select("grp", reg.alias("register"), rank.alias("rank"))
            .groupBy("grp", "register")
            .agg(F.max("rank").alias("max_rank"))
        )

    rm = HLL.merge_registers(grouped_regs(half1), grouped_regs(half2))
    rd = grouped_regs(df)
    assert "grp" in rm.columns
    assert sorted(map(tuple, rm.collect())) == sorted(map(tuple, rd.collect()))


def test_windowed_hll_ignores_null_values(spark):
    """r03 ADVICE: a NULL value row must not poison a window's estimate."""
    import datetime as dt

    from duckdb_nats_jetstream_spark.operators.hll import hll_estimate
    from duckdb_nats_jetstream_spark.streaming.cardinality import (
        batch_windowed_hll_registers,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 30)
    clean = [(t0, f"u{i}") for i in range(50)]
    df_null = spark.createDataFrame(
        clean + [(t0, None)], "ts_nats timestamp, subject string"
    )
    df_clean = spark.createDataFrame(clean, "ts_nats timestamp, subject string")

    regs = batch_windowed_hll_registers(df_null, "subject", "ts_nats", "1 hour")
    assert regs.filter("register IS NULL OR max_rank IS NULL").count() == 0
    # NULLs don't count toward cardinality: sketch with the NULL row must
    # be bit-identical to the sketch without it (raw estimate included —
    # pre-fix, the NULL register row NULLed the harmonic denominator)
    regs_clean = batch_windowed_hll_registers(
        df_clean, "subject", "ts_nats", "1 hour"
    )
    assert sorted(map(tuple, regs.collect())) == sorted(
        map(tuple, regs_clean.collect())
    )
    est = hll_estimate(regs, "window_start").collect()
    assert len(est) == 1 and est[0]["raw_estimate"] is not None
