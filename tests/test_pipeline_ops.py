"""Invariant tests for the training-data pipeline operators: dedup actually
dedups, MinHash-LSH finds planted near-duplicates, SRP-LSH has sane recall
against the brute-force baseline, text metrics behave."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from duckdb_nats_jetstream_spark.operators import dedup as D
from duckdb_nats_jetstream_spark.operators import similarity as S
from duckdb_nats_jetstream_spark.tables import read_table


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [
        Row(doc_id=1, text=base),
        Row(doc_id=2, text=base),                      # exact duplicate
        Row(doc_id=3, text=base + " again"),           # near duplicate
        Row(doc_id=4, text="completely different words about spark engines and shuffles everywhere"),
        Row(doc_id=5, text="short"),                   # < 3 tokens → no shingles
    ]
    return spark.createDataFrame(rows)


def test_exact_dedup_keeps_min_id(spark, docs):
    out = D.exact_dedup(docs)
    ids = sorted(r.doc_id for r in out.collect())
    assert ids == [1, 3, 4, 5]  # doc 2 removed, representative is min id


def test_exact_dup_groups_counts(spark, docs):
    groups = {r.canonical_id: r.n_docs for r in D.exact_dup_groups(docs).collect()}
    assert groups[1] == 2 and groups[3] == 1


def test_minhash_lsh_finds_planted_near_dup(spark, docs):
    pairs = {(r.id_a, r.id_b): r.jaccard_r for r in D.minhash_lsh_pairs(docs, threshold=0.2).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0     # identical text
    assert (1, 3) in pairs and pairs[(1, 3)] > 0.8      # planted near-dup
    assert not any({a, b} & {4} for a, b in pairs)      # unrelated doc not paired


def test_ngram_jaccard_pairs_unblocked(spark, docs):
    pairs = {(r.id_a, r.id_b): r.jaccard_r for r in D.ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    assert pairs[(1, 2)] == 1.0 and (1, 3) in pairs


def test_ngram_jaccard_merge_hint_same_pairs(spark, sf_dir):
    """The documented escape hatch for the broadcast under-estimate zone
    (see the operator docstring): sort-merge-joining the same blocked
    self-join must produce the identical pair set — the hint changes
    only the physical strategy."""
    from pyspark.sql import functions as F

    from duckdb_nats_jetstream_spark.operators.dedup import (
        jaccard,
        shingles,
        tokens,
    )
    from duckdb_nats_jetstream_spark.tables import read_table, spread

    df = read_table(spark, sf_dir, "documents")
    base = D.ngram_jaccard_pairs(df, block_col="n_chars", threshold=0.05)
    sh = shingles(tokens(F.col("text")), 3)
    docs = (
        spread(df)
        .select(F.col("doc_id"), sh.alias("sh"), F.col("n_chars").alias("blk"))
        .filter(F.size("sh") > 0)
    )
    a, b = docs.alias("a"), docs.hint("merge").alias("b")
    merged = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .withColumn("jac", jaccard(F.col("a.sh"), F.col("b.sh")))
        .filter(F.col("jac") >= 0.05)
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("jac").alias("jaccard_r"),
        )
    )
    plan = merged._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert {tuple(r) for r in base.collect()} == {
        tuple(r) for r in merged.collect()
    }


def test_simhash_identical_docs_equal(spark, docs):
    sh = {r.doc_id: r.simhash for r in D.simhash(docs).collect()}
    assert sh[1] == sh[2]
    assert 0 <= sh[1] < 2**16
    # near-dup should be close in Hamming distance
    ham = bin(sh[1] ^ sh[3]).count("1")
    assert ham <= 4


def test_srp_recall_vs_bruteforce(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    exact = {(r.query_id, r.neighbor_id) for r in S.cosine_topk(emb, 10, 5).collect()}
    approx = {(r.query_id, r.neighbor_id) for r in S.srp_topk(emb, 10, 5, n_bits=2).collect()}
    assert exact and approx
    recall = len(exact & approx) / len(exact)
    # random near-orthogonal vectors: per-bit collision ~0.6 → 2-bit ~0.36;
    # this guards "bucketing isn't degenerate", not a quality bar
    assert recall > 0.1


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    exact = {(r.query_id, r.neighbor_id) for r in S.cosine_topk(emb, 10, 5).collect()}
    approx = {
        (r.query_id, r.neighbor_id)
        for r in S.ivf_topk(emb, 10, 5, n_clusters=8, n_probe=4).collect()
    }
    assert exact and approx
    # probing half the clusters on near-random vectors: expect decent recall
    assert len(exact & approx) / len(exact) > 0.3


def test_cosine_topk_self_excluded_and_ranked(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    out = S.cosine_topk(emb, 3, 5).collect()
    assert all(r.query_id != r.neighbor_id for r in out)
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append((r.rnk, r.cos_r))
    for q, rows in by_q.items():
        rows.sort()
        scores = [s for _, s in rows]
        assert scores == sorted(scores, reverse=True)
        assert [r for r, _ in rows] == list(range(1, len(rows) + 1))


def test_embedding_near_dup_threshold(spark):
    rows = [
        Row(vec_id=1, embedding=[1.0, 0.0, 0.0]),
        Row(vec_id=2, embedding=[0.999, 0.01, 0.0]),   # near-dup of 1
        Row(vec_id=3, embedding=[0.0, 1.0, 0.0]),      # orthogonal
    ]
    df = spark.createDataFrame(rows)
    pairs = {(r.id_a, r.id_b) for r in D.embedding_near_dup_pairs(df, threshold=0.95).collect()}
    assert pairs == {(1, 2)}


def test_embedding_near_dup_no_driver_collect(spark, sf_dir, monkeypatch):
    """The operator must be fully distributed — the r01 design collected the
    whole corpus via toPandas() on the driver (OOM bound at 100 TB). Any
    driver-side materialization now fails the test."""
    from pyspark.sql import DataFrame

    def _boom(self, *a, **k):
        raise AssertionError("driver-side toPandas() in embedding_near_dup_pairs")

    monkeypatch.setattr(DataFrame, "toPandas", _boom)
    emb = read_table(spark, sf_dir, "embeddings")
    out = D.embedding_near_dup_pairs(emb, threshold=0.4)
    assert out.count() >= 0  # executes distributed-only


def test_embedding_near_dup_block_invariance(spark, sf_dir):
    """Blocking must not change the result set or any cosine value: compare
    n_blocks=1 (single all-pairs task) against n_blocks=5 bit-for-bit."""
    emb = read_table(spark, sf_dir, "embeddings").limit(300)
    one = {
        (r.id_a, r.id_b): r.cos_r
        for r in D.embedding_near_dup_pairs(emb, threshold=0.3, n_blocks=1).collect()
    }
    many = {
        (r.id_a, r.id_b): r.cos_r
        for r in D.embedding_near_dup_pairs(emb, threshold=0.3, n_blocks=5).collect()
    }
    assert one == many and len(one) > 0


# --- winnowing fingerprints ---------------------------------------------------


def test_winnow_guarantee_shared_substring(spark):
    """Winnowing's correctness property: documents sharing a substring of
    length >= k + w - 1 MUST share at least one fingerprint (k=8, w=4 →
    any common 11-char run is always detected)."""
    common = "zqxjkvbwpfmygh"  # 14 chars, > k+w-1, unlikely n-gram noise
    rows = [
        Row(doc_id=1, text="aaaa" + common + "bbbb"),
        Row(doc_id=2, text="cccccccc" + common + "dddd"),
        Row(doc_id=3, text="totally unrelated content with no overlap at all!"),
    ]
    df = spark.createDataFrame(rows)
    fps = D.winnow_fingerprints(df, k=8, w=4)
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    assert by_doc[1] & by_doc[2], "shared substring produced no shared fingerprint"
    assert not (by_doc[1] & by_doc[3])


def test_winnow_pairs_rank_planted_duplicate(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [
        Row(doc_id=1, text=base),
        Row(doc_id=2, text=base + " and more trailing words"),
        Row(doc_id=3, text="completely different text about query engines"),
    ]
    out = {
        (r.id_a, r.id_b): r.n_shared
        for r in D.winnow_pairs(spark.createDataFrame(rows), min_shared=2).collect()
    }
    assert (1, 2) in out
    assert (1, 3) not in out and (2, 3) not in out


def test_winnow_matches_pure_python_reference(spark, sf_dir):
    """The Spark column pipeline must agree fingerprint-for-fingerprint
    with an independent pure-Python winnowing implementation."""
    from tests.test_properties import _winnow_ref

    docs = read_table(spark, sf_dir, "documents").limit(40)
    got = {}
    for r in D.winnow_fingerprints(docs).collect():
        got.setdefault(r.doc_id, set()).add(r.fp)
    for row in docs.select("doc_id", "text").collect():
        assert got.get(row.doc_id, set()) == _winnow_ref(row.text), row.doc_id


def test_winnow_short_text_emits_nothing(spark):
    """Documents shorter than k have zero k-grams, hence zero fingerprints.
    Regression: Spark's sequence(1, 0) yields DESCENDING [1, 0], so an
    unguarded gram array emitted a bogus md5(text)-prefix fingerprint for
    short texts while DuckDB's range(1, 1) and the pure-Python reference
    emitted none (r02 ADVICE medium)."""
    from tests.test_properties import _winnow_ref

    rows = [
        Row(doc_id=1, text="abc"),  # len < k
        Row(doc_id=2, text=""),  # empty
        Row(doc_id=3, text="exactly8"),  # len == k: exactly one gram
        Row(doc_id=4, text="a decently long document body for contrast"),
    ]
    got = {}
    for r in D.winnow_fingerprints(spark.createDataFrame(rows), k=8, w=4).collect():
        got.setdefault(r.doc_id, set()).add(r.fp)
    for row in rows:
        assert got.get(row.doc_id, set()) == _winnow_ref(row.text), row.doc_id
    assert 1 not in got and 2 not in got
    assert len(got[3]) == 1


def test_winnow_selectivity(spark, sf_dir):
    """~2/(w+1) of k-grams survive winnowing: the fingerprint relation must
    be materially smaller than the raw k-gram count (density bound)."""
    docs = read_table(spark, sf_dir, "documents").limit(100)
    n_chars = docs.agg(F.sum(F.length(F.lower("text")))).collect()[0][0]
    n_fp = D.winnow_fingerprints(docs, k=8, w=4).count()
    assert n_fp < 0.55 * n_chars  # 2/(4+1)=0.4 expected + dedupe slack


# --- weighted mixture sampling ------------------------------------------------


def test_weighted_mixture_rates_and_determinism(spark, sf_dir):
    from duckdb_nats_jetstream_spark.operators.sampling import (
        weighted_mixture_sample,
    )

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "source")
    rates = {"src0": 1.0, "src1": 0.5, "src2": 0.0}
    out = weighted_mixture_sample(docs, rates, default_rate=0.2)
    counts = {r.source: r.n for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    total = {r.source: r.n for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts["src0"] == total["src0"]          # rate 1.0 keeps all
    assert "src2" not in counts                      # rate 0.0 keeps none
    assert 0 < counts.get("src1", 0) < total["src1"]
    # deterministic: same selection on a rerun
    again = {r.doc_id for r in weighted_mixture_sample(docs, rates, default_rate=0.2).collect()}
    assert again == {r.doc_id for r in out.collect()}


def test_weighted_mixture_null_stratum_takes_default(spark):
    """NULL-group rows are sampled at default_rate, not silently dropped
    (r02 ADVICE: `NULL isin(...)` is NULL → filtered out even at 1.0)."""
    from duckdb_nats_jetstream_spark.operators.sampling import (
        sql_weighted_mixture,
        weighted_mixture_sample,
    )

    rows = [(i, None if i % 2 else "src0") for i in range(1, 21)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept = weighted_mixture_sample(df, {"src0": 1.0}, default_rate=1.0)
    assert kept.count() == 20  # every row survives, NULL stratum included
    none_kept = weighted_mixture_sample(df, {"src0": 1.0}, default_rate=0.0)
    assert none_kept.filter(F.col("source").isNull()).count() == 0
    # SQL mirror agrees row-for-row on the NULL arm
    import duckdb

    con = duckdb.connect()
    con.register("docs", df.toPandas())
    pred = sql_weighted_mixture({"src0": 1.0}, default_rate=1.0)
    assert con.execute(f"SELECT count(*) FROM docs WHERE {pred}").fetchone()[0] == 20


def test_weighted_mixture_quoted_group_name_is_sql_safe(spark):
    """A group name (or salt) containing a single quote is a legal value
    the Spark twin samples normally — the oracle predicate must escape it
    rather than emit broken SQL (r11; same class as retrieval's terms)."""
    import duckdb

    from duckdb_nats_jetstream_spark.operators.sampling import (
        sql_weighted_mixture,
        weighted_mixture_sample,
    )

    rows = [(i, "o'reilly" if i % 2 else "web") for i in range(1, 21)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept = weighted_mixture_sample(df, {"o'reilly": 1.0}, default_rate=0.0)
    assert kept.count() == 10

    con = duckdb.connect()
    con.register("docs", df.toPandas())
    pred = sql_weighted_mixture({"o'reilly": 1.0}, default_rate=0.0)
    assert con.execute(f"SELECT count(*) FROM docs WHERE {pred}").fetchone()[0] == 10


# --- PII redaction ------------------------------------------------------------


def test_pii_redact_patterns(spark):
    from duckdb_nats_jetstream_spark.functions.redact import (
        pii_counts,
        redact_pii,
    )

    rows = [
        Row(i=1, t="mail a.b+c@sub.example.org and 192.168.0.1 or +4915112345678"),
        Row(i=2, t="no pii here, just 1.5 numbers and version 2.0"),
        Row(i=3, t="two mails x@y.io z@w.co and ip 8.8.8.8"),
    ]
    df = spark.createDataFrame(rows)
    c = pii_counts(F.col("t"))
    out = {
        r.i: r
        for r in df.select(
            "i",
            c["email"].alias("e"),
            c["phone"].alias("p"),
            c["ipv4"].alias("ip"),
            redact_pii(F.col("t")).alias("red"),
        ).collect()
    }
    assert (out[1].e, out[1].p, out[1].ip) == (1, 1, 1)
    assert out[1].red == "mail <EMAIL> and <IP> or <PHONE>"
    assert (out[2].e, out[2].p, out[2].ip) == (0, 0, 0)
    assert out[2].red == rows[1].t  # untouched
    assert (out[3].e, out[3].ip) == (2, 1)
    assert "<EMAIL>" in out[3].red and "<IP>" in out[3].red


# --- decontamination ----------------------------------------------------------


def test_ngram_contamination_flags_overlap(spark, docs):
    from duckdb_nats_jetstream_spark.operators.decon import ngram_contamination
    from duckdb_nats_jetstream_spark.plans.explain import (
        assert_broadcast_join,
        assert_no_cartesian,
    )

    bench = docs.filter(F.col("doc_id") == 1)
    train = docs.filter(F.col("doc_id") != 1)
    out = {r.doc_id: r for r in ngram_contamination(train, bench).collect()}
    # doc 2 is an exact copy of the benchmark doc → full contamination
    assert out[2].contam_r == 1.0 and out[2].n_matched == out[2].n_grams
    # doc 3 shares all but its trailing shingles
    assert 0.5 < out[3].contam_r < 1.0
    # doc 4 shares nothing → present with exactly zero
    assert out[4].n_matched == 0 and out[4].contam_r == 0.0
    # doc 5 has < n tokens → no grams → dropped, not divided by zero
    assert 5 not in out
    df = ngram_contamination(train, bench)
    assert_broadcast_join(df)
    assert_no_cartesian(df)


def test_dup_ngram_fraction_and_repetition_bounds(spark):
    from duckdb_nats_jetstream_spark.functions.text import dup_ngram_fraction, tokens
    from pyspark.sql import Row

    rows = [
        Row(doc_id=1, text="a b a b a b a b"),        # heavy 2-gram repetition
        Row(doc_id=2, text="one two three four five six seven eight"),  # all unique
    ]
    df = spark.createDataFrame(rows)
    out = {
        r.doc_id: r.f
        for r in df.select(
            "doc_id", dup_ngram_fraction(tokens(F.col("text")), 2).alias("f")
        ).collect()
    }
    # 7 bigrams, 2 distinct → 5/7 duplicated positions
    assert abs(out[1] - 5 / 7) < 1e-15
    assert out[2] == 0.0


# --- stratified sampling ------------------------------------------------------


def test_stratified_topn_exact_vs_plain_window(spark):
    """Prefiltered plan must select the identical set as the plain window,
    including when the margin is starved (margin tiny → shortfall path)."""
    from duckdb_nats_jetstream_spark.operators.sampling import stratified_hash_topn

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).cast("string").alias("grp")
    )
    plain = stratified_hash_topn(df, "grp", 5, margin=None)
    fast = stratified_hash_topn(df, "grp", 5, margin=4.0)
    starved = stratified_hash_topn(df, "grp", 5, margin=0.01)  # forces shortfall redo
    key = lambda r: (r.grp, r.smp_rank, r.doc_id)  # noqa: E731
    p = sorted(map(key, plain.collect()))
    assert p == sorted(map(key, fast.collect()))
    assert p == sorted(map(key, starved.collect()))
    assert len(p) == 35 and all(rk <= 5 for _, rk, _ in p)


def test_stratified_topn_small_groups_keep_all(spark):
    from duckdb_nats_jetstream_spark.operators.sampling import stratified_hash_topn

    df = spark.range(6).select(
        F.col("id").alias("doc_id"), (F.col("id") % 3).cast("string").alias("grp")
    )
    out = stratified_hash_topn(df, "grp", 10, margin=4.0)
    assert out.count() == 6  # quota exceeds group size → everything kept once


# --- sequence packing ---------------------------------------------------------


def test_pack_sequences_invariants(spark):
    from duckdb_nats_jetstream_spark.operators.packing import pack_sequences

    rows = [(i, t) for i, t in enumerate([100, 100, 100, 700, 50, 50, 200, 400, 399, 2])]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = pack_sequences(df, budget=512, chunk_size=4).collect()
    assert len(out) == len(rows)  # every doc lands in exactly one sequence
    by_seq = {}
    for r in out:
        by_seq.setdefault(r.seq_id, []).append(r.n_tokens)
    for members in by_seq.values():
        # a sequence respects the budget unless it is a single oversize doc
        assert sum(members) <= 512 or len(members) == 1
    # doc 3 (700 tokens > budget) sits alone
    alone = [r.seq_id for r in out if r.doc_id == 3]
    assert len(by_seq[alone[0]]) == 1
    # result is partitioning-invariant (chunking depends only on ids)
    out2 = pack_sequences(df.repartition(7), budget=512, chunk_size=4).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_pack_sequences_null_size_is_zero_width(spark):
    """A NULL token count must not kill the task (int(NaN) — the null
    crash class, r10 review): the doc packs zero-width into the current
    bin and keeps its row with a NULL size."""
    from duckdb_nats_jetstream_spark.operators.packing import pack_sequences

    rows = [(0, 300), (1, None), (2, 200), (3, 300)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = {r.doc_id: r for r in pack_sequences(df, budget=512, chunk_size=10).collect()}
    assert len(out) == 4
    assert out[1].n_tokens is None
    # zero-width doc 1 stays in doc 0's bin; 300+200 fits; doc 3 overflows
    assert out[0].seq_id == out[1].seq_id == out[2].seq_id
    assert out[3].seq_id == out[0].seq_id + 1


def test_pack_sequences_greedy_boundaries(spark):
    from duckdb_nats_jetstream_spark.operators.packing import pack_sequences

    # exact-fit boundary: fill + n == budget stays in the same bin
    df = spark.createDataFrame(
        [(0, 256), (1, 256), (2, 1)], "doc_id long, n_tokens long"
    )
    out = {r.doc_id: r.seq_id for r in pack_sequences(df, budget=512, chunk_size=100).collect()}
    assert out[0] == out[1]  # 256+256 == budget → same sequence
    assert out[2] != out[0]  # next doc overflows → new sequence


def test_winsorize_clips_to_group_quantiles(spark):
    from duckdb_nats_jetstream_spark.operators.winsorize import winsorize

    rows = [("a", v) for v in [1, 2, 3, 4, 100]] + [("b", v) for v in [10, 20, 30]]
    df = spark.createDataFrame(rows, "k string, x long")
    out = {(r.k, r.x): (r.w, r._clipped) for r in winsorize(df, "x", ["k"], 0.25, 0.75).collect()}
    # group a: quantile_cont(.25)=2.0, (.75)=4.0 over [1,2,3,4,100]
    assert out[("a", 1)] == (2.0, 1)
    assert out[("a", 3)] == (3.0, 0)
    assert out[("a", 100)] == (4.0, 1)
    # group b: (.25)=15.0, (.75)=25.0 over [10,20,30]
    assert out[("b", 10)] == (15.0, 1)
    assert out[("b", 20)] == (20.0, 0)
    assert out[("b", 30)] == (25.0, 1)
    # all input columns preserved, row count unchanged
    assert len(out) == len(rows)


def test_winsorize_rejects_bad_bounds(spark):
    import pytest as _pytest

    from duckdb_nats_jetstream_spark.operators.winsorize import winsorize

    df = spark.createDataFrame([("a", 1)], "k string, x long")
    with _pytest.raises(ValueError):
        winsorize(df, "x", ["k"], 0.9, 0.1)
    with _pytest.raises(ValueError):
        winsorize(df, "x", ["k"], -0.1, 0.5)
    with _pytest.raises(ValueError):
        winsorize(df, "x", ["k"], 0.1, 0.9, bounds_path="sketch")


def test_winsorize_rank_bounds_bit_parity(spark):
    """bounds_path='rank' (batch-20 scale path) must be bit-identical to the
    default percentile agg — including ties, NULL values, and an all-NULL
    key (NULL bounds → NULL clip on both paths)."""
    from duckdb_nats_jetstream_spark.operators.winsorize import winsorize

    rows = (
        [("a", v) for v in [1, 2, 3, 4, 100]]
        + [("b", v) for v in [10, 20, 30]]
        + [("t", 7), ("t", 7), ("t", 7)]      # ties: lo == hi order stat
        + [("n", None), ("n", None)]           # all-NULL-value key
        + [("m", 5), ("m", None), ("m", 9)]    # mixed NULLs inside a key
        + [(None, 42), (None, 43)]             # NULL keys: equi-join drops
    )
    df = spark.createDataFrame(rows, "k string, x long")

    def snap(out):
        def none_safe(t):
            return tuple((v is None, v if v is not None else 0) for v in t)

        return sorted(
            ((r.k, r.x, r.w, r._clipped) for r in out.collect()), key=none_safe
        )

    agg = snap(winsorize(df, "x", ["k"], 0.25, 0.75))
    rank = snap(winsorize(df, "x", ["k"], 0.25, 0.75, bounds_path="rank"))
    assert agg == rank
    # row-preserving for non-NULL keys; NULL-key rows dropped on BOTH paths
    # (documented equi-join semantics)
    assert len(agg) == len(rows) - 2


def test_winsorize_rank_requires_single_key(spark):
    import pytest as _pytest

    from duckdb_nats_jetstream_spark.errors import BindError
    from duckdb_nats_jetstream_spark.operators.winsorize import winsorize

    df = spark.createDataFrame([("a", "x", 1)], "k string, k2 string, x long")
    with _pytest.raises(BindError, match="single key"):
        winsorize(df, "x", ["k", "k2"], 0.25, 0.75, bounds_path="rank")


# --- round-3 operators: quantization, centroids, gopher rules, df cap ---------


def test_quantize_int8_error_bound_and_zero_guard(spark):
    """Reconstruction error is bounded by scale/2 per cell; a zero vector
    quantizes to zeros (scale guard), never NaN."""
    from duckdb_nats_jetstream_spark.operators.similarity import quantize_int8

    rows = [
        Row(vec_id=1, embedding=[0.5, -1.0, 0.25, 0.0]),
        Row(vec_id=2, embedding=[0.0, 0.0, 0.0, 0.0]),  # zero vector
        Row(vec_id=3, embedding=[127.0, -127.0, 1.0, -1.0]),
    ]
    out = {r.vec_id: r for r in quantize_int8(spark.createDataFrame(rows)).collect()}
    for r in out.values():
        assert r.err_max == r.err_max  # not NaN
        assert r.err_max <= r.scale / 2 + 1e-15
    assert out[2].scale == 1.0 and out[2].err_max == 0.0 and out[2].n_sat == 0
    assert out[3].n_sat == 2  # the two max-magnitude cells saturate


def test_bucket_centroids_partition_invariant(spark, sf_dir):
    """The fixed-point mean must be BIT-identical regardless of input
    partitioning — the property float sums don't have and the oracle gate
    needs."""
    from duckdb_nats_jetstream_spark.operators.similarity import bucket_centroids

    emb = read_table(spark, sf_dir, "embeddings")
    a = {(r.bucket, r.pos): (r.c, r.n) for r in bucket_centroids(emb).collect()}
    b = {
        (r.bucket, r.pos): (r.c, r.n)
        for r in bucket_centroids(emb.repartition(17)).collect()
    }
    assert a == b
    # centroid of a bucket with n vectors averages n values per position
    assert all(n >= 1 for _c, n in a.values())


def test_gopher_filters_rules(spark):
    """Each rule trips on its designed violation; keep is the conjunction."""
    from duckdb_nats_jetstream_spark.queries.pipeline3 import text_gopher_filters
    import duckdb_nats_jetstream_spark.queries.pipeline3 as P3

    # build a tiny documents table on the fly via a temp sf_dir
    import pandas as pd

    good = (
        "the quick brown fox jumps over a lazy dog while rivers flow "
        "and stars shine brightly tonight beyond those quiet hills"
    )
    rows = [
        (1, good),  # passes everything (no repetition, stopwords present)
        (2, "short text only"),  # fails token floor
        (3, "the " + "verylongtokenxxxxxxxxxxxx " * 30),  # fails mean length
        (4, "the spark " * 15),  # fails the duplicate-bigram ceiling
    ]
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(
            os.path.join(d, "documents.parquet")
        )
        out = {r.doc_id: r for r in text_gopher_filters(spark, d).collect()}
    assert out[1].keep == 1
    assert out[2].pass_len == 0 and out[2].keep == 0
    assert out[3].pass_word_len == 0 and out[3].keep == 0
    assert out[4].pass_rep == 0 and out[4].keep == 0
    assert all(r.pass_alpha == 1 for r in out.values())  # all-lowercase corpora


def test_winnow_df_cap_drops_hot_fingerprints(spark):
    """With a df cap, fingerprints shared by more than cap documents stop
    generating pairs; capped pairs are a subset of uncapped pairs."""
    boiler = "this exact license header appears in every single document here"
    rows = [Row(doc_id=i, text=f"{boiler} unique tail {i} {'x' * (i % 5)}") for i in range(1, 9)]
    df = spark.createDataFrame(rows)
    uncapped = {
        (r.id_a, r.id_b) for r in D.winnow_pairs(df, min_shared=1).collect()
    }
    capped = {
        (r.id_a, r.id_b)
        for r in D.winnow_pairs(df, min_shared=1, df_cap=3).collect()
    }
    assert capped <= uncapped
    assert len(capped) < len(uncapped)  # the boilerplate fps were hot (df=8)


def test_winnow_pairs_capped_by_default():
    """The hot-fingerprint cap is the DEFAULT (r08 verdict: the uncapped
    self-join measured exponent 1.90 / 34 GB peak task memory at the 10×
    replica); uncapped is an explicit ``df_cap=None`` opt-out."""
    import inspect

    default = inspect.signature(D.winnow_pairs).parameters["df_cap"].default
    assert default == D.DEFAULT_WINNOW_DF_CAP
    assert default is not None and default >= 64  # bounded, but not absurdly tight


def test_dup_span_stats_flags_shared_spans(spark):
    """A 13-token span shared verbatim by two docs marks exactly those span
    positions; a doc with no shared spans reports dup_frac 0; docs shorter
    than 13 tokens are omitted."""
    from duckdb_nats_jetstream_spark.operators.dedup import dup_span_stats

    span = "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu nu"
    rows = [
        Row(doc_id=1, text=span + " tail one here"),
        Row(doc_id=2, text="head two there " + span),
        Row(
            doc_id=3,
            text=(
                "one two three four five six seven eight nine ten eleven "
                "twelve thirteen fourteen fifteen"
            ),
        ),  # 15 unique tokens, no overlap with the shared span
        Row(doc_id=4, text="too short"),
    ]
    out = {r.doc_id: r for r in dup_span_stats(spark.createDataFrame(rows)).collect()}
    assert 4 not in out  # < 13 tokens → no spans
    assert out[1].n_dup_spans >= 1 and out[2].n_dup_spans >= 1
    assert out[3].n_dup_spans == 0 and out[3].dup_frac == 0.0
    for r in out.values():
        assert 0.0 <= r.dup_frac <= 1.0 and r.n_dup_spans <= r.n_spans


# --- knn_join (exact k-NN self-join) ------------------------------------------


@pytest.fixture(scope="module")
def vecs(spark):
    import hashlib

    rows = []
    for i in range(40):
        v = [
            (int(hashlib.md5(f"{i}:{j}".encode()).hexdigest()[:8], 16) / 2**32)
            - 0.5
            for j in range(8)
        ]
        rows.append(Row(vec_id=i, embedding=v))
    return spark.createDataFrame(rows)


def test_knn_join_matches_brute_force(spark, vecs):
    from duckdb_nats_jetstream_spark.operators.similarity import (
        _prep, _rank_topk, _scored_pairs,
    )

    base = _prep(vecs, "embedding", "vec_id", dim=8)
    brute = _rank_topk(_scored_pairs(base, base, "vec_id", dim=8), 3)
    got = S.knn_join(vecs, k=3, n_blocks=3, dim=8)
    b = {(r.query_id, r.rnk): r.neighbor_id for r in brute.collect()}
    g = {(r.query_id, r.rnk): r.neighbor_id for r in got.collect()}
    assert g == b and len(g) == 40 * 3


def test_knn_join_block_count_invariant(spark, vecs):
    one = sorted(map(tuple, S.knn_join(vecs, k=2, n_blocks=1, dim=8).collect()))
    four = sorted(map(tuple, S.knn_join(vecs, k=2, n_blocks=4, dim=8).collect()))
    assert one == four


def test_knn_join_tiny_corpus_fewer_than_k(spark):
    df = spark.createDataFrame(
        [Row(vec_id=1, embedding=[1.0, 0.0]), Row(vec_id=2, embedding=[0.5, 0.5])]
    )
    out = S.knn_join(df, k=5, n_blocks=2, dim=2).collect()
    # each vector has exactly one real neighbor; no -inf self rows leak
    assert sorted((r.query_id, r.neighbor_id, r.rnk) for r in out) == [
        (1, 2, 1), (2, 1, 1),
    ]


# --- segment boilerplate ------------------------------------------------------


def test_segment_boilerplate_flags_shared_segments(spark):
    from duckdb_nats_jetstream_spark.operators.boilerplate import (
        segment_boilerplate_stats,
    )

    shared = "all rights reserved click here"  # exactly one 5-word segment
    rows = [
        Row(doc_id=1, text=shared + " unique alpha beta gamma delta"),
        Row(doc_id=2, text=shared + " other words entirely different here"),
        Row(doc_id=3, text="no repeated content in this document at all"),
        Row(doc_id=4, text="tiny"),  # < w words → absent from output
    ]
    out = {
        r.doc_id: r
        for r in segment_boilerplate_stats(spark.createDataFrame(rows)).collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[1].n_segments == 2 and out[1].n_boiler == 1
    assert out[2].n_boiler == 1 and out[2].boiler_frac == 0.5
    assert out[3].n_boiler == 0 and out[3].boiler_frac == 0.0


# --- char diversity -----------------------------------------------------------


def test_char_diversity_bounds_and_edges(spark):
    from duckdb_nats_jetstream_spark.functions.text import char_diversity

    rows = [
        Row(doc_id=1, text="aaaa"),        # single char → 0
        Row(doc_id=2, text="abab"),        # two equal chars → 1 - 2*(1/2)^2 = 0.5
        Row(doc_id=3, text=""),            # empty → 0 by convention
        Row(doc_id=4, text="abcd"),        # uniform → 1 - 4*(1/16) = 0.75
    ]
    out = {
        r.doc_id: r.s
        for r in spark.createDataFrame(rows)
        .select("doc_id", char_diversity(F.col("text")).alias("s"))
        .collect()
    }
    assert out[1] == 0.0 and out[2] == 0.5 and out[3] == 0.0 and out[4] == 0.75


# --- prefix containment / snapshot diff ---------------------------------------


def test_prefix_containment_finds_truncation(spark):
    long = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    rows = [
        Row(doc_id=1, text=long),
        Row(doc_id=2, text=long[:40]),            # truncated copy
        Row(doc_id=3, text=long),                 # exact duplicate of 1
        Row(doc_id=4, text="entirely different prefix that matches nothing here"),
        Row(doc_id=5, text="tiny"),               # < 32 chars → excluded
    ]
    pairs = {
        (r.id_short, r.id_long)
        for r in D.prefix_containment_pairs(spark.createDataFrame(rows)).collect()
    }
    # 2 is a prefix of both 1 and 3; equal texts 1/3 pair once in id order
    assert pairs == {(2, 1), (2, 3), (1, 3)}


def test_snapshot_diff_statuses(spark):
    from duckdb_nats_jetstream_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame(
        [Row(doc_id=1, text="a"), Row(doc_id=2, text="b"), Row(doc_id=3, text="c")]
    )
    new = spark.createDataFrame(
        [Row(doc_id=2, text="b"), Row(doc_id=3, text="c2"), Row(doc_id=4, text="d")]
    )
    got = {r.doc_id: r.status for r in snapshot_diff(old, new).collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}


def test_snapshot_diff_null_content_is_presence_not_absence(spark):
    """md5(NULL) is NULL: presence must come from marker columns, and the
    digest compare must be null-safe (r10 review sweep). NULL->text is
    'changed', text->NULL is 'changed', NULL->NULL is 'unchanged'."""
    from duckdb_nats_jetstream_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame(
        [
            Row(doc_id=1, text=None),
            Row(doc_id=2, text="x"),
            Row(doc_id=3, text=None),
        ]
    )
    new = spark.createDataFrame(
        [
            Row(doc_id=1, text="x"),
            Row(doc_id=2, text=None),
            Row(doc_id=3, text=None),
        ]
    )
    got = {r.doc_id: r.status for r in snapshot_diff(old, new).collect()}
    assert got == {1: "changed", 2: "changed", 3: "unchanged"}


def test_snapshot_diff_sql_mirror_agrees_on_null_content(spark):
    import duckdb

    from duckdb_nats_jetstream_spark.operators.cdc import sql_snapshot_diff

    con = duckdb.connect()
    con.execute("CREATE TABLE snap_old(doc_id BIGINT, text VARCHAR)")
    con.execute("CREATE TABLE snap_new(doc_id BIGINT, text VARCHAR)")
    con.execute("INSERT INTO snap_old VALUES (1, NULL), (2, 'x'), (3, NULL)")
    con.execute("INSERT INTO snap_new VALUES (1, 'x'), (2, NULL), (3, NULL)")
    sql = sql_snapshot_diff("SELECT * FROM snap_old", "SELECT * FROM snap_new")
    got = dict(con.execute(f"SELECT doc_id, status FROM ({sql})").fetchall())
    assert got == {1: "changed", 2: "changed", 3: "unchanged"}


def test_leakage_safe_split_is_component_atomic(spark, sf_dir):
    from duckdb_nats_jetstream_spark.queries.pipeline3 import (
        docs_leakage_safe_split,
    )

    rows = docs_leakage_safe_split(spark, sf_dir).collect()
    by_grp = {}
    for r in rows:
        by_grp.setdefault(r.grp, set()).add(r.split)
    assert all(len(s) == 1 for s in by_grp.values())  # no component spans splits
    mix = {s: sum(1 for r in rows if r.split == s) for s in ("train", "val", "test")}
    n = len(rows)
    assert mix["train"] > 0.6 * n and mix["val"] > 0 and mix["test"] > 0


def test_fuzzy_key_pairs_blocking_complete(spark):
    from duckdb_nats_jetstream_spark.operators.fuzzy import fuzzy_key_pairs

    rows = [
        Row(s="events.click.u12"),
        Row(s="events.click.u13"),     # substitution
        Row(s="events.click.u1"),      # deletion
        Row(s="events.click.u123"),    # insertion vs u12
        Row(s="events.view.u12"),      # distance 2+ from all click ones
        Row(s="events.click.u12"),     # duplicate input row
    ]
    got = {(r.s_a, r.s_b) for r in fuzzy_key_pairs(spark.createDataFrame(rows), "s").collect()}
    assert got == {
        ("events.click.u12", "events.click.u13"),
        ("events.click.u1", "events.click.u12"),
        ("events.click.u1", "events.click.u13"),
        ("events.click.u12", "events.click.u123"),
        ("events.click.u123", "events.click.u13"),  # delete the '2'
    }


def test_stratified_topn_null_stratum_sampled_on_both_paths(spark):
    """The NULL stratum is data too (module policy): the margin prefilter
    path must return exactly what the plain-window path returns for it,
    not silently drop it (r10 review sweep)."""
    from duckdb_nats_jetstream_spark.operators.sampling import (
        stratified_hash_topn,
    )

    rows = [Row(doc_id=i, grp=(None if i % 3 == 0 else f"g{i % 3}")) for i in range(90)]
    df = spark.createDataFrame(rows)
    plain = stratified_hash_topn(df, "grp", 5, margin=None)
    fast = stratified_hash_topn(df, "grp", 5, margin=4.0)
    starved = stratified_hash_topn(df, "grp", 5, margin=0.01)

    def rows(d):  # null-safe sort key for the NULL stratum
        return sorted(
            ((r.grp, r.doc_id) for r in d.collect()),
            key=lambda t: (t[0] is not None, t[0] or "", t[1]),
        )

    p = rows(plain)
    assert rows(fast) == p
    assert rows(starved) == p
    assert sum(1 for g, _ in p if g is None) == 5


def test_stratified_topn_reserved_columns_rejected(spark):
    import pytest

    from duckdb_nats_jetstream_spark.operators.sampling import (
        stratified_hash_topn,
    )

    df = spark.createDataFrame([Row(doc_id=1, grp="a", __gk="boom")])
    with pytest.raises(ValueError, match="reserved"):
        stratified_hash_topn(df, "grp", 5)


def test_pack_sequences_duplicate_ids_fail_loud(spark):
    """Duplicate ids overflow a chunk's bin space and would silently
    cross-assign documents between chunks — must raise (r10 sweep)."""
    from duckdb_nats_jetstream_spark.operators.packing import pack_sequences

    df = spark.createDataFrame(
        [Row(doc_id=1, n_tokens=10)] * 9, "doc_id long, n_tokens long"
    )
    with pytest.raises(Exception, match="chunk_size"):
        pack_sequences(df, budget=512, chunk_size=4).collect()
