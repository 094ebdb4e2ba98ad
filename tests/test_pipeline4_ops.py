"""Operator-level invariants for the batch-4 pipeline ops (SemDeDup,
chunk-frequency dedup with reassembly, distributed Lloyd k-means)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from duckdb_nats_jetstream_spark.operators import chunkdedup as CD
from duckdb_nats_jetstream_spark.operators import dedup as D
from duckdb_nats_jetstream_spark.operators import kmeans as KM
from duckdb_nats_jetstream_spark.operators import semantic as SD
from duckdb_nats_jetstream_spark.tables import read_table


# --- SemDeDup -----------------------------------------------------------------


def test_semantic_dedup_precision_is_exact(spark, sf_dir):
    """Every pruned id must be the higher id of a TRUE near-dup pair at the
    same threshold: bucketing only reduces recall, never precision (cosine
    inside the bucket is exact)."""
    emb = read_table(spark, sf_dir, "embeddings")
    pruned = {
        r.vec_id
        for r in SD.semantic_dedup_pruned(emb, threshold=0.4, n_bits=6).collect()
    }
    exact_higher = {
        r.id_b
        for r in D.embedding_near_dup_pairs(emb, threshold=0.4).collect()
    }
    assert pruned <= exact_higher
    # and the blocking actually found something at this corpus/threshold
    assert pruned


def test_semantic_dedup_fewer_bits_more_recall(spark, sf_dir):
    """Shrinking the bucket count (fewer bits) can only grow the candidate
    set — monotone recall, the documented dial."""
    emb = read_table(spark, sf_dir, "embeddings")
    p3 = {r.vec_id for r in SD.semantic_dedup_pruned(emb, 0.4, n_bits=3).collect()}
    p6 = {r.vec_id for r in SD.semantic_dedup_pruned(emb, 0.4, n_bits=6).collect()}
    assert p6 <= p3


# --- chunk dedup --------------------------------------------------------------


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_dedup_drops_shared_chunk_keeps_rest(spark):
    shared = " ".join(f"s{i}" for i in range(8))  # one full 8-word chunk
    a_rest = " ".join(f"a{i}" for i in range(8))
    b_rest = " ".join(f"b{i}" for i in range(8))
    df = _docs(
        spark,
        [(1, f"{shared} {a_rest}"), (2, f"{shared} {b_rest}"), (3, "lonely words")],
    )
    out = {r.doc_id: r for r in CD.chunk_dedup(df, chunk_words=8).collect()}
    assert out[1].n_chunks == 2 and out[1].n_dropped == 1
    assert out[2].n_chunks == 2 and out[2].n_dropped == 1
    assert out[1].cleaned_md5 == hashlib.md5(a_rest.encode()).hexdigest()
    assert out[2].cleaned_md5 == hashlib.md5(b_rest.encode()).hexdigest()
    # untouched doc reassembles to its original text byte-for-byte
    assert out[3].n_dropped == 0
    assert out[3].cleaned_md5 == hashlib.md5(b"lonely words").hexdigest()


def test_chunk_dedup_fully_boilerplate_doc_empties(spark):
    same = " ".join(f"w{i}" for i in range(16))
    df = _docs(spark, [(1, same), (2, same)])
    out = {r.doc_id: r for r in CD.chunk_dedup(df, chunk_words=8).collect()}
    for r in out.values():
        assert r.n_dropped == r.n_chunks == 2
        assert r.cleaned_chars == 0
        assert r.cleaned_md5 == hashlib.md5(b"").hexdigest()


def test_chunk_dedup_within_doc_repetition_is_not_boilerplate(spark):
    """A chunk repeated twice INSIDE one doc has doc_freq=1 — kept (that's
    the repetition operator's job, not this one's)."""
    rep = " ".join(f"r{i}" for i in range(8))
    df = _docs(spark, [(1, f"{rep} {rep}"), (2, "other words entirely")])
    out = {r.doc_id: r for r in CD.chunk_dedup(df, chunk_words=8).collect()}
    assert out[1].n_dropped == 0


def test_chunk_dedup_reassembly_preserves_corpus_unique_text(spark, sf_dir):
    """On the real corpus with max_doc_freq high enough to keep everything,
    reassembly must reproduce every document exactly."""
    docs = read_table(spark, sf_dir, "documents").limit(50)
    out = CD.chunk_dedup(docs, chunk_words=8, max_doc_freq=10**9)
    joined = out.join(docs, "doc_id").filter(
        F.md5(F.col("text")) != F.col("cleaned_md5")
    )
    assert joined.count() == 0


# --- distributed k-means ------------------------------------------------------


@pytest.fixture(scope="module")
def km_sizes(spark):
    emb = read_table(spark, "/root/testdata/sf0.01", "embeddings")
    return KM.kmeans_cluster_sizes(emb, k=8).collect()


def test_kmeans_partitions_the_corpus(spark, km_sizes):
    emb = read_table(spark, "/root/testdata/sf0.01", "embeddings")
    n = emb.count()
    assert sum(r.n_iter1 for r in km_sizes) == n
    assert sum(r.n_iter2 for r in km_sizes) == n
    assert {r.cluster for r in km_sizes} <= set(range(8))


def test_kmeans_stayed_bounded_and_update_moves_rows(km_sizes):
    for r in km_sizes:
        assert 0 <= r.n_stayed <= min(r.n_iter1, r.n_iter2)
    # iteration 2 must keep a majority in place (centroids move toward the
    # data) while the seed-init guarantees SOME movement on a real corpus
    stayed = sum(r.n_stayed for r in km_sizes)
    total = sum(r.n_iter2 for r in km_sizes)
    assert stayed > total // 2


def test_kmeans_deterministic(spark):
    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    a = sorted(map(tuple, KM.kmeans_cluster_sizes(emb, k=4).collect()))
    b = sorted(map(tuple, KM.kmeans_cluster_sizes(emb, k=4).collect()))
    assert a == b


# --- bloom decontamination ----------------------------------------------------


def test_bloom_has_no_false_negatives(spark, sf_dir):
    """Every gram the exact operator matches must also be flagged by the
    Bloom screen: n_flagged >= n_matched per document, always."""
    from duckdb_nats_jetstream_spark.operators.decon import (
        bloom_contamination,
        ngram_contamination,
    )

    docs = read_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    train = docs.filter(F.col("doc_id") % 50 != 0)
    exact = {
        r.doc_id: r.n_matched
        for r in ngram_contamination(train, bench, n=3).collect()
    }
    bloom = {
        r.doc_id: r.n_flagged
        for r in bloom_contamination(train, bench, n=3).collect()
    }
    assert set(exact) == set(bloom)
    for d, m in exact.items():
        assert bloom[d] >= m, f"doc {d}: bloom {bloom[d]} < exact {m}"


def test_bloom_fp_rate_shrinks_with_bigger_filter(spark, sf_dir):
    """More cells (larger m) can only reduce flagged counts — the m/k dial."""
    from duckdb_nats_jetstream_spark.operators.decon import bloom_contamination

    docs = read_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    train = docs.filter(F.col("doc_id") % 50 != 0)
    small = {
        r.doc_id: r.n_flagged
        for r in bloom_contamination(train, bench, cell_hex=2).collect()
    }
    big = {
        r.doc_id: r.n_flagged
        for r in bloom_contamination(train, bench, cell_hex=4).collect()
    }
    assert all(big[d] <= small[d] for d in big)


# --- incremental dedup --------------------------------------------------------


def test_incremental_agrees_with_corpus_lsh_cross_pairs(spark, sf_dir):
    """The incremental screen must flag exactly the batch docs that the
    whole-corpus LSH pair query links across the batch/corpus boundary
    (same signatures, same bands, same verification threshold)."""
    docs = read_table(spark, sf_dir, "documents")
    new_src = F.col("source").isin("src0", "src1")
    flagged = {
        r.doc_id
        for r in D.incremental_near_dups(
            docs.filter(new_src), docs.filter(~new_src), threshold=0.2
        ).collect()
    }
    src = {r.doc_id: r.source for r in docs.select("doc_id", "source").collect()}
    cross = set()
    for r in D.minhash_lsh_pairs(docs, threshold=0.2).collect():
        a_new = src[r.id_a] in ("src0", "src1")
        b_new = src[r.id_b] in ("src0", "src1")
        if a_new != b_new:
            cross.add(r.id_a if a_new else r.id_b)
    assert flagged == cross


# --- BPE merge induction ------------------------------------------------------


def test_bpe_greedy_nonoverlap_merge(spark):
    """BPE's left-to-right greedy rule: merging (a,a) on 'aaa' must produce
    symbols [aa, a], so after one round the top remaining pair is 'aa a'."""
    from duckdb_nats_jetstream_spark.operators.bpe import bpe_merge_table

    df = spark.createDataFrame([(1, "aaa aaa aaa")], "doc_id long, text string")
    rows = bpe_merge_table(df, rounds=1, top_k=3).collect()
    by_step = {}
    for r in rows:
        by_step.setdefault(r.step, []).append((r.rank, r.pair, r.n_occ))
    assert by_step[1] == [(1, "a a", 6)]  # two positions x 3 words
    assert by_step[2][0] == (1, "aa a", 3)


def test_bpe_merges_feed_later_rounds(spark):
    """A round-2 pair may be built from a round-1 merged symbol."""
    from duckdb_nats_jetstream_spark.operators.bpe import bpe_merge_table

    df = spark.createDataFrame(
        [(1, "abab abab abab ab")], "doc_id long, text string"
    )
    rows = {(r.step, r.rank): (r.pair, r.n_occ) for r in bpe_merge_table(df, rounds=2).collect()}
    assert rows[(1, 1)] == ("a b", 7)
    assert rows[(2, 1)] == ("ab ab", 3)


# --- property tests (hypothesis) ---------------------------------------------


def _bpe_ref(word_counts: dict[str, int], rounds: int):
    """Pure-Python BPE reference (Sennrich-style, greedy left-to-right
    non-overlapping merges over a word-frequency table)."""
    seqs = {w: list(w) for w in word_counts}
    merges = []
    for _ in range(rounds):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in seqs.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + word_counts[w]
        if not counts:
            break
        # deterministic tie-break: highest count, then pair string ascending
        top_n = max(counts.values())
        best_pair = min(f"{a} {b}" for (a, b), n in counts.items() if n == top_n)
        a, b = best_pair.split(" ", 1)
        merges.append((best_pair, top_n))
        for w, syms in seqs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seqs[w] = out
    return merges


def test_bpe_matches_pure_python_reference(spark):
    from hypothesis import given, settings, strategies as st

    from duckdb_nats_jetstream_spark.operators.bpe import bpe_merge_table

    word = st.text(alphabet="abc", min_size=1, max_size=6)

    @settings(max_examples=15, deadline=None)
    @given(st.lists(word, min_size=1, max_size=12))
    def check(words):
        text = " ".join(words)
        counts: dict[str, int] = {}
        for w in words:
            counts[w] = counts.get(w, 0) + 1
        expected = _bpe_ref(counts, rounds=2)
        rows = bpe_merge_table(
            spark.createDataFrame([(1, text)], "doc_id long, text string"),
            rounds=2,
            top_k=1,
        ).collect()
        got = [(r.pair, r.n_occ) for r in sorted(rows, key=lambda r: r.step) if r.rank == 1 and r.step <= 2]
        assert got == expected, f"{words}: {got} != {expected}"

    check()


def test_chunk_dedup_reassembly_property(spark):
    """For any corpus, with an infinite doc-frequency cap the reassembled
    text equals the original for every document."""
    import hashlib as _h

    from hypothesis import given, settings, strategies as st

    from duckdb_nats_jetstream_spark.operators.chunkdedup import chunk_dedup

    word = st.text(alphabet="xyz", min_size=1, max_size=4)
    doc = st.lists(word, min_size=1, max_size=20).map(" ".join)

    @settings(max_examples=10, deadline=None)
    @given(st.lists(doc, min_size=1, max_size=6))
    def check(texts):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        out = {r.doc_id: r.cleaned_md5 for r in chunk_dedup(df, 3, 10**9).collect()}
        for i, t in enumerate(texts):
            assert out[i] == _h.md5(t.encode()).hexdigest()

    check()


def test_semantic_kmeans_precision_is_exact(spark, sf_dir):
    """Same invariant as the SRP variant: k-means blocking can only lower
    recall, never precision."""
    emb = read_table(spark, sf_dir, "embeddings")
    pruned = {
        r.vec_id
        for r in SD.semantic_dedup_pruned_kmeans(emb, threshold=0.4, k=8).collect()
    }
    exact_higher = {
        r.id_b for r in D.embedding_near_dup_pairs(emb, threshold=0.4).collect()
    }
    assert pruned <= exact_higher and pruned


def test_train_order_positions_dense_and_deterministic(spark, sf_dir):
    from duckdb_nats_jetstream_spark.queries.pipeline4 import docs_train_order

    a = docs_train_order(spark, sf_dir).collect()
    b = docs_train_order(spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    by_shard: dict[str, list[int]] = {}
    bands: dict[str, list[tuple[int, int]]] = {}
    for r in a:
        by_shard.setdefault(r.shard, []).append(r.pos)
        bands.setdefault(r.shard, []).append((r.pos, r.band))
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1))  # dense 1..n
    for shard, pb in bands.items():  # curriculum: bands ascend with pos
        ordered = [b for _, b in sorted(pb)]
        assert ordered == sorted(ordered)


def test_bpe_apply_compresses_monotonically(spark, sf_dir):
    """rounds=0 must give n_tokens == n_chars (character tokenizer); more
    merge rounds can only shrink the token count, never the word count."""
    from duckdb_nats_jetstream_spark.operators.bpe import bpe_token_counts

    docs = read_table(spark, sf_dir, "documents").limit(100)
    r0 = {r.doc_id: r for r in bpe_token_counts(docs, rounds=0).collect()}
    r3 = {r.doc_id: r for r in bpe_token_counts(docs, rounds=3).collect()}
    assert set(r0) == set(r3)
    for d in r0:
        assert r0[d].n_tokens == r0[d].n_chars
        assert r3[d].n_tokens <= r0[d].n_tokens
        assert r3[d].n_words == r0[d].n_words
        assert r3[d].n_chars == r0[d].n_chars


def test_kmeans_small_and_empty_corpus(spark):
    """k larger than the corpus must degrade to one cluster per row (the
    SQL mirror's seeds CTE is naturally bounded — match it), and an empty
    corpus must yield an empty result, not a crash."""
    emb = spark.createDataFrame(
        [(i, [float(i)] * 64) for i in range(3)],
        "vec_id long, embedding array<float>",
    )
    out = sorted(map(tuple, KM.kmeans_cluster_sizes(emb, k=8).collect()))
    assert out == [(0, 1, 1, 1), (1, 1, 1, 1), (2, 1, 1, 1)]
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert KM.kmeans_cluster_sizes(empty, k=8).collect() == []


# --- count-min sketch ---------------------------------------------------------


def test_countmin_never_undercounts_and_width_tightens(spark):
    """With 16 cells (width_hex=1) and 60 distinct tokens, collisions are
    guaranteed: every estimate must still be >= the true count, and a wider
    sketch can only tighten estimates."""
    from duckdb_nats_jetstream_spark.operators.sketch import countmin_estimates

    text = " ".join(f"tok{i}" for i in range(60) for _ in range(i % 5 + 1))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    narrow = {r.token: r for r in countmin_estimates(df, width_hex=1, top_k=60).collect()}
    wide = {r.token: r for r in countmin_estimates(df, width_hex=4, top_k=60).collect()}
    assert any(r.est_n > r.true_n for r in narrow.values())  # collisions happened
    for t, r in narrow.items():
        assert r.est_n >= r.true_n
        assert wide[t].est_n <= r.est_n
        assert wide[t].est_n >= wide[t].true_n


def test_countmin_sketch_is_mergeable(spark, sf_dir):
    """sketch(A ∪ B) must equal the cell-wise SUM of sketch(A) and
    sketch(B) — exactly. This is what lets partial sketches roll up across
    partitions, days, or streaming micro-batches."""
    from duckdb_nats_jetstream_spark.operators.sketch import countmin_sketch

    docs = read_table(spark, sf_dir, "documents")
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)
    whole = {(r.d, r.cell): r.n for r in countmin_sketch(docs).collect()}
    merged: dict = {}
    for half in (a, b):
        for r in countmin_sketch(half).collect():
            merged[(r.d, r.cell)] = merged.get((r.d, r.cell), 0) + r.n
    assert whole == merged


def test_semantic_dedup_auto_bits_follows_recipe(spark, sf_dir):
    """n_bits=None auto-sizes to ceil(log2(N / target_bucket_rows)) — the
    batch-23 recipe that keeps bucket-local O(c^2) work bounded as the
    corpus grows (the r11 two-decade sweep measured e2=1.79 under pinned
    bits vs flat under auto; SCALING batch 35). Auto with the matching
    target must equal the explicitly pinned run exactly."""
    import math

    from duckdb_nats_jetstream_spark.operators import semantic as SD
    from duckdb_nats_jetstream_spark.tables import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    n = emb.count()
    # pick a target that lands on >=2 bits so the test exercises real
    # bucketing, then pin the SAME bit count explicitly: identical output
    target = max(1, n // 8)
    bits = max(1, math.ceil(math.log2(max(n, 2) / target)))
    assert bits >= 2
    auto = sorted(
        (r.vec_id, r.bucket, r.n_dups)
        for r in SD.semantic_dedup_pruned(
            emb, n_bits=None, target_bucket_rows=target
        ).collect()
    )
    pinned = sorted(
        (r.vec_id, r.bucket, r.n_dups)
        for r in SD.semantic_dedup_pruned(emb, n_bits=bits).collect()
    )
    assert auto == pinned and len(auto) > 0


def test_near_dup_auto_blocking_is_execution_only(spark, sf_dir):
    """n_blocks=None auto-derives blocking (r11: the fixed 8 meant a ~5 GB
    per-task cosine matrix at the 100x replica — the same defect knn_join's
    r10 fix removed). Blocking must never change results: auto, pinned-8,
    and pinned-3 are bit-identical."""
    from duckdb_nats_jetstream_spark.operators import dedup as D
    from duckdb_nats_jetstream_spark.tables import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    runs = [
        sorted(
            tuple(r)
            for r in D.embedding_near_dup_pairs(
                emb, threshold=0.4, n_blocks=nb
            ).collect()
        )
        for nb in (None, 8, 3)
    ]
    assert runs[0] == runs[1] == runs[2] and len(runs[0]) > 0


def test_semantic_kmeans_auto_k_follows_recipe(spark, sf_dir):
    """k=None auto-sizes to ceil(N / target_bucket_rows) (floor 2) and must
    equal the explicitly pinned run exactly (k is a recall dial — the auto
    path must be the recipe, nothing else)."""
    import math

    from duckdb_nats_jetstream_spark.operators import semantic as SD
    from duckdb_nats_jetstream_spark.tables import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    n = emb.count()
    target = max(1, n // 4)
    k = max(2, math.ceil(n / target))
    auto = sorted(
        (r.vec_id, r.cluster, r.n_dups)
        for r in SD.semantic_dedup_pruned_kmeans(
            emb, k=None, target_bucket_rows=target
        ).collect()
    )
    pinned = sorted(
        (r.vec_id, r.cluster, r.n_dups)
        for r in SD.semantic_dedup_pruned_kmeans(emb, k=k).collect()
    )
    assert auto == pinned and len(auto) > 0


def test_block_pair_memberships_plan_size_constant_in_n_blocks(spark):
    """r11 ADVICE: the old per-row literal F.array of n_blocks struct
    expressions grew the Catalyst tree (and codegen) linearly with the
    auto-derived block count. The transform(sequence(...)) form must (a)
    produce the identical membership sets and (b) keep the analyzed-plan
    string O(1) as n_blocks grows 100x."""
    from pyspark.sql import functions as F

    from duckdb_nats_jetstream_spark.operators.similarity import (
        block_pair_memberships,
    )

    df = spark.range(40).select((F.col("id") % 7).cast("int").alias("blk"))

    def old_literal(n_blocks):
        return F.array_distinct(
            F.array(
                *[
                    F.struct(
                        F.least(F.col("blk"), F.lit(j)).alias("p"),
                        F.greatest(F.col("blk"), F.lit(j)).alias("q"),
                    )
                    for j in range(n_blocks)
                ]
            )
        )

    for nb in (3, 7, 49):
        a = sorted(
            map(
                tuple,
                df.select(
                    "blk", F.explode(block_pair_memberships(nb)).alias("bp")
                ).select("blk", "bp.p", "bp.q").collect(),
            )
        )
        b = sorted(
            map(
                tuple,
                df.select("blk", F.explode(old_literal(nb)).alias("bp"))
                .select("blk", "bp.p", "bp.q").collect(),
            )
        )
        assert a == b and len(a) > 0

    small = df.select(F.explode(block_pair_memberships(4)).alias("bp"))
    big = df.select(F.explode(block_pair_memberships(400)).alias("bp"))
    ps, pb = (
        x._jdf.queryExecution().analyzed().toString() for x in (small, big)
    )
    assert len(pb) < len(ps) + 50, (len(ps), len(pb))


def test_block_pair_memberships_rejects_nonpositive_n_blocks():
    """r12 ADVICE: sequence(0, -1) is a DESCENDING [0, -1] in Spark, so a
    user-pinned n_blocks=0 used to yield bogus negative block pairs
    silently; it must be a bind-time error."""
    import pytest

    from duckdb_nats_jetstream_spark.errors import BindError
    from duckdb_nats_jetstream_spark.operators.similarity import (
        block_pair_memberships,
    )

    for bad in (0, -1):
        with pytest.raises(BindError, match="n_blocks"):
            block_pair_memberships(bad)
