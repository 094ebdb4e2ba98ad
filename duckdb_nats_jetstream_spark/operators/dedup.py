"""Deduplication operators for training-data pipelines (north-star surface):
exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

All pure DataFrame compositions — shuffles only on the blocking/bucket keys,
which is the scale path: at 100 TB the LSH band join shuffles only
(doc_id, band_key) pairs plus shingle arrays, never all-pairs.

Float discipline: Jaccard and cosine are exact integer ratios / ordered
folds (see ``functions.text`` / ``functions.vector``), so the DuckDB oracle
mirrors match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from duckdb_nats_jetstream_spark.functions.text import (
    fingerprint,
    jaccard,
    shingles,
    tokens,
)


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (min id) per exact normalized-content match.
    One shuffle (window by fingerprint); no join."""
    w = W.partitionBy("__fp").orderBy(id_col)
    return (
        df.withColumn("__fp", fingerprint(F.col(text_col)))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__fp", "__rn")
    )


def exact_dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Content-hash groups: canonical id + member count per distinct content."""
    return (
        df.withColumn("fp", fingerprint(F.col(text_col)))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count("*").alias("n_docs"),
        )
    )


def _with_shingles(df: DataFrame, text_col: str, id_col: str, n: int = 3) -> DataFrame:
    from duckdb_nats_jetstream_spark.session import spread

    sh = shingles(tokens(F.col(text_col)), n)
    # tokenize+shingle is the expensive per-row stage of every shingle-based
    # dedup — spread first so a few-file input doesn't serialize it
    return spread(df).select(F.col(id_col), sh.alias("sh")).filter(F.size("sh") > 0)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    band_size: int = 2,
    threshold: float = 0.2,
    n: int = 3,
) -> DataFrame:
    """MinHash + LSH banding near-duplicate pairs.

    shingle → k-seed min-hash signature → k/band_size band keys → self-join
    on band key (the only shuffle proportional to corpus size) → exact
    Jaccard verification of candidates. Returns (id_a, id_b, jaccard_r).
    """
    from duckdb_nats_jetstream_spark.functions.text import _hex_slice, _seeded_md5

    # cache the shingled docs: they feed the signature pipeline AND the two
    # candidate-verification joins — without this the whole tokenize+shingle
    # stage recomputes three times
    docs = _with_shingles(df, text_col, id_col, n).persist()
    # materialize the salted digest arrays once; each 32-char digest yields
    # four 32-bit signature slices (4× less hashing than one md5 per seed)
    n_digests = (k + 3) // 4
    withd = docs.select(
        id_col,
        "sh",
        *[
            F.transform(F.col("sh"), _seeded_md5(d)).alias(f"dg_{d}")
            for d in range(n_digests)
        ],
    )
    sig_cols = []
    for d in range(n_digests):
        for j in range(4):
            if len(sig_cols) == k:
                break
            sig_cols.append(
                F.array_min(
                    F.transform(F.col(f"dg_{d}"), _hex_slice(j * 8 + 1))
                ).alias(f"sig_{len(sig_cols)}")
            )
    sigs = withd.select(id_col, "sh", *sig_cols)
    n_bands = k // band_size
    band_keys = [
        F.md5(
            F.concat_ws(
                "|",
                F.lit(str(b)),
                *[F.col(f"sig_{b * band_size + j}") for j in range(band_size)],
            )
        ).alias("band_key")
        for b in range(n_bands)
    ]
    # Shuffle only (id, band_key) through the self-join — never the shingle
    # arrays. Candidate pairs are few; their shingles come back via two
    # broadcast joins against the (small relative to the log) docs relation.
    banded = sigs.select(id_col, F.explode(F.array(*band_keys)).alias("band_key"))
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    sh_a = docs.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    sh_b = docs.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    out = (
        cand.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .withColumn("jac", jaccard(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jac") >= threshold)
        .select("id_a", "id_b", F.col("jac").alias("jaccard_r"))
    )
    # release the shingle cache once the result is materialized; blocking=False
    # so a consumer that hasn't run yet just recomputes
    out = out.localCheckpoint(eager=True)
    docs.unpersist(blocking=False)
    return out


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: str | None = None,
    threshold: float = 0.05,
    n: int = 3,
) -> DataFrame:
    """Blocked pairwise n-gram Jaccard. ``block_col`` bounds the pair
    explosion (at scale, block on an LSH bucket or length band — never
    all-pairs). Returns (id_a, id_b, jaccard_r)."""
    from duckdb_nats_jetstream_spark.session import spread

    sh = shingles(tokens(F.col(text_col)), n)
    cols = [F.col(id_col), sh.alias("sh")]
    if block_col is not None:
        cols.append(F.col(block_col).alias("blk"))
    docs = spread(df).select(*cols).filter(F.size("sh") > 0)
    a, b = docs.alias("a"), docs.alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    if block_col is not None:
        cond = (F.col("a.blk") == F.col("b.blk")) & cond
    return (
        a.join(b, cond)
        .withColumn("jac", jaccard(F.col("a.sh"), F.col("b.sh")))
        .filter(F.col("jac") >= threshold)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("jac").alias("jaccard_r"),
        )
    )


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 16) -> DataFrame:
    """Per-document SimHash: bit j is the sign of the ±1 majority vote over
    tokens, where token bit j = parity of hex digit j of md5(token) (each
    token hashed once, digits reused across bits). Integer math only —
    exactly mirrorable in SQL. Returns (id, simhash)."""
    from duckdb_nats_jetstream_spark.session import spread

    hashed = spread(df).select(
        F.col(id_col),
        F.transform(tokens(F.col(text_col)), F.md5).alias("hs"),
    )
    def _bit_vote(j: int):
        # single-arg closure — a 2-arg lambda would receive the array index
        return lambda h: F.when(
            F.ascii(F.substring(h, j + 1, 1)) % 2 == 1, F.lit(1)
        ).otherwise(F.lit(-1))

    bit_cols = []
    for j in range(bits):
        vote = F.aggregate(
            F.transform(F.col("hs"), _bit_vote(j)),
            F.lit(0),
            lambda acc, v: acc + v,
        )
        bit_cols.append(F.when(vote > 0, F.lit(2**j)).otherwise(F.lit(0)))
    sim = bit_cols[0]
    for c in bit_cols[1:]:
        sim = sim + c
    return hashed.select(F.col(id_col), sim.cast("long").alias("simhash"))


def sql_simhash(md5_list_expr: str, bits: int = 16) -> str:
    """DuckDB mirror of :func:`simhash` over a token-md5-list expression."""
    parts = []
    for j in range(bits):
        vote = (
            f"list_reduce(list_prepend(0, list_transform({md5_list_expr}, "
            f"h -> CASE WHEN ascii(substr(h, {j + 1}, 1)) % 2 = 1 "
            f"THEN 1 ELSE -1 END)), (acc, v) -> acc + v)"
        )
        parts.append(f"CASE WHEN {vote} > 0 THEN {2**j} ELSE 0 END")
    return "CAST(" + " + ".join(parts) + " AS BIGINT)"


def embedding_near_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.8,
) -> DataFrame:
    """All-pairs cosine near-duplicates.

    Executed as a broadcast-corpus block product: the corpus matrix is
    broadcast to every task; each Arrow batch of rows computes its cosine
    block against the corpus with the fold-exact numpy kernel
    (``functions.vector_np``) and emits only (id_a < id_b, cos >= threshold)
    pairs. This is ~30× faster than a pair-join with per-pair column folds
    (measured 41s → ~1s at 2000 vectors) and produces bit-identical values.

    Scale path: the broadcast side holds the corpus (64-dim float32 ≈ 256 MB
    per million vectors) — beyond a few million vectors, pre-bucket with
    ``operators.similarity.with_srp_bucket`` and run this per bucket.
    Returns (id_a, id_b, cos_r).
    """
    import numpy as np

    from duckdb_nats_jetstream_spark.functions.vector_np import (
        fold_gram,
        fold_norms,
    )

    spark = df.sparkSession
    corpus = df.select(id_col, vec_col).toPandas()
    corpus_ids = corpus[id_col].to_numpy()
    corpus_m = np.stack(corpus[vec_col].to_numpy()).astype(np.float64)
    corpus_norms = fold_norms(corpus_m)
    bc = spark.sparkContext.broadcast((corpus_ids, corpus_m, corpus_norms))

    def blocks(it):
        import pandas as pd

        c_ids, c_m, c_n = bc.value
        for pdf in it:
            if pdf.empty:
                continue
            a_ids = pdf[id_col].to_numpy()
            a_m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            cos = fold_gram(a_m, c_m) / np.outer(fold_norms(a_m), c_n)
            # keep id_a < id_b above threshold
            mask = (a_ids[:, None] < c_ids[None, :]) & (cos >= threshold)
            ai, bj = np.nonzero(mask)
            yield pd.DataFrame(
                {
                    "id_a": a_ids[ai],
                    "id_b": c_ids[bj],
                    "cos_r": cos[ai, bj],
                }
            )

    from duckdb_nats_jetstream_spark.session import spread

    out_schema = "id_a long, id_b long, cos_r double"
    return spread(df.select(id_col, vec_col)).mapInPandas(blocks, out_schema)
