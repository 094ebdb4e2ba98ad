"""Training-data pipeline queries, batch 4 (round 3, second wave).

The named-technique closers for the curation surface:

- ``dedup_semantic`` / ``dedup_semantic_kmeans`` — SemDeDup (Abbas et al.
  2023) with SRP-bucket and paper-faithful k-means blocking.
- ``docs_chunk_dedup`` — CCNet/RefinedWeb-style chunk-frequency dedup WITH
  document reassembly (the cleaned text, not just an audit number).
- ``sim_kmeans`` — two distributed Lloyd iterations, integer-exact
  quantization so the iterative algorithm is fully SQL-mirrorable.
- ``dedup_incremental`` — incoming batch vs accepted corpus (LSH
  signature-store join, no corpus rescan per batch).
- ``decon_bloom`` — Bloom-sketch decontamination (constant broadcast
  memory, zero false negatives).
- ``text_bpe_merges`` / ``text_bpe_apply`` — BPE tokenizer training on the
  word-frequency table and its word→pieces application join.
- ``docs_train_order`` — the final write-order step: md5 shards +
  curriculum bands + salted in-shard shuffle, no global sort.
- ``text_countmin_topk`` — count-min frequency sketch audited against the
  exact top-k.

Scale notes: every pair search is blocked (bucket/cluster/band keys);
every sketch is constant-size and broadcast; every iterative step runs on
the vocabulary or centroid relation, never re-scanning the corpus — no
shuffle grows super-linearly in corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from duckdb_nats_jetstream_spark.operators import bpe as BPE
from duckdb_nats_jetstream_spark.operators import chunkdedup as CD
from duckdb_nats_jetstream_spark.operators import dedup as D
from duckdb_nats_jetstream_spark.operators import decon as DC
from duckdb_nats_jetstream_spark.operators import kmeans as KM
from duckdb_nats_jetstream_spark.operators import semantic as SD
from duckdb_nats_jetstream_spark.operators import sketch as SK
from duckdb_nats_jetstream_spark.tables import read_table

#: the incoming "batch" for the incremental dedup screen: two of the
#: twenty sources play the freshly crawled slice
_NEW_SOURCES = ("src0", "src1")


def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    return SD.semantic_dedup_pruned(
        read_table(spark, sf_dir, "embeddings"), threshold=0.4, n_bits=6
    )


def docs_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return CD.chunk_dedup(
        read_table(spark, sf_dir, "documents"), chunk_words=8, max_doc_freq=1
    )


def sim_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    return KM.kmeans_cluster_sizes(
        read_table(spark, sf_dir, "embeddings"), k=8
    )


def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incoming-batch (sources src0/src1) vs accepted-corpus near-dup
    screen — the production LSH shape: each new crawl slice is checked
    against the existing training set, never rescanning it per batch."""
    docs = read_table(spark, sf_dir, "documents")
    new = docs.filter(F.col("source").isin(*_NEW_SOURCES))
    ref = docs.filter(~F.col("source").isin(*_NEW_SOURCES))
    return D.incremental_near_dups(new, ref, k=8, band_size=2, threshold=0.2)


def decon_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-sketch benchmark decontamination (same every-50th-doc eval
    split as ``decon_ngram_overlap``): constant broadcast memory in
    benchmark size, zero false negatives, tunable false-positive rate."""
    docs = read_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    train = docs.filter(F.col("doc_id") % 50 != 0)
    return DC.bloom_contamination(train, bench, n=3, n_hashes=3, cell_hex=3)


def text_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three BPE merge rounds on the corpus word-frequency table plus the
    top-10 unmerged-pair frontier — tokenizer-vocabulary induction as a
    pipeline operator (see :mod:`operators.bpe` for the scale analysis)."""
    return BPE.bpe_merge_table(
        read_table(spark, sf_dir, "documents"), rounds=3, top_k=10
    )


def dedup_semantic_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup with the paper's k-means blocking (clusters from the two
    distributed Lloyd iterations) instead of SRP buckets."""
    return SD.semantic_dedup_pruned_kmeans(
        read_table(spark, sf_dir, "embeddings"), threshold=0.4, k=8
    )


def docs_train_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-data ordering: every document gets a shard
    (md5 2-hex prefix → 256 shards), a curriculum band (row-local length
    thresholds — shortest docs first), and a position within its shard
    (band, then salted shuffle key). This is the final write-order step of
    a training pipeline: reproducible global shuffle + curriculum without
    a global sort — the only shuffle is the 256-way shard window, each
    shard sorting corpus/256 rows independently."""
    docs = read_table(spark, sf_dir, "documents")
    shard = F.substring(F.md5(F.concat(F.lit("shard:"), F.col("doc_id"))), 1, 2)
    band = (
        F.when(F.col("n_chars") < 120, 0)
        .when(F.col("n_chars") < 200, 1)
        .otherwise(2)
        .cast("int")
    )
    shuffle_key = F.md5(F.concat(F.lit("order:"), F.col("doc_id")))
    from pyspark.sql import Window as W

    w = W.partitionBy("shard").orderBy("band", "__k", "doc_id")
    return (
        docs.select(
            "doc_id",
            shard.alias("shard"),
            band.alias("band"),
            shuffle_key.alias("__k"),
        )
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .select("doc_id", "shard", "band", "pos")
    )


TRAIN_ORDER_SQL = """
WITH keyed AS (
  SELECT doc_id,
         substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 2) AS shard,
         CAST(CASE WHEN n_chars < 120 THEN 0
                   WHEN n_chars < 200 THEN 1
                   ELSE 2 END AS INT) AS band,
         md5('order:' || CAST(doc_id AS VARCHAR)) AS k
  FROM documents
)
SELECT doc_id, shard, band,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY band, k, doc_id) AS BIGINT) AS pos
FROM keyed
"""


def text_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the 3-round BPE tokenizer to the corpus: per-doc word, char,
    and post-merge token counts (the deployment-side word→pieces lookup
    join; merges never re-run over the corpus)."""
    return BPE.bpe_token_counts(
        read_table(spark, sf_dir, "documents"), rounds=3
    )


def text_countmin_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimates audited against the exact
    top-20 tokens (est >= true always; the sketch's fixed cell grid is the
    constant-memory alternative to a vocabulary-keyed shuffle)."""
    return SK.countmin_estimates(
        read_table(spark, sf_dir, "documents"), depth=3, width_hex=3, top_k=20
    )


_NEW_PRED = "source IN ('src0', 'src1')"

QUERIES = {
    "dedup_semantic": (dedup_semantic, SD.sql_semantic_dedup_pruned(0.4, 6)),
    "docs_chunk_dedup": (docs_chunk_dedup, CD.sql_chunk_dedup(8, 1)),
    "sim_kmeans": (sim_kmeans, KM.sql_kmeans_cluster_sizes(8)),
    "dedup_incremental": (
        dedup_incremental,
        D.sql_incremental_near_dups(_NEW_PRED, 8, 2, 0.2),
    ),
    "decon_bloom": (decon_bloom, DC.sql_bloom_contamination("doc_id % 50 = 0")),
    "text_bpe_merges": (text_bpe_merges, BPE.sql_bpe_merge_table(3, 10)),
    "dedup_semantic_kmeans": (
        dedup_semantic_kmeans,
        SD.sql_semantic_dedup_pruned_kmeans(0.4, 8),
    ),
    "docs_train_order": (docs_train_order, TRAIN_ORDER_SQL),
    "text_bpe_apply": (text_bpe_apply, BPE.sql_bpe_token_counts(3)),
    "text_countmin_topk": (text_countmin_topk, SK.sql_countmin_estimates(3, 3, 20)),
}
