"""Training-data pipeline queries, batch 4 (round 3, second wave).

Three operators that close the remaining named-technique gaps in the
curation surface:

- ``dedup_semantic`` — SemDeDup (cluster-blocked embedding dedup,
  Abbas et al. 2023): SRP buckets bound the pair search, exact fold-cosine
  inside, keep-lowest-id per duplicate set.
- ``docs_chunk_dedup`` — CCNet/RefinedWeb-style chunk-frequency dedup WITH
  document reassembly (the cleaned text, not just an audit number).
- ``sim_kmeans`` — two distributed Lloyd iterations with an integer-exact
  quantization scheme that makes the iterative algorithm fully
  SQL-mirrorable (assignment argmins cannot flip across engines).

Scale notes: semantic dedup shuffles once on the bucket key (pair explosion
bounded by bucket size); chunk dedup shuffles on the 16-char chunk hash and
then on doc_id; k-means is map-only per assignment plus one k×dim
aggregation per update — no shuffle grows super-linearly in corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from duckdb_nats_jetstream_spark.operators import chunkdedup as CD
from duckdb_nats_jetstream_spark.operators import kmeans as KM
from duckdb_nats_jetstream_spark.operators import semantic as SD
from duckdb_nats_jetstream_spark.session import read_table


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


QUERIES = {
    "dedup_semantic": (dedup_semantic, SD.sql_semantic_dedup_pruned(0.4, 6)),
    "docs_chunk_dedup": (docs_chunk_dedup, CD.sql_chunk_dedup(8, 1)),
    "sim_kmeans": (sim_kmeans, KM.sql_kmeans_cluster_sizes(8)),
}
