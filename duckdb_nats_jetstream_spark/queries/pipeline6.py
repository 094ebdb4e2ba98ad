"""Training-data pipeline queries, batch 6 (round 10): retrieval.

- ``text_bm25_topk`` — BM25 relevance ranking of the document corpus
  against a fixed query term set (one rare discriminative term, two
  common ones). Map-only scoring + a single-row broadcast stats join +
  TakeOrderedAndProject top-k — see :mod:`operators.retrieval` for the
  scale analysis and the rational-idf cross-engine exactness note.
- ``sim_hybrid_rrf`` — hybrid retrieval: reciprocal-rank fusion (Cormack
  et al., SIGIR 2009) of the BM25 lexical candidate list with the exact
  cosine vector candidate list around document 0 (``documents.doc_id``
  and ``embeddings.vec_id`` are aligned in the fixtures). The fusion
  join runs over two bounded top-100 lists, so the corpus-sized work
  stays inside the two candidate generators.

The reference engine has no retrieval surface (its relational host would
run the same shapes through SQL); these extend the LLM-pipeline operator
family in SURVEY §2's north-star block.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_nats_jetstream_spark.functions.vector import sql_dot
from duckdb_nats_jetstream_spark.operators import retrieval as R
from duckdb_nats_jetstream_spark.operators import similarity as S
from duckdb_nats_jetstream_spark.tables import read_table

#: One rare, discriminative term ('dup' marks the planted duplicate docs in
#: the fixtures — high idf) plus two common terms; exercises both ends of
#: the idf range without leaving the fixture vocabulary.
_QUERY_TERMS = ["dup", "vector", "join"]


def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 documents by BM25 against the fixed query term set."""
    docs = read_table(spark, sf_dir, "documents")
    return R.bm25_topk(docs, _QUERY_TERMS, topk=10)


BM25_TOPK_SQL = R.sql_bm25_topk(_QUERY_TERMS, topk=10)


def sim_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid lexical+vector retrieval around document 0: RRF-fuse the
    BM25 top-100 (document 0 itself excluded — it is the query) with the
    exact cosine top-100 neighbors of vector 0, keep the fused top-10."""
    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") != 0)
    emb = read_table(spark, sf_dir, "embeddings")
    lex = R.bm25_topk(docs, _QUERY_TERMS, topk=100)
    vec = S.cosine_topk(emb, query_max_id=1, k=100)
    return R.rrf_fuse(lex, vec, id_b="neighbor_id", rnk_b="rnk", topk=10)


_RRF = R.DEFAULT_RRF_K

HYBRID_RRF_SQL = f"""
WITH lex AS ({R.sql_bm25_topk(_QUERY_TERMS, topk=100, where="doc_id != 0")}),
vbase AS (
  SELECT vec_id, embedding AS v, sqrt({sql_dot('embedding', 'embedding')}) AS nrm
  FROM embeddings
),
vq AS (SELECT * FROM vbase WHERE vec_id < 1),
vs AS (
  SELECT c.vec_id AS neighbor_id,
         {sql_dot('vq.v', 'c.v')} / (vq.nrm * c.nrm) AS cos
  FROM vq JOIN vbase c ON vq.vec_id != c.vec_id
),
vr AS (
  SELECT neighbor_id,
         CAST(row_number() OVER (ORDER BY cos DESC, neighbor_id) AS BIGINT)
           AS vec_rnk
  FROM vs
),
vec AS (SELECT * FROM vr WHERE vec_rnk <= 100),
fused AS (
  SELECT coalesce(lex.doc_id, vec.neighbor_id) AS doc_id,
         lex.rnk AS lex_rnk, vec.vec_rnk,
         coalesce(CAST(1 AS DOUBLE) / ({_RRF} + lex.rnk), CAST(0 AS DOUBLE))
           + coalesce(CAST(1 AS DOUBLE) / ({_RRF} + vec.vec_rnk),
                      CAST(0 AS DOUBLE)) AS rrf_r
  FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.neighbor_id
)
SELECT doc_id, lex_rnk, vec_rnk, rrf_r
FROM fused ORDER BY rrf_r DESC, doc_id LIMIT 10
"""


QUERIES = {
    "text_bm25_topk": (text_bm25_topk, BM25_TOPK_SQL),
    "sim_hybrid_rrf": (sim_hybrid_rrf, HYBRID_RRF_SQL),
}
